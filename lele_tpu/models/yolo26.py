"""YOLO26-style NMS-free detector / segmenter.

Product parity: the reference runs YOLO26 detect (outputs [1,300,80] class
logits + [1,300,4] cxcywh boxes, DETR-style threshold-only decode, no NMS —
/root/reference/examples/yolo26/src/image.rs:189-241) and YOLO26n-seg
([1,300,38] = 4 box + score + class + 32 mask coeffs, plus [1,32,H,W]
prototypes — examples/yolo26n-seg, SURVEY.md §2.5).

Native architecture: CSP-ish conv backbone (NHWC, stride 32) → FPN-lite →
per-cell head (cls + box [+ mask coeffs]); the 300 proposals are selected
on device with `lax.top_k` over cell confidences — the end-to-end NMS-free
contract with static output shapes (TPU-friendly: no data-dependent shapes
leave the device).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, conv2d, init_conv2d


@dataclass
class Yolo26Config:
    img_size: int = 640
    n_classes: int = 80
    n_queries: int = 300
    widths: tuple = (32, 64, 128, 256)
    n_mask_coeffs: int = 32
    n_protos: int = 32
    segmentation: bool = False
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def _csp_block(key, c: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"c1": init_conv2d(k1, c, c, 3), "c2": init_conv2d(k2, c, c, 3)}


def init_yolo26(key, cfg: Yolo26Config) -> Params:
    ks = jax.random.split(key, 16)
    w = cfg.widths
    p: Params = {
        "stem": init_conv2d(ks[0], 3, w[0], 3),
        "stages": [],
        "head_cls": init_conv2d(ks[1], w[-1], cfg.n_classes, 1),
        "head_box": init_conv2d(ks[2], w[-1], 4, 1),
    }
    for i in range(len(w) - 1):
        kk = jax.random.split(ks[3 + i], 2)
        p["stages"].append(
            {"down": init_conv2d(kk[0], w[i], w[i + 1], 3), "csp": _csp_block(kk[1], w[i + 1])}
        )
    if cfg.segmentation:
        p["head_coeff"] = init_conv2d(ks[10], w[-1], cfg.n_mask_coeffs, 1)
        p["proto1"] = init_conv2d(ks[11], w[2], cfg.n_protos, 3)
    return p


def prepare_s2d_params(params: Params, cfg: Yolo26Config) -> Params:
    """Add the space-to-depth-domain weights for the small-channel early
    stages (models/s2d.py): stem + stage-0 run in s2d2 form (full MXU
    lanes), stage-1's down conv exits back to the original domain. Run
    once at load time; `yolo26_forward` takes the fast path when the
    "s2d" subtree is present. Exact same math — parity-tested."""
    from . import s2d as S

    st0, st1 = params["stages"][0], params["stages"][1]

    def hwio(p):
        return np.asarray(jnp.transpose(p["w"], (2, 3, 1, 0)))

    prep = {
        "stem_w": jnp.asarray(S.w_stem_s2d4(hwio(params["stem"]))),
        "stem_b": jnp.tile(params["stem"]["b"], 4),
        "down0_w": jnp.asarray(S.w_down_s2d2(hwio(st0["down"]))),
        "down0_b": jnp.tile(st0["down"]["b"], 4),
        "c01_w": jnp.asarray(S.w_conv1_s2d2(hwio(st0["csp"]["c1"]))),
        "c01_b": jnp.tile(st0["csp"]["c1"]["b"], 4),
        "c02_w": jnp.asarray(S.w_conv1_s2d2(hwio(st0["csp"]["c2"]))),
        "c02_b": jnp.tile(st0["csp"]["c2"]["b"], 4),
        "down1_w": jnp.asarray(S.w_exit_s2d2(hwio(st1["down"]))),
        "down1_b": jnp.asarray(st1["down"]["b"]),
    }
    out = dict(params)
    out["s2d"] = prep
    return out


def yolo26_forward(params: Params, img, cfg: Yolo26Config):
    """img: [B, H, W, 3] f32 in [0,1] OR uint8 in [0,255] (normalized on
    device — ship the 4×-smaller u8 buffer) → (scores [B,300,C], boxes
    [B,300,4] cxcywh in pixels[, coeffs [B,300,32], protos [B,Hp,Wp,32]])."""
    dt = cfg.compute_dtype
    use_s2d = "s2d" in params
    if use_s2d:
        if img.ndim == 4 and img.shape[-1] == 48:
            pass  # pre-packed
        elif img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
            use_s2d = img.shape[2] % 4 == 0 and img.shape[3] % 4 == 0
        else:
            use_s2d = img.shape[1] % 4 == 0 and img.shape[2] % 4 == 0
    if use_s2d:
        from . import s2d as S

        sp = params["s2d"]
        e01 = [(0, 1), (0, 1)]
        # Preferred input: HOST-packed s2d4 [B, H/4, W/4, 48]
        # (utils/image.preprocess_s2d). An in-program image relayout costs
        # ~0.33 ms at 640² whatever the source layout (XLA layout
        # assignment), and NHWC C=3 additionally lane-pads 3→128 (~43× the
        # bytes); a pre-packed input param reads clean. Device fallbacks
        # accept CHW and NHWC for compatibility.
        if img.ndim == 4 and img.shape[-1] == 48:
            xs = img  # pre-packed
        elif img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
            xs = S.s2d_chw(img, 4)  # [B, H/4, W/4, 48]
        else:
            xs = S.s2d(img, 4)  # NHWC compat: pays the padded read once
        if xs.dtype == jnp.uint8:
            xs = xs.astype(dt) * jnp.asarray(1.0 / 255.0, dt)
        else:
            xs = xs.astype(dt)
        xs = jax.nn.silu(
            S.conv_s2d(xs, sp["stem_w"], 1, e01, dt) + sp["stem_b"])
        # s2d2-form of the 320² stem map; feats[0] is only a FPN
        # placeholder, keep it in original form
        feats = [S.s2d_undo(xs.astype(dt), 2)]
        xs = jax.nn.silu(
            S.conv_s2d(xs.astype(dt), sp["down0_w"], 2, e01, dt)
            + sp["down0_b"])
        h = jax.nn.silu(
            S.conv_s2d(xs.astype(dt), sp["c01_w"], 1, "SAME", dt)
            + sp["c01_b"])
        xs = xs + (S.conv_s2d(h.astype(dt), sp["c02_w"], 1, "SAME", dt)
                   + sp["c02_b"]).astype(xs.dtype)
        feats.append(S.s2d_undo(xs.astype(dt), 2))
        x = jax.nn.silu(
            S.conv_s2d(xs.astype(dt), sp["down1_w"], 1, e01, dt)
            + sp["down1_b"])
        rest = params["stages"][1:]
        first = True
        for st in rest:
            if not first:
                x = jax.nn.silu(conv2d(st["down"], x, stride=2, dtype=dt))
            first = False
            h = jax.nn.silu(conv2d(st["csp"]["c1"], x, dtype=dt))
            x = x + conv2d(st["csp"]["c2"], h, dtype=dt).astype(x.dtype)
            feats.append(x)
    else:
        if img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
            img = jnp.transpose(img, (0, 2, 3, 1))  # CHW compat
        if img.dtype == jnp.uint8:
            x = img.astype(dt) * jnp.asarray(1.0 / 255.0, dt)
        else:
            x = img.astype(dt)
        x = jax.nn.silu(conv2d(params["stem"], x, stride=2, dtype=dt))
        feats = [x]
        for st in params["stages"]:
            x = jax.nn.silu(conv2d(st["down"], x, stride=2, dtype=dt))
            h = jax.nn.silu(conv2d(st["csp"]["c1"], x, dtype=dt))
            x = x + conv2d(st["csp"]["c2"], h, dtype=dt).astype(x.dtype)
            feats.append(x)
    B, Hc, Wc, C = x.shape
    cls_map = conv2d(params["head_cls"], x, dtype=dt).astype(jnp.float32)
    box_map = conv2d(params["head_box"], x, dtype=dt).astype(jnp.float32)
    cls_flat = cls_map.reshape(B, Hc * Wc, cfg.n_classes)
    box_flat = box_map.reshape(B, Hc * Wc, 4)
    # one-to-one assignment: top-300 cells by best class logit (NMS-free)
    conf = jnp.max(cls_flat, axis=-1)
    n_q = min(cfg.n_queries, Hc * Wc)
    _, top_idx = jax.lax.top_k(conf, n_q)  # [B, 300]
    scores = jnp.take_along_axis(cls_flat, top_idx[..., None], axis=1)
    boxes_raw = jnp.take_along_axis(box_flat, top_idx[..., None], axis=1)
    # decode: cell center + predicted offsets, wh via softplus, in pixels
    stride = cfg.img_size // Hc
    cy = (top_idx // Wc).astype(jnp.float32)
    cx = (top_idx % Wc).astype(jnp.float32)
    cxcy = jnp.stack([cx, cy], axis=-1) + 0.5
    centers = cxcy * stride + boxes_raw[..., :2] * stride
    wh = jax.nn.softplus(boxes_raw[..., 2:]) * stride
    boxes = jnp.concatenate([centers, wh], axis=-1)
    if not cfg.segmentation:
        return scores, boxes
    coeff_map = conv2d(params["head_coeff"], x, dtype=dt).astype(jnp.float32)
    coeffs = jnp.take_along_axis(
        coeff_map.reshape(B, Hc * Wc, cfg.n_mask_coeffs), top_idx[..., None], axis=1
    )
    protos = conv2d(params["proto1"], feats[2], dtype=dt).astype(jnp.float32)
    return scores, boxes, coeffs, protos


@dataclass
class Yolo26Model:
    cfg: Yolo26Config = field(default_factory=Yolo26Config)
    params: Params | None = None

    def init(self, seed: int = 0):
        self.params = jax.jit(lambda k: init_yolo26(k, self.cfg))(
            jax.random.PRNGKey(seed)
        )
        if self.cfg.img_size % 4 == 0:
            self.params = prepare_s2d_params(self.params, self.cfg)
        return self.params

    def forward_fn(self):
        cfg = self.cfg

        def fn(params, img):
            return yolo26_forward(params, img, cfg)

        return fn


def decode_detections(
    scores: np.ndarray,
    boxes: np.ndarray,
    conf_threshold: float = 0.25,
    class_names: list[str] | None = None,
) -> list[dict]:
    """Threshold-only decode (no NMS), mirroring image.rs:189-241:
    sigmoid(best class logit) ≥ threshold → keep; cxcywh → xyxy."""
    out = []
    s = 1.0 / (1.0 + np.exp(-scores[0]))
    best = s.argmax(-1)
    conf = s.max(-1)
    for i in np.nonzero(conf >= conf_threshold)[0]:
        cx, cy, w, h = boxes[0, i]
        det = {
            "xyxy": (
                float(cx - w / 2), float(cy - h / 2),
                float(cx + w / 2), float(cy + h / 2),
            ),
            "score": float(conf[i]),
            "class_id": int(best[i]),
            # anchor/query index into the raw head outputs — what
            # compose_masks needs to pick the RIGHT coeff/box rows
            "anchor": int(i),
        }
        if class_names:
            det["class"] = class_names[det["class_id"]]
        out.append(det)
    return sorted(out, key=lambda d: -d["score"])


def compose_masks(
    coeffs: np.ndarray, protos: np.ndarray, boxes: np.ndarray, keep: list[int],
    img_size: int = 640,
) -> np.ndarray:
    """Mask composition (postprocess_segmentation analog,
    examples/yolo26n-seg/src/image.rs:123+): sigmoid(coeffs @ protos),
    cropped to each box, upsampled to img_size."""
    hp, wp, _ = protos[0].shape
    pm = protos[0].reshape(hp * wp, -1)  # [Hp*Wp, 32]
    masks = []
    for i in keep:
        m = 1.0 / (1.0 + np.exp(-(pm @ coeffs[0, i]).reshape(hp, wp)))
        m_big = np.kron(m, np.ones((img_size // hp, img_size // wp), np.float32))
        cx, cy, w, h = boxes[0, i]
        x0, y0 = max(0, int(cx - w / 2)), max(0, int(cy - h / 2))
        x1, y1 = min(img_size, int(cx + w / 2)), min(img_size, int(cy + h / 2))
        crop = np.zeros_like(m_big)
        crop[y0:y1, x0:x1] = m_big[y0:y1, x0:x1]
        masks.append(crop > 0.5)
    return np.stack(masks) if masks else np.zeros((0, img_size, img_size), bool)
