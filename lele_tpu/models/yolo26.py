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


def yolo26_forward(params: Params, img, cfg: Yolo26Config):
    """img: [B, H, W, 3] f32 in [0,1] OR uint8 in [0,255] (normalized on
    device — ship the 4×-smaller u8 buffer) → (scores [B,300,C], boxes
    [B,300,4] cxcywh in pixels[, coeffs [B,300,32], protos [B,Hp,Wp,32]])."""
    dt = cfg.compute_dtype
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
