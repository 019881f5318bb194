"""End-to-end autoregressive decode built ON the opset-23 LLM op family:
Attention (fused, masked) + RotaryEmbedding (position_ids) + TensorScatter
(static KV cache writes) composed into a step graph — the layout fresh LLM
exports use instead of spelled-out MatMul/Softmax chains.

Every step reuses one XLA program (static shapes); the oracle is an
independent torch implementation of the same math, compared logit-by-logit
and token-by-token over a greedy rollout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import OnnxModel, builder as ob  # noqa: E402

B, V, D, H, NL, S = 2, 50, 32, 4, 2, 16
HD = D // H
STEPS = 10


def _params(rng):
    p = {"emb": rng.standard_normal((V, D)).astype(np.float32) * 0.5}
    for i in range(NL):
        for nm, shape in [
            ("wq", (D, D)), ("wk", (D, D)), ("wv", (D, D)), ("wo", (D, D)),
            ("up", (D, 2 * D)), ("down", (2 * D, D)),
        ]:
            p[f"{nm}{i}"] = (rng.standard_normal(shape) / np.sqrt(shape[0])
                             ).astype(np.float32)
        p[f"g1_{i}"] = rng.standard_normal(D).astype(np.float32) * 0.1 + 1
        p[f"b1_{i}"] = rng.standard_normal(D).astype(np.float32) * 0.1
        p[f"g2_{i}"] = rng.standard_normal(D).astype(np.float32) * 0.1 + 1
        p[f"b2_{i}"] = rng.standard_normal(D).astype(np.float32) * 0.1
    p["gf"] = np.ones(D, np.float32)
    p["bf"] = np.zeros(D, np.float32)
    p["head"] = (rng.standard_normal((D, V)) / np.sqrt(D)).astype(np.float32)
    inv = 1.0 / 10000 ** (np.arange(HD // 2) / (HD // 2))
    t = np.arange(S)[:, None] * inv[None, :]
    p["cos"] = np.cos(t).astype(np.float32)
    p["sin"] = np.sin(t).astype(np.float32)
    return p


def _build_step(p):
    """One decode step: ids, pos (+ caches, mask) → logits, new caches."""
    nodes = []
    inits = [ob.tensor_from_array(v, k) for k, v in p.items()]
    inits += [
        ob.tensor_from_array(np.array([B, 1, H, HD], np.int64), "shp_bhd"),
        ob.tensor_from_array(np.array([B, 1, D], np.int64), "shp_b1d"),
    ]

    def n(*a, **kw):
        nodes.append(ob.node(*a, **kw))

    n("Gather", ["emb", "ids"], ["x0"])          # [B, D]
    n("Reshape", ["x0", "shp_b1d"], ["x"])        # [B,1,D]
    cur = "x"
    outs = ["logits"]
    for i in range(NL):
        n("LayerNormalization", [cur, f"g1_{i}", f"b1_{i}"], [f"h{i}"])
        for t_ in ("q", "k", "v"):
            n("MatMul", [f"h{i}", f"w{t_}{i}"], [f"{t_}f{i}"])
            n("Reshape", [f"{t_}f{i}", "shp_bhd"], [f"{t_}r{i}"])
            n("Transpose", [f"{t_}r{i}"], [f"{t_}4_{i}"], perm=[0, 2, 1, 3])
        n("RotaryEmbedding", [f"q4_{i}", "cos", "sin", "pos2"], [f"qr{i}"])
        n("RotaryEmbedding", [f"k4_{i}", "cos", "sin", "pos2"], [f"kr{i}"])
        n("TensorScatter", [f"ck{i}", f"kr{i}", "pos1"], [f"nk{i}"])
        n("TensorScatter", [f"cv{i}", f"v4_{i}", "pos1"], [f"nv{i}"])
        n("Attention", [f"qr{i}", f"nk{i}", f"nv{i}", "mask"], [f"att{i}"])
        n("Transpose", [f"att{i}"], [f"attT{i}"], perm=[0, 2, 1, 3])
        n("Reshape", [f"attT{i}", "shp_b1d"], [f"attF{i}"])
        n("MatMul", [f"attF{i}", f"wo{i}"], [f"ao{i}"])
        n("Add", [cur, f"ao{i}"], [f"r1_{i}"])
        n("LayerNormalization", [f"r1_{i}", f"g2_{i}", f"b2_{i}"], [f"hf{i}"])
        n("MatMul", [f"hf{i}", f"up{i}"], [f"u{i}"])
        n("Gelu", [f"u{i}"], [f"ug{i}"])
        n("MatMul", [f"ug{i}", f"down{i}"], [f"dn{i}"])
        n("Add", [f"r1_{i}", f"dn{i}"], [f"r2_{i}"])
        cur = f"r2_{i}"
        outs += [f"nk{i}", f"nv{i}"]
    n("LayerNormalization", [cur, "gf", "bf"], ["hfin"])
    n("MatMul", ["hfin", "head"], ["logits"])

    inputs = [
        ob.value_info("ids", 7, [B]),
        ob.value_info("pos1", 7, [B]),
        ob.value_info("pos2", 7, [B, 1]),
        ob.value_info("mask", 1, [B, 1, 1, S]),
    ]
    for i in range(NL):
        inputs += [
            ob.value_info(f"ck{i}", 1, [B, H, S, HD]),
            ob.value_info(f"cv{i}", 1, [B, H, S, HD]),
        ]
    bs = ob.build_model_bytes(
        nodes, inputs=inputs,
        outputs=[ob.value_info(o, 1, []) for o in outs],
        initializers=inits, opset=23,
    )
    return bs, outs


def _torch_rotary(x, cos, sin):
    # x [B,H,1,HD]; cos/sin [B,1,1,HD/2]
    r = x.shape[-1]
    x1, x2 = x[..., : r // 2], x[..., r // 2:]
    return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)


def _torch_step(p, ids, pos, ck, cv, mask):
    """Independent torch implementation of the same step math."""
    tp = {k: torch.from_numpy(v) for k, v in p.items()}
    x = tp["emb"][torch.from_numpy(ids)].reshape(B, 1, D)
    nks, nvs = [], []
    cos = tp["cos"][torch.from_numpy(pos)].reshape(B, 1, 1, HD // 2)
    sin = tp["sin"][torch.from_numpy(pos)].reshape(B, 1, 1, HD // 2)
    for i in range(NL):
        h = F.layer_norm(x, (D,), tp[f"g1_{i}"], tp[f"b1_{i}"])
        q = (h @ tp[f"wq{i}"]).reshape(B, 1, H, HD).transpose(1, 2)
        k = (h @ tp[f"wk{i}"]).reshape(B, 1, H, HD).transpose(1, 2)
        v = (h @ tp[f"wv{i}"]).reshape(B, 1, H, HD).transpose(1, 2)
        q, k = _torch_rotary(q, cos, sin), _torch_rotary(k, cos, sin)
        nk = torch.from_numpy(ck[i]).clone()
        nv = torch.from_numpy(cv[i]).clone()
        for b in range(B):
            nk[b, :, pos[b]] = k[b, :, 0]
            nv[b, :, pos[b]] = v[b, :, 0]
        att = F.scaled_dot_product_attention(
            q, nk, nv, attn_mask=torch.from_numpy(mask)
        )
        x = x + (att.transpose(1, 2).reshape(B, 1, D) @ tp[f"wo{i}"])
        hf = F.layer_norm(x, (D,), tp[f"g2_{i}"], tp[f"b2_{i}"])
        x = x + F.gelu(hf @ tp[f"up{i}"]) @ tp[f"down{i}"]
        nks.append(nk.numpy())
        nvs.append(nv.numpy())
    hfin = F.layer_norm(x, (D,), tp["gf"], tp["bf"])
    return (hfin @ tp["head"]).numpy(), nks, nvs


def test_llm_decode_matches_torch_rollout():
    rng = np.random.default_rng(0)
    p = _params(rng)
    bs, _ = _build_step(p)
    cm = compile_model(OnnxModel.from_bytes(bs))

    ids = np.array([3, 7], dtype=np.int64)
    ids_t = ids.copy()
    ck = [np.zeros((B, H, S, HD), np.float32) for _ in range(NL)]
    cv = [np.zeros((B, H, S, HD), np.float32) for _ in range(NL)]
    ck_t = [c.copy() for c in ck]
    cv_t = [c.copy() for c in cv]
    toks, toks_t = [], []
    for step in range(STEPS):
        pos = np.full((B,), step, dtype=np.int64)
        mask = np.full((B, 1, 1, S), -1e9, np.float32)
        mask[..., : step + 1] = 0.0
        feeds = {"ids": ids, "pos1": pos, "pos2": pos[:, None],
                 "mask": mask}
        for i in range(NL):
            feeds[f"ck{i}"] = ck[i]
            feeds[f"cv{i}"] = cv[i]
        outs = cm.run_np(**feeds)
        logits = outs[0].reshape(B, V)
        for i in range(NL):
            ck[i], cv[i] = outs[1 + 2 * i], outs[2 + 2 * i]

        logits_t, ck_t, cv_t = _torch_step(p, ids_t, pos, ck_t, cv_t, mask)
        logits_t = logits_t.reshape(B, V)
        np.testing.assert_allclose(logits, logits_t, rtol=1e-4, atol=1e-5)

        ids = logits.argmax(-1).astype(np.int64)
        ids_t = logits_t.argmax(-1).astype(np.int64)
        toks.append(ids.copy())
        toks_t.append(ids_t.copy())
    np.testing.assert_array_equal(np.stack(toks), np.stack(toks_t))


def test_llm_decode_quantized_step():
    """The generic dynamic quantizer composes with the Attention-23 step
    graph: int8-DQL linears inside a rollout step stay close to the float
    logits (the LLM analog of quantize_dynamic on the ASR encoder)."""
    from lele_tpu.onnx.quantize import quantize_dynamic

    rng = np.random.default_rng(1)
    p = _params(rng)
    bs, _ = _build_step(p)
    cm_f = compile_model(OnnxModel.from_bytes(bs))
    cm_q = compile_model(OnnxModel.from_bytes(quantize_dynamic(bs)))

    ids = np.array([3, 7], dtype=np.int64)
    ck = [np.zeros((B, H, S, HD), np.float32) for _ in range(NL)]
    cv = [np.zeros((B, H, S, HD), np.float32) for _ in range(NL)]
    ckq = [c.copy() for c in ck]
    cvq = [c.copy() for c in cv]
    idsq = ids.copy()
    for step in range(4):
        pos = np.full((B,), step, dtype=np.int64)
        mask = np.full((B, 1, 1, S), -1e9, np.float32)
        mask[..., : step + 1] = 0.0

        def feeds(i, c1, c2):
            f = {"ids": i, "pos1": pos, "pos2": pos[:, None], "mask": mask}
            for li in range(NL):
                f[f"ck{li}"] = c1[li]
                f[f"cv{li}"] = c2[li]
            return f

        of = cm_f.run_np(**feeds(ids, ck, cv))
        oq = cm_q.run_np(**feeds(idsq, ckq, cvq))
        lf, lq = of[0].reshape(B, V), oq[0].reshape(B, V)
        mae = np.abs(lf - lq).mean()
        spread = np.abs(lf).mean()
        assert mae < 0.05 * max(spread, 1e-6), f"step {step}: MAE {mae}"
        for li in range(NL):
            ck[li], cv[li] = of[1 + 2 * li], of[2 + 2 * li]
            ckq[li], cvq[li] = oq[1 + 2 * li], oq[2 + 2 * li]
        ids = lf.argmax(-1).astype(np.int64)
        idsq = lq.argmax(-1).astype(np.int64)
