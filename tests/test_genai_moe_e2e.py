"""End-to-end Phi-3.5-MoE decoder graph form: the GenAI attention plumbing
(MatMulNBits projections, contrib RotaryEmbedding, GroupQueryAttention over
static KV buffers, Skip/SimplifiedLayerNormalization) with the MLP replaced
by the MoE export vocabulary — a router MatMul into com.microsoft::QMoE
(SparseMixer top-2 routing, silu-gated fc1/fc3 expert pair, 4-bit packed
experts). Prefill + greedy rollout logit-checked each step against an
independent torch implementation consuming the dequantized twins."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import OnnxModel  # noqa: E402
from lele_tpu.onnx.synth import (  # noqa: E402
    GENAI_MOE_CFG,
    build_genai_decoder,
    genai_decoder_params,
    genai_feeds,
)

C = GENAI_MOE_CFG
B, V, QH, KVH, HD, NL, L, E = (C[k] for k in
                               ("B", "V", "qh", "kvh", "hd", "nl", "L",
                                "experts"))
D = QH * HD
EPS = C["eps"]
PREFILL = 4
STEPS = 5
MIX_EPS = 0.01


def _t_rms(x, g):
    return x * torch.rsqrt((x * x).mean(-1, keepdim=True) + EPS) * g


def _t_rotary(x, pos, cos, sin):
    c = cos[pos][:, None]
    s = sin[pos][:, None]
    x1, x2 = x[..., : HD // 2], x[..., HD // 2:]
    return torch.cat([x1 * c - x2 * s, x1 * s + x2 * c], dim=-1)


def _t_sparse_mixer(logits):
    """HF PhiMoE inference routing (top-2 over relative-margin-masked
    softmaxes) — written against the HF modeling code, not ours."""
    w_all, e_all = [], []
    masked = logits.clone()
    for _ in range(2):
        thr, ind = masked.max(-1, keepdim=True)
        factor = logits.abs().clamp(min=thr)
        drop = (thr - masked) / factor > 2 * MIX_EPS
        gates = masked.masked_fill(drop, float("-inf")).softmax(-1)
        w_all.append(gates.gather(-1, ind)[..., 0])
        e_all.append(ind[..., 0])
        masked = masked.scatter(-1, ind, float("-inf"))
    return torch.stack(w_all, -1), torch.stack(e_all, -1)


def _t_moe(hm, router, fc1, fc2, fc3):
    """hm [B,S,D] → per-token top-2 expert mix of silu-gated FFNs."""
    b, s, _ = hm.shape
    x2 = hm.reshape(-1, D)
    weights, experts = _t_sparse_mixer(x2 @ router)
    out = torch.zeros_like(x2)
    for r in range(x2.shape[0]):
        for slot in range(2):
            e = experts[r, slot]
            h = torch.nn.functional.silu(x2[r] @ fc1[e]) * (x2[r] @ fc3[e])
            out[r] += weights[r, slot] * (h @ fc2[e])
    return out.reshape(b, s, D)


def _t_step(deq, ids, pos, caches):
    t = {k: torch.from_numpy(v) for k, v in deq.items()}
    x = t["emb"][torch.from_numpy(ids)]
    b, s, _ = x.shape
    posT = torch.from_numpy(pos)
    res = None
    for i in range(NL):
        if res is None:
            h, res = _t_rms(x, t[f"g_attn{i}"]), x
        else:
            res = x + res
            h = _t_rms(res, t[f"g_attn{i}"])
        q = (h @ t[f"wq{i}"].T).view(b, s, QH, HD).transpose(1, 2)
        k = (h @ t[f"wk{i}"].T).view(b, s, KVH, HD).transpose(1, 2)
        v = (h @ t[f"wv{i}"].T).view(b, s, KVH, HD).transpose(1, 2)
        q = _t_rotary(q, posT, t["cos"], t["sin"])
        k = _t_rotary(k, posT, t["cos"], t["sin"])
        pk, pv = caches[i]
        if pk is not None:
            k = torch.cat([pk, k], dim=2)
            v = torch.cat([pv, v], dim=2)
        caches[i] = (k, v)
        kf = k.repeat_interleave(QH // KVH, dim=1)
        vf = v.repeat_interleave(QH // KVH, dim=1)
        tkv = k.shape[2]
        att = (q @ kf.transpose(-1, -2)) / np.sqrt(HD)
        causal = (torch.arange(tkv)[None, :]
                  <= (tkv - s + torch.arange(s))[:, None])
        att = att.masked_fill(~causal[None, None], -1e9)
        y = (att.softmax(-1) @ vf).transpose(1, 2).reshape(b, s, D)
        ao = y @ t[f"wo{i}"].T
        res = ao + res
        hm = _t_rms(res, t[f"g_mlp{i}"])
        x = _t_moe(hm, t[f"router{i}"], t[f"fc1_{i}"], t[f"fc2_{i}"],
                   t[f"fc3_{i}"])
    fin = _t_rms(x + res, t["g_final"])
    return (fin @ t["head"].T).numpy(), caches


def test_genai_moe_decoder_prefill_and_greedy_rollout():
    rng = np.random.default_rng(7)
    inits, deq = genai_decoder_params(rng, cfg=C)
    assert "fc1_0_q" in inits and "wg0_q" not in inits
    cm_pre = compile_model(
        OnnxModel.from_bytes(build_genai_decoder(inits, PREFILL, cfg=C)),
        strict=True)
    cm_dec = compile_model(
        OnnxModel.from_bytes(build_genai_decoder(inits, 1, cfg=C)),
        strict=True)

    ids = rng.integers(0, V, (B, PREFILL)).astype(np.int64)
    pos = np.broadcast_to(np.arange(PREFILL), (B, PREFILL)).astype(np.int64)
    pks = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    pvs = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]

    outs = cm_pre.run_np(**genai_feeds(ids, pos, 0, PREFILL, pks, pvs,
                                       cfg=C))
    logits = np.asarray(outs[0])
    for i in range(NL):
        pks[i] = np.asarray(outs[1 + 2 * i])
        pvs[i] = np.asarray(outs[2 + 2 * i])

    tcaches = [(None, None)] * NL
    tlogits, tcaches = _t_step(deq, ids, pos, tcaches)
    np.testing.assert_allclose(logits, tlogits, rtol=1e-3, atol=3e-4)

    tok = logits[:, -1].argmax(-1)
    np.testing.assert_array_equal(tok, tlogits[:, -1].argmax(-1))
    for step in range(STEPS):
        plen = PREFILL + step
        ids1 = tok[:, None].astype(np.int64)
        pos1 = np.full((B, 1), plen, np.int64)
        outs = cm_dec.run_np(**genai_feeds(ids1, pos1, plen, 1, pks, pvs,
                                           cfg=C))
        logits = np.asarray(outs[0])
        for i in range(NL):
            pks[i] = np.asarray(outs[1 + 2 * i])
            pvs[i] = np.asarray(outs[2 + 2 * i])
        tlogits, tcaches = _t_step(deq, ids1, pos1, tcaches)
        np.testing.assert_allclose(logits, tlogits, rtol=1e-3, atol=4e-4)
        tok = logits[:, -1].argmax(-1)
        np.testing.assert_array_equal(tok, tlogits[:, -1].argmax(-1))


def test_genai_moe_routing_actually_sparse():
    """The compiled model's MoE really routes: zeroing one layer's router
    changes which experts fire and therefore the logits."""
    rng = np.random.default_rng(8)
    inits, _ = genai_decoder_params(rng, cfg=C)
    ids = rng.integers(0, V, (B, PREFILL)).astype(np.int64)
    pos = np.broadcast_to(np.arange(PREFILL), (B, PREFILL)).astype(np.int64)
    pks = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    pvs = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    feeds = genai_feeds(ids, pos, 0, PREFILL, pks, pvs, cfg=C)

    base = compile_model(
        OnnxModel.from_bytes(build_genai_decoder(inits, PREFILL, cfg=C)),
        strict=True).run_np(**feeds)[0]
    inits2 = dict(inits)
    inits2["router0"] = np.zeros_like(inits["router0"])
    alt = compile_model(
        OnnxModel.from_bytes(build_genai_decoder(inits2, PREFILL, cfg=C)),
        strict=True).run_np(**feeds)[0]
    assert np.abs(np.asarray(base) - np.asarray(alt)).max() > 1e-4
