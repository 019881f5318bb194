"""End-to-end ORT-GenAI decoder graph form: the exact op vocabulary the
onnxruntime-genai model builder writes into every published int4 LLM ONNX
export (Phi-3/Llama/Qwen hub releases) — MatMulNBits projections,
com.microsoft::RotaryEmbedding, GroupQueryAttention over static KV-cache
buffers, SimplifiedLayerNormalization + SkipSimplifiedLayerNormalization
residual plumbing, SwiGLU MLP — compiled to ONE XLA program per shape
(prefill + decode), prefilled and greedy-decoded, logit-checked each step
against an independent torch implementation of the same math.

Reference parity target: the reference's product is running published
exports end-to-end (/root/reference/crates/lele-build/src/lib.rs:72-135);
this graph form is what those exports contain for LLMs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import OnnxModel  # noqa: E402
from lele_tpu.onnx.synth import (  # noqa: E402
    GENAI_CFG,
    build_genai_decoder,
    genai_decoder_params,
    genai_feeds,
)

B, V, QH, KVH, HD, NL, L = (GENAI_CFG[k]
                            for k in ("B", "V", "qh", "kvh", "hd", "nl", "L"))
D = QH * HD
PREFILL = 4
STEPS = 6
EPS = GENAI_CFG["eps"]


# graph construction lives in lele_tpu.onnx.synth (shared with the launch
# rehearsal, the multichip dryrun leg, examples/genai_decode.py, and
# bench.py); this module owns the INDEPENDENT torch oracle.
_params = genai_decoder_params
_build = build_genai_decoder


# ------------------------------------------------ independent torch oracle


def _t_rms(x, g):
    return x * torch.rsqrt((x * x).mean(-1, keepdim=True) + EPS) * g


def _t_rotary(x, pos, cos, sin):
    """x [B,H,S,HD], pos [B,S]; half-split (non-interleaved) rotation."""
    c = cos[pos][:, None]  # [B,1,S,HD/2]
    s = sin[pos][:, None]
    x1, x2 = x[..., : HD // 2], x[..., HD // 2:]
    return torch.cat([x1 * c - x2 * s, x1 * s + x2 * c], dim=-1)


def _t_step(deq, ids, pos, caches):
    """One torch decoder step over concat caches; returns (logits, caches)."""
    t = {k: torch.from_numpy(v) for k, v in deq.items()}
    x = t["emb"][torch.from_numpy(ids)]  # [B,S,D]
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
        gate = hm @ t[f"wg{i}"].T
        ff = torch.nn.functional.silu(gate) * (hm @ t[f"wu{i}"].T)
        x = ff @ t[f"wd{i}"].T
    fin = _t_rms(x + res, t["g_final"])
    return (fin @ t["head"].T).numpy(), caches


_ours_feeds = genai_feeds


def test_genai_decoder_prefill_and_greedy_rollout():
    rng = np.random.default_rng(0)
    inits, deq = _params(rng)
    cm_pre = compile_model(OnnxModel.from_bytes(_build(inits, PREFILL)),
                           strict=True)
    cm_dec = compile_model(OnnxModel.from_bytes(_build(inits, 1)),
                           strict=True)

    ids = rng.integers(0, V, (B, PREFILL)).astype(np.int64)
    pos = np.broadcast_to(np.arange(PREFILL), (B, PREFILL)).astype(np.int64)
    pks = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    pvs = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]

    outs = cm_pre.run_np(**_ours_feeds(ids, pos, 0, PREFILL, pks, pvs))
    logits = np.asarray(outs[0])
    for i in range(NL):
        pks[i] = np.asarray(outs[1 + 2 * i])
        pvs[i] = np.asarray(outs[2 + 2 * i])

    tcaches = [(None, None)] * NL
    tlogits, tcaches = _t_step(deq, ids, pos, tcaches)
    np.testing.assert_allclose(logits, tlogits, rtol=1e-3, atol=2e-4)
    # the cache buffers hold the torch K/V at the written rows
    for i in range(NL):
        np.testing.assert_allclose(pks[i][:, :, :PREFILL],
                                   tcaches[i][0].numpy(),
                                   rtol=1e-4, atol=1e-5)

    # greedy rollout, decode program, token-by-token agreement
    tok = logits[:, -1].argmax(-1)
    ttok = tlogits[:, -1].argmax(-1)
    np.testing.assert_array_equal(tok, ttok)
    for step in range(STEPS):
        plen = PREFILL + step
        ids1 = tok[:, None].astype(np.int64)
        pos1 = np.full((B, 1), plen, np.int64)
        outs = cm_dec.run_np(**_ours_feeds(ids1, pos1, plen, 1, pks, pvs))
        logits = np.asarray(outs[0])
        for i in range(NL):
            pks[i] = np.asarray(outs[1 + 2 * i])
            pvs[i] = np.asarray(outs[2 + 2 * i])
        tlogits, tcaches = _t_step(deq, ids1, pos1, tcaches)
        np.testing.assert_allclose(logits, tlogits, rtol=1e-3, atol=3e-4)
        tok = logits[:, -1].argmax(-1)
        ttok = tlogits[:, -1].argmax(-1)
        np.testing.assert_array_equal(tok, ttok)


def test_genai_decoder_one_program_per_shape():
    # prefill and decode compile once each; 3 decode steps reuse the jit
    rng = np.random.default_rng(1)
    inits, _ = _params(rng)
    cm = compile_model(OnnxModel.from_bytes(_build(inits, 1)), strict=True)
    pks = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    pvs = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    tok = np.zeros((B, 1), np.int64)
    for step in range(3):
        outs = cm.run_np(**_ours_feeds(tok, np.full((B, 1), step, np.int64),
                                       step, 1, pks, pvs))
        for i in range(NL):
            pks[i] = np.asarray(outs[1 + 2 * i])
            pvs[i] = np.asarray(outs[2 + 2 * i])
        tok = np.asarray(outs[0])[:, -1].argmax(-1)[:, None].astype(np.int64)
    assert np.isfinite(np.asarray(outs[0])).all()
