"""com.microsoft contrib ops vs numpy/torch oracles — the forms real
ORT-optimized / ORT-quantized published checkpoints carry."""

import numpy as np
import pytest

from optest import run_op

K, N, BLK = 16, 5, 8
KB = K // BLK


def _pack_nibbles(vals):
    """vals uint [..., even] → packed uint8, low nibble first."""
    v = np.asarray(vals, np.uint8)
    return (v[..., 0::2] | (v[..., 1::2] << 4)).astype(np.uint8)


def _quant4(w, zp_val=8):
    """Groupwise symmetric-ish u4 quantization of w [N, K]."""
    wg = w.reshape(N, KB, BLK)
    scale = np.abs(wg).max(-1) / 7.0 + 1e-8  # [N, KB]
    q = np.clip(np.round(wg / scale[:, :, None]) + zp_val, 0, 15)
    wdq = (q - zp_val) * scale[:, :, None]
    return q.astype(np.uint8), scale.astype(np.float32), wdq.reshape(N, K)


def test_matmul_nbits_default_zp():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((N, K)).astype(np.float32)
    q, scale, wdq = _quant4(w)
    b = _pack_nibbles(q)  # [N, KB, BLK/2]
    a = rng.standard_normal((3, K)).astype(np.float32)
    got = run_op(
        "MatMulNBits", {"a": a},
        initializers={"b": b.reshape(N, KB, BLK // 2), "sc": scale},
        input_names=["a", "b", "sc"],
        domain="com.microsoft", K=K, N=N, bits=4, block_size=BLK,
    )[0]
    np.testing.assert_allclose(got, a @ wdq.T, rtol=1e-5, atol=1e-5)


def test_matmul_nbits_packed_zp_and_bias():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((N, K)).astype(np.float32)
    zp_vals = rng.integers(4, 12, (N, KB)).astype(np.uint8)
    wg = w.reshape(N, KB, BLK)
    scale = (np.abs(wg).max(-1) / 7.0 + 1e-8).astype(np.float32)
    q = np.clip(np.round(wg / scale[:, :, None]) + zp_vals[:, :, None],
                0, 15).astype(np.uint8)
    wdq = ((q.astype(np.float32) - zp_vals[:, :, None]) * scale[:, :, None]
           ).reshape(N, K)
    b = _pack_nibbles(q).reshape(N, KB, BLK // 2)
    # packed zero points: KB=2 → 1 byte per row
    zp_packed = _pack_nibbles(zp_vals)
    bias = rng.standard_normal(N).astype(np.float32)
    a = rng.standard_normal((2, K)).astype(np.float32)
    got = run_op(
        "MatMulNBits", {"a": a},
        initializers={"b": b, "sc": scale, "zp": zp_packed, "bias": bias},
        input_names=["a", "b", "sc", "zp", "", "bias"],
        domain="com.microsoft", K=K, N=N, bits=4, block_size=BLK,
    )[0]
    np.testing.assert_allclose(got, a @ wdq.T + bias, rtol=1e-5, atol=1e-5)


def test_simplified_layer_norm_is_rmsnorm():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 7)).astype(np.float32)
    w = rng.standard_normal(7).astype(np.float32)
    got = run_op("SimplifiedLayerNormalization", {"x": x, "w": w},
                 epsilon=1e-5)[0]
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_skip_layer_norm():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 8)).astype(np.float32)
    skip = rng.standard_normal((2, 4, 8)).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    be = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    outs = run_op(
        "SkipLayerNormalization",
        {"x": x, "skip": skip, "g": g, "be": be, "bias": bias},
        n_outputs=4, domain="com.microsoft", epsilon=1e-6,
    )
    s = torch.from_numpy(x + skip + bias)
    want = F.layer_norm(s, (8,), torch.from_numpy(g), torch.from_numpy(be),
                        eps=1e-6).numpy()
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[3], (x + skip + bias), rtol=1e-6)


def test_fused_matmul():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((5, 3)).astype(np.float32)
    b = rng.standard_normal((7, 5)).astype(np.float32)
    got = run_op("FusedMatMul", {"a": a, "b": b},
                 domain="com.microsoft",
                 transA=1, transB=1, alpha=0.5)[0]
    np.testing.assert_allclose(got, 0.5 * (a.T @ b.T), rtol=1e-5, atol=1e-6)


def test_quick_gelu():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 6)).astype(np.float32)
    got = run_op("QuickGelu", {"x": x}, domain="com.microsoft")[0]
    want = x / (1 + np.exp(-1.702 * x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _run_ms(nodes, inputs, outputs, inits, **kw):
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel, builder as ob

    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.vi_from_array(k, v) for k, v in inputs.items()],
        outputs=[ob.value_info(o, 1, []) for o in outputs],
        initializers=[ob.tensor_from_array(v, k) for k, v in inits.items()],
    )
    return compile_model(OnnxModel.from_bytes(bs)).run_np(**inputs)


def _torch_ms_attention(x, w, bias, heads, lens=None, causal=False):
    import torch
    import torch.nn.functional as F

    b, s, d = x.shape
    qkv = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(bias)
    q, k, v = qkv.split(qkv.shape[-1] // 3, dim=-1)
    dh = q.shape[-1] // heads

    def sh(t):
        return t.reshape(b, s, heads, dh).transpose(1, 2)

    mask = None
    if lens is not None:
        mask = (torch.arange(s)[None, :] <
                torch.from_numpy(lens)[:, None])[:, None, None, :]
    out = F.scaled_dot_product_attention(
        sh(q), sh(k), sh(v), attn_mask=mask, is_causal=causal
    )
    return out.transpose(1, 2).reshape(b, s, heads * dh).numpy()


def test_ms_attention_basic_and_lengths_mask():
    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(6)
    B, S, D, H = 2, 5, 8, 2
    x = rng.standard_normal((B, S, D)).astype(np.float32)
    w = (rng.standard_normal((D, 3 * D)) / np.sqrt(D)).astype(np.float32)
    bias = rng.standard_normal(3 * D).astype(np.float32)
    lens = np.array([5, 3], dtype=np.int32)
    node = ob.node("Attention", ["x", "w", "bias", "mi"], ["y"],
                   domain="com.microsoft", num_heads=H)
    got = _run_ms([node], {"x": x, "mi": lens}, ["y"],
                  {"w": w, "bias": bias})[0]
    want = _torch_ms_attention(x, w, bias, H, lens=lens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_attention_unidirectional():
    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(7)
    B, S, D, H = 1, 6, 8, 2
    x = rng.standard_normal((B, S, D)).astype(np.float32)
    w = (rng.standard_normal((D, 3 * D)) / np.sqrt(D)).astype(np.float32)
    bias = np.zeros(3 * D, np.float32)
    node = ob.node("Attention", ["x", "w", "bias"], ["y"],
                   domain="com.microsoft", num_heads=H, unidirectional=1)
    got = _run_ms([node], {"x": x}, ["y"], {"w": w, "bias": bias})[0]
    want = _torch_ms_attention(x, w, bias, H, causal=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_attention_share_buffer_rejected():
    # past-KV CONCAT form is supported (test_genai_ops); the share-buffer
    # variant (past_seq_len input / past_present_share_buffer attr) must
    # still refuse loudly rather than compute over a stale ring buffer
    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(8)
    B, S, D, H = 1, 4, 8, 2
    x = rng.standard_normal((B, S, D)).astype(np.float32)
    w = np.eye(D, 3 * D, dtype=np.float32)
    past = np.zeros((2, B, H, 8, D // H), np.float32)
    psl = np.asarray([3], np.int32)
    node = ob.node("Attention", ["x", "w", "", "", "past", "", "psl"],
                   ["y"], domain="com.microsoft", num_heads=H,
                   past_present_share_buffer=1)
    with pytest.raises(Exception, match="share_buffer"):
        _run_ms([node], {"x": x}, ["y"],
                {"w": w, "past": past, "psl": psl})


def test_bias_gelu_fast_gelu():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(9)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = run_op("BiasGelu", {"x": x, "b": b}, domain="com.microsoft")[0]
    want = F.gelu(torch.from_numpy(x + b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got = run_op("FastGelu", {"x": x, "b": b}, domain="com.microsoft")[0]
    want = F.gelu(torch.from_numpy(x + b), approximate="tanh").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_embed_layer_norm():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(10)
    B, S, V, D, NS = 2, 5, 11, 8, 2
    ids = rng.integers(0, V, (B, S)).astype(np.int64)
    seg = rng.integers(0, NS, (B, S)).astype(np.int64)
    we = rng.standard_normal((V, D)).astype(np.float32)
    pe = rng.standard_normal((S + 2, D)).astype(np.float32)
    se = rng.standard_normal((NS, D)).astype(np.float32)
    g = rng.standard_normal(D).astype(np.float32)
    be = rng.standard_normal(D).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32)
    outs = run_op(
        "EmbedLayerNormalization",
        {"ids": ids, "seg": seg, "mask": mask},
        initializers={"we": we, "pe": pe, "se": se, "g": g, "be": be},
        input_names=["ids", "seg", "we", "pe", "se", "g", "be", "mask"],
        n_outputs=3, domain="com.microsoft", epsilon=1e-12,
    )
    emb = we[ids] + pe[None, :S] + se[seg]
    want = F.layer_norm(torch.from_numpy(emb), (D,), torch.from_numpy(g),
                        torch.from_numpy(be), eps=1e-12).numpy()
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(outs[1], [3, 5])
    np.testing.assert_allclose(outs[2], emb, rtol=1e-6)


def test_ort_optimized_bert_block_composition():
    """A full ORT-optimized-style encoder block: EmbedLayerNormalization →
    com.microsoft Attention → SkipLayerNormalization → BiasGelu →
    SkipLayerNormalization, vs an independent torch implementation."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(11)
    B, S, V, D, H = 2, 4, 13, 8, 2
    ids = rng.integers(0, V, (B, S)).astype(np.int64)
    we = rng.standard_normal((V, D)).astype(np.float32) * 0.5
    pe = rng.standard_normal((S, D)).astype(np.float32) * 0.5
    g0 = np.ones(D, np.float32)
    b0 = np.zeros(D, np.float32)
    wqkv = (rng.standard_normal((D, 3 * D)) / np.sqrt(D)).astype(np.float32)
    bqkv = rng.standard_normal(3 * D).astype(np.float32) * 0.1
    wo = (rng.standard_normal((D, D)) / np.sqrt(D)).astype(np.float32)
    g1 = rng.standard_normal(D).astype(np.float32) * 0.1 + 1
    b1 = rng.standard_normal(D).astype(np.float32) * 0.1
    wup = (rng.standard_normal((D, 2 * D)) / np.sqrt(D)).astype(np.float32)
    bup = rng.standard_normal(2 * D).astype(np.float32) * 0.1
    wdn = (rng.standard_normal((2 * D, D)) / np.sqrt(2 * D)).astype(np.float32)
    g2 = rng.standard_normal(D).astype(np.float32) * 0.1 + 1
    b2 = rng.standard_normal(D).astype(np.float32) * 0.1

    nodes = [
        ob.node("EmbedLayerNormalization",
                ["ids", "", "we", "pe", "", "g0", "b0"], ["emb"],
                domain="com.microsoft", epsilon=1e-12),
        ob.node("Attention", ["emb", "wqkv", "bqkv"], ["att"],
                domain="com.microsoft", num_heads=H),
        ob.node("MatMul", ["att", "wo"], ["ao"]),
        ob.node("SkipLayerNormalization", ["ao", "emb", "g1", "b1"], ["h1"],
                domain="com.microsoft", epsilon=1e-12),
        ob.node("MatMul", ["h1", "wup"], ["up"]),
        ob.node("BiasGelu", ["up", "bup"], ["act"],
                domain="com.microsoft"),
        ob.node("MatMul", ["act", "wdn"], ["dn"]),
        ob.node("SkipLayerNormalization", ["dn", "h1", "g2", "b2"], ["y"],
                domain="com.microsoft", epsilon=1e-12),
    ]
    got = _run_ms(
        nodes, {"ids": ids}, ["y"],
        {k: v for k, v in [("we", we), ("pe", pe), ("g0", g0), ("b0", b0),
                           ("wqkv", wqkv), ("bqkv", bqkv), ("wo", wo),
                           ("g1", g1), ("b1", b1), ("wup", wup),
                           ("bup", bup), ("wdn", wdn), ("g2", g2),
                           ("b2", b2)]},
    )[0]

    emb = F.layer_norm(torch.from_numpy(we[ids] + pe[None]), (D,),
                       torch.from_numpy(g0), torch.from_numpy(b0),
                       eps=1e-12)
    att = torch.from_numpy(
        _torch_ms_attention(emb.numpy(), wqkv, bqkv, H))
    h1 = F.layer_norm(att @ torch.from_numpy(wo) + emb, (D,),
                      torch.from_numpy(g1), torch.from_numpy(b1), eps=1e-12)
    act = F.gelu(h1 @ torch.from_numpy(wup) + torch.from_numpy(bup))
    y = F.layer_norm(act @ torch.from_numpy(wdn) + h1, (D,),
                     torch.from_numpy(g2), torch.from_numpy(b2), eps=1e-12)
    np.testing.assert_allclose(got, y.numpy(), rtol=1e-3, atol=1e-4)
