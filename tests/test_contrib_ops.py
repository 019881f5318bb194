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
        K=K, N=N, bits=4, block_size=BLK,
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
        K=K, N=N, bits=4, block_size=BLK,
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
        n_outputs=4, epsilon=1e-6,
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
                 transA=1, transB=1, alpha=0.5)[0]
    np.testing.assert_allclose(got, 0.5 * (a.T @ b.T), rtol=1e-5, atol=1e-6)


def test_quick_gelu():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 6)).astype(np.float32)
    got = run_op("QuickGelu", {"x": x})[0]
    want = x / (1 + np.exp(-1.702 * x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_contrib_attention_rejected_clearly():
    """com.microsoft::Attention has a different schema than ai.onnx
    Attention-23 — it must refuse loudly, never compute garbage."""
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel, builder as ob

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 4, 8)).astype(np.float32)
    w = rng.standard_normal((8, 24)).astype(np.float32)
    bias = rng.standard_normal(24).astype(np.float32)
    node = ob.node("Attention", ["x", "w", "bias"], ["y"],
                   domain="com.microsoft", num_heads=2)
    bs = ob.build_model_bytes(
        [node],
        inputs=[ob.vi_from_array("x", x)],
        outputs=[ob.value_info("y", 1, [])],
        initializers=[ob.tensor_from_array(w, "w"),
                      ob.tensor_from_array(bias, "bias")],
    )
    with pytest.raises(Exception, match="com.microsoft"):
        compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)
