"""Pallas-vs-jnp backend parity (the TPU analog of the reference's
NEON-vs-portable equivalence suite, tests/verify_neon_accuracy.rs:7-77).

On CPU the Pallas kernels run in interpreter mode; the numerics contract is
bit-exactness for integer kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from lele_tpu.kernels.quant_matmul import (
    dynamic_quantize_u8,
    fused_dynamic_quant_matmul,
    pallas_int8_matmul,
)

rng = np.random.default_rng(5)


def test_pallas_int8_matmul_exact():
    m, k, n = 64, 128, 96
    a = rng.integers(-128, 127, (m, k)).astype(np.int8)
    b = rng.integers(-128, 127, (k, n)).astype(np.int8)
    got = np.asarray(
        pallas_int8_matmul(jnp.asarray(a), jnp.asarray(b), tm=32, tn=32, tk=64,
                           interpret=True)
    )
    want = a.astype(np.int32) @ b.astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_pallas_int8_matmul_ragged_tiles():
    # shapes not divisible by the tile sizes exercise the cdiv grid
    m, k, n = 50, 70, 30
    a = rng.integers(-100, 100, (m, k)).astype(np.int8)
    b = rng.integers(-100, 100, (k, n)).astype(np.int8)
    got = np.asarray(
        pallas_int8_matmul(jnp.asarray(a), jnp.asarray(b), tm=32, tn=16, tk=32,
                           interpret=True)
    )
    np.testing.assert_array_equal(got, a.astype(np.int32) @ b.astype(np.int32))


def test_fused_dq_matmul_matches_unfused_ops():
    """The fused path must match composing the individual ONNX ops
    (DynamicQuantizeLinear → MatMulInteger → dequant)."""
    m, k, n = 16, 64, 32
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.integers(0, 255, (k, n)).astype(np.uint8)
    bzp = jnp.asarray(np.uint8(117))
    bscale = jnp.asarray(np.float32(0.031))
    out, a_scale, a_zp = fused_dynamic_quant_matmul(
        jnp.asarray(a), jnp.asarray(b), bzp, bscale
    )
    # oracle via the op emitters' semantics
    q, scale, zp = (np.asarray(v) for v in dynamic_quantize_u8(jnp.asarray(a)))
    mm = (q.astype(np.int64) - int(zp)) @ (b.astype(np.int64) - 117)
    want = mm.astype(np.float32) * (scale * 0.031)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-3)
    assert abs(float(a_scale) - scale) < 1e-9


def test_dynamic_quantize_u8_range():
    x = rng.standard_normal(1000).astype(np.float32) * 4
    q, scale, zp = dynamic_quantize_u8(jnp.asarray(x))
    qn = np.asarray(q)
    assert qn.min() >= 0 and qn.max() <= 255
    # reconstruct within one quantization step
    rec = (qn - float(zp)) * float(scale)
    assert np.abs(rec - x).max() <= float(scale) * 0.51 + 1e-6


def test_pallas_lstm_seq_matches_scan():
    from lele_tpu.kernels.lstm import lstm_seq_pallas, lstm_seq_reference

    S, B, H = 23, 1, 32
    xp = jnp.asarray(rng.standard_normal((S, B, 4 * H)).astype(np.float32) * 0.4)
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.4)
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    hs_p, hf_p, cf_p = lstm_seq_pallas(xp, wh, h0, c0, interpret=True)
    hs_r, hf_r, cf_r = lstm_seq_reference(xp, wh, h0, c0)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf_p), np.asarray(cf_r), atol=1e-5)


@pytest.mark.parametrize("lbr", [True, False])
def test_pallas_gru_seq_matches_scan(lbr):
    from lele_tpu.kernels.gru import gru_seq_pallas, gru_seq_reference

    S, B, H = 19, 1, 32
    xp = jnp.asarray(rng.standard_normal((S, B, 3 * H)).astype(np.float32) * 0.4)
    rh = jnp.asarray(rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.4)
    rb = jnp.asarray(rng.standard_normal((3 * H,)).astype(np.float32) * 0.1)
    h0 = jnp.zeros((B, H))
    hs_p, hf_p = gru_seq_pallas(xp, rh, rb, h0, lbr, interpret=True)
    hs_r, hf_r = gru_seq_reference(xp, rh, rb, h0, lbr)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_r), atol=1e-5)


def test_fused_dq_matmul_pallas_matches_composed_ops():
    from lele_tpu.kernels.quant_matmul import fused_dq_matmul_pallas

    M, K, N = 37, 64, 50
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)
    ws = np.abs(w).max() / 127.0
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    colsum = wq.astype(np.int32).sum(0)
    q, a_scale, a_zp = dynamic_quantize_u8(jnp.asarray(x))
    out = fused_dq_matmul_pallas(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(colsum),
        a_scale, a_zp, jnp.float32(ws), tm=16, tn=32, interpret=True,
    )
    qn = np.asarray(q)
    mm = (qn.astype(np.int64) - int(np.asarray(a_zp))) @ wq.astype(np.int64)
    want = mm * (float(np.asarray(a_scale)) * ws)
    np.testing.assert_allclose(np.asarray(out), want,
                               rtol=1e-5, atol=np.abs(want).max() * 1e-6)


def test_w8_matmul_pallas_matches_dequant_matmul():
    """Weight-only int8 GEMM (w8a16): int8 weights stream at half the bf16
    bytes and dequantize in-register. Parity vs explicit dequant + matmul,
    including ragged M/N/K and per-channel scales."""
    from lele_tpu.kernels.quant_matmul import (
        quantize_weight_int8,
        w8_matmul_pallas,
    )

    for (M, K, N) in [(37, 64, 50), (96, 512, 200), (7, 130, 513)]:
        x = rng.standard_normal((M, K)).astype(np.float32)
        w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
        wq, sc = quantize_weight_int8(w)
        want = x @ (np.asarray(wq, np.float32) * np.asarray(sc)[None, :])
        out = w8_matmul_pallas(
            jnp.asarray(x), wq, sc, tn=128, tk=64, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), want, rtol=1e-4,
            atol=np.abs(want).max() * 1e-5,
        )


def test_quantize_weight_int8_roundtrip_error_bound():
    w = rng.standard_normal((64, 32)).astype(np.float32)
    from lele_tpu.kernels.quant_matmul import quantize_weight_int8

    wq, sc = quantize_weight_int8(w)
    deq = np.asarray(wq, np.float32) * np.asarray(sc)[None, :]
    # per-channel symmetric: error ≤ scale/2 per element
    assert (np.abs(deq - w) <= np.asarray(sc)[None, :] / 2 + 1e-7).all()
