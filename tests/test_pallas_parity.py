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


def test_guarded_wrappers_fall_back_off_tpu():
    """fused_dq_matmul / w8_matmul must route to the jnp path on CPU (and
    for oversized K on TPU) instead of erroring in Mosaic — VERDICT r1 #8."""
    from lele_tpu.kernels.quant_matmul import (
        _fused_dq_vmem_bytes,
        _VMEM_BUDGET,
        fused_dq_matmul,
        quantize_weight_int8,
        w8_matmul,
    )

    # a K so large the fused kernel's whole-K tiles cannot fit VMEM
    big_k = 1 + _VMEM_BUDGET // (2 * 128 * 4)
    assert _fused_dq_vmem_bytes(big_k, 128, 256, 4) > _VMEM_BUDGET

    # both wrappers: CPU → jnp path; parity vs explicit composition
    M, K, N = 9, 160, 40
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    wq, sc = quantize_weight_int8(w)
    want = x @ (np.asarray(wq, np.float32) * np.asarray(sc)[None, :])
    got = np.asarray(w8_matmul(jnp.asarray(x), wq, sc))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    ws_scalar = np.abs(w).max() / 127.0
    wq_t = np.clip(np.round(w / ws_scalar), -127, 127).astype(np.int8)
    colsum = jnp.asarray(wq_t.astype(np.int32).sum(0))
    q, a_scale, a_zp = dynamic_quantize_u8(jnp.asarray(x))
    out = fused_dq_matmul(
        jnp.asarray(x), jnp.asarray(wq_t), colsum, a_scale, a_zp,
        jnp.float32(ws_scalar),
    )
    qn = np.asarray(q)
    mm = (qn.astype(np.int64) - int(np.asarray(a_zp))) @ wq_t.astype(np.int64)
    want2 = mm * (float(np.asarray(a_scale)) * ws_scalar)
    np.testing.assert_allclose(np.asarray(out), want2, rtol=1e-5, atol=1e-3)


def test_w8_model_forward_parity():
    """SenseVoice w8a16 mode: logits within the int8 error budget of the f32
    model (the bench-path parity gate, VERDICT r1 #2)."""
    from lele_tpu.models import (
        SenseVoiceConfig,
        SenseVoiceModel,
        prepare_w8_params,
    )

    cfg = SenseVoiceConfig(
        n_layers=2, d_model=64, ffn_dim=128, vocab_size=60, n_heads=2,
        dtype="float32",
    )
    m = SenseVoiceModel(cfg)
    m.init(0)
    pcm = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    import jax

    ref = np.asarray(jax.jit(m.forward_fn())(m.params, pcm))

    w8cfg = SenseVoiceConfig(**{**cfg.__dict__, "weight_int8": True})
    m8 = SenseVoiceModel(w8cfg, params=prepare_w8_params(m.params), fbank=m.fbank)
    got = np.asarray(jax.jit(m8.forward_fn())(m8.params, pcm))
    assert got.shape == ref.shape
    # per-channel int8 weights: small relative error on the logits
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.05
    # frame argmax agreement (the CTC-decode-visible quantity)
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.95


def test_fused_sanm_layer_matches_block():
    """The whole-layer Pallas kernel (kernels/sanm_block.py) vs the jnp
    block with the same w8 weights — the backend-equivalence gate for the
    flagship's hot path."""
    import jax

    from lele_tpu.kernels.sanm_block import sanm_layer_w8_pallas
    from lele_tpu.models import (
        SenseVoiceConfig,
        init_sensevoice,
        prepare_w8_params,
    )
    from lele_tpu.models.sensevoice import sanm_block

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=256, ffn_dim=384, vocab_size=32, n_heads=2,
        dtype="float32", weight_int8=True, fused_block=False,
    )
    params = prepare_w8_params(init_sensevoice(jax.random.PRNGKey(3), cfg))
    lp = params["layers"][0]
    T = 23  # ragged → exercises the Tp padding + mask
    x = rng.standard_normal((1, T, cfg.d_model)).astype(np.float32) * 0.3
    mask = np.ones((1, T), np.float32)
    mask[0, -4:] = 0.0  # padded tail must not leak into valid rows

    want = np.asarray(sanm_block(lp, jnp.asarray(x), jnp.asarray(mask), cfg))
    got = np.asarray(sanm_layer_w8_pallas(
        jnp.asarray(x[0]), jnp.asarray(mask[0]), lp,
        cfg.n_heads, cfg.fsmn_kernel, interpret=True,
    ))[None]
    valid = int(mask.sum())
    np.testing.assert_allclose(
        got[:, :valid], want[:, :valid], rtol=2e-2,
        atol=np.abs(want[:, :valid]).max() * 2e-2,
    )


def test_fused_sanm_stack_matches_per_layer():
    """Grid-over-layers whole-encoder kernel == composing the per-layer
    kernel (carry threading + revolving weight indexing must be exact)."""
    import jax

    from lele_tpu.kernels.sanm_block import (
        sanm_layer_w8_pallas,
        sanm_stack_w8_pallas,
    )
    from lele_tpu.models import (
        SenseVoiceConfig,
        init_sensevoice,
        prepare_w8_params,
        stack_layer_params,
    )

    cfg = SenseVoiceConfig(
        n_layers=3, d_model=256, ffn_dim=384, vocab_size=32, n_heads=2,
        dtype="float32", weight_int8=True,
    )
    params = prepare_w8_params(init_sensevoice(jax.random.PRNGKey(4), cfg))
    stacked = stack_layer_params(params)["layers_stacked"]
    T = 19
    x = rng.standard_normal((T, cfg.d_model)).astype(np.float32) * 0.3
    mask = np.ones((T,), np.float32)
    mask[-3:] = 0.0

    want = jnp.asarray(x)
    for lp in params["layers"]:
        want = sanm_layer_w8_pallas(want, jnp.asarray(mask), lp,
                                    cfg.n_heads, cfg.fsmn_kernel,
                                    interpret=True)
    got = sanm_stack_w8_pallas(jnp.asarray(x), jnp.asarray(mask), stacked,
                               cfg.n_heads, cfg.fsmn_kernel, interpret=True)
    valid = int(mask.sum())
    np.testing.assert_allclose(
        np.asarray(got)[:valid], np.asarray(want)[:valid],
        rtol=1e-5, atol=1e-5,
    )


def test_quantize_weight_int8_roundtrip_error_bound():
    w = rng.standard_normal((64, 32)).astype(np.float32)
    from lele_tpu.kernels.quant_matmul import quantize_weight_int8

    wq, sc = quantize_weight_int8(w)
    deq = np.asarray(wq, np.float32) * np.asarray(sc)[None, :]
    # per-channel symmetric: error ≤ scale/2 per element
    assert (np.abs(deq - w) <= np.asarray(sc)[None, :] / 2 + 1e-7).all()
