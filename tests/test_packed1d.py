"""Lane-packed 1-D vocoder domain (models/packed1d.py): numerically
extracted packed kernels must reproduce the plain vocoder exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lele_tpu.models.packed1d import (  # noqa: E402
    extract_packed_conv,
    pack_rows,
    packed_conv,
    unpack_rows,
)


def test_extract_reproduces_plain_conv():
    """A stride-1 SAME conv viewed through pack-2 rows is recovered
    exactly, including zero-padded edges."""
    rng = np.random.default_rng(0)
    C, k, P = 6, 7, 2
    w = jnp.asarray(rng.standard_normal((k, C, C)), jnp.float32)

    def plain(x):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))

    def packed_view(xp):
        return pack_rows(plain(unpack_rows(xp, P)), P)

    W, pad = extract_packed_conv(packed_view, P * C)
    x = jnp.asarray(rng.standard_normal((1, 40, C)), jnp.float32)
    want = np.asarray(plain(x))
    got = np.asarray(unpack_rows(packed_conv(pack_rows(x, P), W, pad), P))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_extract_reproduces_conv_transpose_subpixel():
    rng = np.random.default_rng(1)
    Cin, Cout = 8, 4
    w = jnp.asarray(rng.standard_normal((8, Cin, Cout)), jnp.float32)

    def sub(x):
        y = jax.lax.conv_transpose(
            x, w, strides=(4,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"))
        B, T4, Co = y.shape
        return y.reshape(B, T4 // 4, 4 * Co)

    W, pad = extract_packed_conv(sub, Cin)
    x = jnp.asarray(rng.standard_normal((1, 24, Cin)), jnp.float32)
    want = np.asarray(sub(x))
    got = np.asarray(packed_conv(x, W, pad))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_vocoder_packed_matches_plain():
    from lele_tpu.models import SupertonicConfig
    from lele_tpu.models.supertonic import init_vocoder, vocoder_forward
    from lele_tpu.models.packed1d import prepare_vocoder_packed

    cfg = SupertonicConfig()
    rng = np.random.default_rng(2)
    voc = init_vocoder(jax.random.PRNGKey(0), cfg)
    latent = jnp.asarray(
        rng.standard_normal((1, 32, cfg.d_latent)), jnp.float32)
    plain = {k: v for k, v in voc.items()}
    want = np.asarray(vocoder_forward(plain, latent, cfg))
    assert want.shape == (1, 32 * cfg.hop)  # exact ×256 hop contract
    packed = prepare_vocoder_packed(voc, cfg)
    got = np.asarray(vocoder_forward(packed, latent, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_full_synth_uses_packed_and_is_finite():
    from lele_tpu.models import SupertonicConfig, SupertonicTts

    cfg = SupertonicConfig()
    tts = SupertonicTts(cfg)
    tts.init(0)
    assert "packed" in tts.params["vocoder"]
    rng = np.random.default_rng(3)
    fn = jax.jit(tts.synth_fn(64))
    ids = rng.integers(2, 90, (1, 16)).astype(np.int32)
    tm = np.ones((1, 16), np.float32)
    style = rng.standard_normal(cfg.d_style).astype(np.float32)
    lm = np.ones((1, 64), np.float32)
    wave, dur = fn(tts.params, ids, tm, style, style, lm, 0)
    assert wave.shape == (1, 64 * cfg.hop)
    assert np.isfinite(np.asarray(wave)).all()
