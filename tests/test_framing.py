"""Slice-based framing (features/framing.py) vs the index-gather oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lele_tpu.features.framing import frame_signal  # noqa: E402


def _oracle(x, frame_len, hop):
    n = x.shape[-1]
    n_frames = (n - frame_len) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    return np.asarray(x)[..., idx]


@pytest.mark.parametrize("n,frame_len,hop", [
    (89434, 400, 160),   # the fbank shape (5.6 s @ 16 kHz)
    (576, 256, 128),     # silero chunk STFT
    (1000, 400, 400),    # non-overlapping
    (1000, 100, 160),    # hop > frame_len (decimating)
    (400, 400, 160),     # exactly one frame
    (399, 400, 160),     # zero frames
    (1013, 320, 97),     # nothing divides anything
])
def test_frame_signal_matches_gather(n, frame_len, hop):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    got = np.asarray(frame_signal(x, frame_len, hop))
    want = _oracle(x, frame_len, hop)
    if want.shape[0] == 0:
        assert got.shape == (0, frame_len)
    else:
        np.testing.assert_array_equal(got, want)


def test_frame_signal_batched_and_int16():
    rng = np.random.default_rng(1)
    x = rng.integers(-3000, 3000, (2, 3, 2048)).astype(np.int16)
    got = np.asarray(frame_signal(jnp.asarray(x), 512, 160))
    want = _oracle(x, 512, 160)
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, want)


def test_frame_signal_jit_under_scan():
    """The point of the rewrite: must stay cheap (and correct) inside jit."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal(4000), jnp.float32)

    @jax.jit
    def f(x):
        return jnp.sum(frame_signal(x, 400, 160))

    np.testing.assert_allclose(
        float(f(x)), _oracle(x, 400, 160).sum(), rtol=1e-5)
