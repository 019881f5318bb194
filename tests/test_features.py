"""Feature front-end suite (port of /root/reference/tests/verify_features.rs
:6-67 — Hann correctness, FFT impulse/DC, mel round-trip, filterbank shape —
plus a full-pipeline numpy oracle check of the fbank semantics)."""

import numpy as np

from lele_tpu.features import (
    FbankConfig,
    FbankFrontend,
    cmvn,
    hann_window,
    hz_to_mel_htk,
    lfr_stack,
    mel_filterbank,
    mel_to_hz_htk,
)

rng = np.random.default_rng(11)


def test_hann_window_properties():
    w = hann_window(400)
    assert w[0] == 0.0
    assert abs(w[-1]) < 1e-6  # symmetric: last sample ~0
    assert abs(w[199] - w[200]) < 1e-4  # symmetric around center
    np.testing.assert_allclose(
        w, 0.5 * (1 - np.cos(2 * np.pi * np.arange(400) / 399)), atol=1e-6
    )
    assert hann_window(1).tolist() == [1.0]
    assert hann_window(0).size == 0


def test_mel_conversion_roundtrip():
    for hz in [20.0, 440.0, 4000.0, 7999.0]:
        assert abs(mel_to_hz_htk(hz_to_mel_htk(hz)) - hz) < 1e-3
    assert abs(hz_to_mel_htk(1000.0) - 999.9855) < 0.1  # 1000 Hz ≈ 1000 mel


def test_filterbank_shape_and_partition():
    fb = mel_filterbank(16000, 512, 80, 20.0)
    assert fb.shape == (80, 257)
    assert (fb >= 0).all()
    # each filter has a nonempty support and peaks ≤ 1
    assert (fb.max(axis=1) > 0).all()
    assert fb.max() <= 1.0 + 1e-6


def test_fft_impulse_and_dc():
    import jax.numpy as jnp

    # impulse → flat magnitude; DC → energy only in bin 0
    n = 512
    impulse = np.zeros(n, np.float32)
    impulse[0] = 1.0
    spec = np.asarray(jnp.fft.rfft(jnp.asarray(impulse)))
    np.testing.assert_allclose(np.abs(spec), np.ones(n // 2 + 1), atol=1e-5)
    dc = np.ones(n, np.float32)
    spec = np.asarray(jnp.fft.rfft(jnp.asarray(dc)))
    assert abs(spec[0].real - n) < 1e-3
    assert np.abs(spec[1:]).max() < 1e-3


def test_fft_parseval_and_linearity():
    import jax.numpy as jnp

    n = 256
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    fx = np.asarray(jnp.fft.fft(jnp.asarray(x)))
    # Parseval
    assert abs((np.abs(fx) ** 2).sum() / n - (x**2).sum()) < 1e-2
    fxy = np.asarray(jnp.fft.fft(jnp.asarray(2 * x + 3 * y)))
    fy = np.asarray(jnp.fft.fft(jnp.asarray(y)))
    np.testing.assert_allclose(fxy, 2 * fx + 3 * fy, atol=1e-3)


def test_lfr_stack_shape_and_edges():
    import jax

    t, d, m, n = 10, 4, 7, 6
    x = rng.standard_normal((t, d)).astype(np.float32)
    out = np.asarray(jax.jit(lambda v: lfr_stack(v, m, n))(x))
    t_lfr = -(-t // n)
    assert out.shape == (t_lfr, d * m)
    pad = (m - 1) // 2
    # first output row stacks frames clamp(0*6-3 .. +3) = [0,0,0,0,1,2,3]
    want_first = np.concatenate([x[0], x[0], x[0], x[0], x[1], x[2], x[3]])
    np.testing.assert_allclose(out[0], want_first, atol=1e-6)
    # last row clamps at t-1
    idx = np.clip(np.arange(m) + n - pad, 0, t - 1)
    np.testing.assert_allclose(out[1], x[idx].reshape(-1), atol=1e-6)


def test_cmvn_zero_mean_unit_var():
    import jax

    x = rng.standard_normal((50, 8)).astype(np.float32) * 3 + 5
    out = np.asarray(jax.jit(cmvn)(x))
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=0), 1, atol=1e-2)


def _fbank_oracle(pcm, c: FbankConfig, window, mel_fb):
    """Frame-by-frame numpy oracle mirroring pipeline.rs:85-190 semantics."""
    frame_len, hop = c.frame_len, c.hop_len
    n_frames = (len(pcm) - frame_len) // hop + 1
    out = np.zeros((n_frames, c.n_mels))
    for i in range(n_frames):
        fr = pcm[i * hop : i * hop + frame_len].astype(np.float64) * c.scale
        fr = fr - fr.mean()
        pre = fr.copy()
        for j in range(frame_len - 1, 0, -1):
            pre[j] -= c.preemphasis * pre[j - 1]
        wf = pre * window
        spec = np.fft.rfft(wf, n=c.n_fft)
        power = np.abs(spec) ** 2
        mel = mel_fb @ power
        out[i] = np.log(np.maximum(mel, c.log_floor))
    return out


def test_fbank_matches_frame_by_frame_oracle():
    c = FbankConfig(apply_lfr=False, apply_cmvn=False)
    fe = FbankFrontend(c)
    pcm = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1s audio
    got = np.asarray(fe(pcm))
    mel_fb = mel_filterbank(c.sample_rate, c.n_fft, c.n_mels, c.f_min)
    want = _fbank_oracle(pcm, c, fe.window.astype(np.float64), mel_fb)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fbank_full_pipeline_shapes():
    c = FbankConfig()
    fe = FbankFrontend(c)
    pcm = (rng.standard_normal(32000) * 0.05).astype(np.float32)  # 2s
    out = np.asarray(fe(pcm))
    n_frames = (32000 - 400) // 160 + 1
    t_lfr = -(-n_frames // 6)
    assert out.shape == (t_lfr, 560)
    # CMVN applied: zero mean over time
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-3)


def test_fbank_short_input_returns_empty():
    fe = FbankFrontend()
    out = np.asarray(fe(np.zeros(100, np.float32)))
    assert out.shape[0] == 0


def test_fbank_accepts_int16_pcm():
    """i16 PCM == f32 PCM × 32768 path (half the host→device transfer)."""
    import jax

    c = FbankConfig(apply_lfr=False, apply_cmvn=False)
    fe = FbankFrontend(c)
    pcm_f = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    pcm_i = np.clip(pcm_f * 32768.0, -32768, 32767).astype(np.int16)
    out_i = np.asarray(jax.jit(fe)(pcm_i))
    out_f = np.asarray(jax.jit(fe)(pcm_i.astype(np.float32) / 32768.0))
    np.testing.assert_allclose(out_i, out_f, atol=1e-3)
