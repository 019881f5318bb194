"""Kaldi-style fbank front-end, batched over frames on device.

Parity target: SenseVoiceFrontend::compute (/root/reference/src/features/
pipeline.rs:67-190): ×32768 scale → per-frame mean subtraction →
pre-emphasis 0.97 (y[0] kept) → symmetric Hann window → zero-pad to n_fft
(512 for ≤400-sample frames, 1024 above) → rFFT → power spectrum → HTK mel
(80 bins, f_min=20) → ln(max(x, 1e-5)) → LFR stack.

TPU design: all frames processed at once — framing is one gather
[n_frames, frame_len], the FFT batches over the frame axis, and the mel
projection is a dense [n_freqs, n_mels] matmul on the MXU. The returned
function is pure jnp, so `jax.jit(lambda pcm: model(frontend(pcm)))`
compiles waveform→logits as ONE program.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .cmvn import cmvn
from .filters import hann_window, mel_filterbank
from .framing import frame_signal
from .lfr import lfr_stack


@dataclass
class FbankConfig:
    sample_rate: int = 16000
    n_mels: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    f_min: float = 20.0
    preemphasis: float = 0.97
    scale: float = 32768.0
    log_floor: float = 1e-5
    lfr_m: int = 7
    lfr_n: int = 6
    apply_lfr: bool = True
    apply_cmvn: bool = True

    @property
    def frame_len(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def hop_len(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def n_fft(self) -> int:
        return 1024 if self.frame_len > 400 else 512

    def num_frames(self, n_samples: int) -> int:
        return (n_samples - self.frame_len) // self.hop_len + 1


class FbankFrontend:
    """Precomputes window/mel constants; __call__ is pure jnp (jittable)."""

    def __init__(self, config: FbankConfig | None = None):
        self.config = config or FbankConfig()
        c = self.config
        self.window = hann_window(c.frame_len)
        # transposed [n_freqs, n_mels] so the device does power @ mel
        self.mel_t = mel_filterbank(
            c.sample_rate, c.n_fft, c.n_mels, c.f_min
        ).T.copy()

    def __call__(self, pcm):
        return fbank_features(pcm, self.config, self.window, self.mel_t)


def fbank_features(
    pcm, config: FbankConfig, window: np.ndarray, mel_t: np.ndarray, n_valid=None
):
    """pcm: [n_samples] f32 in [-1,1] → [T_lfr, n_mels*lfr_m] (or [T, n_mels]
    with LFR/CMVN disabled).

    With `n_valid` (a traced scalar ≤ n_samples — the length-bucketing path,
    runtime/bucketing.py), statistics (CMVN) cover only the valid frames and
    the function returns (features, frame_mask)."""
    import jax.numpy as jnp

    c = config
    n = int(np.shape(pcm)[-1])
    frame_len, hop = c.frame_len, c.hop_len
    if n < frame_len:
        d = c.n_mels * (c.lfr_m if c.apply_lfr else 1)
        empty = jnp.zeros((0, d), jnp.float32)
        return (empty, jnp.zeros((0,), jnp.float32)) if n_valid is not None else empty
    n_frames = c.num_frames(n)
    pcm_dev = jnp.asarray(pcm)
    raw = frame_signal(pcm_dev, frame_len, hop)  # slices, not a gather
    if pcm_dev.dtype == jnp.int16:
        # i16 PCM carries the ×scale (32768) natively — half the transfer
        # of f32 and no host conversion
        frames = raw.astype(jnp.float32)
    else:
        frames = raw * c.scale  # [T, frame_len]
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    # pre-emphasis: y[0] unchanged, y[j] = x[j] - a*x[j-1]
    pre = jnp.concatenate(
        [frames[:, :1], frames[:, 1:] - c.preemphasis * frames[:, :-1]], axis=1
    )
    windowed = pre * jnp.asarray(window)
    spec = jnp.fft.rfft(windowed, n=c.n_fft, axis=1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)  # [T, n_freqs]
    mel = power @ jnp.asarray(mel_t)  # MXU: [T, n_mels]
    logmel = jnp.log(jnp.maximum(mel, c.log_floor))
    out = logmel
    mask = None
    if n_valid is not None:
        valid_frames = jnp.maximum((n_valid - frame_len) // hop + 1, 0)
        mask = (jnp.arange(n_frames) < valid_frames).astype(jnp.float32)
    if c.apply_lfr:
        valid_frames = None
        if mask is not None:
            valid_frames = jnp.maximum((n_valid - frame_len) // hop + 1, 0)
        out = lfr_stack(out, c.lfr_m, c.lfr_n, n_valid=valid_frames)
        if mask is not None:
            t_lfr = out.shape[0]
            valid_lfr = -(-valid_frames // c.lfr_n)
            mask = (jnp.arange(t_lfr) < valid_lfr).astype(jnp.float32)
    if c.apply_cmvn:
        if mask is not None:
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            mean = jnp.sum(out * mask[:, None], axis=0, keepdims=True) / denom
            var = jnp.maximum(
                jnp.sum(jnp.square(out) * mask[:, None], axis=0, keepdims=True)
                / denom
                - mean**2,
                0.0,
            )
            out = (out - mean) / jnp.sqrt(var + 1e-5)
        else:
            out = cmvn(out)
    out = out.astype(jnp.float32)
    return (out, mask) if n_valid is not None else out
