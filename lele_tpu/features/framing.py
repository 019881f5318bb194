"""Overlapping-frame extraction as static slices (no device gather).

A [n_frames, frame_len] gather from a flat PCM array is the single most
expensive op a TPU audio front-end can issue: XLA lowers the 2-D index
matrix to a serial scalar-gather loop (~1.5 ms for 5.6 s of 16 kHz audio —
docs/PERF.md r2 measurement, vs ~30 µs for the whole rest of the fbank
pipeline). Framing is deterministic striding, so it can instead be a
reshape plus `span = ceil(frame_len/hop)` static slices:

    H = pcm.reshape(rows, hop)
    frame[t] = concat(H[t], H[t+1], …, H[t+span-1])[:frame_len]
             = pcm[t*hop : t*hop + frame_len]

which XLA compiles to pure vector copies. Used by the fbank front-end
(features/fbank.py), the Silero STFT (models/silero.py), and the ONNX STFT
emitter (ops/math_ops.py). Parity target for framing semantics:
/root/reference/src/features/pipeline.rs:85-90 (frame t starts at t*hop).
"""

from __future__ import annotations


def frame_signal(x, frame_len: int, hop: int):
    """[..., n] → [..., n_frames, frame_len] overlapping frames, where
    n_frames = (n - frame_len)//hop + 1. Pure reshape/slice/concat — safe
    and fast inside jit on TPU. Works on any dtype (int16 PCM included)."""
    import jax.numpy as jnp

    n = int(x.shape[-1])
    n_frames = (n - frame_len) // hop + 1
    lead = x.shape[:-1]
    if n_frames <= 0:
        return jnp.zeros((*lead, 0, frame_len), x.dtype)
    span = -(-frame_len // hop)  # frames this many hop-rows wide
    rows = n_frames + span - 1
    need = rows * hop
    if need > n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, need - n)]
        x = jnp.pad(x, pad)  # positions ≥ n are never selected (see proof)
    elif need < n:
        x = x[..., :need]
    h = x.reshape(*lead, rows, hop)
    parts = [h[..., i : i + n_frames, :] for i in range(span)]
    out = jnp.concatenate(parts, axis=-1)
    # frame t = pcm[t*hop : t*hop + span*hop][:frame_len]; the tail beyond
    # frame_len (and any zero padding) is sliced away here. The last kept
    # sample is (n_frames-1)*hop + frame_len - 1 ≤ n - 1, so padding never
    # leaks into a frame.
    return out[..., :frame_len]
