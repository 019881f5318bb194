"""Minimal WAV reader/writer (RIFF PCM16/24/32 + IEEE float).

The analog of the reference's per-example WavReader
(/root/reference/examples/sensevoice/src/audio.rs) and encode_wav
(examples/web-demo/src/lib.rs). Pure numpy; mono-izes by channel average.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Returns (mono float32 samples in [-1, 1], sample_rate).

    Uses the native C++ decoder when available (runtime/native), falling
    back to the pure-Python parser."""
    return decode_wav_bytes(Path(path).read_bytes(), label=str(path))


def decode_wav_bytes(data: bytes, label: str = "<bytes>",
                     try_native: bool = True) -> tuple[np.ndarray, int]:
    """Parse WAV bytes directly (one native attempt, then pure Python) —
    serving paths call this instead of round-tripping through a temp file."""
    if try_native:
        try:
            from ..runtime.native import get_native

            nat = get_native()
            if nat is not None:
                raw, sr = nat.decode_wav(data)
                return np.frombuffer(raw, np.float32).copy(), sr
        except Exception:
            pass  # fall back to the Python decoder
    return _parse_wav(data, label)


def _parse_wav(data: bytes, label: str) -> tuple[np.ndarray, int]:
    path = label
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = b""
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_fmt, n_ch, sr, _, _, bits = fmt
    if audio_fmt == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the REAL format code is the first two
        # bytes of the SubFormat GUID (fmt-body offset 24) — assuming PCM
        # turns extensible float WAVs into reinterpreted integer noise
        if len(fmt_body) >= 26:
            audio_fmt = struct.unpack_from("<H", fmt_body, 24)[0]
        else:
            audio_fmt = 1
    if audio_fmt == 3:  # IEEE float
        x = np.frombuffer(pcm, dtype=np.float32 if bits == 32 else np.float64)
        x = x.astype(np.float32)
    elif audio_fmt == 1:
        if bits == 16:
            x = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(pcm, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(
                1 << 23
            )
        elif bits == 8:
            x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt}")
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, sr


def write_wav(path: str | Path, samples: np.ndarray, sr: int) -> None:
    """PCM16 mono writer (clamped), matching the reference runners' output."""
    x = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    dat = b"data" + struct.pack("<I", len(pcm))
    Path(path).write_bytes(hdr + fmt + dat + pcm)
