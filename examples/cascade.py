#!/usr/bin/env python
"""VAD → ASR cascade: Silero-style segmentation feeding SenseVoice-style
transcription, each segment batched through one shared bucketed program.

The classic production speech pipeline composed from the framework's
pieces: `python examples/cascade.py [audio.wav]`.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()

from lele_tpu.models import (  # noqa: E402
    SenseVoiceConfig,
    SenseVoiceModel,
    SileroConfig,
    SileroVad,
    VadSegmentConfig,
    collect_segments,
)
from lele_tpu.utils.wav import read_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav", nargs="?", default="/root/reference/fixtures/zh.wav")
    ap.add_argument("--asr-layers", type=int, default=8)
    args = ap.parse_args()

    if Path(args.wav).exists():
        pcm, sr = read_wav(args.wav)
    else:
        sr = 16000
        t = np.arange(sr * 6) / sr
        pcm = np.concatenate([
            np.zeros(sr, np.float32),
            (np.sin(2 * np.pi * 330 * t[: 2 * sr]) * 0.3).astype(np.float32),
            np.zeros(sr, np.float32),
            (np.sin(2 * np.pi * 220 * t[: sr]) * 0.3).astype(np.float32),
            np.zeros(sr, np.float32),
        ])
    audio_s = len(pcm) / sr
    print(f"audio: {audio_s:.2f}s")

    vad = SileroVad(SileroConfig())
    vad.init(0)
    asr = SenseVoiceModel(SenseVoiceConfig(n_layers=args.asr_layers))
    asr.init(0)

    t0 = time.perf_counter()
    probs = vad.speech_probs(pcm)
    segs = collect_segments(probs, VadSegmentConfig(threshold=0.4))
    if not segs:  # random-init model may not trigger; fall back to full audio
        segs = [(0.0, audio_s)]
    pieces = [pcm[int(s * sr) : int(e * sr)] for s, e in segs]
    ids = asr.transcribe_batch(pieces)
    elapsed = time.perf_counter() - t0
    for (s, e), toks in zip(segs, ids):
        print(f"  [{s:6.2f}s – {e:6.2f}s] {len(toks)} tokens: {toks[:10]}")
    print(f"cascade wall: {elapsed:.2f}s (RTF {elapsed / audio_s:.4f}, cold)")
    t0 = time.perf_counter()
    probs = vad.speech_probs(pcm)
    segs2 = collect_segments(probs, VadSegmentConfig(threshold=0.4)) or segs
    asr.transcribe_batch([pcm[int(s * sr) : int(e * sr)] for s, e in segs2])
    steady = time.perf_counter() - t0
    print(f"steady: {steady:.3f}s (RTF {steady / audio_s:.4f})")


if __name__ == "__main__":
    main()
