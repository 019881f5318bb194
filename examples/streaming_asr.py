#!/usr/bin/env python
"""Streaming ASR demo: feed audio chunk-by-chunk through the chunked
SenseVoice encoder, printing incremental tokens per chunk with latency.

`python examples/streaming_asr.py [audio.wav] [--chunk-ms 960]`
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()

from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel  # noqa: E402
from lele_tpu.models.sensevoice_stream import (  # noqa: E402
    StreamConfig,
    StreamingSenseVoice,
    init_stream_state,
)
from lele_tpu.utils.wav import read_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav", nargs="?", default="/root/reference/fixtures/zh.wav")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--chunk-frames", type=int, default=16)
    args = ap.parse_args()

    if Path(args.wav).exists():
        pcm, sr = read_wav(args.wav)
    else:
        sr = 16000
        pcm = (np.sin(np.arange(sr * 5) / 15) * 0.2).astype(np.float32)

    cfg = SenseVoiceConfig(n_layers=args.layers)
    base = SenseVoiceModel(cfg)
    base.init(0)
    sv = StreamingSenseVoice(
        cfg=cfg, stream=StreamConfig(chunk_frames=args.chunk_frames)
    )
    sv.params = base.params
    sv.fbank = base.fbank

    feats = np.asarray(base.features(np.asarray(pcm, np.float32)))
    C = sv.stream.chunk_frames
    chunk_s = C * 0.06  # LFR frame ≈ 60 ms
    print(f"audio {len(pcm) / sr:.2f}s → {feats.shape[0]} LFR frames, "
          f"chunks of {C} (~{chunk_s * 1000:.0f} ms)")

    state = init_stream_state(cfg, sv.stream)
    step = sv.step_fn()
    prev = -1
    total = 0.0
    for idx, start in enumerate(range(0, feats.shape[0], C)):
        chunk = feats[start : start + C]
        mask = np.ones((1, C), np.float32)
        if chunk.shape[0] < C:
            mask[0, chunk.shape[0]:] = 0.0
            chunk = np.pad(chunk, ((0, C - chunk.shape[0]), (0, 0)))
        t0 = time.perf_counter()
        logits, state = step(sv.params, chunk[None], mask, state)
        ids = np.asarray(logits[0]).argmax(-1)
        dt = time.perf_counter() - t0
        total += dt
        emitted = []
        for t in ids[: int(mask.sum())]:
            t = int(t)
            if t != prev and t != 0:
                emitted.append(t)
            prev = t
        tag = "compile+" if idx == 0 else ""
        print(f"  chunk {idx:2d}: +{len(emitted)} tokens ({tag}{dt * 1000:.1f} ms)")
    print(f"total stream compute: {total:.2f}s "
          f"(per-chunk steady ≈ {dt * 1000:.1f} ms vs {chunk_s * 1000:.0f} ms budget)")


if __name__ == "__main__":
    main()
