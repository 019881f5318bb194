#!/usr/bin/env python
"""Silero VAD runner: WAV → speech segments (+ per-run RTF).

Surface parity: /root/reference/examples/silero/src/main.rs (512-sample
streaming chunks, hysteresis segmenter, RTF print) and run_silero.sh.
Without downloaded weights the model runs random-initialized — the pipeline,
state handling, and timing protocol are identical.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()

from lele_tpu.models import (  # noqa: E402
    SileroConfig, SileroVad, VadSegmentConfig, collect_segments,
)
from lele_tpu.utils.wav import read_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav", nargs="?", default="/root/reference/fixtures/zh.wav")
    ap.add_argument("--onnx", default=None, metavar="PATH",
                    help="run a real checkpoint (fixtures/silero.onnx or the "
                         "published Silero VAD export) through the compiler")
    ap.add_argument("--threshold", type=float, default=0.3)
    ap.add_argument("--save-aot", metavar="PREFIX", default=None,
                    help="save params + the compiled whole-utterance scan "
                         "program (pinned to this wav's chunk count) as an "
                         "AOT bundle for cold starts without trace/compile")
    ap.add_argument("--aot", metavar="PREFIX", default=None,
                    help="cold-start from a --save-aot bundle (same-length "
                         "audio)")
    args = ap.parse_args()

    if Path(args.wav).exists():
        pcm, sr = read_wav(args.wav)
    else:
        print(f"note: {args.wav} missing; using synthetic audio", file=sys.stderr)
        sr = 16000
        t = np.arange(sr * 4) / sr
        pcm = np.concatenate(
            [np.zeros(sr, np.float32),
             (np.sin(2 * np.pi * 220 * t[: 2 * sr]) * 0.3).astype(np.float32),
             np.zeros(sr, np.float32)]
        )
    print(f"audio: {len(pcm) / sr:.2f}s @ {sr} Hz")
    vsr = sr if sr in (8000, 16000) else 16000

    if args.onnx:
        from lele_tpu.models.checkpoints import SileroOnnx

        vad = SileroOnnx(args.onnx)
        t0 = time.perf_counter()
        probs = vad.speech_probs(pcm, sr=vsr)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        probs = vad.speech_probs(pcm, sr=vsr)
        steady = time.perf_counter() - t0
        audio_s = len(pcm) / sr
        print(f"chunks: {len(probs)}  prob range "
              f"[{probs.min():.3f}, {probs.max():.3f}]")
        for s, e in collect_segments(
            probs, VadSegmentConfig(threshold=args.threshold)
        ):
            print(f"  speech {s:.2f}s – {e:.2f}s")
        print(f"RTF: {steady / audio_s:.6f} (cold {cold / audio_s:.6f})")
        return

    vad = SileroVad(SileroConfig(sample_rate=sr if sr in (8000, 16000) else 16000))

    if args.aot:
        import jax as _jax

        from lele_tpu.runtime.artifact import load_aot_bundle

        chunks_in = vad.frame_chunks(pcm)
        t0 = time.perf_counter()
        scan, vad.params = load_aot_bundle(args.aot)
        probs_d, _state = scan(vad.params, chunks_in)
        _jax.block_until_ready(probs_d)
        cold = time.perf_counter() - t0
        vad._fn_cache[("scan", vsr)] = scan  # speech_probs reuses it
        print(f"AOT bundle cold start: {cold:.2f}s (params+executable+run)")
    else:
        vad.init(0)

    t0 = time.perf_counter()
    probs = vad.speech_probs(pcm, sr=vsr)
    elapsed = time.perf_counter() - t0
    if args.save_aot:
        from lele_tpu.runtime.artifact import save_aot_bundle

        chunks_in = vad.frame_chunks(pcm)
        compiled = vad.scan_fn(chunks_in.shape[0], sr=vsr).lower(
            vad.params, chunks_in).compile()
        save_aot_bundle(args.save_aot, compiled, vad.params)
        print(f"AOT bundle saved to {args.save_aot}[.bin/.xc]")
    # steady-state: second pass with compiled step
    t0 = time.perf_counter()
    probs = vad.speech_probs(pcm, sr=vsr)
    steady = time.perf_counter() - t0
    # device-compute-only steady state (excludes the fixed host-readback RTT,
    # which on a tunneled TPU dominates tiny outputs)
    import jax

    chunks = vad.frame_chunks(pcm)
    fn = vad.scan_fn(chunks.shape[0], sr=vsr)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(vad.params, chunks))
    device_steady = time.perf_counter() - t0
    audio_s = len(pcm) / sr
    print(f"chunks: {len(probs)}  prob range [{probs.min():.3f}, {probs.max():.3f}]")
    segs = collect_segments(probs, VadSegmentConfig(threshold=args.threshold))
    for s, e in segs:
        print(f"  speech {s:.2f}s – {e:.2f}s")
    print(f"RTF: {steady / audio_s:.6f} (cold {elapsed / audio_s:.6f}, "
          f"device-compute {device_steady / audio_s:.6f})")


if __name__ == "__main__":
    main()
