#!/usr/bin/env python
"""SenseVoice ASR runner: WAV → CTC token ids (+ steady-state RTF stats).

Surface parity: /root/reference/examples/sensevoice/src/main.rs:56-246 —
model-size print, feature shapes, 10-run steady-state RTF with p50/std/
min/max, greedy CTC decode. With an ONNX checkpoint + tokenizer vocab it
prints text; random-init prints token ids.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel, greedy_ctc_decode  # noqa: E402
from lele_tpu.utils.timing import bench_stats  # noqa: E402
from lele_tpu.utils.wav import read_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav", nargs="?", default="/root/reference/fixtures/zh.wav")
    ap.add_argument("--onnx", default=None, metavar="PATH",
                    help="run a real checkpoint through the compiler "
                         "(fixtures/sensevoice.onnx or the published "
                         "SenseVoiceSmall export) instead of the "
                         "random-init native model")
    ap.add_argument("--layers", type=int, default=50)
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--w8", action="store_true",
                    help="w8a16: int8 weights through the fused Pallas "
                         "stack kernel (the headline bench configuration)")
    ap.add_argument("--w4", action="store_true",
                    help="w4a16: groupwise-int4 weights (half the w8 "
                         "stream — the capacity/cold-start knob: ~86 MB "
                         "resident + transferred vs w8's 173 MB)")
    ap.add_argument("--save-aot", metavar="PREFIX", default=None,
                    help="after compiling, save prepared params + the "
                         "compiled executable (runtime/artifact.py AOT "
                         "bundle) for sub-second cold starts")
    ap.add_argument("--aot", metavar="PREFIX", default=None,
                    help="cold-start from a --save-aot bundle: mmap params, "
                         "load the executable, skip init/trace/compile")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--vocab", default=None,
                    help="tokenizer vocab (JSON list/dict or text) for text "
                         "output instead of token ids")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace (op-level timing; the "
                         "TPU analog of the reference's TIMING_ENABLED "
                         "breakdown, kernels/timing.rs)")
    args = ap.parse_args()

    if Path(args.wav).exists():
        pcm, sr = read_wav(args.wav)
    else:
        print(f"note: {args.wav} missing; using synthetic audio", file=sys.stderr)
        sr = 16000
        pcm = (np.sin(np.arange(sr * 5) / 20) * 0.1).astype(np.float32)
    audio_s = len(pcm) / sr

    if args.onnx:
        from lele_tpu.models.checkpoints import SenseVoiceOnnx

        sv = SenseVoiceOnnx(args.onnx)
        t0 = time.perf_counter()
        ids = sv.transcribe(np.asarray(pcm, np.float32))
        cold = time.perf_counter() - t0
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            ids = sv.transcribe(np.asarray(pcm, np.float32))
            times.append(time.perf_counter() - t0)
        st = bench_stats(times)
        if args.vocab:
            from lele_tpu.utils.tokenizer import CtcTokenizer

            print(f"transcript: {CtcTokenizer.load(args.vocab).decode(ids)!r}")
        else:
            print(f"decoded tokens: {len(ids)} (first 16: {ids[:16]})")
        print(
            f"steady RTF {st['mean'] / audio_s:.6f} (cold {cold / audio_s:.4f})"
            f" | p50 {st['p50'] * 1000:.2f}ms min {st['min'] * 1000:.2f}"
        )
        return

    cfg = SenseVoiceConfig(n_layers=args.layers, quantized=args.quantized,
                           weight_int8=args.w8, weight_int4=args.w4)
    model = SenseVoiceModel(cfg)

    if args.aot:
        from lele_tpu.runtime.artifact import load_aot_bundle

        t0 = time.perf_counter()
        fn, params = load_aot_bundle(args.aot)
        model.params = params
        logits = fn(params, np.asarray(pcm, np.float32))
        logits.block_until_ready()
        cold = time.perf_counter() - t0
        print(f"AOT bundle cold start: {cold:.2f}s (params+executable+run)")
    else:
        model.init(0)
        if args.w8 or args.w4:
            from lele_tpu.models.common import cast_big_params
            from lele_tpu.models.sensevoice import (
                prepare_w4_params, prepare_w8_params, stack_layer_params,
            )

            prep = prepare_w4_params if args.w4 else prepare_w8_params
            model.params = stack_layer_params(prep(
                cast_big_params(model.params, jnp.bfloat16)))
        from lele_tpu.models.common import count_params

        print(f"model: {args.layers} SAN-M layers, "
              f"{count_params(model.params) / 1e6:.1f}M params"
              f"{' (int8 dynamic)' if args.quantized else ''}"
              f"{' (w8a16 fused stack)' if args.w8 else ''}"
              f"{' (w4a16 fused stack)' if args.w4 else ''}")
        feats = np.asarray(model.features(np.asarray(pcm, np.float32)))
        print(f"audio {audio_s:.2f}s → features {feats.shape}")

        fn = jax.jit(model.forward_fn())
        t0 = time.perf_counter()
        logits = fn(model.params, np.asarray(pcm, np.float32))
        logits.block_until_ready()
        cold = time.perf_counter() - t0
        if args.save_aot:
            from lele_tpu.runtime.artifact import save_aot_bundle

            compiled = fn.lower(
                model.params, np.asarray(pcm, np.float32)).compile()
            save_aot_bundle(args.save_aot, compiled, model.params)
            print(f"AOT bundle saved to {args.save_aot}[.bin/.xc]")
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        fn(model.params, np.asarray(pcm, np.float32)).block_until_ready()
        times.append(time.perf_counter() - t0)
    st = bench_stats(times)
    if args.profile:
        with jax.profiler.trace(args.profile):
            fn(model.params, np.asarray(pcm, np.float32)).block_until_ready()
        print(f"profiler trace written to {args.profile}")
    ids = greedy_ctc_decode(np.asarray(logits[0, cfg.n_prefix:]))
    if args.vocab:
        from lele_tpu.utils.tokenizer import CtcTokenizer

        text = CtcTokenizer.load(args.vocab).decode(ids)
        print(f"transcript: {text!r}")
    else:
        print(f"decoded tokens: {len(ids)} (first 16: {ids[:16]})")
    print(
        f"steady RTF {st['mean'] / audio_s:.6f} (cold {cold / audio_s:.4f}) | "
        f"p50 {st['p50'] * 1000:.2f}ms std {st['std'] * 1000:.2f} "
        f"min {st['min'] * 1000:.2f} max {st['max'] * 1000:.2f}"
    )


if __name__ == "__main__":
    main()
