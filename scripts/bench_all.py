#!/usr/bin/env python
"""All-family benchmark report → JSON (the full §6 table, not just the
driver's single headline). Device-compute timings (block_until_ready after
N dispatches), reference numbers from BASELINE.md alongside.

`python scripts/bench_all.py [--out report.json]`
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from lele_tpu.runtime import enable_cache

enable_cache()

import jax
import jax.numpy as jnp


def timed(fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lele_bench_all.json")
    args = ap.parse_args()
    report = {}
    rng = np.random.default_rng(0)

    # --- SenseVoice (flagship, waveform→logits fused) ---
    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
    from lele_tpu.models.common import cast_big_params
    from lele_tpu.utils.wav import read_wav

    try:
        pcm, sr = read_wav("/root/reference/fixtures/zh.wav")
    except Exception:
        sr = 16000
        pcm = (np.sin(np.arange(sr * 6) / 20) * 0.1).astype(np.float32)
    audio_s = len(pcm) / sr
    sv = SenseVoiceModel(SenseVoiceConfig())
    sv.init(0)
    params = cast_big_params(sv.params, jnp.bfloat16)
    fn = jax.jit(sv.forward_fn())
    dt = timed(fn, params, np.asarray(pcm, np.float32))
    report["sensevoice_rtf"] = {
        "value": dt / audio_s, "reference_lele": 0.0256, "reference_ort": 0.0294,
        "speedup_vs_lele": 0.0256 / (dt / audio_s),
    }

    # --- Silero VAD (scan program, device compute) ---
    from lele_tpu.models import SileroConfig, SileroVad

    vad = SileroVad(SileroConfig())
    vad.init(0)
    cfgv = vad.cfg
    n = (len(pcm) - cfgv.context) // cfgv.chunk
    idx = (np.arange(n)[:, None] * cfgv.chunk
           + np.arange(cfgv.chunk + cfgv.context)[None, :])
    chunks = np.ascontiguousarray(np.asarray(pcm)[idx])
    sfn = vad.scan_fn(n)
    dt = timed(sfn, vad.params, chunks)
    report["silero_rtf"] = {
        "value": dt / audio_s, "reference_lele": 0.0022, "reference_ort": 0.002882,
        "speedup_vs_lele": 0.0022 / (dt / audio_s),
    }

    # --- Supertonic (full fused bucket) ---
    from lele_tpu.models import SupertonicConfig, SupertonicTts

    cfg_t = SupertonicConfig()
    tts = SupertonicTts(cfg_t)
    tts.init(0)
    T = 512
    tfn = jax.jit(tts.synth_fn(T))
    ids = rng.integers(2, 90, (1, 120)).astype(np.int32)
    tm = np.ones((1, 120), np.float32)
    style = rng.standard_normal(cfg_t.d_style).astype(np.float32)
    lm = np.ones((1, T), np.float32)
    dt = timed(tfn, tts.params, ids, tm, style, style, lm, 0)
    tts_audio = T / cfg_t.frames_per_second
    report["supertonic_rtf"] = {
        "value": dt / tts_audio, "reference_lele": 0.0648, "reference_ort": 0.1667,
        "speedup_vs_lele": 0.0648 / (dt / tts_audio),
    }

    # --- YOLO26 detect + seg (device-resident input compute) ---
    from lele_tpu.models import Yolo26Config, Yolo26Model

    for name, seg, ref in [("yolo26_ms", False, 534.97),
                           ("yolo26n_seg_ms", True, 64.82)]:
        m = Yolo26Model(Yolo26Config(segmentation=seg))
        m.init(0)
        yfn = jax.jit(m.forward_fn())
        img = jnp.asarray(rng.random((1, 640, 640, 3), np.float32))
        dt = timed(yfn, m.params, img)
        report[name] = {
            "value_ms": dt * 1e3, "reference_lele_ms": ref,
            "speedup_vs_lele": ref / (dt * 1e3),
        }

    out_path = Path(args.out)
    out_path.write_text(json.dumps(report, indent=1))
    for k, v in report.items():
        print(k, json.dumps(v))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
