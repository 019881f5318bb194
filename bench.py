"""Headline benchmark: SenseVoice-class steady-state RTF on one TPU chip.

Protocol mirrors the reference (warmup + multi-run steady-state average,
/root/reference/examples/sensevoice/src/main.rs:199-233; README.md:14):
waveform→logits as ONE fused program (frontend included), full-size
SAN-M encoder (50 layers, d=512, ffn=2048, vocab 25055) in bf16.

Baseline: lele-NEON steady RTF 0.0256 on Apple Silicon (BASELINE.md);
vs_baseline = baseline_rtf / our_rtf (>1 means faster than the reference).
Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    from lele_tpu.runtime.cache import enable_cache

    enable_cache()

    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
    from lele_tpu.utils.wav import read_wav

    audio_s = 10.0
    sr = 16000
    try:  # prefer the reference fixture when present (read-only)
        pcm, sr = read_wav("/root/reference/fixtures/zh.wav")
        audio_s = len(pcm) / sr
    except Exception:
        t = np.arange(int(audio_s * sr)) / sr
        pcm = (np.sin(2 * np.pi * 220 * t) * 0.1).astype(np.float32)

    cfg = SenseVoiceConfig()  # full SenseVoiceSmall-class: 50L/512d/2048ffn
    model = SenseVoiceModel(cfg)
    params = model.init(0)
    if cfg.dtype == "bfloat16":  # store big weights in compute dtype: halves
        import jax.numpy as jnp  # the HBM weight-streaming per forward

        from lele_tpu.models.common import cast_big_params

        params = cast_big_params(params, jnp.bfloat16)
    fn = jax.jit(model.forward_fn())

    # i16 PCM: the wire format WAV already carries, half the transfer, and
    # the frontend folds the ×32768 scale away
    pcm = np.clip(np.asarray(pcm, np.float32) * 32768.0, -32768, 32767).astype(
        np.int16
    )
    logits = fn(params, pcm)
    logits.block_until_ready()  # compile + warmup
    for _ in range(2):
        fn(params, pcm).block_until_ready()

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        fn(params, pcm).block_until_ready()
        times.append(time.perf_counter() - t0)
    steady = float(np.mean(times))
    rtf = steady / audio_s
    baseline_rtf = 0.0256  # lele-NEON steady RTF, BASELINE.md
    print(
        json.dumps(
            {
                "metric": "sensevoice_steady_rtf",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(baseline_rtf / rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(f"bench failed on default backend: {e!r}", file=sys.stderr)
        if os.environ.get("LELE_BENCH_FALLBACK") != "1":
            import subprocess

            env = dict(os.environ, JAX_PLATFORMS="cpu", LELE_BENCH_FALLBACK="1")
            raise SystemExit(
                subprocess.run([sys.executable, __file__], env=env).returncode
            )
        raise
