#!/usr/bin/env python
"""Supertonic 2 TTS runner: text → WAV (+ [STAGE] timings, RTF).

Surface parity: /root/reference/examples/supertonic/src/main.rs:124-285 —
text normalize/chunk → DurationPredictor → TextEncoder → 5-step
flow-matching → Vocoder, voice styles from JSON, [STAGE] timing prints,
RTF. The 4 sub-models fuse into one program per latent bucket here.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()

from lele_tpu.models import SupertonicConfig, SupertonicTts, load_voice_style  # noqa: E402
from lele_tpu.utils.timing import ScopeTimer  # noqa: E402
from lele_tpu.utils.wav import write_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("text", nargs="?",
                    default="Hello! This is the TPU native Supertonic pipeline.")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--voice", default=None, help="voice style JSON path")
    ap.add_argument("--out", default="/tmp/supertonic_out.wav")
    ap.add_argument("--v3", action="store_true", help="Supertonic 3 mode "
                    "(no latent denorm, speed 1.05)")
    ap.add_argument("--min-frames", type=int, default=8,
                    help="floor on latent frames per chunk (random-init "
                         "duration models predict ~0; set e.g. 256 for a "
                         "realistic-length benchmark)")
    ap.add_argument("--onnx-dir", default=None, metavar="DIR",
                    help="directory with supertonic_{dp,te,ve,voc}.onnx "
                         "(fixtures/ or real exports): chain the 4 compiled "
                         "sub-models instead of the native model")
    ap.add_argument("--save-aot", metavar="PREFIX", default=None,
                    help="save params + the compiled one-dispatch synth "
                         "program (pinned to this text's token/latent "
                         "buckets) as an AOT bundle for cold starts without "
                         "trace/compile")
    ap.add_argument("--aot", metavar="PREFIX", default=None,
                    help="cold-start from a --save-aot bundle (text must hit "
                         "the saved token/latent buckets)")
    args = ap.parse_args()

    if args.onnx_dir:
        from lele_tpu.models.checkpoints import SupertonicOnnx
        from lele_tpu.onnx.loader import OnnxModel

        from lele_tpu.compiler import resolve_input_specs

        st = SupertonicOnnx(args.onnx_dir)
        d = Path(args.onnx_dir)
        # derive token/style dims from the checkpoint's own signature
        specs = resolve_input_specs(OnnxModel.load(str(d / "supertonic_dp.onnx")))
        tn = int(specs["ids"][0][1])
        d_style = int(specs["style"][0][1])
        rng = np.random.default_rng(0)
        ids = rng.integers(2, 90, (1, tn)).astype(np.int64)
        style = rng.standard_normal((1, d_style)).astype(np.float32)
        mask = np.ones((1, tn), np.float32)
        t0 = time.perf_counter()
        dur, wave = st.synthesize_latent(ids, style, mask, latent_len=32)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        dur, wave = st.synthesize_latent(ids, style, mask, latent_len=32)
        steady = time.perf_counter() - t0
        print(f"durations sum {float(np.sum(dur)):.2f}, wave {wave.shape}")
        print(f"[OVERHEAD] steady synth: {steady * 1000:.1f} ms "
              f"(cold {cold * 1000:.0f} ms)")
        return

    cfg = SupertonicConfig()
    if args.v3:
        cfg.apply_latent_denorm = False
        cfg.speed = 1.05
    tts = SupertonicTts(cfg)
    timer = ScopeTimer()
    if args.aot:
        from lele_tpu.runtime.artifact import load_aot_bundle

        with timer.scope("aot-load"):
            fn, tts.params = load_aot_bundle(args.aot)
            meta = json.loads(Path(args.aot + ".meta.json").read_text())
        if bool(meta.get("v3", False)) != bool(args.v3):
            sys.exit("--aot bundle was saved in a different --v3 mode")
        tts._fn_cache[("synth_e2e", meta["t_buck"], meta["min_frames"])] = fn
        tts._fpt_ema = meta["fpt"]  # so the bucket guess hits the bundle
        args.min_frames = meta["min_frames"]
    else:
        with timer.scope("init"):
            tts.init(0)
    style_dir = Path(__file__).parents[1] / (
        "supertonic3" if args.v3 else "supertonic") / "voice_styles"
    voice = args.voice or str(style_dir / "M1.json")
    if Path(voice).exists():
        style = load_voice_style(voice)
    else:
        rng = np.random.default_rng(7)
        style = {
            "ttl": rng.standard_normal(cfg.d_style).astype(np.float32),
            "dp": rng.standard_normal(cfg.d_style).astype(np.float32),
        }
    with timer.scope("synthesize(cold)"):
        wave = tts.synthesize(args.text, style, lang=args.lang, seed=0,
                              min_frames=args.min_frames)
    t0 = time.perf_counter()
    wave = tts.synthesize(args.text, style, lang=args.lang, seed=0,
                          min_frames=args.min_frames)
    steady = time.perf_counter() - t0
    if args.save_aot:
        import jax

        from lele_tpu.models.supertonic import prepare_chunks
        from lele_tpu.runtime.artifact import save_aot_bundle

        # pin the bundle to the buckets the steady-state run converged to
        # (EMA-guided guess == canonical bucket after the warm pass above)
        chunk = prepare_chunks(args.text, args.lang)[0]
        n_real = len(tts.indexer(chunk))
        ids, text_mask = tts.pad_tokens(tts.indexer(chunk)[None])
        fpt = tts._fpt_ema or cfg.est_frames_per_token
        t_buck = tts._bucket(
            max(args.min_frames, int(n_real * fpt / cfg.speed)))
        # reuse the jitted program the steady pass above already compiled
        key = ("synth_e2e", t_buck, args.min_frames)
        fn = tts._fn_cache.get(key) or jax.jit(
            tts.synth_e2e_fn(t_buck, args.min_frames))
        compiled = fn.lower(
            tts.params, ids, text_mask, np.asarray(style["ttl"]),
            np.asarray(style["dp"]), 0,
        ).compile()
        save_aot_bundle(args.save_aot, compiled, tts.params)
        Path(args.save_aot + ".meta.json").write_text(json.dumps({
            "t_buck": t_buck, "min_frames": args.min_frames,
            "fpt": tts._fpt_ema, "v3": bool(args.v3),
        }))
        print(f"AOT bundle saved to {args.save_aot}[.bin/.xc] "
              f"(latent bucket {t_buck})")
    audio_s = len(wave) / cfg.sample_rate
    write_wav(args.out, wave, cfg.sample_rate)
    timer.print_scope()
    print(f"[OVERHEAD] steady synth: {steady * 1000:.1f} ms")
    print(f"wrote {args.out}: {audio_s:.2f}s audio, RTF {steady / audio_s:.4f}")


if __name__ == "__main__":
    main()
