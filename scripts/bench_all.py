#!/usr/bin/env python
"""All-family benchmark report → JSON file (the full §6 table with
reference numbers alongside). Thin wrapper over bench.py's family
functions so the protocol (chained-scan slope timing, w8a16 flagship)
can never drift between the driver headline and this report.

Each metric runs `--sessions` independent measurement sessions (fresh
chained-slope trials, same compiled programs) and reports min / median /
max — the spread IS part of the result on a tunneled device (VERDICT r2
weak #5: single readings hid a ±50% session-to-session spread on the
small side metrics).

`python scripts/bench_all.py [--out report.json] [--sessions 3]`
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.runtime import enable_cache  # noqa: E402

enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lele_bench_all.json")
    ap.add_argument("--sessions", type=int, default=3)
    args = ap.parse_args()

    import jax

    import bench

    pcm, sr = bench._load_audio()
    audio_s = len(pcm) / sr
    platform = jax.devices()[0].platform

    on_tpu = platform == "tpu"
    rows = {
        "sensevoice_rtf_w8a16": (
            lambda: bench.bench_sensevoice(pcm, audio_s), 0.0256, 0.0294),
        "compiled_sensevoice_rtf_int8": (
            lambda: bench.bench_compiled_sensevoice(pcm, audio_s, on_tpu),
            0.0256, 0.0294),
        "compiled_sensevoice_rtf_int8_unfused": (
            lambda: bench.bench_compiled_sensevoice(
                pcm, audio_s, on_tpu, fused=False),
            0.0256, 0.0294),
        "sensevoice_rtf_w4a16": (
            lambda: bench.bench_sensevoice_w4(pcm, audio_s), 0.0256, 0.0294),
        "silero_rtf": (
            lambda: bench.bench_silero(pcm, audio_s), 0.0022, 0.002882),
        "silero_step_us": (
            lambda: bench.bench_silero_step(pcm), 70.4, 92.2),
        "supertonic_rtf": (bench.bench_supertonic, 0.0648, 0.1667),
        "supertonic_rtf_e2e": (bench.bench_supertonic_e2e, 0.0648, 0.1667),
        "yolo26_ms": (lambda: bench.bench_yolo(False), 534.97, 704.50),
        # fixture-scale (~0.7 GFLOP) — tracked vs its own history, no
        # reference column (the NEON number is for the full YOLO26n)
        "compiled_yolo_fixture_ms": (bench.bench_compiled_yolo, None, None),
        "yolo26n_seg_ms": (lambda: bench.bench_yolo(True), 64.82, 126.51),
        # ORT-GenAI int4 decode step (MatMulNBits w4-kernel + GQA family)
        # — no reference column: the reference cannot load these contrib
        # ops at all; tracked vs its own history
        "genai_int4_decode_us": (bench.bench_genai_decode, None, None),
    }
    import statistics

    report = {"platform": platform, "sessions": args.sessions}
    for name, (fn, ref_lele, ref_ort) in rows.items():
        try:
            vals = sorted(fn() for _ in range(args.sessions))
        except Exception as e:  # one family must never kill the report
            report[name] = {"error": repr(e)}
            print(name, "FAILED:", repr(e))
            continue
        med = statistics.median(vals)
        report[name] = {
            "value": med,            # the honest headline per metric
            "min": vals[0],
            "median": med,
            "max": vals[-1],
            "spread_pct": round(100 * (vals[-1] - vals[0]) / med, 1)
            if med else None,
            "reference_lele": ref_lele,
            "reference_ort": ref_ort,
            "speedup_vs_lele": (ref_lele / med
                                if (med and ref_lele is not None) else None),
        }
        print(name, json.dumps(report[name]))

    out_path = Path(args.out)
    out_path.write_text(json.dumps(report, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
