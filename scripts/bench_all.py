#!/usr/bin/env python
"""All-family benchmark report → JSON file (the full §6 table with
reference numbers alongside). Thin wrapper over bench.py's family
functions so the protocol (chained-scan slope timing, w8a16 flagship)
can never drift between the driver headline and this report.

`python scripts/bench_all.py [--out report.json]`
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
    args = ap.parse_args()

    import jax

    import bench

    pcm, sr = bench._load_audio()
    audio_s = len(pcm) / sr
    platform = jax.devices()[0].platform

    rows = {
        "sensevoice_rtf_w8a16": (
            lambda: bench.bench_sensevoice(pcm, audio_s), 0.0256, 0.0294),
        "sensevoice_rtf_w4a16": (
            lambda: bench.bench_sensevoice_w4(pcm, audio_s), 0.0256, 0.0294),
        "silero_rtf": (
            lambda: bench.bench_silero(pcm, audio_s), 0.0022, 0.002882),
        "supertonic_rtf": (bench.bench_supertonic, 0.0648, 0.1667),
        "yolo26_ms": (lambda: bench.bench_yolo(False), 534.97, 704.50),
        "yolo26n_seg_ms": (lambda: bench.bench_yolo(True), 64.82, 126.51),
    }
    report = {"platform": platform}
    for name, (fn, ref_lele, ref_ort) in rows.items():
        v = fn()
        report[name] = {
            "value": v,
            "reference_lele": ref_lele,
            "reference_ort": ref_ort,
            "speedup_vs_lele": ref_lele / v,
        }
        print(name, json.dumps(report[name]))

    out_path = Path(args.out)
    out_path.write_text(json.dumps(report, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
