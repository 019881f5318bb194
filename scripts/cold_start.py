#!/usr/bin/env python
"""Fresh-process cold-start breakdown for an AOT bundle (docs/PERF.md).

Measures, in THIS process (run it fresh — `python scripts/cold_start.py
PREFIX [wav]`), the three cold-start components:

  exec_load   host-side executable deserialize + device program handle
  params      blob → device (single-DMA unpack path when the bundle ships
              a .up.xc, per-leaf device_put otherwise), blocked
  first_exec  first execution + scalar readback (includes the backend's
              one-time device program load — on a tunneled TPU this term
              is service weather: observed 2 s–160 s for identical trials;
              on a host-attached chip it is the program-load only)
  overlap     what `load_aot_bundle` actually delivers: params stream on a
              worker thread under the executable load

Each component is also what the reference's cold start pays in its own
shape: mmap weights + run the AOT binary (README.md:19 cold RTF 0.0549,
compiler/mod.rs:1381 flat weights file burned into the binary).

Run it N times (fresh process each) and take the min per component: disk
page-cache and tunnel weather inflate single readings — `--json` emits one
line per run for aggregation.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix", help="bundle path prefix (from --save-aot)")
    ap.add_argument("wav", nargs="?",
                    default="/root/reference/fixtures/zh.wav")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    t_imp0 = time.perf_counter()
    import numpy as np

    import jax

    t_imp = time.perf_counter() - t_imp0

    import pickle

    from jax.experimental import serialize_executable as se

    from lele_tpu.runtime.artifact import (
        _XC_SUFFIX,
        _XC_TREE_SUFFIX,
        load_pytree,
    )
    from lele_tpu.utils.wav import read_wav

    pcm, _sr = read_wav(args.wav)
    x = np.asarray(pcm, np.float32)

    t0 = time.perf_counter()
    payload = Path(args.prefix + _XC_SUFFIX).read_bytes()
    in_tree, out_tree = pickle.loads(
        Path(args.prefix + _XC_TREE_SUFFIX).read_bytes()
    )
    fn = se.deserialize_and_load(payload, in_tree, out_tree)
    t1 = time.perf_counter()
    params = load_pytree(args.prefix)
    jax.block_until_ready(params)
    t2 = time.perf_counter()
    out = fn(params, x)
    _gate = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t3 = time.perf_counter()
    out = fn(params, x)
    _gate = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t4 = time.perf_counter()

    row = {
        "prefix": args.prefix,
        "imports_s": round(t_imp, 3),
        "exec_load_s": round(t1 - t0, 3),
        "params_s": round(t2 - t1, 3),
        "first_exec_s": round(t3 - t2, 3),
        "second_exec_s": round(t4 - t3, 3),
        "packed": Path(args.prefix + ".up.xc").exists(),
    }
    if args.json:
        print(json.dumps(row))
    else:
        print(" ".join(f"{k}={v}" for k, v in row.items()))


if __name__ == "__main__":
    main()
