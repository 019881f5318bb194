#!/usr/bin/env python
"""Kernel microbenchmarks on TPU — the docs/LELE_VS_ORT.md protocol
(/root/reference/benches/kernels.rs shapes; BASELINE.md table) rerun on one
TPU chip. Writes a markdown table to stdout (piped into docs/PERF.md).

Times are amortized over `iters` dispatches with one device sync (standard
accelerator microbench practice; single-dispatch latency on this tunneled
setup is dominated by RTT and reported separately by the runners).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from lele_tpu.runtime import enable_cache

enable_cache()

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=200):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e6  # µs


def main():
    rng = np.random.default_rng(0)
    rows = []

    # reference table: lele (µs) / ORT (µs) from BASELINE.md (Apple M-series)
    ref = {
        ("MatMul", "4x512x512"): (8.61, 22.00),
        ("MatMul", "8x512x512"): (7.75, 25.75),
        ("MatMul", "16x256x256"): (2.20, 14.92),
        ("MatMul", "1x512x2048"): (12.35, 21.50),
        ("MatMul", "128x128x128"): (4.60, 24.48),
        ("Softmax", "1x512"): (0.49, 3.08),
        ("Softmax", "64x128"): (7.43, 7.29),
        ("Add", "512"): (0.08, 3.12),
        ("Add", "4096"): (0.35, 3.50),
        ("Mul", "4096"): (0.30, 3.48),
        ("ReLU", "4096"): (0.52, 2.83),
    }

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    mm = jax.jit(lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32))
    for m, k, n in [(4, 512, 512), (8, 512, 512), (16, 256, 256),
                    (1, 512, 2048), (128, 128, 128)]:
        us = timeit(mm, mk((m, k)), mk((k, n)))
        rows.append(("MatMul", f"{m}x{k}x{n}", us))

    sm = jax.jit(lambda x: jax.nn.softmax(x, axis=-1))
    for shape in [(1, 512), (64, 128)]:
        rows.append(("Softmax", "x".join(map(str, shape)), timeit(sm, mk(shape))))

    add = jax.jit(lambda a, b: a + b)
    mul = jax.jit(lambda a, b: a * b)
    relu = jax.jit(lambda x: jnp.maximum(x, 0))
    rows.append(("Add", "512", timeit(add, mk((512,)), mk((512,)))))
    rows.append(("Add", "4096", timeit(add, mk((4096,)), mk((4096,)))))
    rows.append(("Mul", "4096", timeit(mul, mk((4096,)), mk((4096,)))))
    rows.append(("ReLU", "4096", timeit(relu, mk((4096,)))))

    # int8 MXU path (no reference counterpart in the table)
    from lele_tpu.kernels.quant_matmul import pallas_int8_matmul

    a8 = jnp.asarray(rng.integers(-128, 127, (1024, 1024)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-128, 127, (1024, 1024)).astype(np.int8))
    xq = jax.jit(lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.int32))
    if jax.devices()[0].platform != "cpu":
        pq = jax.jit(lambda a, b: pallas_int8_matmul(a, b))
        rows.append(("Int8MatMul(Pallas)", "1024^3", timeit(pq, a8, b8)))
    else:  # Pallas compiles only on TPU; CPU gets the XLA row alone
        print("(CPU backend: skipping the Pallas int8 row — TPU-only kernel)")
    rows.append(("Int8MatMul(XLA)", "1024^3", timeit(xq, a8, b8)))

    print("| Operator | Shape | lele-tpu (µs) | lele-NEON (µs) | ORT 1-thread (µs) |")
    print("|---|---|---|---|---|")
    for op, shape, us in rows:
        r = ref.get((op, shape))
        lele_s = f"{r[0]}" if r else "—"
        ort_s = f"{r[1]}" if r else "—"
        print(f"| {op} | {shape} | {us:.2f} | {lele_s} | {ort_s} |")


if __name__ == "__main__":
    main()
