#!/usr/bin/env python
"""Autoregressive decode through the compiled ONNX path with a static KV
cache — a generative capability with no reference counterpart (the
reference's five families are all encoder-style, SURVEY.md §2.5).

A torch decoder STEP graph (one token in, logits + one new KV slot out) is
exported to ONNX, compiled once, and driven by
`lele_tpu.runtime.decode.StaticKVDecoder`: the cache has fixed capacity, so
every step reuses the SAME XLA program — no per-length recompiles.

Usage: python examples/decoder_kv_cache.py [steps]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import torch

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx.torch_shim import install
    from lele_tpu.runtime.decode import StaticKVDecoder

    install()
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from test_torch_onnx import TinyDecoderStep

    torch.manual_seed(0)
    V, d, H, L = 257, 128, 8, 4
    MAXLEN = max(steps + 8, 48)
    hd = d // H
    m = TinyDecoderStep(V, d, H, L, MAXLEN).eval()
    P = MAXLEN - 1
    args = (
        torch.zeros(1, 1, dtype=torch.long),
        torch.zeros(1, 1, dtype=torch.long),
        torch.zeros(L, 1, H, P, hd),
        torch.zeros(L, 1, H, P, hd),
        torch.zeros(1, 1, 1, P + 1),
    )
    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "decoder.onnx")
        with torch.no_grad():
            torch.onnx.export(m, args, path, opset_version=17, dynamo=False)
        t0 = time.perf_counter()
        cm = compile_model(path)
        print(f"[STAGE] compile: {time.perf_counter() - t0:.2f}s "
              f"({V=} {d=} {H=} {L=} max_len={MAXLEN})")

    dec = StaticKVDecoder(cm, num_layers=L, num_heads=H, head_dim=hd,
                          max_len=MAXLEN)
    prompt = [1, 2, 3]
    ids_host, _ = dec.generate_hostloop(prompt, steps)  # host loop (oracle path)
    dec.generate_fused(prompt, steps)  # warmup: compile the fused program
    t0 = time.perf_counter()
    ids, _ = dec.generate_fused(prompt, steps)
    dt = time.perf_counter() - t0
    per_tok = dt / (len(prompt) + steps) * 1e3
    print(f"generated {steps} tokens: {ids[:16]}{'...' if steps > 16 else ''}")
    print(f"[STAGE] fused decode: {dt * 1e3:.1f} ms total, {per_tok:.2f} "
          f"ms/token (prefill+decode+cache+argmax in ONE program)")
    assert ids == ids_host, "fused decode diverged from host loop"
    assert len(ids) == steps and all(0 <= i < V for i in ids)
    print("OK")


if __name__ == "__main__":
    main()
