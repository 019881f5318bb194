#!/usr/bin/env python
"""Cross-runtime baseline: the same exported model on torch-CPU (1 thread,
the reference's ORT-pinning protocol — scripts/silero_bench.py:10-12) vs
this stack on TPU.

The reference ships ORT baseline scripts per model; ORT isn't installed
here, so PyTorch serves as the independent runtime. Prints both steady-state
latencies and the speedup.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

torch.set_num_threads(1)  # single-thread pinning, reference protocol
torch.set_num_interop_threads(1)


class Block(nn.Module):
    def __init__(self, d=512, h=8):
        super().__init__()
        self.h = h
        self.ln1 = nn.LayerNorm(d)
        self.qkv = nn.Linear(d, 3 * d)
        self.out = nn.Linear(d, d)
        self.ln2 = nn.LayerNorm(d)
        self.f1 = nn.Linear(d, 4 * d)
        self.f2 = nn.Linear(4 * d, d)

    def forward(self, x):
        B, T, D = x.shape
        q, k, v = self.qkv(self.ln1(x)).chunk(3, -1)
        q = q.view(B, T, self.h, -1).transpose(1, 2)
        k = k.view(B, T, self.h, -1).transpose(1, 2)
        v = v.view(B, T, self.h, -1).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / (D // self.h) ** 0.5, -1)
        x = x + self.out((a @ v).transpose(1, 2).reshape(B, T, D))
        return x + self.f2(nn.functional.gelu(self.f1(self.ln2(x))))


class Enc(nn.Module):
    def __init__(self, layers=8):
        super().__init__()
        self.blocks = nn.ModuleList([Block() for _ in range(layers)])

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


def main():
    layers, T = 8, 200
    m = Enc(layers).eval()
    x = torch.randn(1, T, 512)
    path = "/tmp/lele_baseline_enc.onnx"
    with torch.no_grad():
        torch.onnx.export(m, (x,), path, opset_version=17, dynamo=False)
        m(x)
        t0 = time.perf_counter()
        for _ in range(10):
            m(x)
        torch_ms = (time.perf_counter() - t0) / 10 * 1e3

    from lele_tpu.runtime import enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    from lele_tpu.compiler import compile_model

    cm = compile_model(path)
    xd = jnp.asarray(x.numpy())
    wf = cm._walk_fn
    name = cm.input_order[0]

    # the CANONICAL chained-slope protocol (bench._chain_slope): carried
    # dependency + readback gating + INTERLEAVED K measurements — a local
    # re-implementation here used to run the two K walls sequentially,
    # letting sustained device-load drift skew the slope
    import bench

    tpu_ms = bench._chain_slope(
        lambda c, p, xx: jax.tree.leaves(wf(p, {name: xx + c * 1e-30}))[0],
        (cm.params, xd),
        Ks=(8, 40) if jax.devices()[0].platform == "tpu" else (1, 3),
    ) * 1e3

    plat = jax.devices()[0].platform
    label = "lele-tpu (1x v5e)  " if plat != "cpu" else \
        "lele-tpu (CPU!)    "  # honest label when run off-TPU
    print(f"transformer encoder {layers}L d512 T{T} (batch 1):")
    print(f"  torch-CPU 1-thread : {torch_ms:8.2f} ms")
    print(f"  {label}: {tpu_ms:8.3f} ms  ({torch_ms / tpu_ms:.0f}x)")
    if plat == "cpu":
        print("  (JAX backend is CPU here — the honest device number needs "
              "the TPU; see docs/PERF.md)")


if __name__ == "__main__":
    main()
