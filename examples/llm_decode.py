#!/usr/bin/env python
"""Autoregressive decode over the fused opset-23 op family: a step graph
built from Attention (masked, KV-cached), RotaryEmbedding, and
TensorScatter — the layout modern LLM exports use instead of spelled-out
MatMul/Softmax chains (contrast: examples/decoder_kv_cache.py drives a
torch export in the spelled-out form).

The cache is static [B, H, max_len, hd], so every step reuses ONE XLA
program; on TPU, flash-eligible shapes route the Attention node through
the Pallas flash kernel automatically (see docs/PERF.md "Kernel honesty").

Usage: python examples/llm_decode.py [steps] [--quantize]
  --quantize   rewrite the step graph's linears to int8 DQL form first
               (onnxruntime quantize_dynamic analog) and report the logit
               drift vs float.

Correctness gate for this construction lives in
tests/test_llm_decode_e2e.py (logit-exact vs an independent torch
implementation).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    steps = 32
    quantize = "--quantize" in sys.argv
    for a in sys.argv[1:]:
        if a.isdigit():
            steps = int(a)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    import test_llm_decode_e2e as G

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel

    B, V, H, NL, S, HD = G.B, G.V, G.H, G.NL, G.S, G.HD
    if steps > S:
        print(f"[llm_decode] clamping steps {steps} → cache capacity {S}")
        steps = S

    rng = np.random.default_rng(0)
    p = G._params(rng)
    bs, _ = G._build_step(p)
    if quantize:
        from lele_tpu.onnx.quantize import quantize_dynamic

        bs_q = quantize_dynamic(bs)
        print(f"[llm_decode] quantized step graph: "
              f"{len(bs)} → {len(bs_q)} bytes")
        cm = compile_model(OnnxModel.from_bytes(bs_q))
        cm_f = compile_model(OnnxModel.from_bytes(bs))
    else:
        cm = compile_model(OnnxModel.from_bytes(bs))
        cm_f = None

    ids = np.array([3, 7], dtype=np.int64)[:B]
    ck = [np.zeros((B, H, S, HD), np.float32) for _ in range(NL)]
    cv = [np.zeros((B, H, S, HD), np.float32) for _ in range(NL)]
    toks = []
    drift = 0.0
    t0 = time.perf_counter()
    for step in range(steps):
        pos = np.full((B,), step, dtype=np.int64)
        mask = np.full((B, 1, 1, S), -1e9, np.float32)
        mask[..., : step + 1] = 0.0
        feeds = {"ids": ids, "pos1": pos, "pos2": pos[:, None], "mask": mask}
        for i in range(NL):
            feeds[f"ck{i}"] = ck[i]
            feeds[f"cv{i}"] = cv[i]
        outs = cm.run_np(**feeds)
        logits = outs[0].reshape(B, V)
        if cm_f is not None:
            lf = cm_f.run_np(**feeds)[0].reshape(B, V)
            drift = max(drift, float(np.abs(logits - lf).mean()))
        for i in range(NL):
            ck[i], cv[i] = outs[1 + 2 * i], outs[2 + 2 * i]
        ids = logits.argmax(-1).astype(np.int64)
        toks.append(ids.copy())
    dt = time.perf_counter() - t0
    seq = np.stack(toks)  # [steps, B]
    print(f"[llm_decode] {steps} steps × batch {B} in {dt*1e3:.1f} ms "
          f"({dt/steps*1e3:.2f} ms/step incl. host loop)")
    for b in range(B):
        print(f"  stream {b}: {' '.join(str(t) for t in seq[:, b])}")
    if cm_f is not None:
        print(f"[llm_decode] max per-step logit MAE int8 vs float: "
              f"{drift:.4f}")


if __name__ == "__main__":
    main()
