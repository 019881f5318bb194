#!/usr/bin/env python
"""Whisper-class encoder–decoder generation over compiled ONNX graphs.

Exports a tiny torch encoder (+ cross-attention K/V projection) and a
decoder step graph, compiles both, and generates with the fused
whole-utterance device program: encode ONCE, then a single decode dispatch
whose lax.scan carries the static self-attention KV cache while the
precomputed cross K/V ride as fixed inputs (runtime/seq2seq.py).

Beyond the reference — miuda-ai/lele ships encoder-style pipelines only
(SURVEY.md §2.5). Usage: python examples/seq2seq_asr.py [steps]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from test_torch_onnx import TinyS2SDecoderStep, TinyS2SEncoder

    from lele_tpu.compiler import compile_model
    from lele_tpu.runtime.seq2seq import Seq2SeqGenerator

    torch.manual_seed(7)
    V, d, H, L, Te, F = 257, 128, 8, 4, 48, 80
    max_len = steps + 2
    P = max_len - 1
    hd = d // H
    enc = TinyS2SEncoder(F, d, H, L).eval()
    dec = TinyS2SDecoderStep(V, d, H, L, max_len).eval()

    import tempfile

    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        ep, dp = str(Path(td) / "e.onnx"), str(Path(td) / "d.onnx")
        with torch.no_grad():
            torch.onnx.export(enc, (torch.randn(1, Te, F),), ep,
                              opset_version=17, dynamo=False,
                              input_names=["src"],
                              output_names=["cross_k", "cross_v"])
            torch.onnx.export(
                dec,
                (torch.zeros(1, 1, dtype=torch.long),
                 torch.zeros(1, 1, dtype=torch.long),
                 torch.zeros(L, 1, H, P, hd), torch.zeros(L, 1, H, P, hd),
                 torch.zeros(1, 1, 1, P + 1),
                 torch.zeros(L, 1, H, Te, hd), torch.zeros(L, 1, H, Te, hd)),
                dp, opset_version=17, dynamo=False,
                input_names=["ids", "pos", "ck", "cv", "mask",
                             "cross_k", "cross_v"],
                output_names=["logits", "nk", "nv"])
        gen = Seq2SeqGenerator(compile_model(ep), compile_model(dp),
                               num_layers=L, num_heads=H, head_dim=hd,
                               max_len=max_len, bos_id=1, eos_id=0)
        print(f"[STAGE] export+compile: {time.perf_counter() - t0:.2f}s "
              f"(V={V} d={d} H={H} L={L} Te={Te} max_len={max_len})")

        src = np.random.default_rng(0).standard_normal(
            (1, Te, F)).astype(np.float32)
        ids = gen.generate(src, max_steps=steps)  # compile + run
        t0 = time.perf_counter()
        ids = gen.generate(src, max_steps=steps)
        dt = time.perf_counter() - t0
        print(f"generated {len(ids)} tokens: {ids[:16]}...")
        print(f"[STAGE] encode + fused decode: {dt * 1e3:.1f} ms total, "
              f"{dt / max(len(ids), 1) * 1e3:.2f} ms/token "
              f"(2 dispatches per utterance)")
        host = gen.generate_hostloop(src, max_steps=steps)
        assert ids == host, "fused != host-loop oracle"
        print("OK")


if __name__ == "__main__":
    main()
