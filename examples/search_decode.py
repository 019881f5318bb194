#!/usr/bin/env python
"""Generative search as ONE XLA program — the com.microsoft
BeamSearch/GreedySearch/Sampling contrib ops that published ORT generative
exports ship (GPT-2 via convert_generation.py; Whisper/T5 use the same ops'
two-graph model_type 1/2 form).

Unlike ORT's host orchestrator (which re-runs the decoder subgraph with
growing dynamic shapes), the embedded decoder GraphProto traces INTO a
lax.scan over static max-length KV buffers: one compile, zero host
round-trips during the search, beam bookkeeping as static-shape jnp frozen
per batch on completion.

Usage: python examples/search_decode.py [max_length] [num_beams]

On a tunneled TPU the FIRST compile of the scanned search program can take
minutes (remote-compile weather; cached afterwards) — for a quick look run
with JAX_PLATFORMS=cpu (~3 s).

Correctness gates: tests/test_search_ops.py (HF generate for greedy; an
independent torch implementation of ORT's beam-search scorer for beam;
randomized-config fuzz arm).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from lele_tpu import runtime
from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel
from lele_tpu.onnx.synth import build_gpt2_decoder_graph, build_search_model

runtime.enable_cache()  # first remote compile is minutes; reruns are fast


def main():
    ml = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    V, D, NH, NL, B, S = 61, 32, 2, 2, 2, 5

    def w(*s):
        return (rng.standard_normal(s) / np.sqrt(s[0])).astype(np.float32)

    p = {"wte": w(V, D) * 3, "wpe": w(max(ml, 32), D),
         "lnf_g": w(D) * 0.1 + 1, "lnf_b": w(D) * 0.1}
    for i in range(NL):
        for nm in ("ln1", "ln2"):
            p[f"{nm}_g{i}"] = w(D) * 0.1 + 1
            p[f"{nm}_b{i}"] = w(D) * 0.1
        p[f"attn_w{i}"], p[f"attn_b{i}"] = w(D, 3 * D), w(3 * D) * 0.1
        p[f"proj_w{i}"], p[f"proj_b{i}"] = w(D, D), w(D) * 0.1
        p[f"fc_w{i}"], p[f"fc_b{i}"] = w(D, 4 * D), w(4 * D) * 0.1
        p[f"fcp_w{i}"], p[f"fcp_b{i}"] = w(4 * D, D), w(D) * 0.1
    p["lm_w"] = np.ascontiguousarray(p["wte"].T)
    dec = build_gpt2_decoder_graph(p, NL, NH)
    ids = rng.integers(0, V - 2, (B, S)).astype(np.int32)

    bs = build_search_model(
        "BeamSearch", dec, (B, S),
        {"max_length": np.asarray([ml], np.int32),
         "num_beams": np.asarray([nb], np.int32),
         "num_return_sequences": np.asarray([2], np.int32),
         "length_penalty": np.asarray([1.1], np.float32)},
        dict(eos_token_id=V - 1, pad_token_id=V - 2, model_type=0,
             no_repeat_ngram_size=3), 2)
    t0 = time.perf_counter()
    cm = compile_model(OnnxModel.from_bytes(bs), strict=True)
    seq, scores = cm.run_np(input_ids=ids)
    t1 = time.perf_counter()
    print(f"[beam nb={nb}] compile+search {t1 - t0:.2f}s "
          f"(whole search = one program)")
    for b in range(B):
        for r in range(seq.shape[1]):
            print(f"  batch {b} #{r} score={float(scores[b, r]):+.3f} "
                  f"tokens={seq[b, r].tolist()}")

    bs = build_search_model(
        "GreedySearch", dec, (B, S),
        {"max_length": np.asarray([ml], np.int32)},
        dict(eos_token_id=V - 1, pad_token_id=V - 2, model_type=0), 1)
    cm = compile_model(OnnxModel.from_bytes(bs), strict=True)
    t0 = time.perf_counter()
    (g,) = cm.run_np(input_ids=ids)
    t1 = time.perf_counter()
    print(f"[greedy] search {t1 - t0:.2f}s")
    for b in range(B):
        print(f"  batch {b} tokens={g[b].tolist()}")


if __name__ == "__main__":
    main()
