#!/usr/bin/env python
"""Greedy decode over the ORT-GenAI int4 export form — the exact graph
vocabulary published LLM ONNX releases carry (Phi-3/Llama/Qwen hub
builds): MatMulNBits packed-int4 projections, com.microsoft::
RotaryEmbedding, GroupQueryAttention over static KV-cache buffers,
SimplifiedLayerNormalization / SkipSimplifiedLayerNormalization residual
plumbing, SwiGLU MLP.

Two static programs (prefill + decode) are compiled once and reused every
step; the KV cache is the caller-held max-length buffer, appended on
device via per-batch dynamic_update_slice (donation-friendly).

Usage: python examples/genai_decode.py [steps]

Correctness gate: tests/test_genai_decoder_e2e.py (logit parity vs an
independent torch implementation, token-by-token greedy agreement).
Launch-day acquisition of the real checkpoints is rehearsed in
tests/test_launch_rehearsal.py::test_llm_int4_family_rehearsal against
the llm_int4 lock family (scripts/MODELS.lock.json).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    steps = 24
    for a in sys.argv[1:]:
        if a.isdigit():
            steps = int(a)

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.onnx.synth import (
        GENAI_CFG,
        build_genai_decoder,
        genai_decoder_params,
        genai_feeds,
    )

    cfg = dict(GENAI_CFG, L=64)
    B, V, KVH, HD, NL, L = (cfg[k]
                            for k in ("B", "V", "kvh", "hd", "nl", "L"))
    prefill = 8
    steps = min(steps, L - prefill)

    rng = np.random.default_rng(0)
    inits, _ = genai_decoder_params(rng, cfg)
    t0 = time.perf_counter()
    cm_pre = compile_model(OnnxModel.from_bytes(
        build_genai_decoder(inits, prefill, cfg)))
    cm_dec = compile_model(OnnxModel.from_bytes(
        build_genai_decoder(inits, 1, cfg)))
    print(f"[genai_decode] compiled prefill(S={prefill}) + decode(S=1) "
          f"programs in {time.perf_counter() - t0:.1f}s")

    pks = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    pvs = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    ids = rng.integers(0, V, (B, prefill)).astype(np.int64)
    pos = np.broadcast_to(np.arange(prefill), (B, prefill)).astype(np.int64)
    outs = cm_pre.run_np(**genai_feeds(ids, pos, 0, prefill, pks, pvs, cfg))
    for i in range(NL):
        pks[i], pvs[i] = np.asarray(outs[1 + 2 * i]), np.asarray(
            outs[2 + 2 * i])
    tok = np.asarray(outs[0])[:, -1].argmax(-1)[:, None].astype(np.int64)
    print(f"[genai_decode] prefill {prefill} tokens → first token "
          f"{tok.ravel().tolist()}")

    t0 = time.perf_counter()
    toks = [tok]
    for step in range(steps):
        plen = prefill + step
        outs = cm_dec.run_np(**genai_feeds(
            tok, np.full((B, 1), plen, np.int64), plen, 1, pks, pvs, cfg))
        for i in range(NL):
            pks[i] = np.asarray(outs[1 + 2 * i])
            pvs[i] = np.asarray(outs[2 + 2 * i])
        tok = np.asarray(outs[0])[:, -1].argmax(-1)[:, None].astype(np.int64)
        toks.append(tok)
    dt = time.perf_counter() - t0
    seq = np.concatenate(toks, axis=1)
    print(f"[genai_decode] {steps} greedy steps in {dt:.3f}s "
          f"({steps / dt:.1f} tok/s host-looped)")
    for b in range(B):
        print(f"  row {b}: {seq[b].tolist()}")


if __name__ == "__main__":
    main()
