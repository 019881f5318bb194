"""Global configuration for the compiler/runtime.

TPU-first dtype policy: ONNX i64/f64 canonicalize on device to i32/f32
(values in the supported model families are lengths/indices/offsets that fit
easily). Trace-time static values keep full numpy 64-bit precision, so shape
arithmetic is exact. This replaces the reference's f32/i64 two-type runtime
(SURVEY.md §2.7) with real dtypes + a device-width policy.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Config:
    # device dtype canonicalization
    index_dtype: str = "int32"  # ONNX int64 tensors on device
    float64_as: str = "float32"
    # matmul precision: "default" (fast bf16 on TPU), "high", "highest"
    # parity gates vs ORT want "highest"; benches use "default"
    matmul_precision: str = "highest"
    # unknown-op behavior: warn + zeros (reference generate.rs:987-997) or raise
    strict: bool = False
    # fused Pallas RNN-sequence kernels in the LSTM/GRU emitters (forward,
    # single-direction, inference graphs); auto-disabled off-TPU
    use_pallas_rnn: bool = True
    # compute dtype override for weights/activations ("" = keep onnx dtypes)
    compute_dtype: str = ""
    # seed for ONNX Random* ops (deterministic per-node streams)
    rng_seed: int = 0


config = Config()
