"""lele_tpu — a TPU-native AOT inference stack.

A ground-up rebuild of the capabilities of miuda-ai/lele (an ONNX→Rust AOT
compiler + SIMD kernel library) designed for TPU: the ONNX graph compiles to
one fused XLA program via a trace-time ONNX→JAX interpreter, hot paths use
Pallas TPU kernels, the audio front-end runs on device in the same program,
and multi-chip scaling rides `jax.sharding` meshes.

Layers (mirrors SURVEY.md §1, redesigned TPU-first):
- ``lele_tpu.onnx``      ONNX protobuf substrate (own wire codec, no deps)
- ``lele_tpu.ops``       ONNX op semantics over jnp (the portable kernel layer)
- ``lele_tpu.kernels``   Pallas TPU kernels for fusion-critical paths
- ``lele_tpu.compiler``  ONNX→JAX tracer, constant folding, pattern rewrites,
                          weight blob, AOT cache
- ``lele_tpu.features``  on-device audio front-end (STFT/mel/LFR/CMVN)
- ``lele_tpu.models``    native JAX implementations of the model families
- ``lele_tpu.runtime``   compiled-model engine (donation, streaming state)
- ``lele_tpu.parallel``  mesh/sharding helpers (data/tensor/sequence parallel)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor the standard JAX_PLATFORMS env var even when a sitecustomize
    # shim has overridden it via jax.config (restores the documented JAX
    # contract; no-op when the backend is already initialized).
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
