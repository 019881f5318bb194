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

_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms and _env_platforms not in ("axon", "axon,cpu"):
    # Restore the documented JAX_PLATFORMS env contract when the ambient
    # sitecustomize shim overrode it via jax.config (the shim pins
    # "axon,cpu"). Only the shim's own value is replaced — a config the
    # user already set programmatically is left alone.
    try:
        import jax as _jax

        if _jax.config.jax_platforms in ("axon", "axon,cpu"):
            _jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass


def compile_model(*args, **kwargs):
    """Convenience re-export of lele_tpu.compiler.compile_model."""
    from .compiler import compile_model as _cm

    return _cm(*args, **kwargs)
