"""AOT export: serialize a compiled model to a portable StableHLO artifact.

The reference's artifact is generated Rust source + weights blob compiled
into the app binary (SURVEY.md §5 checkpoint/resume analog). Ours is the
weights blob (weights.py) + a `jax.export` StableHLO payload, reloadable
without the original ONNX — plus the persistent XLA compile cache
(runtime/cache.py) for warm cold-starts.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def export_model(cm, path: str | Path) -> None:
    """Serialize a CompiledModel's program to <path> (.shlo bytes)."""
    import jax
    from jax import export as jexport

    donated = tuple(
        jax.ShapeDtypeStruct(tuple(cm.input_specs[n][0]), cm._canon[n])
        for n in cm._donate_names
    )
    rest = tuple(
        jax.ShapeDtypeStruct(tuple(cm.input_specs[n][0]), cm._canon[n])
        for n in cm._rest_names
    )
    params_spec = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in cm.params.items()
    }
    exported = jexport.export(cm._jit)(params_spec, donated, rest)
    Path(path).write_bytes(exported.serialize())


def load_exported(path: str | Path):
    """→ callable(params_dict, donated_tuple, rest_tuple) on this backend.

    Wrapped in jax.jit so repeat calls hit the executable cache instead of
    re-staging the deserialized module each invocation."""
    import jax
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return jax.jit(exported.call)
