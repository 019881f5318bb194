"""Import ONNX checkpoint weights into native model param trees.

Bridges the two model paths (SURVEY §2.5): run a real checkpoint either by
compiling its ONNX graph (lele_tpu.compiler) or by mapping its initializers
onto the native JAX architecture — useful when the native implementation is
preferred (sharding, fine-tuning, fused frontend) but the weights come from
an exported .onnx file.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..onnx.loader import OnnxModel
from ..parallel.sharding import _unflatten


def import_weights(
    model: OnnxModel,
    mapping: dict[str, str | tuple[str, Callable[[np.ndarray], np.ndarray]]],
    strict: bool = True,
) -> dict:
    """mapping: param-path ("layers/0/qkv/w") → ONNX initializer name, or
    (name, transform) where transform adapts layout (e.g. transpose — ONNX
    linears are usually [out, in], ours are [in, out]).

    Returns a nested param tree (lists for numeric path segments)."""
    flat: dict[str, np.ndarray] = {}
    missing = []
    for path, spec in mapping.items():
        if isinstance(spec, tuple):
            name, transform = spec
        else:
            name, transform = spec, None
        arr = model.initializer_array(name)
        if arr is None:
            t = model.find_constant_node_tensor(name)
            if t is not None:
                from ..onnx.loader import tensor_to_array

                arr = tensor_to_array(t, getattr(model, "base_dir", None))
        if arr is None:
            missing.append((path, name))
            continue
        if transform is not None:
            arr = transform(arr)
        flat[path] = np.ascontiguousarray(arr)
    if missing and strict:
        raise KeyError(f"initializers not found: {missing}")
    return _unflatten(flat)


def transpose2d(arr: np.ndarray) -> np.ndarray:
    """The common [out,in] → [in,out] linear-weight adapter."""
    return arr.T
