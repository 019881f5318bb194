"""ONNX substrate: wire codec, schema, loader, graph builder."""

from .loader import (  # noqa: F401
    DTYPE_MAP,
    NP_TO_ONNX,
    OnnxModel,
    bind_inputs,
    tensor_to_array,
)
from .schema import Proto  # noqa: F401
