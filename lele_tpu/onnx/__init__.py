"""ONNX substrate: wire codec, schema, loader, graph builder."""

from .loader import DTYPE_MAP, NP_TO_ONNX, OnnxModel, tensor_to_array  # noqa: F401
from .schema import Proto  # noqa: F401
