"""`onnx`-module compatibility shim for `torch.onnx.export`.

PyTorch's TorchScript ONNX exporter serializes the ModelProto itself (C++),
but hard-requires the `onnx` pip package for a post-pass that scans the
graph for onnxscript functions (torch/onnx/.../onnx_proto_utils.py
`_add_onnxscript_fn`). In an onnx-less environment (like this one), that
makes export impossible — even though nothing from onnx is really needed
for standard aten graphs.

`install()` registers a minimal stand-in built on lele_tpu's own protobuf
substrate: `load_model_from_string` decodes with our schema (the shim's
`.graph.node[*].attribute[*].g` traversal is exactly our Proto surface) and
`SerializeToString` returns the original bytes untouched. Result:
`torch.onnx.export(..., dynamo=False)` works, and the artifact feeds
straight into `lele_tpu.compiler.compile_model`.
"""

from __future__ import annotations

import sys
import types


class _ModelShim:
    def __init__(self, data: bytes):
        from . import schema

        self._bytes = bytes(data)
        self._model = schema.decode_model(self._bytes)
        self.functions: list = []

    @property
    def graph(self):
        return self._model.graph

    def SerializeToString(self) -> bytes:
        if self.functions:
            raise NotImplementedError(
                "onnxscript custom functions require the real onnx package"
            )
        return self._bytes


def install(force: bool = False) -> bool:
    """Register the shim as `onnx` when the real package is absent.
    Returns True if the shim (or real onnx) is available afterwards."""
    if "onnx" in sys.modules and not force:
        return True
    try:  # prefer the real thing
        import onnx  # noqa: F401

        return True
    except ImportError:
        pass
    import importlib.machinery

    mod = types.ModuleType("onnx")
    mod.__version__ = "0.0.0+lele_tpu_shim"
    # a real-looking spec so importlib.util.find_spec("onnx") works
    # (transformers probes availability that way)
    mod.__spec__ = importlib.machinery.ModuleSpec("onnx", loader=None)
    mod.load_model_from_string = _ModelShim
    mod.load_from_string = _ModelShim
    mod.ModelProto = _ModelShim
    sys.modules["onnx"] = mod
    return True
