"""fp16 checkpoint ingestion: a torch half-precision export compiles and
runs with f16 preserved end to end (weights, compute, output dtype).

Real published checkpoints commonly ship fp16; the reference's two-dtype
system materializes everything f32 (SURVEY §2.7 infer_variable_types),
while our tracer carries real dtypes — this pins that capability against
a foreign (torch) exporter.

The torch dynamo exporter (`dynamo=True`, the 2.9+ default) hard-imports
onnxscript at module load and is untestable in this egress-less env; the
TorchScript exporter (`dynamo=False`) is the covered surface, same as
tests/test_sanm_fuse_torch.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import OnnxModel  # noqa: E402
from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()


def test_fp16_export_runs_fp16(tmp_path):
    torch.manual_seed(0)
    m = nn.Sequential(
        nn.Linear(16, 16), nn.ReLU(), nn.LayerNorm(16), nn.Linear(16, 4)
    ).eval().half()
    x = torch.randn(3, 16).half()
    path = str(tmp_path / "fp16.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (x,), path, opset_version=17, dynamo=False,
                          input_names=["x"])
        want = m(x).float().numpy()
    om = OnnxModel.load(path)
    # the export really is half precision
    assert any(
        int(t.data_type) == 10 for t in om.initializers.values()
    ), "export is not fp16 — test is vacuous"
    cm = compile_model(om)
    got = cm.run_np(x=x.numpy())[0]
    assert got.dtype == np.float16  # dtype carried, not silently upcast
    assert np.abs(got.astype(np.float32) - want).max() < 5e-3


def test_fp16_mixed_with_cast(tmp_path):
    """Mixed-precision export: fp16 body behind an f32 input Cast — the
    common deploy layout (f32 I/O, f16 weights)."""

    class Mixed(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(8, 8).half()

        def forward(self, x):
            return self.lin(x.half()).float()

    torch.manual_seed(1)
    m = Mixed().eval()
    x = torch.randn(2, 8)
    path = str(tmp_path / "mixed.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (x,), path, opset_version=17, dynamo=False,
                          input_names=["x"])
        want = m(x).numpy()
    cm = compile_model(OnnxModel.load(path))
    got = cm.run_np(x=x.numpy())[0]
    assert got.dtype == np.float32
    assert np.abs(got - want).max() < 5e-3
