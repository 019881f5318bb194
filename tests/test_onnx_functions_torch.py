"""Foreign-provenance check for local-function inlining: a model exported
BY TORCH with `export_modules_as_functions=True` (each nn.Module becomes a
FunctionProto, calls carry the module's domain) must compile and match the
torch forward. This proves the inliner handles an exporter it didn't write
— the same generality contract the SAN-M fusion proves for the matcher
(tests/test_sanm_fuse_torch.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import OnnxModel, schema  # noqa: E402
from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()


class Block(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.lin = nn.Linear(d, d)
        self.ln = nn.LayerNorm(d)

    def forward(self, x):
        return self.ln(torch.relu(self.lin(x)) + x)


class Net(nn.Module):
    def __init__(self, d=16):
        super().__init__()
        self.b1 = Block(d)
        self.b2 = Block(d)
        self.head = nn.Linear(d, 4)

    def forward(self, x):
        return self.head(self.b2(self.b1(x)))


def test_torch_module_functions_compile(tmp_path):
    torch.manual_seed(0)
    m = Net().eval()
    x = torch.randn(3, 16)
    path = str(tmp_path / "fn_export.onnx")
    with torch.no_grad():
        torch.onnx.export(
            m, (x,), path,
            opset_version=17, dynamo=False,
            input_names=["x"],
            export_modules_as_functions={Block},
        )
        want = m(x).numpy()

    with open(path, "rb") as f:
        dec = schema.decode_model(f.read())
    fns = dec.functions
    assert fns, "export did not produce local functions — test is vacuous"
    assert any(len(f.node) > 1 for f in fns)
    # two Block instances share one function definition, called twice
    calls = [n for n in dec.graph.node
             if (n.domain or "") not in ("", "ai.onnx", "ai.onnx.ml")]
    assert len(calls) >= 2

    cm = compile_model(OnnxModel.load(path))
    got = cm.run_np(x=x.numpy())[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
