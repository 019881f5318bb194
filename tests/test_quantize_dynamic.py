"""Dynamic-quantizer graph transform (onnx/quantize.py).

The reference consumes ORT-quantized int8 graphs (DynamicQuantizeLinear →
MatMulInteger chains, /root/reference/src/compiler/mod.rs:865-990); with no
ORT wheel here, onnx/quantize.py must produce that exact graph form from a
float export. These tests drive it with REAL torch.onnx exports (foreign
provenance — not our builder) and gate on (a) the emitted structure, (b)
numeric closeness to the float model, (c) the weight grid being ORT's
symmetric int8.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import schema  # noqa: E402
from lele_tpu.onnx.quantize import (  # noqa: E402
    quantize_dynamic,
    quantize_weight_int8,
)
from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()


def _export(model, args, tmp_path, name="m.onnx"):
    path = str(tmp_path / name)
    model = model.eval()
    with torch.no_grad():
        torch.onnx.export(model, args, path, opset_version=17, dynamo=False)
        want = model(*args)
    with open(path, "rb") as f:
        data = f.read()
    if isinstance(want, (tuple, list)):
        want = want[0]
    return data, want.numpy()


def _ops(data: bytes) -> list[str]:
    m = schema.decode_model(data)
    return [n.op_type for n in m.graph.node]


def test_mlp_matmul_3d(tmp_path):
    """3-D Linears (MatMul+Add form) → DQL chains; output stays close to
    the float model within dynamic-u8 quantization noise."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Linear(96, 128)
            self.b = nn.Linear(128, 64)

        def forward(self, x):
            return self.b(torch.relu(self.a(x)))

    torch.manual_seed(0)
    x = torch.randn(1, 7, 96)
    data, want = _export(M(), (x,), tmp_path)
    qdata = quantize_dynamic(data)

    ops = _ops(qdata)
    assert ops.count("DynamicQuantizeLinear") == 2
    assert ops.count("MatMulInteger") == 2
    assert "MatMul" not in ops and "Gemm" not in ops

    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=0.05, rtol=0)


def _write(tmp_path, data, name="q.onnx"):
    p = tmp_path / name
    p.write_bytes(data)
    return p


def test_gemm_2d(tmp_path):
    """2-D Linear exports as Gemm(transB=1); the quantizer pre-transposes
    the weight and keeps the bias as a float Add."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(80, 40)

        def forward(self, x):
            return self.fc(x)

    torch.manual_seed(1)
    x = torch.randn(5, 80)
    data, want = _export(M(), (x,), tmp_path)
    assert "Gemm" in _ops(data)
    qdata = quantize_dynamic(data)
    ops = _ops(qdata)
    assert "Gemm" not in ops and ops.count("MatMulInteger") == 1
    assert "Add" in ops  # bias survives as float Add

    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    np.testing.assert_allclose(out, want, atol=0.05, rtol=0)


def test_dynamic_matmuls_stay_float(tmp_path):
    """Attention-style dynamic×dynamic MatMul must NOT be rewritten."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(32, 32)

        def forward(self, x):
            y = self.proj(x)
            return torch.matmul(y, y.transpose(1, 2))

    torch.manual_seed(2)
    x = torch.randn(1, 6, 32)
    data, want = _export(M(), (x,), tmp_path)
    qdata = quantize_dynamic(data)
    ops = _ops(qdata)
    assert ops.count("MatMulInteger") == 1  # the projection only
    assert ops.count("MatMul") == 1         # y @ y^T stays float

    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    np.testing.assert_allclose(out, want, atol=0.08, rtol=0)


def test_weight_grid_is_ort_symmetric():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    wq, ws = quantize_weight_int8(w)
    assert wq.dtype == np.int8
    assert ws == pytest.approx(float(np.abs(w).max()) / 127.0)
    assert int(np.abs(wq).max()) == 127
    np.testing.assert_array_equal(
        wq, np.clip(np.round(w / ws), -127, 127).astype(np.int8))
    # degenerate all-zero weight: scale falls back to 1.0, grid all zeros
    wq0, ws0 = quantize_weight_int8(np.zeros((4, 4), np.float32))
    assert ws0 == 1.0 and not wq0.any()


def test_shared_weight_quantized_once(tmp_path):
    """Two MatMuls sharing one initializer → one quantized copy, and the
    float original is dropped from the model."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.w = nn.Parameter(torch.randn(48, 48) * 0.1)

        def forward(self, x):
            return torch.matmul(torch.matmul(x, self.w), self.w)

    torch.manual_seed(4)
    x = torch.randn(1, 5, 48)
    data, want = _export(M(), (x,), tmp_path)
    qdata = quantize_dynamic(data)
    m = schema.decode_model(qdata)
    i8 = [t for t in m.graph.initializer
          if len(t.dims) == 2 and t.data_type == 3]  # INT8 2-D weights
    assert len(i8) == 1
    f32_2d = [t for t in m.graph.initializer
              if len(t.dims) == 2 and t.data_type == 1]
    assert not f32_2d  # float copy removed

    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    np.testing.assert_allclose(out, want, atol=0.08, rtol=0)
