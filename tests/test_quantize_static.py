"""Static (QDQ-format) quantizer: calibrate → insert Q/DQ pairs → the ops
stay float and the compiler folds the pairs (consumption semantics proven
in test_qdq_model). ORT `quantize_static` analog; the layout matches real
int8 vision exports."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import schema  # noqa: E402
from lele_tpu.onnx.quantize import (  # noqa: E402
    calibrate_minmax,
    quantize_static,
)
from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()


class CNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(3, 8, 3, padding=1)
        self.c2 = nn.Conv2d(8, 16, 3, stride=2, padding=1)
        self.fc = nn.Linear(16 * 8 * 8, 10)

    def forward(self, x):
        h = torch.relu(self.c1(x))
        h = torch.relu(self.c2(h))
        return self.fc(h.flatten(1))


def _export(model, args, tmp_path):
    path = str(tmp_path / "m.onnx")
    model = model.eval()
    with torch.no_grad():
        torch.onnx.export(model, args, path, opset_version=17, dynamo=False,
                          input_names=["x"])
        want = model(*args)
    with open(path, "rb") as f:
        return f.read(), want.numpy()


def _ops(data):
    return [n.op_type for n in schema.decode_model(data).graph.node]


def test_calibrate_minmax_merges_and_includes_zero(tmp_path):
    torch.manual_seed(0)
    data, _ = _export(CNN(), (torch.randn(1, 3, 16, 16),), tmp_path)
    b1 = {"x": np.full((1, 3, 16, 16), 0.5, np.float32)}
    b2 = {"x": np.full((1, 3, 16, 16), 2.0, np.float32)}
    r = calibrate_minmax(data, [b1, b2])
    assert r, "no calibration tensors found"
    lo, hi = r["x"]
    assert lo == 0.0          # range widened to include zero
    assert hi == pytest.approx(2.0)  # merged across batches


def test_static_quant_structure_and_accuracy(tmp_path):
    torch.manual_seed(1)
    x = torch.randn(1, 3, 16, 16)
    data, want = _export(CNN(), (x,), tmp_path)
    rng = np.random.default_rng(2)
    batches = [{"x": rng.standard_normal((1, 3, 16, 16)).astype(np.float32)}
               for _ in range(4)]
    qdata = quantize_static(data, batches)

    ops = _ops(qdata)
    # ops stay float; Q/DQ pairs surround them
    assert ops.count("Conv") == 2 and "Gemm" in ops
    assert ops.count("QuantizeLinear") >= 4
    assert ops.count("DequantizeLinear") >= 7  # activations + 3 weights
    m = schema.decode_model(qdata)
    i8_w = [t for t in m.graph.initializer
            if t.data_type == 3 and len(t.dims) >= 2]
    assert len(i8_w) == 3  # c1, c2, fc weights pre-baked int8
    f32_w = [t for t in m.graph.initializer
             if t.data_type == 1 and len(t.dims) >= 2]
    assert not f32_w  # float copies dropped

    p = tmp_path / "q.onnx"
    p.write_bytes(qdata)
    cm = compile_model(str(p))
    out = np.asarray(cm.run_np(x.numpy())[0])
    assert out.shape == want.shape
    # full fake-quant (input + every inter-layer activation + weights,
    # ranges calibrated on a DIFFERENT random draw): per-element outliers
    # are inherent — semantics are pinned exactly by
    # test_static_quant_oracle_exactness; this gates sanity
    err = np.abs(out - want)
    assert err.mean() < 0.05, err.mean()
    assert err.max() < 0.3, err.max()


def test_static_quant_oracle_exactness(tmp_path):
    """The compiled QDQ model must equal the numpy fake-quant oracle of
    the SAME graph exactly (not just 'close to float'): one MatMul with
    known calibration constants."""
    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(3)
    w = (rng.standard_normal((8, 4)) / np.sqrt(8)).astype(np.float32)
    x = rng.standard_normal((2, 8)).astype(np.float32)
    data = ob.build_model_bytes(
        [ob.node("MatMul", ["x", "w"], ["y"])],
        inputs=[ob.value_info("x", 1, [2, 8])],
        outputs=[ob.value_info("y", 1, [2, 4])],
        initializers=[ob.tensor_from_array(w, "w")],
    )
    qdata = quantize_static(data, [{"x": x}])

    # numpy oracle with the qparams the quantizer computed
    m = schema.decode_model(qdata)
    from lele_tpu.onnx.loader import tensor_to_array

    ini = {t.name: tensor_to_array(t) for t in m.graph.initializer}

    def fq_u8(v, s, z):
        q = np.clip(np.round(v / s) + z, 0, 255).astype(np.uint8)
        return ((q.astype(np.int32) - z) * s).astype(np.float32)

    names = {t.name for t in m.graph.initializer}
    sx = next(ini[k] for k in names if "x_scale" in k)
    zx = next(ini[k] for k in names if "x_zp" in k)
    wq = next(ini[k] for k in names if "_quant" in k)
    ws = next(ini[k] for k in names if "_wscale" in k)
    want = fq_u8(x, float(sx), int(zx)) @ (
        wq.astype(np.float32) * float(ws))
    # output fake-quant applies too
    sy = next(ini[k] for k in names if "y_scale" in k)
    zy = next(ini[k] for k in names if "y_zp" in k)
    want = fq_u8(want, float(sy), int(zy))

    p = tmp_path / "q1.onnx"
    p.write_bytes(qdata)
    cm = compile_model(str(p))
    out = np.asarray(cm.run_np(x)[0])
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=0)


def test_per_channel_conv_weights(tmp_path):
    """per_channel=True: Conv weights get one scale per output channel
    (DequantizeLinear axis=0) and accuracy strictly improves when channel
    magnitudes are wildly uneven."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 8, 3, padding=1)

        def forward(self, x):
            return self.c(x)

    torch.manual_seed(4)
    m = M()
    with torch.no_grad():  # make channel magnitudes span 100x
        for i in range(8):
            m.c.weight[i] *= (0.05 if i else 5.0)
    x = torch.randn(1, 3, 12, 12)
    data, want = _export(m, (x,), tmp_path)
    batches = [{"x": x.numpy()}]

    qc = quantize_static(data, batches, per_channel=True)
    mc = schema.decode_model(qc)
    from lele_tpu.onnx.loader import tensor_to_array

    ws = next(tensor_to_array(t) for t in mc.graph.initializer
              if "_wscale" in t.name)
    assert ws.shape == (8,) and ws[0] > 10 * ws[1]  # real per-channel grid

    # weight-grid reconstruction: per-channel must beat per-tensor by the
    # magnitude ratio on the small channels (e2e error is dominated by
    # activation fake-quant, so the grid is gated directly)
    w = m.c.weight.detach().numpy()
    from lele_tpu.onnx.quantize import (
        quantize_weight_int8,
        quantize_weight_int8_per_channel,
    )

    wq_t, ws_t = quantize_weight_int8(w)
    wq_c, ws_c = quantize_weight_int8_per_channel(w, axis=0)
    rec_t = wq_t.astype(np.float32) * ws_t
    rec_c = wq_c.astype(np.float32) * ws_c.reshape(-1, 1, 1, 1)
    err_small_t = np.abs(rec_t[1:] - w[1:]).mean()
    err_small_c = np.abs(rec_c[1:] - w[1:]).mean()
    assert err_small_c < err_small_t / 20, (err_small_t, err_small_c)

    # and the per-channel model still compiles and tracks the float model
    p = tmp_path / "pc_c.onnx"
    p.write_bytes(qc)
    out = np.asarray(compile_model(str(p)).run_np(x.numpy())[0])
    assert np.abs(out - want).mean() < 0.1 * float(np.abs(want).max())


def test_old_opset_refused():
    from lele_tpu.onnx import builder as ob

    data = ob.build_model_bytes(
        [ob.node("MatMul", ["x", "w"], ["y"])],
        inputs=[ob.value_info("x", 1, [2, 4])],
        outputs=[ob.value_info("y", 1, [2, 4])],
        initializers=[ob.tensor_from_array(np.ones((4, 4), np.float32),
                                           "w")],
        opset=9,
    )
    with pytest.raises(ValueError, match="opset"):
        quantize_static(data, [{"x": np.ones((2, 4), np.float32)}])
