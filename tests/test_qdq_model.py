"""QDQ-format (static-quant) model e2e: the layout real int8 VISION exports
use — QuantizeLinear/DequantizeLinear pairs around every conv — as opposed
to the dynamic-quant chains of the ASR exports (test_dql_dataflow). The
tracer folds the weight-side Q/DQ at trace time and executes the
activation-side fake-quant exactly; output must match a numpy oracle of
the same math."""

import numpy as np

from optest import assert_close, run_graph
from lele_tpu.onnx import builder as ob

rng = np.random.default_rng(55)


def _q(x, s, zp):
    # ONNX QuantizeLinear: round-half-even, clamp to u8
    return np.clip(np.round(x / s) + zp, 0, 255).astype(np.uint8)


def _dq(q, s, zp):
    return ((q.astype(np.int32) - zp) * s).astype(np.float32)


def _conv2d(x, w, b):
    n, cin, h, wd = x.shape
    co, _, kh, kw = w.shape
    out = np.zeros((n, co, h - kh + 1, wd - kw + 1), np.float32)
    for o in range(co):
        for i in range(out.shape[2]):
            for j in range(out.shape[3]):
                out[0, o, i, j] = (
                    x[0, :, i : i + kh, j : j + kw] * w[o]
                ).sum() + b[o]
    return out


def test_qdq_conv_backbone_matches_oracle():
    x = (rng.standard_normal((1, 3, 8, 8)) * 0.5).astype(np.float32)
    w1 = (rng.standard_normal((4, 3, 3, 3)) * 0.2).astype(np.float32)
    b1 = (rng.standard_normal(4) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((5, 4, 3, 3)) * 0.2).astype(np.float32)
    b2 = (rng.standard_normal(5) * 0.1).astype(np.float32)

    # static scales/zps (calibration constants in a real export)
    sx, zx = np.float32(0.02), np.uint8(128)
    sw1, zw1 = np.float32(0.004), np.uint8(128)
    sa1, za1 = np.float32(0.03), np.uint8(110)
    sw2, zw2 = np.float32(0.004), np.uint8(128)

    w1q, w2q = _q(w1, sw1, int(zw1)), _q(w2, sw2, int(zw2))

    inits = {
        "sx": sx, "zx": zx, "w1q": w1q, "sw1": sw1, "zw1": zw1, "b1": b1,
        "sa1": sa1, "za1": za1, "w2q": w2q, "sw2": sw2, "zw2": zw2, "b2": b2,
    }
    nodes = [
        # input fake-quant
        ob.node("QuantizeLinear", ["x", "sx", "zx"], ["xq"]),
        ob.node("DequantizeLinear", ["xq", "sx", "zx"], ["xdq"]),
        # conv1 with dequantized weights (weight-side folds at trace time)
        ob.node("DequantizeLinear", ["w1q", "sw1", "zw1"], ["w1dq"]),
        ob.node("Conv", ["xdq", "w1dq", "b1"], ["c1"]),
        ob.node("Relu", ["c1"], ["r1"]),
        # inter-layer fake-quant
        ob.node("QuantizeLinear", ["r1", "sa1", "za1"], ["a1q"]),
        ob.node("DequantizeLinear", ["a1q", "sa1", "za1"], ["a1dq"]),
        # conv2
        ob.node("DequantizeLinear", ["w2q", "sw2", "zw2"], ["w2dq"]),
        ob.node("Conv", ["a1dq", "w2dq", "b2"], ["c2"]),
        ob.node("Relu", ["c2"], ["y"]),
    ]
    (got,) = run_graph(nodes, {"x": x}, ["y"], initializers=inits)

    # numpy oracle of the identical fake-quant math
    xdq = _dq(_q(x, sx, int(zx)), sx, int(zx))
    r1 = np.maximum(_conv2d(xdq, _dq(w1q, sw1, int(zw1)), b1), 0)
    a1 = _dq(_q(r1, sa1, int(za1)), sa1, int(za1))
    want = np.maximum(_conv2d(a1, _dq(w2q, sw2, int(zw2)), b2), 0)
    assert_close(got, want, tol=2e-4)


def test_qdq_weight_side_folds_at_trace_time():
    """The weight Q→DQ chain is all-static: it must fold (no runtime nodes),
    leaving only the activation path in the program."""
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel

    w = (rng.standard_normal((2, 2, 2, 2)) * 0.2).astype(np.float32)
    wq = _q(w, 0.01, 128)
    nodes = [
        ob.node("DequantizeLinear", ["wq", "sw", "zw"], ["wdq"]),
        ob.node("Conv", ["x", "wdq"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.vi_from_array("x", np.zeros((1, 2, 4, 4), np.float32))],
        outputs=[ob.value_info("y", 1, [])],
        initializers=[
            ob.tensor_from_array(wq, "wq"),
            ob.tensor_from_array(np.float32(0.01), "sw"),
            ob.tensor_from_array(np.uint8(128), "zw"),
        ],
    )
    cm = compile_model(OnnxModel.from_bytes(bs))
    assert cm.stats["n_folded"] >= 1  # the weight DQ folded
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    (y,) = cm.run_np(x)
    want = _conv2d(np.pad(x, ((0, 0),) * 4), _dq(wq, 0.01, 128),
                   np.zeros(2, np.float32))
    assert_close(y, want, tol=1e-4)
