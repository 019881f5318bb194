"""Spec-conformance regressions from the r3 kernels/ops review: each test
pins ONNX semantics an emitter used to get wrong (or crash on)."""

import numpy as np
import pytest

from optest import assert_close, run_graph, run_op
from lele_tpu.onnx import builder as ob

rng = np.random.default_rng(77)


def test_conv_integer_per_channel_wzp():
    """1-D w_zero_point is per-OUTPUT-CHANNEL — raw broadcast aligned it
    with kernel width (crash when M != kW, silent corruption when M == kW).
    M == kW == 3 here pins the silent case."""
    x = rng.integers(0, 255, (1, 2, 5, 5)).astype(np.uint8)
    w = rng.integers(0, 255, (3, 2, 3, 3)).astype(np.uint8)
    wzp = np.array([120, 128, 140], np.uint8)
    (y,) = run_op("ConvInteger", {"x": x},
                  initializers={"w": w, "xzp": np.uint8(128), "wzp": wzp})
    xs = x.astype(np.int64) - 128
    want = np.zeros((1, 3, 3, 3), np.int64)
    for o in range(3):
        ws = w[o].astype(np.int64) - int(wzp[o])
        for i in range(3):
            for j in range(3):
                want[0, o, i, j] = (xs[0, :, i : i + 3, j : j + 3] * ws).sum()
    assert (np.asarray(y).astype(np.int64) == want).all()


def test_lstm_layout1_initial_states():
    """layout=1 stores init_h/init_c as [B, num_dir, H]; they must be read
    direction-major (B=1 bidirectional used to IndexError or mix rows)."""
    S, B, I, H = 3, 1, 4, 5
    x_bsi = rng.standard_normal((B, S, I)).astype(np.float32)
    w = rng.standard_normal((2, 4 * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((2, 4 * H, H)).astype(np.float32) * 0.3
    h0 = rng.standard_normal((B, 2, H)).astype(np.float32)
    c0 = rng.standard_normal((B, 2, H)).astype(np.float32)
    nodes = [ob.node("LSTM", ["x", "w", "r", "", "", "h0", "c0"],
                     ["Y", "Yh", "Yc"], hidden_size=H, layout=1,
                     direction="bidirectional")]
    Y, Yh, Yc = run_graph(
        nodes, {"x": x_bsi}, ["Y", "Yh", "Yc"],
        initializers={"w": w, "r": r, "h0": h0, "c0": c0})
    # oracle: same graph in layout=0 with direction-major states
    nodes0 = [ob.node("LSTM", ["x", "w", "r", "", "", "h0", "c0"],
                      ["Y", "Yh", "Yc"], hidden_size=H,
                      direction="bidirectional")]
    Y0, Yh0, Yc0 = run_graph(
        nodes0, {"x": x_bsi.transpose(1, 0, 2)}, ["Y", "Yh", "Yc"],
        initializers={"w": w, "r": r, "h0": h0.transpose(1, 0, 2),
                      "c0": c0.transpose(1, 0, 2)})
    # layout=1 outputs: Y [B, S, dir, H], Yh/Yc [B, dir, H]
    assert_close(Y, np.asarray(Y0).transpose(2, 0, 1, 3), tol=1e-5)
    assert_close(Yh, np.asarray(Yh0).transpose(1, 0, 2), tol=1e-5)
    assert_close(Yc, np.asarray(Yc0).transpose(1, 0, 2), tol=1e-5)


def test_conv_transpose_output_shape_attr():
    """output_shape overrides pads: the requested spatial size must come
    out (it used to be ignored → (in-1)*stride + k)."""
    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    w = rng.standard_normal((2, 3, 3, 3)).astype(np.float32) * 0.3
    (y,) = run_op("ConvTranspose", {"x": x}, initializers={"w": w},
                  strides=[2, 2], output_shape=[10, 10])
    assert np.asarray(y).shape == (1, 3, 10, 10)
    # and the values match the equivalent explicitly-padded call
    # total = 2*(5-1) + 3 - 10 = 1 → pads [0,0,1,1] (NOTSET: head=total//2)
    (y2,) = run_op("ConvTranspose", {"x": x}, initializers={"w": w},
                   strides=[2, 2], pads=[0, 0, 1, 1])
    assert_close(y, y2, tol=1e-5)


def test_argmin_select_last_index():
    x = np.array([[3.0, 1.0, 1.0], [2.0, 5.0, 2.0]], np.float32)
    (first,) = run_op("ArgMin", {"x": x}, axis=1, keepdims=0)
    (last,) = run_op("ArgMin", {"x": x}, axis=1, keepdims=0,
                     select_last_index=1)
    assert list(np.asarray(first).reshape(-1)) == [1, 0]
    assert list(np.asarray(last).reshape(-1)) == [2, 2]


def test_maxpool_int8_dtype():
    """reduce_window identity must be representable in x's dtype (int32 min
    used to overflow i8 at trace time)."""
    x = rng.integers(-100, 100, (1, 1, 4, 4)).astype(np.int8)
    (y,) = run_op("MaxPool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2])
    want = x.reshape(1, 1, 2, 2, 2, 2).max(axis=(3, 5))
    assert (np.asarray(y) == want).all()


def test_pad_opset10_value_attr():
    """Pre-11 Pad carries the constant fill in the `value` ATTR (it used to
    be dropped → 0 fill, catastrophic for -1e9 attention-mask pads)."""
    x = np.ones((2, 2), np.float32)
    (y,) = run_op("Pad", {"x": x}, opset=10, mode="constant",
                  pads=[0, 1, 0, 1], value=-9.5)
    want = np.pad(x, [(0, 0), (1, 1)], constant_values=-9.5)
    assert_close(y, want, tol=0)


def test_hardmax_opset11_flattens_trailing_block():
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    (y,) = run_op("Hardmax", {"x": x}, opset=11, axis=1)
    flat = x.reshape(2, 12)
    want = np.zeros_like(flat)
    want[np.arange(2), flat.argmax(-1)] = 1.0
    assert_close(y, want.reshape(2, 3, 4), tol=0)
    # opset ≥ 13: per-axis argmax
    (y13,) = run_op("Hardmax", {"x": x}, opset=17, axis=1)
    assert_close(np.asarray(y13).sum(axis=1), np.ones((2, 4)), tol=0)


def test_gridsample_bicubic_raises():
    x = rng.standard_normal((1, 1, 4, 4)).astype(np.float32)
    grid = rng.uniform(-1, 1, (1, 2, 2, 2)).astype(np.float32)
    with pytest.raises(NotImplementedError, match="bicubic"):
        run_op("GridSample", {"x": x, "grid": grid}, mode="bicubic")


def test_random_like_dtype_attr():
    x = np.zeros((3, 3), np.float32)
    (u,) = run_op("RandomUniformLike", {"x": x}, dtype=10)  # float16
    assert np.asarray(u).dtype == np.float16
    (n,) = run_op("RandomNormalLike", {"x": x}, dtype=1)    # stays f32
    assert np.asarray(n).dtype == np.float32
