"""Second coverage battery: the emitters no other suite referenced by name
(audit: grep of op names over tests/). Each asserts the ONNX-spec formula
against a numpy oracle; the deliberate dynamic-shape errors assert their
guidance fires."""

import numpy as np
import pytest

from optest import assert_close, run_op

rng = np.random.default_rng(404)


def test_bool_logic_and_or_xor():
    a = rng.integers(0, 2, (3, 5)).astype(bool)
    b = rng.integers(0, 2, (3, 5)).astype(bool)
    assert (run_op("And", {"a": a, "b": b})[0].astype(bool) == (a & b)).all()
    assert (run_op("Or", {"a": a, "b": b})[0].astype(bool) == (a | b)).all()
    assert (run_op("Xor", {"a": a, "b": b})[0].astype(bool) == (a ^ b)).all()


def test_argmin():
    x = rng.standard_normal((4, 7)).astype(np.float32)
    (y,) = run_op("ArgMin", {"x": x}, axis=1, keepdims=0)
    assert (np.asarray(y).reshape(-1) == np.argmin(x, axis=1)).all()
    (yk,) = run_op("ArgMin", {"x": x}, axis=0, keepdims=1)
    assert (np.asarray(yk) == np.argmin(x, axis=0, keepdims=True)).all()


def test_greater_or_equal_less_or_equal():
    a = rng.standard_normal((2, 6)).astype(np.float32)
    b = rng.standard_normal((2, 6)).astype(np.float32)
    b[0, :3] = a[0, :3]  # exercise the equality boundary
    assert (run_op("GreaterOrEqual", {"a": a, "b": b})[0].astype(bool)
            == (a >= b)).all()
    assert (run_op("LessOrEqual", {"a": a, "b": b})[0].astype(bool)
            == (a <= b)).all()


def test_global_max_pool():
    x = rng.standard_normal((2, 3, 5, 4)).astype(np.float32)
    (y,) = run_op("GlobalMaxPool", {"x": x})
    assert_close(y, x.max(axis=(2, 3), keepdims=True), tol=1e-6)


def test_reduce_l1():
    x = rng.standard_normal((3, 4, 5)).astype(np.float32)
    (y,) = run_op("ReduceL1", {"x": x}, axes=[1], keepdims=1)
    assert_close(y, np.abs(x).sum(axis=1, keepdims=True), tol=1e-5)


def test_size():
    x = rng.standard_normal((3, 4, 5)).astype(np.float32)
    (y,) = run_op("Size", {"x": x})
    assert int(np.asarray(y)) == 60


def test_thresholded_relu():
    x = (rng.standard_normal(64) * 2).astype(np.float32)
    (y,) = run_op("ThresholdedRelu", {"x": x}, alpha=1.0)
    assert_close(y, np.where(x > 1.0, x, 0.0), tol=1e-6)


def test_lp_normalization():
    x = rng.standard_normal((4, 6)).astype(np.float32)
    (y2,) = run_op("LpNormalization", {"x": x}, axis=-1, p=2)
    assert_close(y2, x / np.linalg.norm(x, axis=-1, keepdims=True), tol=1e-5)
    (y1,) = run_op("LpNormalization", {"x": x}, axis=0, p=1)
    assert_close(y1, x / np.abs(x).sum(axis=0, keepdims=True), tol=1e-5)


def test_group_normalization():
    n, c, h, w, groups, eps = 2, 6, 3, 4, 3, 1e-5
    x = rng.standard_normal((n, c, h, w)).astype(np.float32)
    scale = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    (y,) = run_op("GroupNormalization", {"x": x},
                  initializers={"scale": scale, "bias": bias},
                  opset=21, epsilon=eps, num_groups=groups)
    g = x.reshape(n, groups, -1)
    norm = (g - g.mean(-1, keepdims=True)) / np.sqrt(
        g.var(-1, keepdims=True) + eps)
    want = norm.reshape(x.shape) * scale.reshape(1, c, 1, 1) \
        + bias.reshape(1, c, 1, 1)
    assert_close(y, want, tol=2e-4)


def test_rms_normalization():
    x = rng.standard_normal((3, 8)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    (y,) = run_op("RMSNormalization", {"x": x},
                  initializers={"scale": scale}, opset=23, epsilon=1e-5)
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * scale
    assert_close(y, want, tol=1e-5)


def test_conv_integer_matches_loop_oracle():
    x = rng.integers(0, 255, (1, 2, 5, 5)).astype(np.uint8)
    w = rng.integers(0, 255, (3, 2, 2, 2)).astype(np.uint8)
    xzp = np.uint8(120)
    wzp = np.uint8(128)
    (y,) = run_op("ConvInteger", {"x": x},
                  initializers={"w": w, "xzp": xzp, "wzp": wzp})
    xs = x.astype(np.int32) - 120
    ws = w.astype(np.int32) - 128
    want = np.zeros((1, 3, 4, 4), np.int64)
    for o in range(3):
        for i in range(4):
            for j in range(4):
                want[0, o, i, j] = (
                    xs[0, :, i : i + 2, j : j + 2] * ws[o]
                ).sum()
    assert (np.asarray(y).astype(np.int64) == want).all()


def test_upsample_nearest():
    x = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)
    scales = np.array([1.0, 1.0, 2.0, 2.0], np.float32)
    (y,) = run_op("Upsample", {"x": x}, initializers={"scales": scales},
                  opset=9, mode="nearest")
    want = x.repeat(2, axis=2).repeat(2, axis=3)
    assert_close(y, want, tol=1e-6)


def test_scatter_nd():
    data = rng.standard_normal((4, 5)).astype(np.float32)
    indices = np.array([[0], [2]], np.int64)
    updates = rng.standard_normal((2, 5)).astype(np.float32)
    (y,) = run_op("ScatterND", {"data": data},
                  initializers={"indices": indices, "updates": updates})
    want = data.copy()
    want[0] = updates[0]
    want[2] = updates[1]
    assert_close(y, want, tol=1e-6)


def test_random_ops_deterministic_and_in_range():
    """RNG ops can't match a cross-runtime oracle bit-for-bit; assert the
    contract instead: shape/dtype, seed determinism, range/moments."""
    from optest import run_graph
    from lele_tpu.onnx import builder as ob

    def uniform_run():
        nodes = [
            ob.node("RandomUniform", [], ["r"], shape=[64, 64],
                    low=2.0, high=5.0, seed=3.0),
            ob.node("Add", ["r", "d"], ["out"]),
        ]
        (y,) = run_graph(nodes, {"d": np.zeros((64, 64), np.float32)},
                         ["out"])
        return np.asarray(y)

    a, b = uniform_run(), uniform_run()
    assert a.shape == (64, 64) and (a == b).all()
    assert a.min() >= 2.0 and a.max() < 5.0

    nodes = [
        ob.node("RandomNormal", [], ["r"], shape=[128, 128],
                mean=1.0, scale=2.0, seed=7.0),
        ob.node("Add", ["r", "d"], ["out"]),
    ]
    (n,) = run_graph(nodes, {"d": np.zeros((128, 128), np.float32)}, ["out"])
    n = np.asarray(n)
    assert abs(float(n.mean()) - 1.0) < 0.1 and abs(float(n.std()) - 2.0) < 0.1

    x = np.zeros((32, 32), np.float32)
    (u,) = run_op("RandomUniformLike", {"x": x}, low=-1.0, high=1.0, seed=1.0)
    u = np.asarray(u)
    assert u.shape == x.shape and -1.0 <= u.min() and u.max() < 1.0


def test_nms_raises_with_guidance():
    boxes = np.zeros((1, 4, 4), np.float32)
    scores = np.zeros((1, 1, 4), np.float32)
    with pytest.raises(NotImplementedError, match="NMS-free"):
        run_op("NonMaxSuppression", {"boxes": boxes, "scores": scores})
