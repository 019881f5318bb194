"""Kernel accuracy suite: elementwise / reductions / matmul / quantization.

Port of the reference's tests/kernel_accuracy.rs (17 tests, :27-394) and the
op list of tests/verify_kernels_with_ort.py (:46-440), asserted against
numpy oracles with ONNX semantics.
"""

import numpy as np
import pytest

from optest import assert_close, run_graph, run_op

rng = np.random.default_rng(42)


# -- binary elementwise ------------------------------------------------------


def test_add_broadcast():
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    (y,) = run_op("Add", {"a": a, "b": b})
    assert_close(y, a + b)


def test_sub_mul():
    a = rng.standard_normal((5, 1)).astype(np.float32)
    b = rng.standard_normal((1, 7)).astype(np.float32)
    assert_close(run_op("Sub", {"a": a, "b": b})[0], a - b)
    assert_close(run_op("Mul", {"a": a, "b": b})[0], a * b)


def test_div_float_and_int_trunc():
    a = rng.standard_normal((8,)).astype(np.float32) * 10
    b = (rng.standard_normal((8,)).astype(np.float32) + 2.5)
    assert_close(run_op("Div", {"a": a, "b": b})[0], a / b, tol=1e-4)
    ai = np.array([7, -7, 6, -6], dtype=np.int32)
    bi = np.array([2, 2, -4, -4], dtype=np.int32)
    (y,) = run_op("Div", {"a": ai, "b": bi})
    np.testing.assert_array_equal(y, np.array([3, -3, -1, 1]))  # trunc toward 0


def test_mod_and_fmod():
    a = np.array([5.0, -5.0, 5.0, -5.0], dtype=np.float32)
    b = np.array([3.0, 3.0, -3.0, -3.0], dtype=np.float32)
    assert_close(run_op("Mod", {"a": a, "b": b})[0], np.mod(a, b))
    assert_close(run_op("Mod", {"a": a, "b": b}, fmod=1)[0], np.fmod(a, b))


def test_pow_keeps_base_dtype():
    a = np.abs(rng.standard_normal((4,))).astype(np.float32) + 0.5
    b = np.array(2, dtype=np.int64)
    (y,) = run_op("Pow", {"a": a}, initializers={"b": b})
    assert y.dtype == np.float32
    assert_close(y, a**2, tol=1e-5)


def test_min_max_variadic():
    xs = {f"x{i}": rng.standard_normal((3, 3)).astype(np.float32) for i in range(3)}
    (y,) = run_op("Max", xs)
    assert_close(y, np.maximum.reduce(list(xs.values())))
    (y,) = run_op("Min", xs)
    assert_close(y, np.minimum.reduce(list(xs.values())))


def test_clip_inputs_and_attrs():
    x = rng.standard_normal((10,)).astype(np.float32) * 3
    lo, hi = np.float32(-1.0), np.float32(2.0)
    (y,) = run_op("Clip", {"x": x}, initializers={"lo": lo, "hi": hi})
    assert_close(y, np.clip(x, -1, 2))
    (y,) = run_op("Clip", {"x": x}, opset=6, min=-1.0, max=2.0)
    assert_close(y, np.clip(x, -1, 2))


def test_prelu():
    x = rng.standard_normal((2, 4)).astype(np.float32)
    slope = np.float32(0.25) * np.ones((4,), np.float32)
    (y,) = run_op("PRelu", {"x": x}, initializers={"s": slope})
    assert_close(y, np.where(x < 0, 0.25 * x, x))


# -- unary -------------------------------------------------------------------


def test_unary_suite():
    x = (np.abs(rng.standard_normal((16,))) + 0.1).astype(np.float32)
    for op, fn in [
        ("Sqrt", np.sqrt), ("Exp", np.exp), ("Log", np.log),
        ("Neg", np.negative), ("Abs", np.abs), ("Floor", np.floor),
        ("Ceil", np.ceil), ("Round", np.round),
    ]:
        assert_close(run_op(op, {"x": x})[0], fn(x), tol=1e-4)
    xs = rng.standard_normal((16,)).astype(np.float32)
    assert_close(run_op("Sin", {"x": xs})[0], np.sin(xs), tol=1e-5)
    assert_close(run_op("Cos", {"x": xs})[0], np.cos(xs), tol=1e-5)
    assert_close(
        run_op("Reciprocal", {"x": x})[0], 1.0 / x, tol=1e-4
    )


def test_erf_and_softplus():
    from scipy.special import erf as sp_erf

    x = rng.standard_normal((32,)).astype(np.float32) * 2
    assert_close(run_op("Erf", {"x": x})[0], sp_erf(x.astype(np.float64)), tol=1e-5)
    assert_close(
        run_op("Softplus", {"x": x})[0],
        np.log1p(np.exp(x.astype(np.float64))),
        tol=1e-4,  # f32 exp/log1p ulps
    )


# -- comparisons -------------------------------------------------------------


def test_comparisons_and_logic():
    a = rng.standard_normal((6,)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    np.testing.assert_array_equal(run_op("Equal", {"a": a, "b": a})[0], np.ones(6, bool))
    np.testing.assert_array_equal(run_op("Less", {"a": a, "b": b})[0], a < b)
    np.testing.assert_array_equal(run_op("Greater", {"a": a, "b": b})[0], a > b)
    c = a < 0
    np.testing.assert_array_equal(run_op("Not", {"c": c})[0], ~c)


def test_where():
    c = rng.integers(0, 2, (3, 4)).astype(bool)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((3, 4)).astype(np.float32)
    assert_close(run_op("Where", {"c": c, "a": a, "b": b})[0], np.where(c, a, b))


# -- reductions --------------------------------------------------------------


def test_reduce_sum_axes_input_opset13():
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    (y,) = run_op(
        "ReduceSum", {"x": x}, initializers={"axes": np.array([1], np.int64)},
        keepdims=1,
    )
    assert_close(y, x.sum(axis=1, keepdims=True), tol=1e-5)


def test_reduce_mean_max_min_attr_axes():
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    assert_close(
        run_op("ReduceMean", {"x": x}, axes=[0, 2], keepdims=0)[0],
        x.mean(axis=(0, 2)),
        tol=1e-5,
    )
    assert_close(run_op("ReduceMax", {"x": x}, keepdims=1)[0], x.max(keepdims=True).reshape(1, 1, 1))
    assert_close(run_op("ReduceMin", {"x": x}, axes=[-1], keepdims=0)[0], x.min(axis=-1))


def test_reduce_l2():
    x = rng.standard_normal((3, 5)).astype(np.float32)
    assert_close(
        run_op("ReduceL2", {"x": x}, axes=[1], keepdims=0)[0],
        np.sqrt((x.astype(np.float64) ** 2).sum(axis=1)),
        tol=1e-5,
    )


def test_cumsum():
    x = rng.standard_normal((4, 5)).astype(np.float32)
    (y,) = run_op("CumSum", {"x": x}, initializers={"axis": np.array(1, np.int64)})
    assert_close(y, np.cumsum(x, axis=1), tol=1e-5)


# -- matmul family -----------------------------------------------------------


def test_matmul_2d_and_batched():
    a = rng.standard_normal((4, 8)).astype(np.float32)
    b = rng.standard_normal((8, 5)).astype(np.float32)
    assert_close(run_op("MatMul", {"a": a, "b": b})[0], a @ b, tol=1e-4)
    a3 = rng.standard_normal((3, 4, 8)).astype(np.float32)
    b3 = rng.standard_normal((3, 8, 5)).astype(np.float32)
    assert_close(run_op("MatMul", {"a": a3, "b": b3})[0], a3 @ b3, tol=1e-4)
    # vector cases follow numpy semantics
    v = rng.standard_normal((8,)).astype(np.float32)
    assert_close(run_op("MatMul", {"a": a, "b": v})[0], a @ v, tol=1e-4)


def test_gemm_full():
    a = rng.standard_normal((6, 4)).astype(np.float32)
    b = rng.standard_normal((5, 6)).astype(np.float32)
    c = rng.standard_normal((5,)).astype(np.float32)
    (y,) = run_op(
        "Gemm", {"a": a, "b": b, "c": c}, alpha=0.5, beta=2.0, transA=1, transB=1
    )
    assert_close(y, 0.5 * (a.T @ b.T) + 2.0 * c, tol=1e-4)


def test_einsum():
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((2, 4, 5)).astype(np.float32)
    (y,) = run_op("Einsum", {"a": a, "b": b}, equation="bij,bjk->bik")
    assert_close(y, np.einsum("bij,bjk->bik", a, b), tol=1e-4)


# -- softmax / argmax --------------------------------------------------------


def _softmax_np(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def test_softmax_opset13():
    x = rng.standard_normal((2, 5, 7)).astype(np.float32)
    assert_close(run_op("Softmax", {"x": x})[0], _softmax_np(x, -1), tol=1e-5)
    assert_close(run_op("Softmax", {"x": x}, axis=1)[0], _softmax_np(x, 1), tol=1e-5)


def test_softmax_opset11_flatten_semantics():
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    (y,) = run_op("Softmax", {"x": x}, opset=11, axis=1)
    flat = x.reshape(2, 12)
    assert_close(y, _softmax_np(flat, -1).reshape(2, 3, 4), tol=1e-5)


def test_argmax_variants():
    x = np.array([[1.0, 3.0, 3.0, 2.0]], dtype=np.float32)
    np.testing.assert_array_equal(run_op("ArgMax", {"x": x}, axis=1, keepdims=0)[0], [1])
    np.testing.assert_array_equal(
        run_op("ArgMax", {"x": x}, axis=1, keepdims=0, select_last_index=1)[0], [2]
    )
    np.testing.assert_array_equal(
        run_op("ArgMax", {"x": x}, axis=1)[0], [[1]]
    )


# -- quantization ------------------------------------------------------------


def test_dynamic_quantize_linear_spec_example():
    # worked example in the ONNX spec style
    x = np.array([0.0, 2.0, -3.0, -2.5, 1.34, 0.5], dtype=np.float32)
    y, scale, zp = run_op("DynamicQuantizeLinear", {"x": x}, n_outputs=3)
    want_scale = (2.0 - (-3.0)) / 255.0
    assert_close(scale, want_scale, tol=1e-7)
    want_zp = np.round(np.clip(3.0 / want_scale, 0, 255))
    assert zp == want_zp
    # the -2.5/scale element sits exactly on a .5 rounding boundary, where
    # runtimes legitimately differ by one quantization step (XLA lowers x/s
    # to x*(1/s)); allow ±1 there, exact elsewhere
    q = np.round((x / np.float32(want_scale)).astype(np.float32))
    want_y = np.clip(q + want_zp, 0, 255).astype(np.uint8)
    diff = np.abs(y.astype(int) - want_y.astype(int))
    assert diff.max() <= 1 and (diff > 0).sum() <= 1, (y, want_y)


def test_dynamic_quantize_all_zero():
    x = np.zeros(8, np.float32)
    y, scale, zp = run_op("DynamicQuantizeLinear", {"x": x}, n_outputs=3)
    np.testing.assert_array_equal(y, np.zeros(8, np.uint8))


def test_matmul_integer_worked_example():
    # mirrors the style of kernel_accuracy.rs:52-97 with our own numbers
    a = np.array([[11, 7, 3], [10, 6, 2], [9, 5, 1], [8, 4, 0]], dtype=np.uint8)
    b = np.array([[1, 4], [2, 5], [3, 6]], dtype=np.uint8)
    azp = np.uint8(12)
    bzp = np.uint8(0)
    (y,) = run_op(
        "MatMulInteger",
        {"a": a, "b": b},
        initializers={"azp": azp, "bzp": bzp},
    )
    want = (a.astype(np.int32) - 12) @ b.astype(np.int32)
    np.testing.assert_array_equal(y, want)


def test_matmul_integer_i8_per_tensor():
    a = rng.integers(-128, 127, (6, 9)).astype(np.int8)
    b = rng.integers(-128, 127, (9, 4)).astype(np.int8)
    azp = np.int8(3)
    bzp = np.int8(-5)
    (y,) = run_op(
        "MatMulInteger", {"a": a, "b": b}, initializers={"azp": azp, "bzp": bzp}
    )
    want = (a.astype(np.int32) - 3) @ (b.astype(np.int32) + 5)
    np.testing.assert_array_equal(y, want)


def test_quantize_dequantize_roundtrip():
    x = rng.standard_normal((4, 8)).astype(np.float32)
    scale = np.float32(0.05)
    zp = np.uint8(128)
    (q,) = run_op("QuantizeLinear", {"x": x}, initializers={"s": scale, "z": zp})
    want_q = np.clip(np.round(x / 0.05) + 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(q, want_q)
    (dq,) = run_op("DequantizeLinear", {"q": q}, initializers={"s": scale, "z": zp})
    assert_close(dq, (want_q.astype(np.float32) - 128) * 0.05, tol=1e-6)


def test_dequantize_per_axis():
    q = rng.integers(0, 255, (3, 4)).astype(np.uint8)
    scale = np.array([0.1, 0.2, 0.3], dtype=np.float32)
    zp = np.array([1, 2, 3], dtype=np.uint8)
    (dq,) = run_op(
        "DequantizeLinear", {"q": q}, initializers={"s": scale, "z": zp}, axis=0
    )
    want = (q.astype(np.float32) - zp[:, None]) * scale[:, None]
    assert_close(dq, want, tol=1e-6)


def test_fused_dql_matmul_chain_pattern():
    """DQL→MatMulInteger→Cast→Mul chain matches the fused path and stays
    numerically identical to the unfused ops."""
    from lele_tpu.onnx import builder as ob

    x = rng.standard_normal((7, 320)).astype(np.float32)
    w = rng.integers(0, 255, (320, 48)).astype(np.uint8)
    wzp = np.uint8(131)
    wscale = np.float32(0.021)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w", "azp", "wzp"], ["mm"]),
        ob.node("Cast", ["mm"], ["mmf"], to=1),
        ob.node("Mul", ["ascale", "wscale"], ["scale2"]),
        ob.node("Mul", ["mmf", "scale2"], ["y"]),
    ]
    (y,) = run_graph(
        nodes,
        {"x": x},
        ["y"],
        initializers={"w": w, "wzp": wzp, "wscale": wscale},
    )
    # oracle: plain ONNX semantics
    scale = (max(x.max(), 0) - min(x.min(), 0)) / 255.0
    zp = np.round(np.clip(-min(x.min(), 0) / scale, 0, 255))
    q = np.clip(np.round(x / scale) + zp, 0, 255).astype(np.int32)
    mm = (q - int(zp)) @ (w.astype(np.int32) - 131)
    want = mm.astype(np.float32) * (scale * 0.021)
    assert_close(y, want, tol=np.abs(want).max() * 1e-5 + 1e-5)


def test_qlinear_matmul():
    a = rng.integers(0, 255, (5, 8)).astype(np.uint8)
    b = rng.integers(0, 255, (8, 6)).astype(np.uint8)
    inits = {
        "as_": np.float32(0.02), "az": np.uint8(120),
        "bs": np.float32(0.05), "bz": np.uint8(128),
        "ys": np.float32(0.1), "yz": np.uint8(100),
    }
    (y,) = run_op(
        "QLinearMatMul", {"a": a, "b": b}, input_names=[
            "a", "as_", "az", "b", "bs", "bz", "ys", "yz"],
        initializers=inits,
    )
    acc = (a.astype(np.int64) - 120) @ (b.astype(np.int64) - 128)
    want = np.clip(np.round(acc * (0.02 * 0.05 / 0.1)) + 100, 0, 255)
    diff = np.abs(y.astype(np.int64) - want.astype(np.int64))
    assert diff.max() <= 1  # .5-boundary rounding tolerance


def test_qlinear_conv_per_channel():
    x = rng.integers(0, 255, (1, 2, 6, 6)).astype(np.uint8)
    w = rng.integers(-127, 127, (3, 2, 3, 3)).astype(np.int8)
    b = rng.integers(-1000, 1000, (3,)).astype(np.int32)
    ws = np.array([0.01, 0.02, 0.03], np.float32)
    inits = {
        "xs": np.float32(0.04), "xz": np.uint8(128),
        "w": w, "wsc": ws, "wz": np.int8(0),
        "ys": np.float32(0.2), "yz": np.uint8(110), "b": b,
    }
    (y,) = run_op(
        "QLinearConv", {"x": x}, input_names=[
            "x", "xs", "xz", "w", "wsc", "wz", "ys", "yz", "b"],
        initializers=inits, pads=[1, 1, 1, 1],
    )
    # int oracle: naive conv over (x-128)*(w-0), + bias, requant per channel
    xi = x.astype(np.int64) - 128
    xp_ = np.pad(xi, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = np.zeros((1, 3, 6, 6), np.int64)
    for co in range(3):
        for ci in range(2):
            for oy in range(6):
                for ox in range(6):
                    acc[0, co, oy, ox] += (
                        xp_[0, ci, oy:oy+3, ox:ox+3] * w[co, ci].astype(np.int64)
                    ).sum()
    acc += b[None, :, None, None]
    want = np.clip(
        np.round(acc * (0.04 * ws[None, :, None, None] / 0.2)) + 110, 0, 255
    )
    diff = np.abs(y.astype(np.int64) - want.astype(np.int64))
    assert diff.max() <= 1
