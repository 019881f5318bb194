"""com.microsoft QLinear* (QOperator format) vs literal numpy oracles.

Every oracle below implements the ORT contract directly in f64/f32 numpy
(dequant → float math → round-half-even requant with saturation), so the
emitters in ops/qlinear_ops.py are judged against an independent
derivation, not themselves.
"""

import numpy as np
import pytest

from optest import run_graph, run_op
from lele_tpu.onnx import builder as ob


def np_dq(x, s, zp):
    return (x.astype(np.float64) - np.float64(zp)) * np.float64(s)


def np_q(y, s, zp, qdt):
    info = np.iinfo(qdt)
    q = np.round(y / np.float64(s)) + np.float64(zp)
    return np.clip(q, info.min, info.max).astype(qdt)


def q8(rng, shape, qdt=np.uint8):
    info = np.iinfo(qdt)
    return rng.integers(info.min, info.max + 1, shape).astype(qdt)


@pytest.mark.parametrize("op_name,fn", [("QLinearAdd", np.add),
                                        ("QLinearMul", np.multiply)])
@pytest.mark.parametrize("qdt", [np.uint8, np.int8])
def test_qlinear_binary(op_name, fn, qdt):
    rng = np.random.default_rng(0)
    a, b = q8(rng, (2, 5), qdt), q8(rng, (2, 5), qdt)
    sa, za = np.float32(0.031), qdt(7)
    sb, zb = np.float32(0.053), qdt(3)
    sc, zc = np.float32(0.07), qdt(5)
    got = run_op(
        op_name, {"a": a, "b": b},
        initializers={"sa": sa, "za": za, "sb": sb, "zb": zb,
                      "sc": sc, "zc": zc},
        input_names=["a", "sa", "za", "b", "sb", "zb", "sc", "zc"],
        domain="com.microsoft")[0]
    want = np_q(fn(np_dq(a, sa, za), np_dq(b, sb, zb)), sc, zc, qdt)
    # f64 oracle vs f32 device math can disagree by one grid step at
    # exact .5 rounding boundaries — the ORT-documented contract is ±1
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_qlinear_add_broadcast():
    rng = np.random.default_rng(1)
    a, b = q8(rng, (2, 3, 4)), q8(rng, (4,))
    got = run_op(
        "QLinearAdd", {"a": a, "b": b},
        initializers={"sa": np.float32(0.02), "za": np.uint8(128),
                      "sb": np.float32(0.01), "zb": np.uint8(100),
                      "sc": np.float32(0.05), "zc": np.uint8(20)},
        input_names=["a", "sa", "za", "b", "sb", "zb", "sc", "zc"],
        domain="com.microsoft")[0]
    want = np_q(np_dq(a, 0.02, 128) + np_dq(b, 0.01, 100), 0.05, 20,
                np.uint8)
    np.testing.assert_array_equal(got, want)


def test_qlinear_sigmoid():
    rng = np.random.default_rng(2)
    x = q8(rng, (3, 7))
    got = run_op(
        "QLinearSigmoid", {"x": x},
        initializers={"sx": np.float32(0.05), "zx": np.uint8(128),
                      "sy": np.float32(1 / 256), "zy": np.uint8(0)},
        input_names=["x", "sx", "zx", "sy", "zy"],
        domain="com.microsoft")[0]
    sig = 1.0 / (1.0 + np.exp(-np_dq(x, 0.05, 128)))
    want = np_q(sig, 1 / 256, 0, np.uint8)
    # sigmoid curvature can land exactly between grid points; allow 1 ulp
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_qlinear_leaky_relu():
    rng = np.random.default_rng(3)
    x = q8(rng, (4, 4), np.int8)
    got = run_op(
        "QLinearLeakyRelu", {"x": x},
        initializers={"sx": np.float32(0.04), "zx": np.int8(3),
                      "sy": np.float32(0.04), "zy": np.int8(3)},
        input_names=["x", "sx", "zx", "sy", "zy"],
        domain="com.microsoft", alpha=0.1)[0]
    xf = np_dq(x, 0.04, 3)
    want = np_q(np.where(xf < 0, 0.1 * xf, xf), 0.04, 3, np.int8)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("sem,axis", [(13, -1), (13, 1), (11, 1)])
def test_qlinear_softmax(sem, axis):
    rng = np.random.default_rng(4)
    x = q8(rng, (2, 3, 4))
    # the node's `opset` ATTRIBUTE shares its name with run_op's
    # model-opset parameter — build the node explicitly
    node = ob.node("QLinearSoftmax", ["x", "sx", "zx", "sy", "zy"],
                   ["y"], domain="com.microsoft", axis=axis, opset=sem)
    got = run_graph(
        [node], {"x": x}, ["y"],
        initializers={"sx": np.float32(0.05), "zx": np.uint8(128),
                      "sy": np.float32(1 / 256), "zy": np.uint8(0)})[0]
    xf = np_dq(x, 0.05, 128)
    if sem >= 13:
        s = xf - xf.max(axis=axis, keepdims=True)
        e = np.exp(s)
        sm = e / e.sum(axis=axis, keepdims=True)
    else:
        flat = xf.reshape(2, -1)
        e = np.exp(flat - flat.max(-1, keepdims=True))
        sm = (e / e.sum(-1, keepdims=True)).reshape(xf.shape)
    want = np_q(sm, 1 / 256, 0, np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize("channels_last", [0, 1])
def test_qlinear_average_pool(channels_last):
    rng = np.random.default_rng(5)
    x = q8(rng, (1, 3, 6, 6) if not channels_last else (1, 6, 6, 3))
    got = run_op(
        "QLinearAveragePool", {"x": x},
        initializers={"sx": np.float32(0.1), "zx": np.uint8(128),
                      "sy": np.float32(0.1), "zy": np.uint8(128)},
        input_names=["x", "sx", "zx", "sy", "zy"],
        domain="com.microsoft", kernel_shape=[2, 2], strides=[2, 2],
        channels_last=channels_last)[0]
    xf = np_dq(x, 0.1, 128)
    if channels_last:
        xf = xf.transpose(0, 3, 1, 2)
    n, c, h, w = xf.shape
    pooled = xf.reshape(n, c, h // 2, 2, w // 2, 2).mean((3, 5))
    if channels_last:
        pooled = pooled.transpose(0, 2, 3, 1)
    want = np_q(pooled, 0.1, 128, np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize("channels_last", [0, 1])
def test_qlinear_global_average_pool(channels_last):
    rng = np.random.default_rng(6)
    x = q8(rng, (2, 4, 5, 5) if not channels_last else (2, 5, 5, 4))
    got = run_op(
        "QLinearGlobalAveragePool", {"x": x},
        initializers={"sx": np.float32(0.07), "zx": np.uint8(100),
                      "sy": np.float32(0.03), "zy": np.uint8(90)},
        input_names=["x", "sx", "zx", "sy", "zy"],
        domain="com.microsoft", channels_last=channels_last)[0]
    xf = np_dq(x, 0.07, 100)
    axes = (1, 2) if channels_last else (2, 3)
    want = np_q(xf.mean(axes, keepdims=True), 0.03, 90, np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_qlinear_concat():
    rng = np.random.default_rng(7)
    xs = [q8(rng, (2, k)) for k in (2, 3, 4)]
    scales = [np.float32(s) for s in (0.02, 0.05, 0.013)]
    zps = [np.uint8(z) for z in (10, 128, 200)]
    names, inits, dyn = ["ys", "yz"], {"ys": np.float32(0.04),
                                       "yz": np.uint8(64)}, {}
    for i, (x, s, z) in enumerate(zip(xs, scales, zps)):
        dyn[f"x{i}"] = x
        inits[f"s{i}"] = s
        inits[f"z{i}"] = z
        names += [f"x{i}", f"s{i}", f"z{i}"]
    got = run_op("QLinearConcat", dyn, initializers=inits,
                 input_names=names, domain="com.microsoft", axis=1)[0]
    parts = [np_dq(x, s, z) for x, s, z in zip(xs, scales, zps)]
    want = np_q(np.concatenate(parts, 1), 0.04, 64, np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize("quant_out", [False, True])
@pytest.mark.parametrize("transB", [0, 1])
def test_qgemm(quant_out, transB):
    rng = np.random.default_rng(8)
    M, K, N = 3, 6, 5
    a = q8(rng, (M, K))
    b = q8(rng, (N, K) if transB else (K, N), np.int8)
    c = rng.integers(-500, 500, (N,)).astype(np.int32)
    sa, za = np.float32(0.02), np.uint8(120)
    sb = (rng.random(N).astype(np.float32) * 0.05 + 0.01)  # per-column
    zb = np.zeros(N, np.int8)
    alpha = 0.5
    ins = ["a", "sa", "za", "b", "sb", "zb", "c"]
    inits = {"sa": sa, "za": za, "b": b, "sb": sb, "zb": zb, "c": c}
    if quant_out:
        ins += ["sy", "zy"]
        inits["sy"] = np.float32(0.08)
        inits["zy"] = np.uint8(30)
    got = run_op("QGemm", {"a": a}, initializers=inits, input_names=ins,
                 domain="com.microsoft", alpha=alpha, transB=transB)[0]
    bm = b.T if transB else b
    acc = (a.astype(np.int64) - 120) @ bm.astype(np.int64) + c
    yf = acc.astype(np.float64) * (alpha * 0.02 * sb.astype(np.float64))
    if quant_out:
        want = np_q(yf, 0.08, 30, np.uint8)
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(got, yf.astype(np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_matmul_integer_to_float():
    rng = np.random.default_rng(9)
    M, K, N = 4, 7, 3
    a = q8(rng, (M, K))
    b = q8(rng, (K, N), np.int8)
    sa, za = np.float32(0.03), np.uint8(131)
    sb = (rng.random(N).astype(np.float32) * 0.1 + 0.01)
    zb = rng.integers(-5, 5, N).astype(np.int8)
    bias = rng.standard_normal(N).astype(np.float32)
    got = run_op(
        "MatMulIntegerToFloat", {"a": a},
        initializers={"b": b, "sa": sa, "sb": sb, "za": za, "zb": zb,
                      "bias": bias},
        input_names=["a", "b", "sa", "sb", "za", "zb", "bias"],
        domain="com.microsoft")[0]
    acc = (a.astype(np.int64) - 131) @ (b.astype(np.int64) - zb.astype(np.int64))
    want = acc * (0.03 * sb.astype(np.float64)) + bias
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-5, atol=1e-5)


def test_dynamic_quantize_matmul():
    rng = np.random.default_rng(10)
    M, K, N = 3, 8, 4
    a = (rng.standard_normal((M, K)) * 2).astype(np.float32)
    b = q8(rng, (K, N), np.int8)
    sb = np.float32(0.02)
    zb = np.int8(3)
    bias = rng.standard_normal(N).astype(np.float32)
    got = run_op(
        "DynamicQuantizeMatMul", {"a": a},
        initializers={"b": b, "sb": sb, "zb": zb, "bias": bias},
        input_names=["a", "b", "sb", "zb", "bias"],
        domain="com.microsoft")[0]
    # literal DynamicQuantizeLinear oracle (f32 division, half-even)
    xmin = np.float32(min(a.min(), 0.0))
    xmax = np.float32(max(a.max(), 0.0))
    sc = np.float32((xmax - xmin) / np.float32(255.0))
    safe = sc if sc != 0 else np.float32(1.0)
    zpf = np.round(np.clip(-xmin / safe, 0.0, 255.0)).astype(np.float32)
    q = np.clip(np.round((a / safe).astype(np.float32)) + zpf,
                0, 255).astype(np.uint8)
    acc = (q.astype(np.int64) - int(zpf)) @ (b.astype(np.int64) - 3)
    want = acc * (float(sc) * 0.02) + bias
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-4, atol=1e-4)


def test_qoperator_chain():
    """A QOperator-format micro-CNN block the ORT quantizer emits:
    QLinearConv → QLinearLeakyRelu → QLinearGlobalAveragePool →
    QLinearAdd (residual), all in one graph — the integration the
    per-op tests above can't see."""
    rng = np.random.default_rng(11)
    x = q8(rng, (1, 2, 4, 4))
    w = rng.integers(-60, 60, (2, 2, 1, 1)).astype(np.int8)
    nodes = [
        ob.node("QLinearConv",
                ["x", "sx", "zx", "w", "sw", "zw", "sc", "zc"], ["c"]),
        ob.node("QLinearLeakyRelu", ["c", "sc", "zc", "sr", "zr"], ["r"],
                domain="com.microsoft", alpha=0.01),
        ob.node("QLinearGlobalAveragePool",
                ["r", "sr", "zr", "sp", "zp"], ["p"],
                domain="com.microsoft"),
        ob.node("QLinearAdd",
                ["p", "sp", "zp", "res", "sres", "zres", "sy", "zy"],
                ["y"], domain="com.microsoft"),
    ]
    res = q8(rng, (1, 2, 1, 1))
    scalars = dict(
        sx=np.float32(0.05), zx=np.uint8(128),
        sw=np.float32(0.01), zw=np.int8(0),
        sc=np.float32(0.04), zc=np.uint8(110),
        sr=np.float32(0.04), zr=np.uint8(110),
        sp=np.float32(0.02), zp=np.uint8(128),
        sres=np.float32(0.03), zres=np.uint8(90),
        sy=np.float32(0.05), zy=np.uint8(100),
    )
    got = run_graph(nodes, {"x": x}, ["y"],
                    initializers={"w": w, "res": res, **scalars})[0]
    # oracle, step by step
    acc = np.einsum("nchw,oc->nohw", x.astype(np.int64) - 128,
                    w[:, :, 0, 0].astype(np.int64))
    cq = np_q(acc * (0.05 * 0.01), 0.04, 110, np.uint8)
    rf = np_dq(cq, 0.04, 110)
    rf = np.where(rf < 0, 0.01 * rf, rf)
    rq = np_q(rf, 0.04, 110, np.uint8)
    pq = np_q(np_dq(rq, 0.04, 110).mean((2, 3), keepdims=True),
              0.02, 128, np.uint8)
    want = np_q(np_dq(pq, 0.02, 128) + np_dq(res, 0.03, 90),
                0.05, 100, np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
