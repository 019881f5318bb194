"""Round-5 contrib tail: the ORT graph-optimizer fused family
(FusedConv/FusedGemm/ConvTransposeWithDynamicPads/BiasSoftmax/
RelativePositionBias), the quantized-attention QOperator twin
(QAttention), and the 4-bit storage gathers (GatherBlockQuantized,
MatMulBnb4) — all vs literal numpy/scipy-style oracles built
independently of the emitters."""

import numpy as np
import pytest

from optest import run_op


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _ref_conv2d(x, w, b=None, stride=1, pad=0):
    bsz, cin, h, wd = x.shape
    cout, _, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((bsz, cout, oh, ow), np.float32)
    for n in range(bsz):
        for co in range(cout):
            for i in range(oh):
                for j in range(ow):
                    patch = xp[n, :, i * stride:i * stride + kh,
                               j * stride:j * stride + kw]
                    out[n, co, i, j] = (patch * w[co]).sum()
            if b is not None:
                out[n, co] += b[co]
    return out


# -- FusedConv ---------------------------------------------------------------


def test_fused_conv_relu():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 6, 6)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    got = run_op("FusedConv", {"x": x}, initializers={"w": w, "b": b},
                 input_names=["x", "w", "b"], domain="com.microsoft",
                 activation="Relu", kernel_shape=[3, 3],
                 pads=[1, 1, 1, 1])[0]
    want = np.maximum(_ref_conv2d(x, w, b, pad=1), 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_conv_residual_z_then_activation():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    w = rng.standard_normal((2, 2, 3, 3)).astype(np.float32)
    conv = _ref_conv2d(x, w, pad=1)
    z = rng.standard_normal(conv.shape).astype(np.float32)
    got = run_op("FusedConv", {"x": x, "z": z}, initializers={"w": w},
                 input_names=["x", "w", "", "z"], domain="com.microsoft",
                 activation="Relu", kernel_shape=[3, 3],
                 pads=[1, 1, 1, 1])[0]
    np.testing.assert_allclose(got, np.maximum(conv + z, 0),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv_leaky_relu_params():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    w = rng.standard_normal((3, 2, 1, 1)).astype(np.float32)
    got = run_op("FusedConv", {"x": x}, initializers={"w": w},
                 input_names=["x", "w"], domain="com.microsoft",
                 activation="LeakyRelu", activation_params=[0.3],
                 kernel_shape=[1, 1])[0]
    y = _ref_conv2d(x, w)
    np.testing.assert_allclose(got, np.where(y >= 0, y, 0.3 * y),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_hard_sigmoid_and_clip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    w = rng.standard_normal((2, 2, 1, 1)).astype(np.float32)
    y = _ref_conv2d(x, w)
    got = run_op("FusedConv", {"x": x}, initializers={"w": w},
                 input_names=["x", "w"], domain="com.microsoft",
                 activation="HardSigmoid", activation_params=[0.4, 0.6],
                 kernel_shape=[1, 1])[0]
    np.testing.assert_allclose(got, np.clip(0.4 * y + 0.6, 0, 1),
                               rtol=1e-5, atol=1e-5)
    got = run_op("FusedConv", {"x": x}, initializers={"w": w},
                 input_names=["x", "w"], domain="com.microsoft",
                 activation="Clip", activation_params=[-0.5, 0.5],
                 kernel_shape=[1, 1])[0]
    np.testing.assert_allclose(got, np.clip(y, -0.5, 0.5),
                               rtol=1e-5, atol=1e-5)


# -- FusedGemm ---------------------------------------------------------------


def test_fused_gemm_relu_transb():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((3, 5)).astype(np.float32)
    b = rng.standard_normal((4, 5)).astype(np.float32)
    c = rng.standard_normal(4).astype(np.float32)
    got = run_op("FusedGemm", {"a": a}, initializers={"b": b, "c": c},
                 input_names=["a", "b", "c"], domain="com.microsoft",
                 transB=1, alpha=0.5, activation="Relu")[0]
    np.testing.assert_allclose(got, np.maximum(0.5 * (a @ b.T) + c, 0),
                               rtol=1e-5, atol=1e-5)


def test_fused_gemm_leaky_relu_alpha_attr():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((2, 3)).astype(np.float32)
    b = rng.standard_normal((3, 4)).astype(np.float32)
    got = run_op("FusedGemm", {"a": a}, initializers={"b": b},
                 input_names=["a", "b"], domain="com.microsoft",
                 activation="LeakyRelu", activation_alpha=0.2)[0]
    y = a @ b
    np.testing.assert_allclose(got, np.where(y >= 0, y, 0.2 * y),
                               rtol=1e-5, atol=1e-5)


# -- ConvTransposeWithDynamicPads -------------------------------------------


def test_conv_transpose_dynamic_pads_matches_static():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    w = rng.standard_normal((2, 3, 3, 3)).astype(np.float32)
    pads = np.array([1, 1, 1, 1], np.int64)
    got = run_op("ConvTransposeWithDynamicPads", {"x": x},
                 initializers={"w": w, "pads": pads},
                 input_names=["x", "w", "pads"], domain="com.microsoft",
                 strides=[2, 2])[0]
    want = run_op("ConvTranspose", {"x": x}, initializers={"w": w},
                  input_names=["x", "w"], strides=[2, 2],
                  pads=[1, 1, 1, 1])[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# -- BiasSoftmax --------------------------------------------------------------


def test_bias_softmax_full_shape():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    b = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    got = run_op("BiasSoftmax", {"x": x, "b": b}, domain="com.microsoft",
                 axis=3, is_inner_broadcast=0)[0]
    np.testing.assert_allclose(got, _softmax(x + b), rtol=1e-5, atol=1e-6)


def test_bias_softmax_inner_broadcast():
    # scores [B,H,S,S], bias varies per batch, shared across heads+rows:
    # row i of the [N, D] view adds bias row i // (N // Nb)
    rng = np.random.default_rng(8)
    bsz, h, s = 2, 3, 4
    x = rng.standard_normal((bsz, h, s, s)).astype(np.float32)
    b = rng.standard_normal((bsz, 1, 1, s)).astype(np.float32)
    got = run_op("BiasSoftmax", {"x": x, "b": b}, domain="com.microsoft",
                 axis=3, is_inner_broadcast=1)[0]
    want = _softmax(x + b)  # numpy broadcast equals the inner rule here
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bias_softmax_outer_broadcast():
    # bias shared across the leading batch: row i adds bias row i % Nb
    rng = np.random.default_rng(9)
    bsz, h, s = 2, 3, 4
    x = rng.standard_normal((bsz, h, s, s)).astype(np.float32)
    b = rng.standard_normal((1, h, s, s)).astype(np.float32)
    got = run_op("BiasSoftmax", {"x": x, "b": b}, domain="com.microsoft",
                 axis=3, is_inner_broadcast=0)[0]
    np.testing.assert_allclose(got, _softmax(x + b), rtol=1e-5, atol=1e-6)


def test_bias_softmax_axis_flattens_tail():
    # axis=2 on [2,3,4,5]: softmax normalizes over the flattened 4*5 tail
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    b = rng.standard_normal((1, 3, 4, 5)).astype(np.float32)
    got = run_op("BiasSoftmax", {"x": x, "b": b}, domain="com.microsoft",
                 axis=2, is_inner_broadcast=0)[0]
    y = (x + b).reshape(6, 20)
    want = _softmax(y).reshape(2, 3, 4, 5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# -- RelativePositionBias ------------------------------------------------------


def _t5_bucket(rel, num_buckets, max_distance, bidirectional):
    """Independent oracle: HF T5Attention._relative_position_bucket."""
    ret = np.zeros_like(rel)
    n = num_buckets
    if bidirectional:
        n //= 2
        ret += (rel > 0).astype(np.int64) * n
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
        / np.log(max_distance / max_exact) * (n - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, n - 1)
    return ret + np.where(is_small, rel, large)


@pytest.mark.parametrize("bidir", [0, 1])
def test_relative_position_bias(bidir):
    rng = np.random.default_rng(11)
    num_buckets, heads, q, k = 32, 4, 6, 9
    table = rng.standard_normal((num_buckets, heads)).astype(np.float32)
    got = run_op(
        "RelativePositionBias", {},
        initializers={"t": table,
                      "q": np.array(q, np.int64),
                      "k": np.array(k, np.int64)},
        input_names=["t", "q", "k"], domain="com.microsoft",
        max_distance=128, is_bidirectional=bidir)[0]
    rel = np.arange(k)[None, :] - np.arange(q)[:, None]
    bucket = _t5_bucket(rel, num_buckets, 128, bidir)
    want = table[bucket].transpose(2, 0, 1)[None]
    assert got.shape == (1, heads, q, k)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# -- QAttention ----------------------------------------------------------------


def _ref_attention(qkv, heads, mask_lens=None, unidirectional=False):
    bsz, s, h3 = qkv.shape
    dh = h3 // 3 // heads
    q, k, v = np.split(qkv, 3, axis=-1)

    def sh(t):
        return t.reshape(bsz, s, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = sh(q), sh(k), sh(v)
    att = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
    if mask_lens is not None:
        valid = np.arange(s)[None, :] < mask_lens[:, None]
        att = np.where(valid[:, None, None, :], att, -1e9)
    if unidirectional:
        causal = np.tril(np.ones((s, s), bool))
        att = np.where(causal[None, None], att, -1e9)
    w = _softmax(att)
    y = np.einsum("bhqk,bhkd->bhqd", w, v)
    return y.transpose(0, 2, 1, 3).reshape(bsz, s, heads * dh)


def test_qattention_matches_float_oracle():
    rng = np.random.default_rng(12)
    bsz, s, d, heads = 2, 5, 8, 2
    x = rng.standard_normal((bsz, s, d)).astype(np.float32)
    w = (rng.standard_normal((d, 3 * d)) * 0.5).astype(np.float32)
    bias = rng.standard_normal(3 * d).astype(np.float32)
    # quantize both sides on the u8/i8 grids the ORT kernel uses
    xs = np.abs(x).max() / 127.0
    xq = np.clip(np.round(x / xs) + 128, 0, 255).astype(np.uint8)
    ws = np.abs(w).max() / 127.0
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    xdq = (xq.astype(np.float32) - 128) * xs
    wdq = wq.astype(np.float32) * ws
    got = run_op(
        "QAttention", {"x": xq},
        initializers={"w": wq, "b": bias,
                      "xs": np.float32(xs), "ws": np.float32(ws),
                      "xzp": np.uint8(128)},
        input_names=["x", "w", "b", "xs", "ws", "", "xzp"],
        domain="com.microsoft", num_heads=heads)[0]
    want = _ref_attention(xdq @ wdq + bias, heads)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_qattention_mask_and_causal_and_percol_scale():
    rng = np.random.default_rng(13)
    bsz, s, d, heads = 2, 4, 8, 2
    x = rng.standard_normal((bsz, s, d)).astype(np.float32)
    w = (rng.standard_normal((d, 3 * d)) * 0.5).astype(np.float32)
    bias = rng.standard_normal(3 * d).astype(np.float32)
    xs = np.abs(x).max() / 127.0
    xq = np.clip(np.round(x / xs) + 128, 0, 255).astype(np.uint8)
    ws = (np.abs(w).max(0) / 127.0).astype(np.float32)  # per-column
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    xdq = (xq.astype(np.float32) - 128) * xs
    wdq = wq.astype(np.float32) * ws
    mask = np.array([3, 4], np.int32)
    got = run_op(
        "QAttention", {"x": xq, "mask": mask},
        initializers={"w": wq, "b": bias,
                      "xs": np.float32(xs), "ws": ws,
                      "xzp": np.uint8(128)},
        input_names=["x", "w", "b", "xs", "ws", "mask", "xzp"],
        domain="com.microsoft", num_heads=heads, unidirectional=1)[0]
    want = _ref_attention(xdq @ wdq + bias, heads, mask_lens=mask,
                          unidirectional=True)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# -- GatherBlockQuantized ------------------------------------------------------


def test_gather_block_quantized_int4_signed():
    rng = np.random.default_rng(14)
    rows, cols, block = 7, 32, 16
    blocks = cols // block
    q = rng.integers(-8, 8, (rows, cols)).astype(np.int8)
    scales = (rng.random((rows, blocks)) + 0.5).astype(np.float32)
    zp = rng.integers(-8, 8, (rows, blocks)).astype(np.int8)
    idx = np.array([[3, 0], [6, 2]], np.int64)
    got = run_op(
        "GatherBlockQuantized", {"idx": idx},
        initializers={"d": q, "s": scales, "z": zp},
        input_names=["d", "idx", "s", "z"], domain="com.microsoft",
        gather_axis=0, quantize_axis=1, block_size=block)[0]
    deq = (q.astype(np.float32)
           - np.repeat(zp, block, 1)) * np.repeat(scales, block, 1)
    np.testing.assert_allclose(got, deq[idx], rtol=1e-5, atol=1e-5)
    assert got.shape == (2, 2, cols)


def test_gather_block_quantized_packed_uint8_default_zp():
    rng = np.random.default_rng(15)
    rows, cols, block = 5, 32, 16
    blocks = cols // block
    q = rng.integers(0, 16, (rows, cols)).astype(np.uint8)
    packed = (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8)
    scales = (rng.random((rows, blocks)) + 0.5).astype(np.float32)
    idx = np.array([4, 1, 1], np.int64)
    got = run_op(
        "GatherBlockQuantized", {"idx": idx},
        initializers={"d": packed, "s": scales},
        input_names=["d", "idx", "s"], domain="com.microsoft",
        gather_axis=0, quantize_axis=1, block_size=block)[0]
    deq = (q.astype(np.float32) - 8) * np.repeat(scales, block, 1)
    np.testing.assert_allclose(got, deq[idx], rtol=1e-5, atol=1e-5)


def test_gather_block_quantized_ceil_blocks_and_axis1_gather():
    # gather along axis 1 while axis 0 is quantized; block count ceils
    rng = np.random.default_rng(16)
    rows, cols, block = 20, 6, 16  # ceil(20/16) = 2 blocks
    blocks = -(-rows // block)
    q = rng.integers(-8, 8, (rows, cols)).astype(np.int8)
    scales = (rng.random((blocks, cols)) + 0.5).astype(np.float32)
    idx = np.array([5, 0], np.int64)
    got = run_op(
        "GatherBlockQuantized", {"idx": idx},
        initializers={"d": q, "s": scales},
        input_names=["d", "idx", "s"], domain="com.microsoft",
        gather_axis=1, quantize_axis=0, block_size=block)[0]
    deq = q.astype(np.float32) * np.repeat(scales, block, 0)[:rows]
    np.testing.assert_allclose(got, deq[:, idx], rtol=1e-5, atol=1e-5)


# -- MatMulBnb4 ----------------------------------------------------------------

_NF4 = np.array(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0], np.float32)
_FP4 = np.array(
    [0.0, 0.0625, 8.0, 12.0, 4.0, 6.0, 2.0, 3.0,
     -0.0, -0.0625, -8.0, -12.0, -4.0, -6.0, -2.0, -3.0], np.float32)


@pytest.mark.parametrize("quant_type,lut", [(0, _FP4), (1, _NF4)])
def test_matmul_bnb4(quant_type, lut):
    rng = np.random.default_rng(17)
    n, k, block = 6, 16, 32  # one block spans 2 rows of the flat layout
    codes = rng.integers(0, 16, n * k).astype(np.uint8)
    absmax = (rng.random(-(-n * k // block)) + 0.5).astype(np.float32)
    # bitsandbytes packing: FIRST code in the HIGH nibble
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    a = rng.standard_normal((3, k)).astype(np.float32)
    got = run_op(
        "MatMulBnb4", {"a": a},
        initializers={"b": packed, "m": absmax},
        input_names=["a", "b", "m"], domain="com.microsoft",
        K=k, N=n, block_size=block, quant_type=quant_type)[0]
    w = (lut[codes] * np.repeat(absmax, block)[: n * k]).reshape(n, k)
    np.testing.assert_allclose(got, a @ w.T, rtol=1e-4, atol=1e-4)
