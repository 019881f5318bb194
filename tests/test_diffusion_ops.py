"""com.microsoft diffusion-optimizer ops (ops/diffusion_ops.py) vs numpy
oracles — the graph vocabulary of published Stable Diffusion ONNX
releases (ORT transformer optimizer --model_type unet/vae/clip)."""

import numpy as np
import pytest
from scipy.special import erf

from optest import run_op


def np_groupnorm(x_nhwc, gamma, beta, groups, eps=1e-5, swish=False):
    n, h, w, c = x_nhwc.shape
    xg = x_nhwc.reshape(n, h, w, groups, c // groups).astype(np.float64)
    mean = xg.mean((1, 2, 4), keepdims=True)
    var = xg.var((1, 2, 4), keepdims=True)
    y = ((xg - mean) / np.sqrt(var + eps)).reshape(n, h, w, c)
    y = y * gamma + beta
    if swish:
        y = y / (1.0 + np.exp(-y))
    return y.astype(np.float32)


@pytest.mark.parametrize("swish", [0, 1])
def test_group_norm_channels_last(swish):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4, 8)).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    got = run_op("GroupNorm", {"x": x},
                 initializers={"g": gamma, "b": beta},
                 input_names=["x", "g", "b"], domain="com.microsoft",
                 groups=4, epsilon=1e-5, activation=swish,
                 channels_last=1)[0]
    want = np_groupnorm(x, gamma, beta, 4, swish=bool(swish))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_group_norm_nchw():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 4, 5)).astype(np.float32)
    gamma = rng.standard_normal(6).astype(np.float32)
    beta = rng.standard_normal(6).astype(np.float32)
    got = run_op("GroupNorm", {"x": x},
                 initializers={"g": gamma, "b": beta},
                 input_names=["x", "g", "b"], domain="com.microsoft",
                 groups=3, channels_last=0)[0]
    want = np_groupnorm(x.transpose(0, 2, 3, 1), gamma, beta, 3)
    np.testing.assert_allclose(got, want.transpose(0, 3, 1, 2),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("skip_shape", ["full", "nc"])
def test_skip_group_norm_two_outputs(skip_shape):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 3, 4)).astype(np.float32)
    skip = (rng.standard_normal((2, 3, 3, 4)) if skip_shape == "full"
            else rng.standard_normal((2, 4))).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    gamma = rng.standard_normal(4).astype(np.float32)
    beta = rng.standard_normal(4).astype(np.float32)
    y, s = run_op("SkipGroupNorm", {"x": x, "skip": skip},
                  initializers={"g": gamma, "b": beta, "bias": bias},
                  input_names=["x", "g", "b", "skip", "bias"],
                  n_outputs=2, domain="com.microsoft", groups=2,
                  channels_last=1)
    sb = skip if skip_shape == "full" else skip[:, None, None, :]
    tot = x + sb + bias
    np.testing.assert_allclose(s, tot, atol=1e-6)
    np.testing.assert_allclose(y, np_groupnorm(tot, gamma, beta, 2),
                               atol=2e-5, rtol=2e-5)


def test_nhwc_conv_matches_nchw_conv():
    """NhwcConv = Conv on the transposed layout (the ai.onnx Conv
    emitter carries its own oracle battery — this gates the NHWC
    dimension-number wiring and auto_pad handling)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 7, 7, 3)).astype(np.float32)
    w = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    got = run_op("NhwcConv", {"x": x}, initializers={"w": w, "b": b},
                 input_names=["x", "w", "b"], domain="com.microsoft",
                 strides=[2, 2], auto_pad="SAME_UPPER")[0]
    ref = run_op("Conv", {"x": x.transpose(0, 3, 1, 2)},
                 initializers={"w": w, "b": b},
                 input_names=["x", "w", "b"],
                 strides=[2, 2], auto_pad="SAME_UPPER")[0]
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_nhwc_conv_grouped_padded():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 5, 5, 4)).astype(np.float32)
    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32)
    got = run_op("NhwcConv", {"x": x}, initializers={"w": w},
                 input_names=["x", "w"], domain="com.microsoft",
                 group=2, pads=[1, 1, 1, 1])[0]
    ref = run_op("Conv", {"x": x.transpose(0, 3, 1, 2)},
                 initializers={"w": w}, input_names=["x", "w"],
                 group=2, pads=[1, 1, 1, 1])[0]
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_bias_split_gelu():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 8)).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    got = run_op("BiasSplitGelu", {"x": x}, initializers={"b": bias},
                 input_names=["x", "b"], domain="com.microsoft")[0]
    s = (x + bias).astype(np.float64)
    a, g = s[..., :4], s[..., 4:]
    want = a * 0.5 * g * (1.0 + erf(g / np.sqrt(2.0)))
    np.testing.assert_allclose(got, want.astype(np.float32),
                               atol=1e-5, rtol=1e-5)


def test_bias_add():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 5, 6)).astype(np.float32)
    bias = rng.standard_normal(6).astype(np.float32)
    skip = rng.standard_normal((2, 5, 6)).astype(np.float32)
    got = run_op("BiasAdd", {"x": x, "skip": skip},
                 initializers={"b": bias},
                 input_names=["x", "b", "skip"],
                 domain="com.microsoft")[0]
    np.testing.assert_allclose(got, x + bias + skip, atol=1e-6)


def test_gemm_fast_gelu():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 6)).astype(np.float32)
    w = rng.standard_normal((6, 5)).astype(np.float32)
    bias = rng.standard_normal(5).astype(np.float32)
    got = run_op("GemmFastGelu", {"x": x}, initializers={"w": w, "b": bias},
                 input_names=["x", "w", "b"], domain="com.microsoft")[0]
    y = (x.astype(np.float64) @ w + bias)
    want = 0.5 * y * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (y + 0.044715 * y ** 3)))
    np.testing.assert_allclose(got, want.astype(np.float32),
                               atol=2e-5, rtol=2e-5)
