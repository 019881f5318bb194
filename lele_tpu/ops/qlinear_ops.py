"""com.microsoft QLinear* (QOperator-format) emitters.

ORT's static int8 quantizer has two output formats: QDQ (Quantize/
Dequantize pairs around float ops — already covered by quant_ops.py) and
QOperator, which rewrites each float op into a fused com.microsoft
QLinear* node carrying its own scales/zero-points. Every published
ORT-quantized CNN (mobilenet/resnet/efficientnet int8 releases) is in
QOperator format, so loading them needs this family. Reference surface:
the reference stops at ai.onnx QLinearConv/QLinearMatMul
(/root/reference/src/kernels/quantization.rs) and cannot load QOperator
exports at all.

Semantics, shared by the whole family (ORT kernel contract):
    y = saturate(round_half_even(f(dequant(inputs)) / y_scale) + y_zp)
with the elementwise/pool/softmax math `f` computed in float — ORT's
int-domain shortcuts (e.g. the precomputed sigmoid LUT) are documented
as value-identical to the float path within 1 ulp of the quantized grid.
TPU-first: dequant → f → requant is exactly what XLA fuses into one
elementwise kernel; an int-domain LUT would be a scalar-gather pattern
the VPU hates.
"""

from __future__ import annotations

import numpy as np

from .registry import OpContext, op
from .quant_ops import _round_half_even, dynamic_quantize_linear, matmul_integer


def _qdt(x):
    """numpy dtype of a value that may be a tracer (no __array__)."""
    return np.dtype(str(x.dtype))


def _dq(xp, x, scale, zp=None):
    xf = xp.asarray(x).astype(np.float32)
    if zp is not None:
        xf = xf - xp.asarray(zp).astype(np.float32)
    return xf * xp.asarray(scale).astype(np.float32)


def _q(xp, y, scale, zp, qdt=None):
    if qdt is None:
        qdt = _qdt(zp) if zp is not None else np.dtype(np.uint8)
    info = np.iinfo(qdt)
    yq = _round_half_even(xp, y / xp.asarray(scale).astype(np.float32))
    if zp is not None:
        yq = yq + xp.asarray(zp).astype(np.float32)
    return xp.clip(yq, info.min, info.max).astype(qdt)


@op("QLinearAdd", foldable=False, domain="com.microsoft")
def qlinear_add(ctx: OpContext, a, a_scale, a_zp, b, b_scale, b_zp,
                c_scale, c_zp=None):
    xp = ctx.xp
    return _q(xp, _dq(xp, a, a_scale, a_zp) + _dq(xp, b, b_scale, b_zp),
              c_scale, c_zp, _qdt(a))


@op("QLinearMul", foldable=False, domain="com.microsoft")
def qlinear_mul(ctx: OpContext, a, a_scale, a_zp, b, b_scale, b_zp,
                c_scale, c_zp=None):
    xp = ctx.xp
    return _q(xp, _dq(xp, a, a_scale, a_zp) * _dq(xp, b, b_scale, b_zp),
              c_scale, c_zp, _qdt(a))


@op("QLinearSigmoid", foldable=False, domain="com.microsoft")
def qlinear_sigmoid(ctx: OpContext, x, x_scale, x_zp, y_scale, y_zp=None):
    import jax

    xp = ctx.xp
    return _q(xp, jax.nn.sigmoid(_dq(xp, x, x_scale, x_zp)),
              y_scale, y_zp, _qdt(x))


@op("QLinearLeakyRelu", foldable=False, domain="com.microsoft")
def qlinear_leaky_relu(ctx: OpContext, x, x_scale, x_zp, y_scale, y_zp=None):
    xp = ctx.xp
    alpha = np.float32(ctx.attr("alpha", 0.01))
    xf = _dq(xp, x, x_scale, x_zp)
    return _q(xp, xp.where(xf < 0, alpha * xf, xf),
              y_scale, y_zp, _qdt(x))


@op("QLinearSoftmax", foldable=False, domain="com.microsoft")
def qlinear_softmax(ctx: OpContext, x, x_scale, x_zp, y_scale, y_zp=None):
    """The `opset` attribute selects which ai.onnx Softmax semantics the
    float core uses (the quantizer records the model's opset: <13 is the
    flatten-to-2D rule, >=13 is single-axis)."""
    import jax
    import jax.numpy as jnp

    xp = ctx.xp
    sem = int(ctx.attr("opset", 13))
    xf = _dq(xp, x, x_scale, x_zp)
    if sem >= 13:
        sm = jax.nn.softmax(xf, axis=ctx.attr("axis", -1))
    else:
        shape = np.shape(xf)
        axis = ctx.attr("axis", 1)
        axis = axis if axis >= 0 else axis + len(shape)
        lead = int(np.prod(shape[:axis])) if axis else 1
        sm = jnp.reshape(jax.nn.softmax(jnp.reshape(xf, (lead, -1)),
                                        axis=-1), shape)
    return _q(xp, sm, y_scale, y_zp, _qdt(x))


def _nhwc_to_nchw(xp, x):
    rank = np.ndim(x)
    return xp.transpose(x, (0, rank - 1) + tuple(range(1, rank - 1)))


def _nchw_to_nhwc(xp, x):
    rank = np.ndim(x)
    return xp.transpose(x, (0,) + tuple(range(2, rank)) + (1,))


@op("QLinearAveragePool", foldable=False, domain="com.microsoft")
def qlinear_average_pool(ctx: OpContext, x, x_scale, x_zp, y_scale,
                         y_zp=None):
    from .nn_ops import average_pool

    xp = ctx.xp
    qdt = _qdt(x)
    xf = _dq(xp, x, x_scale, x_zp)
    if int(ctx.attr("channels_last", 0)):
        xf = _nhwc_to_nchw(xp, xf)
    y = average_pool(ctx, xf)
    if int(ctx.attr("channels_last", 0)):
        y = _nchw_to_nhwc(xp, y)
    return _q(xp, y, y_scale, y_zp, qdt)


@op("QLinearGlobalAveragePool", foldable=False, domain="com.microsoft")
def qlinear_global_average_pool(ctx: OpContext, x, x_scale, x_zp, y_scale,
                                y_zp=None):
    xp = ctx.xp
    qdt = _qdt(x)
    xf = _dq(xp, x, x_scale, x_zp)
    if int(ctx.attr("channels_last", 0)):
        axes = tuple(range(1, np.ndim(xf) - 1))
    else:
        axes = tuple(range(2, np.ndim(xf)))
    return _q(xp, xp.mean(xf, axis=axes, keepdims=True), y_scale, y_zp, qdt)


@op("QLinearConcat", foldable=False, domain="com.microsoft")
def qlinear_concat(ctx: OpContext, y_scale, y_zp, *rest):
    """Variadic (tensor, scale, zero_point) triples after the output's
    scale/zp; each input is dequantized with its own pair, concatenated
    along `axis`, and requantized to the output grid."""
    xp = ctx.xp
    if len(rest) % 3:
        raise ValueError(
            f"QLinearConcat: inputs after y_scale/y_zp must be "
            f"(tensor, scale, zero_point) triples, got {len(rest)}")
    parts = [_dq(xp, rest[i], rest[i + 1], rest[i + 2])
             for i in range(0, len(rest), 3)]
    y = xp.concatenate(parts, axis=int(ctx.attr("axis")))
    return _q(xp, y, y_scale, y_zp, _qdt(rest[0]))


@op("QGemm", foldable=False, domain="com.microsoft")
def qgemm(ctx: OpContext, a, a_scale, a_zp, b, b_scale, b_zp,
          c=None, y_scale=None, y_zp=None):
    """Quantized Gemm: int8 dot with zero-point corrections (the
    matmul_integer core), int32 bias C at scale alpha*a_scale*b_scale,
    then requantize — or, when y_scale is absent, dequantize to float
    (both output modes are in the ORT schema). b_scale may be
    per-output-column."""
    import jax.numpy as jnp

    alpha = np.float32(ctx.attr("alpha", 1.0))
    if int(ctx.attr("transA", 0)):
        a = ctx.xp.swapaxes(a, -1, -2)
    if int(ctx.attr("transB", 0)):
        # b_zp/b_scale are per-OUTPUT-column [N] in the schema, so they
        # need no transpose of their own
        b = ctx.xp.swapaxes(b, -1, -2)
    acc = matmul_integer(ctx, a, b, a_zp, b_zp)
    if c is not None:
        acc = acc + jnp.asarray(c).astype(jnp.int32)
    sw = jnp.asarray(b_scale).astype(np.float32)
    if sw.ndim == 1:
        sw = sw.reshape(1, -1)
    mult = alpha * jnp.asarray(a_scale).astype(np.float32) * sw
    yf = acc.astype(np.float32) * mult
    if y_scale is None:
        return yf
    qdt = _qdt(a)
    return _q(ctx.xp, yf, y_scale, y_zp, qdt)


@op("MatMulIntegerToFloat", foldable=False, domain="com.microsoft")
def matmul_integer_to_float(ctx: OpContext, a, b, a_scale, b_scale,
                            a_zp=None, b_zp=None, bias=None):
    """(A − a_zp)·(B − b_zp) · a_scale·b_scale + bias, output float —
    the fusion ORT's dynamic quantizer emits for MatMul when the
    consumer is float (MatMulInteger+Cast+Mul collapsed into one node).
    b_scale/b_zp may be per-column [N]."""
    import jax.numpy as jnp

    acc = matmul_integer(ctx, a, b, a_zp, b_zp)
    sb = jnp.asarray(b_scale).astype(np.float32)
    if sb.ndim == 1:
        sb = sb.reshape(1, -1)
    sa = jnp.asarray(a_scale).astype(np.float32)
    if sa.ndim == 1:
        sa = sa.reshape(-1, 1)
    y = acc.astype(np.float32) * (sa * sb)
    if bias is not None:
        y = y + jnp.asarray(bias).astype(np.float32)
    return y


@op("DynamicQuantizeMatMul", foldable=False, domain="com.microsoft")
def dynamic_quantize_matmul(ctx: OpContext, a, b, b_scale, b_zp=None,
                            bias=None):
    """Float A dynamically quantized to u8 (the DynamicQuantizeLinear
    rule), then the MatMulIntegerToFloat core — the other dynamic-MatMul
    fusion ORT emits."""
    aq, a_scale, a_zp = dynamic_quantize_linear(ctx, a)
    return matmul_integer_to_float(ctx, aq, b, a_scale, b_scale,
                                   a_zp, b_zp, bias)


@op("QAttention", foldable=False, domain="com.microsoft")
def qattention(ctx: OpContext, x, weight, bias, input_scale, weight_scale,
               mask_index=None, input_zp=None, weight_zp=None, past=None):
    """com.microsoft::QAttention — the quantized packed-QKV attention
    ORT's static quantizer writes into int8 BERT exports (the QOperator
    twin of contrib Attention).

    The projection runs as an int8 MXU dot with zero-point corrections
    (the MatMulInteger core), dequantized by input_scale · weight_scale
    (weight_scale/weight_zp may be per-output-column [3·H·dh]); the
    float bias is added post-dequant per the ORT kernel. Everything
    after the projection — head split, past concat, the ORT mask_index
    convention, causal `unidirectional` — is the shared contrib
    attention core (contrib_ops._packed_qkv_attention)."""
    import jax.numpy as jnp

    from .contrib_ops import _packed_qkv_attention

    heads = int(ctx.attr("num_heads", 0))
    if not heads:
        raise ValueError("com.microsoft::QAttention requires num_heads")
    if ctx.attr("past_present_share_buffer", 0):
        raise NotImplementedError(
            "com.microsoft::QAttention: past_present_share_buffer is not "
            "supported (GQA's static buffer is the share-buffer path)"
        )
    unidir = bool(ctx.attr("unidirectional", 0))
    acc = matmul_integer(ctx, x, weight, input_zp, weight_zp)  # int32
    sw = jnp.asarray(weight_scale).astype(np.float32)
    if sw.ndim == 1 and sw.size > 1:
        sw = sw.reshape(1, 1, -1)  # per-output-column
    qkv = acc.astype(np.float32) * (
        jnp.asarray(input_scale).astype(np.float32) * sw
    )
    if bias is not None:
        qkv = qkv + jnp.asarray(bias).astype(np.float32)
    return _packed_qkv_attention(ctx, qkv, heads, unidir, mask_index,
                                 past, None)
