"""Quantization op emitters: the int8 inference path.

Covers the reference's quantization stack (/root/reference/src/kernels/
quantization.rs: DynamicQuantizeLinear :1628, MatMulInteger fusions :8-77,
PreparedWeights zero-point col-sum correction :206-232) — redesigned for the
MXU: u8 operands shift to i8 (the reference's XOR-0x80 trick, expressed
algebraically), the dot runs as an int8×int8→int32 `dot_general`, and the
zero-point terms are rank-1 corrections added afterwards, which is exactly
the reference's col_sums scheme but fused by XLA.
"""

from __future__ import annotations

import numpy as np

from .registry import OpContext, op


def _to_i8_domain(x, zp):
    """Shift a u8 operand (and its zero point) into i8 so the MXU int8 path
    applies; i8 operands pass through."""
    import jax.numpy as jnp

    if x.dtype == jnp.uint8:
        xi = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        zpi = (zp.astype(jnp.int32) - 128) if zp is not None else jnp.int32(-128)
        return xi, zpi
    return x.astype(jnp.int8), (
        zp.astype(jnp.int32) if zp is not None else jnp.int32(0)
    )


def _round_half_even(xp, x):
    return xp.round(x)  # numpy/jnp round = banker's rounding, per ONNX spec


def _is_host(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic))


@op("DynamicQuantizeLinear")
def dynamic_quantize_linear(ctx: OpContext, x):
    """y_scale = (max(x,0)-min(x,0))/255; zp = round(clip(-min/scale,0,255))."""
    xp = ctx.xp
    x = xp.asarray(x, dtype=np.float32)
    x_min = xp.minimum(xp.min(x), 0.0)
    x_max = xp.maximum(xp.max(x), 0.0)
    scale = (x_max - x_min) / 255.0
    safe_scale = xp.where(scale == 0, xp.asarray(1.0, np.float32), scale)
    zp_f = _round_half_even(xp, xp.clip(-x_min / safe_scale, 0.0, 255.0))
    zp = zp_f.astype(np.uint8)
    y = xp.clip(_round_half_even(xp, x / safe_scale) + zp_f, 0.0, 255.0).astype(
        np.uint8
    )
    return y, scale.astype(np.float32), zp


@op("QuantizeLinear", static_args=(2,))
def quantize_linear(ctx: OpContext, x, scale, zp=None):
    """zp stays host-side when static (static_args) so the loader's
    Int4Array marker survives: int4/uint4 zero points unpack to int8/uint8
    STORAGE but must clip at the 4-bit VALUE range [-8,7]/[0,15]
    (ADVICE r4). The opset-21 `output_dtype` attribute is honored too
    (it wins over zp inference per the spec; 21/22 map to the widened
    storage dtype with narrow bounds)."""
    xp = ctx.xp
    axis = ctx.attr("axis", 1)
    block = int(ctx.attr("block_size", 0))
    out_dt = ctx.attr("output_dtype")
    int4_kind = None  # 21 (uint4) / 22 (int4) when the output is 4-bit
    if out_dt is not None and int(out_dt) in (21, 22):
        int4_kind = int(out_dt)
    elif getattr(zp, "onnx_dtype", None) in (21, 22):
        int4_kind = int(zp.onnx_dtype)
    if int4_kind is not None:
        qdt = np.dtype(np.uint8 if int4_kind == 21 else np.int8)
        lo, hi = (0, 15) if int4_kind == 21 else (-8, 7)
    else:
        if out_dt is not None:
            from ..onnx.loader import DTYPE_MAP

            qdt = DTYPE_MAP[int(out_dt)]
        elif zp is None:
            qdt = np.dtype(np.uint8)
        else:
            qdt = np.dtype(
                str(np.asarray(zp).dtype if _is_host(zp) else zp.dtype)
            )
        info = np.iinfo(qdt)
        lo, hi = info.min, info.max

    def expand(p):
        """Per-tensor / per-axis / blocked (opset 21) broadcast — the same
        rule as DequantizeLinear's (see there)."""
        p = xp.asarray(p)
        if np.ndim(p) == 0 or np.ndim(x) <= 1:
            return p
        if np.ndim(p) == 1:
            shape = [1] * np.ndim(x)
            shape[axis] = -1
            return p.reshape(shape)
        if block > 0:
            rep = xp.repeat(p, block, axis=axis)
            sl = [slice(None)] * np.ndim(x)
            sl[axis] = slice(0, x.shape[axis])
            return rep[tuple(sl)]
        return p

    y = _round_half_even(xp, x / expand(scale))
    if zp is not None:
        y = y + expand(zp).astype(np.float32)
    return xp.clip(y, lo, hi).astype(qdt)


@op("DequantizeLinear")
def dequantize_linear(ctx: OpContext, x, scale, zp=None):
    xp = ctx.xp
    axis = ctx.attr("axis", 1)
    block = int(ctx.attr("block_size", 0))
    xf = xp.asarray(x).astype(np.float32)

    def expand(p):
        """Broadcast a scale/zp to x's shape: per-tensor (0-D), per-axis
        (1-D), or BLOCKED (opset 21: same rank as x, axis dim = ceil(K/
        block_size) — the 4-bit LLM groupwise layout): each block of
        `block_size` elements along `axis` shares one value."""
        p = xp.asarray(p).astype(np.float32)
        if np.ndim(p) == 0 or np.ndim(x) <= 1:
            return p
        if np.ndim(p) == 1:
            shape = [1] * np.ndim(x)
            shape[axis] = -1
            return p.reshape(shape)
        if block > 0:  # blocked: repeat each block entry block_size times
            rep = xp.repeat(p, block, axis=axis)
            # ceil-division padding: trim to the data extent
            sl = [slice(None)] * np.ndim(x)
            sl[axis] = slice(0, x.shape[axis])
            return rep[tuple(sl)]
        return p  # same-rank broadcastable (e.g. [K,1])

    if zp is not None:
        xf = xf - expand(zp)
    return xf * expand(scale)


@op("MatMulInteger", foldable=False)
def matmul_integer(ctx: OpContext, a, b, azp=None, bzp=None):
    """(A - azp) @ (B - bzp) → int32 via int8 MXU dot + rank-1 corrections."""
    import jax.numpy as jnp

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ai, azp_i = _to_i8_domain(a, jnp.asarray(azp) if azp is not None else None)
    bi, bzp_i = _to_i8_domain(b, jnp.asarray(bzp) if bzp is not None else None)
    k = a.shape[-1]
    c = jnp.matmul(ai, bi, preferred_element_type=jnp.int32)
    # zero-point corrections (reference: col_sums in PreparedWeights,
    # neon/quantization.rs:24); per-row azp [M] / per-col bzp [N] supported
    rowsum_a = jnp.sum(ai.astype(jnp.int32), axis=-1, keepdims=True)  # [.., M, 1]
    colsum_b = jnp.sum(bi.astype(jnp.int32), axis=-2, keepdims=True)  # [.., 1, N]
    azp_t = azp_i if jnp.ndim(azp_i) == 0 else azp_i.reshape(-1, 1)
    bzp_t = bzp_i if jnp.ndim(bzp_i) == 0 else bzp_i.reshape(1, -1)
    c = c - azp_t * colsum_b - bzp_t * rowsum_a + k * azp_t * bzp_t
    return c


@op("ConvInteger", foldable=False)
def conv_integer(ctx: OpContext, x, w, xzp=None, wzp=None):
    import jax
    import jax.numpy as jnp

    from .nn_ops import _conv_dims, _resolve_pads

    rank = np.ndim(x) - 2
    kshape = ctx.attr_ints("kernel_shape", list(np.shape(w)[2:]))
    strides = ctx.attr_ints("strides", [1] * rank)
    dilations = ctx.attr_ints("dilations", [1] * rank)
    group = ctx.attr("group", 1)
    pads = _resolve_pads(ctx, np.shape(x), kshape, strides, dilations)
    xi = jnp.asarray(x).astype(jnp.int32)
    wi = jnp.asarray(w).astype(jnp.int32)
    if xzp is not None:
        xi = xi - jnp.asarray(xzp).astype(jnp.int32)
    if wzp is not None:
        wz = jnp.asarray(wzp).astype(jnp.int32)
        if wz.ndim == 1:
            # per-OUTPUT-CHANNEL zero point: align with wi's leading M axis
            # (raw broadcast would line it up with the kernel-width axis)
            wz = wz.reshape((-1,) + (1,) * (np.ndim(w) - 1))
        wi = wi - wz
    return jax.lax.conv_general_dilated(
        xi,
        wi,
        window_strides=strides,
        padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dims(rank),
        feature_group_count=group,
        preferred_element_type=jnp.int32,
    )  # int32 conv is exact; no precision knob needed


def _requant(xp, acc_i32, scale_in, scale_w, y_scale, y_zp, qdt):
    """int32 accumulator → quantized output: acc * (sx*sw/sy) + yzp, saturate."""
    import numpy as np_

    info = np_.iinfo(np_.dtype(str(qdt)))
    mult = (scale_in * scale_w / y_scale).astype(np_.float32)
    y = _round_half_even(xp, acc_i32.astype(np_.float32) * mult)
    if y_zp is not None:
        y = y + xp.asarray(y_zp).astype(np_.float32)
    return xp.clip(y, info.min, info.max).astype(qdt)


@op("QLinearMatMul", foldable=False)
def qlinear_matmul(ctx: OpContext, a, a_scale, a_zp, b, b_scale, b_zp,
                   y_scale, y_zp):
    """Statically-quantized matmul (the QDQ-format sibling of the dynamic
    path): int8 dot with zero-point corrections, then requantize."""
    import jax.numpy as jnp

    c = matmul_integer(ctx, a, b, a_zp, b_zp)
    qdt = y_zp.dtype if y_zp is not None else jnp.uint8
    return _requant(jnp, c, jnp.asarray(a_scale), jnp.asarray(b_scale),
                    jnp.asarray(y_scale), y_zp, qdt)


@op("QLinearConv", foldable=False)
def qlinear_conv(ctx: OpContext, x, x_scale, x_zp, w, w_scale, w_zp,
                 y_scale, y_zp, b=None):
    """Statically-quantized conv: ConvInteger core + int32 bias + requant.
    Per-output-channel w_scale supported (axis 0)."""
    import jax.numpy as jnp

    acc = conv_integer(ctx, x, w, x_zp, w_zp)
    if b is not None:  # int32 bias at scale x_scale*w_scale
        rank = acc.ndim
        acc = acc + jnp.asarray(b).astype(jnp.int32).reshape(
            (1, -1) + (1,) * (rank - 2)
        )
    ws = jnp.asarray(w_scale)
    if ws.ndim == 1:  # per-channel → broadcast over NCHW channel dim
        ws = ws.reshape((1, -1) + (1,) * (acc.ndim - 2))
    qdt = y_zp.dtype if y_zp is not None else jnp.uint8
    return _requant(jnp, acc, jnp.asarray(x_scale), ws, jnp.asarray(y_scale),
                    y_zp, qdt)
