"""com.microsoft contrib ops from ORT's diffusion-model optimizer.

The ORT transformer optimizer's `--model_type unet/vae/clip` passes
(the published Stable Diffusion ONNX releases are shipped pre-optimized
this way) rewrite UNet/VAE graphs into GroupNorm, SkipGroupNorm,
NhwcConv, BiasSplitGelu, BiasAdd and GemmFastGelu nodes. Reference
surface: none — the reference's emitter tables predate these ops; this
family is what makes the published SD exports loadable.

TPU-first notes: NhwcConv is the one contrib op that is *more* natural
here than its ai.onnx sibling — NHWC is the TPU's preferred conv layout,
so the emitter feeds `conv_general_dilated` NHWC dimension numbers
directly instead of transposing into NCHW and back. GroupNorm's
channels_last default (1) likewise matches the lane-major layout XLA
wants on TPU.
"""

from __future__ import annotations

import numpy as np

from .registry import OpContext, op


@op("GroupNorm", foldable=False, domain="com.microsoft")
def ms_group_norm(ctx: OpContext, x, gamma, beta):
    """com.microsoft::GroupNorm — same math as ai.onnx
    GroupNormalization but NHWC by default (`channels_last=1`), float32
    gamma/beta of size C, and an optional fused swish
    (`activation=1` → y·sigmoid(y))."""
    import jax
    import jax.numpy as jnp

    eps = np.float32(ctx.attr("epsilon", 1e-5))
    g = int(ctx.attr("groups"))
    last = int(ctx.attr("channels_last", 1))
    shape = np.shape(x)
    if last:
        c = shape[-1]
        xg = jnp.reshape(x, shape[:-1] + (g, c // g))
        # normalize over all spatial dims + the within-group channels
        axes = tuple(range(1, len(shape) - 1)) + (len(shape),)
    else:
        c = shape[1]
        xg = jnp.reshape(x, (shape[0], g, c // g) + shape[2:])
        axes = (2,) + tuple(range(3, len(shape) + 1))
    xg = xg.astype(jnp.float32)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    out = jnp.reshape(xg, shape)
    brd = (-1,) if last else (1, -1) + (1,) * (len(shape) - 2)
    out = out * jnp.reshape(gamma.astype(jnp.float32), brd) \
        + jnp.reshape(beta.astype(jnp.float32), brd)
    if int(ctx.attr("activation", 0)):
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


@op("SkipGroupNorm", foldable=False, domain="com.microsoft")
def skip_group_norm(ctx: OpContext, x, gamma, beta, skip, bias=None):
    """GroupNorm over x + skip (+ bias); skip may be full-shape
    [N,H,W,C], broadcast [N,1,1,C], or [N,C]. When the node declares a
    second output, the pre-norm sum rides out for the next residual."""
    import jax.numpy as jnp

    s = jnp.asarray(skip)
    if s.ndim == 2:  # [N, C] → broadcast over spatial
        s = s.reshape((s.shape[0],) + (1,) * (np.ndim(x) - 2)
                      + (s.shape[-1],))
    tot = x + s.astype(x.dtype)
    if bias is not None:
        tot = tot + jnp.asarray(bias).astype(x.dtype)
    y = ms_group_norm(ctx, tot, gamma, beta)
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out >= 2 and ctx.node.output[1]:
        return y, tot
    return y


@op("NhwcConv", foldable=False, domain="com.microsoft")
def nhwc_conv(ctx: OpContext, x, w, b=None):
    """Conv with NHWC input/output and the standard ONNX OIHW weight —
    fed straight to XLA in the TPU's native layout (no transposes)."""
    import jax

    from .math_ops import _prec
    from .nn_ops import _resolve_pads

    rank = np.ndim(x) - 2
    kshape = ctx.attr_ints("kernel_shape", list(np.shape(w)[2:]))
    strides = ctx.attr_ints("strides", [1] * rank)
    dilations = ctx.attr_ints("dilations", [1] * rank)
    group = ctx.attr("group", 1)
    # _resolve_pads reads spatial dims at xshape[2:]; synthesize NCHW
    shape = np.shape(x)
    pads = _resolve_pads(ctx, (shape[0], shape[-1]) + shape[1:-1],
                         kshape, strides, dilations)
    sp = "DHW"[3 - rank:]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=strides,
        padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=(f"N{sp}C", f"OI{sp}", f"N{sp}C"),
        feature_group_count=group,
        precision=_prec(),
    )
    if b is not None:
        out = out + b.astype(out.dtype)  # bias is [C], trailing — plain bcast
    return out


@op("BiasSplitGelu", foldable=False, domain="com.microsoft")
def bias_split_gelu(ctx: OpContext, x, bias):
    """The GEGLU gate in SD UNet MLPs: (x + bias) split in half on the
    last dim; y = first_half * Gelu(second_half) (erf gelu)."""
    import jax
    import jax.numpy as jnp

    s = x + jnp.asarray(bias).astype(x.dtype)
    h = s.shape[-1] // 2
    return s[..., :h] * jax.nn.gelu(s[..., h:], approximate=False)


@op("BiasAdd", foldable=False, domain="com.microsoft")
def bias_add(ctx: OpContext, x, bias, skip):
    """x + bias[C] + skip — the residual-add fusion around SD attention
    blocks."""
    import jax.numpy as jnp

    return x + jnp.asarray(bias).astype(x.dtype) + skip


@op("GemmFastGelu", foldable=False, domain="com.microsoft")
def gemm_fast_gelu(ctx: OpContext, x, w, bias=None):
    """FastGelu(x @ w + bias) — tanh-approximation gelu fused behind the
    projection GEMM."""
    import jax
    import jax.numpy as jnp

    from .math_ops import _prec

    y = jnp.matmul(x, w.astype(x.dtype),
                   preferred_element_type=jnp.promote_types(x.dtype,
                                                            jnp.float32),
                   precision=_prec()).astype(x.dtype)
    if bias is not None:
        y = y + jnp.asarray(bias).astype(y.dtype)
    return jax.nn.gelu(y, approximate=True)
