"""com.microsoft fused-op family the ORT graph optimizer writes into CNN
and encoder exports (FusedConv/FusedGemm/ConvTransposeWithDynamicPads/
BiasSoftmax/RelativePositionBias).

These are NOT new math: each is a standard op with an activation or bias
folded in by onnxruntime's level-2/3 graph transformers, so checkpoints
saved *after* ORT optimization (a common distribution form — e.g.
optimized mobilenet/yolo releases, T5 encoder exports) carry them in the
com.microsoft domain. The reference cannot load such graphs (its dispatch
has no contrib domain at all, generate.rs:802-997); here each maps back
onto the existing ai.onnx emitter plus a fused epilogue, which XLA fuses
into the conv/GEMM epilogue on TPU — exactly the fusion ORT's optimizer
was trying to hand-write.
"""

from __future__ import annotations

import numpy as np

from .math_ops import gemm
from .nn_ops import conv, conv_transpose
from .registry import OpContext, op


def _apply_activation(xp, y, act: str | None, params):
    """The ORT fused-activation epilogue (FusedConv `activation` +
    `activation_params` contract; FusedGemm passes scalars the same way)."""
    if not act:
        return y
    p = list(params or [])
    if act == "Relu":
        return xp.maximum(y, 0)
    if act == "Tanh":
        return xp.tanh(y)
    if act == "Sigmoid":
        return 1.0 / (1.0 + xp.exp(-y))
    if act == "LeakyRelu":
        alpha = p[0] if p else 0.01
        return xp.where(y >= 0, y, xp.asarray(alpha, y.dtype) * y)
    if act == "HardSigmoid":
        alpha = p[0] if len(p) > 0 else 0.2
        beta = p[1] if len(p) > 1 else 0.5
        return xp.clip(xp.asarray(alpha, y.dtype) * y
                       + xp.asarray(beta, y.dtype), 0.0, 1.0)
    if act == "Clip":
        lo = p[0] if len(p) > 0 else -np.inf
        hi = p[1] if len(p) > 1 else np.inf
        return xp.clip(y, lo, hi)
    raise NotImplementedError(
        f"fused activation {act!r} is not implemented"
    )


@op("FusedConv", foldable=False, domain="com.microsoft")
def fused_conv(ctx: OpContext, x, w, b=None, z=None):
    """Conv [+ residual Z] + activation, the ORT ConvActivation /
    ConvAddActivation fusion. Conv attrs pass through to the ai.onnx
    emitter; Z (when present) is added before the activation."""
    y = conv(ctx, x, w, b)
    if z is not None:
        y = y + z.astype(y.dtype)
    return _apply_activation(ctx.xp, y, ctx.attr("activation"),
                             ctx.attr("activation_params"))


@op("FusedGemm", foldable=False, domain="com.microsoft")
def fused_gemm(ctx: OpContext, a, b, c=None):
    """Gemm + activation (ORT GemmActivation fusion). Activation scalars
    arrive as activation_alpha/activation_beta instead of a params list."""
    y = gemm(ctx, a, b, c)
    params = [v for v in (ctx.attr("activation_alpha"),
                          ctx.attr("activation_beta")) if v is not None]
    return _apply_activation(ctx.xp, y, ctx.attr("activation"), params)


@op("ConvTransposeWithDynamicPads", foldable=False, static_args=(2,),
    domain="com.microsoft")
def conv_transpose_dynamic_pads(ctx: OpContext, x, w, pads=None, b=None):
    """ConvTranspose whose pads ride as a tensor input instead of an
    attribute (ORT emits this when an upstream pass computes padding).
    XLA needs static padding, so the pads input is a static_arg — the
    tracer guarantees it folds (it is an initializer or shape-derived in
    every real export)."""
    if pads is not None:
        ctx.attrs = dict(ctx.attrs)
        ctx.attrs["pads"] = [int(v) for v in np.asarray(pads).reshape(-1)]
        ctx.attrs.pop("auto_pad", None)
    return conv_transpose(ctx, x, w, b)


@op("BiasSoftmax", foldable=False, domain="com.microsoft")
def bias_softmax(ctx: OpContext, x, bias):
    """softmax(x + bias) over the flattened dims [axis:], with the ORT
    row-broadcast rule: viewing x as [N, D] (D = prod(shape[axis:])) and
    bias as [Nb, D], row i adds bias row
        i // (N // Nb)   when is_inner_broadcast=1  (bias varies on the
                          LEADING batch dims, shared across the inner)
        i %  Nb          when is_inner_broadcast=0  (bias varies on the
                          TRAILING dims, shared across the leading)
    — the specialization ORT writes for softmax(scores + additive mask)
    in transformer graphs."""
    import jax

    xp = ctx.xp
    axis = int(ctx.attr("axis", 1)) % x.ndim
    shape = x.shape
    d = int(np.prod(shape[axis:]))
    n = int(np.prod(shape[:axis])) if axis else 1
    if bias.size % d != 0:
        raise ValueError(
            f"BiasSoftmax: bias size {bias.size} is not a multiple of the "
            f"softmax row size {d}"
        )
    nb = bias.size // d
    xf = x.reshape(n, d)
    bf = bias.astype(x.dtype).reshape(nb, d)
    if n % nb:
        raise ValueError(
            f"BiasSoftmax: {nb} bias rows do not divide {n} input rows"
        )
    if nb == n:
        rows = bf
    elif int(ctx.attr("is_inner_broadcast", 0)):
        rows = xp.repeat(bf, n // nb, axis=0)
    else:
        rows = xp.tile(bf, (n // nb, 1))
    y = xf + rows
    if ctx.is_fold:
        e = np.exp(y - y.max(-1, keepdims=True))
        return (e / e.sum(-1, keepdims=True)).reshape(shape)
    return jax.nn.softmax(y, axis=-1).reshape(shape)


@op("RelativePositionBias", foldable=False, static_args=(1, 2),
    domain="com.microsoft")
def relative_position_bias(ctx: OpContext, bias_table, query_length,
                           key_length):
    """T5-style bucketed relative position bias (the contrib op ORT's
    transformer optimizer folds T5's 40-node bias subgraph into).

    bias_table: [num_buckets, num_heads]; output [1, num_heads, q, k]
    with bucket(relative_position = j - i) per the T5 formula: half the
    buckets exact, half log-spaced out to max_distance (doubled ranges
    when is_bidirectional). Lengths are static (they set the output
    shape), so the whole bias folds to a constant at trace time for
    fixed-shape programs."""
    xp = ctx.xp
    num_buckets, _ = bias_table.shape
    q = int(np.asarray(query_length).reshape(-1)[0])
    k = int(np.asarray(key_length).reshape(-1)[0])
    max_distance = int(ctx.attr("max_distance", 128))
    bidir = bool(ctx.attr("is_bidirectional", 0))
    # bucket indices are pure host math over static lengths
    rel = np.arange(k)[None, :] - np.arange(q)[:, None]  # j - i
    nb = num_buckets
    bucket = np.zeros((q, k), np.int64)
    if bidir:
        nb //= 2
        bucket += (rel > 0).astype(np.int64) * nb
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    bucket += np.where(is_small, rel, large)
    out = xp.take(bias_table, xp.asarray(bucket.reshape(-1)), axis=0)
    out = out.reshape(q, k, bias_table.shape[1])
    return out.transpose(2, 0, 1)[None]
