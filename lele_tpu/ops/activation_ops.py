"""Activation op emitters.

Covers the reference's ops/activations.rs (/root/reference/src/compiler/ops/
activations.rs:15-60: Relu/Sigmoid/Softmax/ArgMax/Tanh) plus the activation
kernels its SIMD backends hand-roll (silu/gelu/erf/softplus — kernels/math.rs,
neon/math.rs:76-723). XLA fuses these into adjacent matmuls/convs.
"""

from __future__ import annotations

import numpy as np

from .registry import OpContext, op


@op("Relu")
def relu(ctx: OpContext, x):
    return ctx.xp.maximum(x, ctx.xp.asarray(0, dtype=ctx.xp.asarray(x).dtype))


@op("Sigmoid", foldable=False)
def sigmoid(ctx: OpContext, x):
    import jax

    return jax.nn.sigmoid(x)


@op("Tanh")
def tanh(ctx: OpContext, x):
    return ctx.xp.tanh(x)


@op("Softmax", foldable=False)
def softmax(ctx: OpContext, x):
    import jax

    if ctx.opset >= 13:
        axis = ctx.attr("axis", -1)
        return jax.nn.softmax(x, axis=axis)
    # opset < 13: flatten to 2D at axis, softmax over trailing block
    import jax.numpy as jnp

    axis = ctx.attr("axis", 1)
    shape = np.shape(x)
    axis = axis if axis >= 0 else axis + len(shape)
    lead = int(np.prod(shape[:axis])) if axis else 1
    flat = jnp.reshape(x, (lead, -1))
    return jnp.reshape(jax.nn.softmax(flat, axis=-1), shape)


@op("LogSoftmax", foldable=False)
def log_softmax(ctx: OpContext, x):
    import jax

    if ctx.opset >= 13:
        return jax.nn.log_softmax(x, axis=ctx.attr("axis", -1))
    # opset < 13: like Softmax, flatten to 2D at axis and normalize the
    # whole trailing block (matches ORT for rank>2 inputs)
    import jax.numpy as jnp

    axis = ctx.attr("axis", 1)
    shape = np.shape(x)
    axis = axis if axis >= 0 else axis + len(shape)
    lead = int(np.prod(shape[:axis])) if axis else 1
    flat = jnp.reshape(x, (lead, -1))
    return jnp.reshape(jax.nn.log_softmax(flat, axis=-1), shape)


@op("LeakyRelu", foldable=False)
def leaky_relu(ctx: OpContext, x):
    import jax.numpy as jnp

    alpha = ctx.attr("alpha", 0.01)
    return jnp.where(x >= 0, x, jnp.asarray(alpha, x.dtype) * x)


@op("Elu", foldable=False)
def elu(ctx: OpContext, x):
    import jax.numpy as jnp

    alpha = ctx.attr("alpha", 1.0)
    return jnp.where(x > 0, x, jnp.asarray(alpha, x.dtype) * (jnp.exp(x) - 1))


@op("Selu", foldable=False)
def selu(ctx: OpContext, x):
    import jax.numpy as jnp

    alpha = ctx.attr("alpha", 1.6732632423543772)
    gamma = ctx.attr("gamma", 1.0507009873554805)
    return jnp.asarray(gamma, x.dtype) * jnp.where(
        x > 0, x, jnp.asarray(alpha, x.dtype) * (jnp.exp(x) - 1)
    )


@op("Celu", foldable=False)
def celu(ctx: OpContext, x):
    import jax.numpy as jnp

    alpha = ctx.attr("alpha", 1.0)
    return jnp.maximum(x, 0) + jnp.minimum(
        0, jnp.asarray(alpha, x.dtype) * (jnp.exp(x / alpha) - 1)
    )


@op("HardSigmoid")
def hard_sigmoid(ctx: OpContext, x):
    alpha = ctx.attr("alpha", 0.2)
    beta = ctx.attr("beta", 0.5)
    return ctx.xp.clip(alpha * x + beta, 0.0, 1.0).astype(ctx.xp.asarray(x).dtype)


@op("HardSwish", foldable=False)
def hard_swish(ctx: OpContext, x):
    import jax.numpy as jnp

    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


@op("Softplus", foldable=False)
def softplus(ctx: OpContext, x):
    import jax

    return jax.nn.softplus(x)


@op("Softsign")
def softsign(ctx: OpContext, x):
    return x / (1 + ctx.xp.abs(x))


@op("Gelu", foldable=False)
def gelu(ctx: OpContext, x):
    import jax

    approx = ctx.attr("approximate", "none") == "tanh"
    return jax.nn.gelu(x, approximate=approx)


@op("Mish", foldable=False)
def mish(ctx: OpContext, x):
    import jax

    return x * jax.numpy.tanh(jax.nn.softplus(x))


@op("ThresholdedRelu", foldable=False)
def thresholded_relu(ctx: OpContext, x):
    import jax.numpy as jnp

    alpha = ctx.attr("alpha", 1.0)
    return jnp.where(x > alpha, x, jnp.zeros_like(x))
