"""Math op emitters: elementwise, comparisons, reductions, matmul, STFT.

Covers the reference's ops/math.rs emitter set (/root/reference/src/compiler/
ops/math.rs:13-483) plus kernels/math.rs semantics, expressed as jnp/numpy —
XLA fuses the elementwise chains that the reference hand-vectorized with
NEON/AVX (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

from ..config import config
from .registry import OpContext, op, static_ints


def _prec():
    import jax

    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[config.matmul_precision]


# -- binary elementwise ------------------------------------------------------


@op("Add")
def add(ctx: OpContext, a, b):
    return ctx.xp.add(a, b)


@op("Sub")
def sub(ctx: OpContext, a, b):
    return ctx.xp.subtract(a, b)


@op("Mul")
def mul(ctx: OpContext, a, b):
    return ctx.xp.multiply(a, b)


@op("Div")
def div(ctx: OpContext, a, b):
    a_ = ctx.xp.asarray(a)
    if ctx.xp.issubdtype(a_.dtype, ctx.xp.integer):
        # ONNX integer Div truncates toward zero (C semantics): adjust the
        # floor quotient up by one when signs differ and division is inexact
        q = ctx.xp.floor_divide(a, b)
        r = a_ - q * ctx.xp.asarray(b)
        neg = (a_ < 0) != (ctx.xp.asarray(b) < 0)
        return ctx.xp.where((r != 0) & neg, q + 1, q)
    return ctx.xp.divide(a, b)


@op("Mod")
def mod(ctx: OpContext, a, b):
    if ctx.attr("fmod", 0):
        return ctx.xp.fmod(a, b)
    return ctx.xp.mod(a, b)


@op("Pow")
def pow_(ctx: OpContext, a, b):
    out = ctx.xp.power(a, ctx.xp.asarray(b).astype(ctx.xp.asarray(a).dtype))
    return out.astype(ctx.xp.asarray(a).dtype)


@op("Max")
def max_(ctx: OpContext, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = ctx.xp.maximum(out, x)
    return out


@op("Min")
def min_(ctx: OpContext, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = ctx.xp.minimum(out, x)
    return out


@op("Sum")
def sum_variadic(ctx: OpContext, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = ctx.xp.add(out, x)
    return out


@op("Mean")
def mean_variadic(ctx: OpContext, *xs):
    return sum_variadic(ctx, *xs) / len(xs)


@op("PRelu")
def prelu(ctx: OpContext, x, slope):
    return ctx.xp.where(x < 0, x * slope, x)


@op("Clip")
def clip(ctx: OpContext, x, lo=None, hi=None):
    if lo is None and "min" in ctx.attrs:
        lo = ctx.attr("min")
    if hi is None and "max" in ctx.attrs:
        hi = ctx.attr("max")
    out = x
    if lo is not None:
        out = ctx.xp.maximum(out, lo)
    if hi is not None:
        out = ctx.xp.minimum(out, hi)
    return out


# -- unary -------------------------------------------------------------------

for _name, _fn in [
    ("Sqrt", "sqrt"), ("Exp", "exp"), ("Log", "log"), ("Sin", "sin"),
    ("Cos", "cos"), ("Tan", "tan"), ("Asin", "arcsin"), ("Acos", "arccos"),
    ("Atan", "arctan"), ("Sinh", "sinh"), ("Cosh", "cosh"),
    ("Abs", "abs"), ("Floor", "floor"), ("Ceil", "ceil"),
    ("Sign", "sign"),
]:
    def _make(fname):
        def emitter(ctx: OpContext, x):
            return getattr(ctx.xp, fname)(x)
        return emitter
    op(_name)(_make(_fn))


@op("Neg")
def neg(ctx: OpContext, x):
    return ctx.xp.negative(x)


@op("Reciprocal")
def reciprocal(ctx: OpContext, x):
    return ctx.xp.asarray(1.0, dtype=ctx.xp.asarray(x).dtype) / x


@op("Round")
def round_(ctx: OpContext, x):
    return ctx.xp.round(x)  # round-half-to-even, matches ONNX


@op("Erf", foldable=False)
def erf(ctx: OpContext, x):
    import jax

    return jax.lax.erf(x)


@op("IsNaN")
def isnan(ctx: OpContext, x):
    return ctx.xp.isnan(x)


@op("IsInf")
def isinf(ctx: OpContext, x):
    return ctx.xp.isinf(x)


# -- comparisons / logic -----------------------------------------------------


@op("Equal")
def equal(ctx: OpContext, a, b):
    return ctx.xp.equal(a, b)


@op("Less")
def less(ctx: OpContext, a, b):
    return ctx.xp.less(a, b)


@op("LessOrEqual")
def less_equal(ctx: OpContext, a, b):
    return ctx.xp.less_equal(a, b)


@op("Greater")
def greater(ctx: OpContext, a, b):
    return ctx.xp.greater(a, b)


@op("GreaterOrEqual")
def greater_equal(ctx: OpContext, a, b):
    return ctx.xp.greater_equal(a, b)


@op("Not")
def not_(ctx: OpContext, x):
    return ctx.xp.logical_not(x)


@op("And")
def and_(ctx: OpContext, a, b):
    return ctx.xp.logical_and(a, b)


@op("Or")
def or_(ctx: OpContext, a, b):
    return ctx.xp.logical_or(a, b)


@op("Xor")
def xor_(ctx: OpContext, a, b):
    return ctx.xp.logical_xor(a, b)


# -- reductions --------------------------------------------------------------


def _reduce(ctx: OpContext, fn_name: str, x, axes_in=None):
    """Shared ONNX reduce semantics: axes as attr (<opset 13/18) or input."""
    keepdims = bool(ctx.attr("keepdims", 1))
    noop_empty = bool(ctx.attr("noop_with_empty_axes", 0))
    axes = ctx.attr_ints("axes")
    if axes_in is not None:
        axes = static_ints(axes_in, "reduce axes")
    if axes is not None and len(axes) == 0:
        axes = None
    if axes is None:
        if noop_empty:
            return x
        axes_t = None  # all axes
    else:
        axes_t = tuple(int(a) for a in axes)
    return getattr(ctx.xp, fn_name)(x, axis=axes_t, keepdims=keepdims)


@op("ReduceSum", static_args=(1,))
def reduce_sum(ctx, x, axes=None):
    return _reduce(ctx, "sum", x, axes)


@op("ReduceMean", static_args=(1,))
def reduce_mean(ctx, x, axes=None):
    return _reduce(ctx, "mean", x, axes)


@op("ReduceMax", static_args=(1,))
def reduce_max(ctx, x, axes=None):
    return _reduce(ctx, "max", x, axes)


@op("ReduceMin", static_args=(1,))
def reduce_min(ctx, x, axes=None):
    return _reduce(ctx, "min", x, axes)


@op("ReduceProd", static_args=(1,))
def reduce_prod(ctx, x, axes=None):
    return _reduce(ctx, "prod", x, axes)


@op("ReduceL2", static_args=(1,))
def reduce_l2(ctx, x, axes=None):
    return ctx.xp.sqrt(_reduce(ctx, "sum", ctx.xp.square(x), axes))


@op("ReduceL1", static_args=(1,))
def reduce_l1(ctx, x, axes=None):
    return _reduce(ctx, "sum", ctx.xp.abs(x), axes)


@op("ReduceLogSumExp", static_args=(1,))
def reduce_lse(ctx, x, axes=None):
    m = _reduce(ctx, "max", x, axes)
    keep = bool(ctx.attr("keepdims", 1))
    mb = m if keep else _reduce(
        OpContext(ctx.xp, {**ctx.attrs, "keepdims": 1}, ctx.opset), "max", x, axes
    )
    return ctx.xp.log(_reduce(ctx, "sum", ctx.xp.exp(x - mb), axes)) + m


@op("CumSum", static_args=(1,))
def cumsum(ctx: OpContext, x, axis):
    ax = static_ints(axis, "cumsum axis")[0]
    if ctx.attr("exclusive", 0) or ctx.attr("reverse", 0):
        xx = x
        if ctx.attr("reverse", 0):
            xx = ctx.xp.flip(xx, axis=ax)
        c = ctx.xp.cumsum(xx, axis=ax)
        if ctx.attr("exclusive", 0):
            c = ctx.xp.roll(c, 1, axis=ax)
            idx = [slice(None)] * c.ndim
            idx[ax] = slice(0, 1)
            c = c.at[tuple(idx)].set(0) if hasattr(c, "at") else _np_set0(c, idx)
        if ctx.attr("reverse", 0):
            c = ctx.xp.flip(c, axis=ax)
        return c
    return ctx.xp.cumsum(x, axis=ax)


def _np_set0(c, idx):
    c = c.copy()
    c[tuple(idx)] = 0
    return c


# -- matmul family -----------------------------------------------------------


@op("MatMul", foldable=False)
def matmul(ctx: OpContext, a, b):
    import jax.numpy as jnp

    return jnp.matmul(a, b, precision=_prec())


@op("Gemm", foldable=False)
def gemm(ctx: OpContext, a, b, c=None):
    import jax.numpy as jnp

    alpha = ctx.attr("alpha", 1.0)
    beta = ctx.attr("beta", 1.0)
    if ctx.attr("transA", 0):
        a = a.T
    if ctx.attr("transB", 0):
        b = b.T
    out = jnp.matmul(a, b, precision=_prec())
    if alpha != 1.0:
        out = out * jnp.asarray(alpha, out.dtype)
    if c is not None and beta != 0.0:
        out = out + (c if beta == 1.0 else jnp.asarray(beta, out.dtype) * c)
    return out


@op("Einsum", foldable=False)
def einsum(ctx: OpContext, *xs):
    import jax.numpy as jnp

    return jnp.einsum(ctx.attr("equation"), *xs, precision=_prec())


# -- range / trilu -----------------------------------------------------------


@op("Range", static_args=(0, 1, 2))
def range_(ctx: OpContext, start, limit, delta):
    # shape depends on values → must fold (tracer guarantees static inputs)
    s, l, d = np.asarray(start), np.asarray(limit), np.asarray(delta)
    return np.arange(s.item(), l.item(), d.item(), dtype=s.dtype)


@op("Trilu", static_args=(1,))
def trilu(ctx: OpContext, x, k=None):
    kk = static_ints(k, "trilu k")[0] if k is not None else 0
    if ctx.attr("upper", 1):
        return ctx.xp.triu(x, kk)
    return ctx.xp.tril(x, kk)


# -- STFT (opset 17) ---------------------------------------------------------


@op("STFT", foldable=False, static_args=(1, 3))
def stft(ctx: OpContext, signal, frame_step, window=None, frame_length=None):
    """ONNX STFT → framing + rFFT, all on device.

    Reference implements this host-side in kernels/math.rs:2304 with a custom
    radix-2 FFT; on TPU the XLA FFT custom-call handles the transform and the
    framing is static slices (features/framing.py — a 2-D index gather from
    a flat signal lowers to a serial scalar loop on TPU). Output
    [B, frames, bins, 2] (real, imag).
    """
    import jax.numpy as jnp

    from ..features.framing import frame_signal

    step = static_ints(frame_step, "frame_step")[0]
    if signal.ndim == 3:  # [B, L, 1]
        signal = signal[..., 0]
    if window is not None:
        flen = int(window.shape[-1])
    elif frame_length is not None:
        flen = static_ints(frame_length, "frame_length")[0]
    else:
        raise ValueError("STFT requires window or frame_length")
    frames = frame_signal(signal, flen, step)  # [B, frames, flen]
    if window is not None:
        frames = frames * window
    onesided = bool(ctx.attr("onesided", 1))
    if onesided:
        spec = jnp.fft.rfft(frames, n=flen, axis=-1)
    else:
        spec = jnp.fft.fft(frames, n=flen, axis=-1)
    return jnp.stack([spec.real, spec.imag], axis=-1).astype(jnp.float32)
