"""Tensor-manipulation op emitters.

Covers the reference's ops/tensor.rs emitter set (/root/reference/src/
compiler/ops/tensor.rs:72-597) and kernels/manipulation.rs semantics. On TPU
most of these are metadata/layout ops that XLA folds away (SURVEY.md §2.7:
the reference's zero-copy alias map becomes a no-op here).

Shape-carrying computations (Shape→Concat→Reshape chains) are resolved at
trace time by the tracer's constant folding, so every reshape/expand/tile
below sees static shape arguments.
"""

from __future__ import annotations

import numpy as np

from ..config import config
from ..onnx.loader import DTYPE_MAP
from .registry import OpContext, op, static_ints


def canonical_dtype(dt: np.dtype, device: bool) -> np.dtype:
    """Map ONNX dtypes to device dtypes per the TPU-first width policy."""
    if not device:
        return dt
    dt = np.dtype(dt)
    if dt == np.int64:
        return np.dtype(config.index_dtype)
    if dt == np.uint64:
        return np.dtype(np.uint32)
    if dt == np.float64:
        return np.dtype(config.float64_as)
    return dt


@op("Identity")
def identity(ctx: OpContext, x):
    return x


@op("Transpose")
def transpose(ctx: OpContext, x):
    perm = ctx.attr_ints("perm")
    return ctx.xp.transpose(x, axes=perm)


@op("Reshape", static_args=(1,))
def reshape(ctx: OpContext, x, shape=None):
    dims = static_ints(shape if shape is not None else ctx.attr("shape"), "reshape")
    allowzero = bool(ctx.attr("allowzero", 0))
    in_shape = list(np.shape(x))
    out = []
    for i, d in enumerate(dims):
        if d == 0 and not allowzero:
            out.append(in_shape[i])
        else:
            out.append(d)
    if -1 in out:
        known = int(np.prod([d for d in out if d != -1])) or 1
        total = int(np.prod(in_shape)) if in_shape else 1
        out[out.index(-1)] = total // known
    return ctx.xp.reshape(x, tuple(out))


@op("Flatten")
def flatten(ctx: OpContext, x):
    axis = ctx.attr("axis", 1)
    shape = np.shape(x)
    axis = axis if axis >= 0 else axis + len(shape)
    lead = int(np.prod(shape[:axis])) if axis else 1
    return ctx.xp.reshape(x, (lead, -1))


@op("Unsqueeze", static_args=(1,))
def unsqueeze(ctx: OpContext, x, axes=None):
    ax = static_ints(axes if axes is not None else ctx.attr("axes"), "unsqueeze")
    out_rank = np.ndim(x) + len(ax)
    ax = sorted(a if a >= 0 else a + out_rank for a in ax)
    out = x
    for a in ax:
        out = ctx.xp.expand_dims(out, a)
    return out


@op("Squeeze", static_args=(1,))
def squeeze(ctx: OpContext, x, axes=None):
    ax = axes if axes is not None else ctx.attr("axes")
    if ax is None:
        return ctx.xp.squeeze(x)
    ax = static_ints(ax, "squeeze")
    return ctx.xp.squeeze(x, axis=tuple(a if a >= 0 else a + np.ndim(x) for a in ax))


@op("Concat")
def concat(ctx: OpContext, *xs):
    axis = ctx.attr("axis", 0)
    xs = [x for x in xs if x is not None]
    # promote to common dtype (mixed static/dynamic inputs may disagree)
    return ctx.xp.concatenate([ctx.xp.asarray(x) for x in xs], axis=axis)


@op("Where")
def where(ctx: OpContext, cond, a, b):
    return ctx.xp.where(cond.astype(bool) if hasattr(cond, "astype") else cond, a, b)


@op("Gather")
def gather(ctx: OpContext, x, indices):
    axis = ctx.attr("axis", 0)
    idx = indices
    if not ctx.is_fold:
        import jax.numpy as jnp

        idx = jnp.asarray(idx)
        # negative index wraparound (ONNX allows negatives; jnp take clamps)
        dim = np.shape(x)[axis]
        idx = jnp.where(idx < 0, idx + dim, idx)
        return jnp.take(x, idx, axis=axis)
    return np.take(x, np.asarray(idx, dtype=np.int64), axis=axis)


@op("GatherElements")
def gather_elements(ctx: OpContext, x, indices):
    axis = ctx.attr("axis", 0)
    if ctx.is_fold:
        return np.take_along_axis(x, np.asarray(indices, np.int64), axis=axis)
    import jax.numpy as jnp

    idx = jnp.asarray(indices)
    dim = np.shape(x)[axis]
    idx = jnp.where(idx < 0, idx + dim, idx)
    return jnp.take_along_axis(x, idx, axis=axis)


@op("GatherND", foldable=False)
def gather_nd(ctx: OpContext, x, indices):
    import jax.numpy as jnp

    b = int(ctx.attr("batch_dims", 0))
    x = jnp.asarray(x)
    idx = jnp.asarray(indices)
    k = idx.shape[-1]
    dims = jnp.asarray(np.array(x.shape[b : b + k], np.int64), idx.dtype)
    idx = jnp.where(idx < 0, idx + dims, idx)
    if b == 0:
        return x[tuple(idx[..., i] for i in range(k))]
    # collapse the shared batch dims to one axis and index it explicitly
    xb = x.reshape((-1,) + x.shape[b:])
    ib = idx.reshape((-1,) + idx.shape[b:])
    bidx = jnp.arange(xb.shape[0]).reshape((-1,) + (1,) * (ib.ndim - 2))
    bidx = jnp.broadcast_to(bidx, ib.shape[:-1])
    out = xb[(bidx,) + tuple(ib[..., i] for i in range(k))]
    return out.reshape(idx.shape[:b] + out.shape[1:])


@op("Shape")
def shape_(ctx: OpContext, x):
    # always static: shapes are trace-time constants (tracer routes here
    # even for dynamic tensors — SURVEY §2.7 "free metadata ops")
    s = list(np.shape(x))
    start = ctx.attr("start", 0) or 0
    end = ctx.attr("end")
    s = s[start:] if end is None else s[start:end]
    return np.asarray(s, dtype=np.int64)


@op("Size")
def size_(ctx: OpContext, x):
    return np.asarray(int(np.prod(np.shape(x)) if np.ndim(x) else 1), dtype=np.int64)


@op("Cast")
def cast(ctx: OpContext, x):
    to = ctx.attr("to")
    np_dt = DTYPE_MAP[int(to)]
    dt = canonical_dtype(np_dt, device=not ctx.is_fold)
    return ctx.xp.asarray(x).astype(dt)


@op("CastLike")
def cast_like(ctx: OpContext, x, like):
    return ctx.xp.asarray(x).astype(np.asarray(like).dtype if ctx.is_fold else like.dtype)


@op("Constant")
def constant(ctx: OpContext):
    for key in ("value", "value_float", "value_int", "value_ints", "value_floats"):
        v = ctx.attr(key)
        if v is not None:
            if key == "value":
                return v
            if key == "value_float":
                return np.asarray(v, np.float32)
            if key == "value_int":
                return np.asarray(v, np.int64)
            if key == "value_ints":
                return np.asarray(v, np.int64)
            return np.asarray(v, np.float32)
    raise ValueError("Constant node without a value attribute")


@op("ConstantOfShape", static_args=(0,))
def constant_of_shape(ctx: OpContext, shape):
    dims = static_ints(shape, "ConstantOfShape")
    v = ctx.attr("value")
    if v is None:
        return np.zeros(dims, dtype=np.float32)
    v = np.asarray(v)
    return np.full(dims, v.reshape(-1)[0], dtype=v.dtype)


@op("Slice", static_args=(1, 2, 3, 4))
def slice_(ctx: OpContext, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset < 10: attributes
        starts = ctx.attr_ints("starts")
        ends = ctx.attr_ints("ends")
        axes = ctx.attr_ints("axes")
    starts = static_ints(starts, "slice starts")
    ends = static_ints(ends, "slice ends")
    axes_l = static_ints(axes, "slice axes") if axes is not None else list(
        range(len(starts))
    )
    steps_l = static_ints(steps, "slice steps") if steps is not None else [1] * len(
        starts
    )
    rank = np.ndim(x)
    sl = [slice(None)] * rank
    INT_MAX = 2**31 - 1
    for st, en, ax, sp in zip(starts, ends, axes_l, steps_l):
        ax = ax if ax >= 0 else ax + rank
        # clamp huge sentinels (i64 max / INT_MAX used as "to the end")
        if en >= INT_MAX:
            en = None
        elif en <= -INT_MAX:
            en = None if sp < 0 else 0
        sl[ax] = slice(st, en, sp)
    return x[tuple(sl)]


@op("Expand", static_args=(1,))
def expand(ctx: OpContext, x, shape):
    dims = static_ints(shape, "expand shape")
    target = np.broadcast_shapes(np.shape(x), tuple(dims))
    return ctx.xp.broadcast_to(x, target)


@op("Tile", static_args=(1,))
def tile(ctx: OpContext, x, repeats):
    return ctx.xp.tile(x, tuple(static_ints(repeats, "tile repeats")))


@op("Split", static_args=(1,))
def split(ctx: OpContext, x, split_sizes=None):
    axis = ctx.attr("axis", 0)
    rank = np.ndim(x)
    axis = axis if axis >= 0 else axis + rank
    dim = np.shape(x)[axis]
    sizes = None
    if split_sizes is not None:
        sizes = static_ints(split_sizes, "split sizes")
    elif ctx.attr("split") is not None:
        sizes = ctx.attr_ints("split")
    if sizes is None:
        n = ctx.attr("num_outputs")
        if n is None:
            n = len(ctx.node.output) if ctx.node is not None else 2
        base = -(-dim // n)
        sizes = [base] * (n - 1) + [dim - base * (n - 1)]
    offsets = np.cumsum([0] + sizes)
    outs = []
    for i in range(len(sizes)):
        sl = [slice(None)] * rank
        sl[axis] = slice(int(offsets[i]), int(offsets[i + 1]))
        outs.append(x[tuple(sl)])
    return tuple(outs)


@op("Pad", static_args=(1, 3))
def pad(ctx: OpContext, x, pads=None, constant_value=None, axes=None):
    mode = ctx.attr("mode", "constant")
    if pads is None:
        plist = ctx.attr_ints("pads")
        if constant_value is None:  # opset<11 fill lives in the attr
            constant_value = ctx.attr("value", None)
    else:
        plist = static_ints(pads, "pads")
    rank = np.ndim(x)
    if axes is not None:
        ax_l = static_ints(axes, "pad axes")
        full = [0] * (2 * rank)
        for i, a in enumerate(ax_l):
            a = a if a >= 0 else a + rank
            full[a] = plist[i]
            full[rank + a] = plist[len(ax_l) + i]
        plist = full
    pairs = [(plist[i], plist[i + rank]) for i in range(rank)]
    # negative pads crop first
    if any(p < 0 for pair in pairs for p in pair):
        sl = []
        for i, (b, e) in enumerate(pairs):
            start = -b if b < 0 else 0
            stop = np.shape(x)[i] + e if e < 0 else None
            sl.append(slice(start, stop))
        x = x[tuple(sl)]
        pairs = [(max(b, 0), max(e, 0)) for b, e in pairs]
    if mode == "constant":
        cv = 0 if constant_value is None else np.asarray(constant_value).item()
        return ctx.xp.pad(x, pairs, mode="constant", constant_values=cv)
    mode_map = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}
    return ctx.xp.pad(x, pairs, mode=mode_map[mode])


@op("TopK", foldable=False, static_args=(1,))
def topk(ctx: OpContext, x, k):
    import jax
    import jax.numpy as jnp

    kk = static_ints(k, "topk k")[0]
    axis = ctx.attr("axis", -1)
    largest = bool(ctx.attr("largest", 1))
    rank = np.ndim(x)
    axis = axis if axis >= 0 else axis + rank
    moved = jnp.moveaxis(x, axis, -1)
    vals, idx = jax.lax.top_k(moved if largest else -moved, kk)
    if not largest:
        vals = -vals
    vals = jnp.moveaxis(vals, -1, axis)
    idx = jnp.moveaxis(idx, -1, axis)
    return vals, idx.astype(canonical_dtype(np.dtype(np.int64), True))


@op("ArgMax")
def argmax(ctx: OpContext, x):
    axis = ctx.attr("axis", 0)
    keepdims = bool(ctx.attr("keepdims", 1))
    if ctx.attr("select_last_index", 0):
        rev = ctx.xp.flip(x, axis=axis)
        idx = ctx.xp.argmax(rev, axis=axis)
        idx = np.shape(x)[axis] - 1 - idx
    else:
        idx = ctx.xp.argmax(x, axis=axis)
    if keepdims:
        idx = ctx.xp.expand_dims(idx, axis)
    dt = np.int64 if ctx.is_fold else canonical_dtype(np.dtype(np.int64), True)
    return idx.astype(dt)


@op("ArgMin")
def argmin(ctx: OpContext, x):
    axis = ctx.attr("axis", 0)
    keepdims = bool(ctx.attr("keepdims", 1))
    if ctx.attr("select_last_index", 0):
        rev = ctx.xp.flip(x, axis=axis)
        idx = ctx.xp.argmin(rev, axis=axis)
        idx = np.shape(x)[axis] - 1 - idx
    else:
        idx = ctx.xp.argmin(x, axis=axis)
    if keepdims:
        idx = ctx.xp.expand_dims(idx, axis)
    dt = np.int64 if ctx.is_fold else canonical_dtype(np.dtype(np.int64), True)
    return idx.astype(dt)


@op("OneHot", static_args=(1,))
def onehot(ctx: OpContext, indices, depth, values):
    d = static_ints(depth, "onehot depth")[0]
    axis = ctx.attr("axis", -1)
    vals = np.asarray(values) if ctx.is_fold else values
    off, on = vals[0], vals[1]
    idx = ctx.xp.asarray(indices)
    idx = ctx.xp.where(idx < 0, idx + d, idx)
    eye = ctx.xp.arange(d)
    oh = ctx.xp.expand_dims(idx, -1) == eye
    out = ctx.xp.where(oh, on, off)
    if axis != -1:
        out = ctx.xp.moveaxis(out, -1, axis if axis >= 0 else axis + out.ndim)
    return out


@op("DepthToSpace")
def depth_to_space(ctx: OpContext, x):
    b = ctx.attr("blocksize")
    mode = ctx.attr("mode", "DCR")
    n, c, h, w = np.shape(x)
    if mode == "DCR":
        t = ctx.xp.reshape(x, (n, b, b, c // (b * b), h, w))
        t = ctx.xp.transpose(t, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        t = ctx.xp.reshape(x, (n, c // (b * b), b, b, h, w))
        t = ctx.xp.transpose(t, (0, 1, 4, 2, 5, 3))
    return ctx.xp.reshape(t, (n, c // (b * b), h * b, w * b))


@op("SpaceToDepth")
def space_to_depth(ctx: OpContext, x):
    b = ctx.attr("blocksize")
    n, c, h, w = np.shape(x)
    t = ctx.xp.reshape(x, (n, c, h // b, b, w // b, b))
    t = ctx.xp.transpose(t, (0, 3, 5, 1, 2, 4))
    return ctx.xp.reshape(t, (n, c * b * b, h // b, w // b))


@op("ScatterND", foldable=False)
def scatter_nd(ctx: OpContext, data, indices, updates):
    import jax.numpy as jnp

    reduction = ctx.attr("reduction", "none")
    idx = jnp.asarray(indices)
    k = idx.shape[-1]
    flat_idx = tuple(idx[..., i] for i in range(k))
    d = jnp.asarray(data)
    if reduction == "add":
        return d.at[flat_idx].add(updates)
    if reduction == "mul":
        return d.at[flat_idx].multiply(updates)
    return d.at[flat_idx].set(updates)


@op("Dropout")
def dropout(ctx: OpContext, x, ratio=None, training_mode=None):
    """Inference dropout = identity (+ all-true mask when requested)."""
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1 or not ctx.node.output[1]:
        return x
    xp = ctx.xp
    return x, xp.ones(np.shape(x), dtype=bool)


def _rng_key(ctx: OpContext):
    import zlib

    import jax

    from ..config import config

    seed = getattr(config, "rng_seed", 0)
    # ONNX `seed` float attr: ORT gives every kernel with the same explicit
    # seed the same stream, so when present the key derives from the seed
    # ALONE (full 32 bits — masking the sign bit would alias ±x). Without
    # it, each node gets its own stream via a crc32 of its tag — crc32,
    # not hash(), because Python string hashing is randomized per process
    node_seed = ctx.attr("seed") if ctx.node is not None else None
    key = jax.random.PRNGKey(seed)
    if node_seed is not None:
        return jax.random.fold_in(
            key, np.float32(node_seed).view(np.uint32).item())
    tag = (ctx.node.name or ctx.node.output[0]) if ctx.node is not None else ""
    return jax.random.fold_in(key, zlib.crc32(tag.encode()))


@op("RandomNormal", foldable=False)
def random_normal(ctx: OpContext):
    import jax

    shape = tuple(ctx.attr_ints("shape"))
    mean = ctx.attr("mean", 0.0)
    scale = ctx.attr("scale", 1.0)
    return mean + scale * jax.random.normal(_rng_key(ctx), shape, jnp_dtype(ctx))


def _like_dtype(ctx: OpContext, x):
    """Random*Like: the optional `dtype` attr overrides the input's."""
    dt = ctx.attr("dtype")
    if dt is None:
        return x.dtype
    from ..onnx.loader import DTYPE_MAP

    return canonical_dtype(DTYPE_MAP[int(dt)], device=not ctx.is_fold)


@op("RandomNormalLike", foldable=False)
def random_normal_like(ctx: OpContext, x):
    import jax

    mean = ctx.attr("mean", 0.0)
    scale = ctx.attr("scale", 1.0)
    return mean + scale * jax.random.normal(
        _rng_key(ctx), np.shape(x), _like_dtype(ctx, x))


@op("RandomUniform", foldable=False)
def random_uniform(ctx: OpContext):
    import jax

    shape = tuple(ctx.attr_ints("shape"))
    lo = ctx.attr("low", 0.0)
    hi = ctx.attr("high", 1.0)
    return jax.random.uniform(_rng_key(ctx), shape, jnp_dtype(ctx), lo, hi)


@op("RandomUniformLike", foldable=False)
def random_uniform_like(ctx: OpContext, x):
    import jax

    lo = ctx.attr("low", 0.0)
    hi = ctx.attr("high", 1.0)
    return jax.random.uniform(
        _rng_key(ctx), np.shape(x), _like_dtype(ctx, x), lo, hi)


def jnp_dtype(ctx: OpContext):
    dt = ctx.attr("dtype")
    if dt is None:
        return np.float32
    return canonical_dtype(DTYPE_MAP[int(dt)], device=True)


@op("ReduceSumSquare", static_args=(1,))
def reduce_sum_square(ctx: OpContext, x, axes=None):
    from .math_ops import _reduce

    return _reduce(ctx, "sum", ctx.xp.square(x), axes)


@op("ScatterElements", foldable=False)
def scatter_elements(ctx: OpContext, data, indices, updates):
    import jax.numpy as jnp

    axis = ctx.attr("axis", 0)
    reduction = ctx.attr("reduction", "none")
    d = jnp.asarray(data)
    idx = jnp.asarray(indices)
    dim = np.shape(data)[axis]
    idx = jnp.where(idx < 0, idx + dim, idx)
    # build full index grids for take_along_axis-style scatter
    grids = list(jnp.meshgrid(
        *[jnp.arange(s) for s in idx.shape], indexing="ij"
    ))
    grids[axis] = idx
    loc = tuple(grids)
    if reduction == "add":
        return d.at[loc].add(updates)
    if reduction == "mul":
        return d.at[loc].multiply(updates)
    return d.at[loc].set(updates)


def _dynamic_shape_error(op_name: str, hint: str):
    raise NotImplementedError(
        f"{op_name} produces data-dependent output shapes, which XLA's "
        f"static-shape model cannot express for runtime inputs. {hint}"
    )


def _require_concrete(op_name: str, v, what: str, hint: str) -> np.ndarray:
    """Data-dependent-shape ops fold at trace time when their shape-driving
    input is a constant (tracer folds whole static subgraphs, so this covers
    e.g. NonZero over an initializer mask); a runtime input raises with the
    workaround hint instead."""
    import jax

    if isinstance(v, jax.core.Tracer):
        _dynamic_shape_error(op_name, f"{what} must be trace-time static. {hint}")
    return np.asarray(v)


_NONZERO_HINT = ("Use a fixed-size mask (Where/Greater) or postprocess on "
                 "host; the model families here are NMS-free by design.")


@op("NonZero")
def nonzero(ctx: OpContext, x):
    x = _require_concrete("NonZero", x, "the input", _NONZERO_HINT)
    return np.stack(np.nonzero(x)).astype(np.int64)


@op("Unique")
def unique(ctx: OpContext, x):
    x = _require_concrete("Unique", x, "the input",
                          "Deduplicate on host after inference.")
    axis = ctx.attr("axis")
    if axis is not None:
        axis = int(axis) % max(x.ndim, 1)
    y, idx, inv, cnt = np.unique(
        x, return_index=True, return_inverse=True, return_counts=True,
        axis=axis)
    inv = inv.reshape(-1)
    if not int(ctx.attr("sorted", 1)):
        order = np.argsort(idx, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(order.size)
        y = y[order] if axis is None else np.take(y, order, axis=axis)
        idx, cnt, inv = idx[order], cnt[order], rank[inv]
    return (y, idx.astype(np.int64), inv.astype(np.int64),
            cnt.astype(np.int64))


@op("Compress", foldable=False, static_args=(1,))
def compress(ctx: OpContext, data, condition):
    """Output length = number of true conditions: static once the condition
    is, so a constant condition compiles to a plain gather over runtime
    data; only a runtime condition is inexpressible."""
    cond = _require_concrete(
        "Compress", condition, "the condition",
        "Select with a constant mask, or Where + fixed-size postprocess.")
    idx = np.nonzero(cond.reshape(-1).astype(bool))[0]
    axis = ctx.attr("axis")
    # a True past the data extent is an invalid model: numpy raises on the
    # fold path, so the trace path must too (jnp.take would silently clamp
    # and duplicate the last element — divergent invalid-model behavior)
    extent = (int(np.prod(np.shape(data))) if axis is None
              else int(np.shape(data)[int(axis)]))
    if idx.size and int(idx.max()) >= extent:
        raise ValueError(
            f"Compress: condition marks index {int(idx.max())} but the "
            f"compressed axis has extent {extent}")
    if axis is None:
        return ctx.xp.take(ctx.xp.reshape(data, (-1,)), idx, axis=0)
    return ctx.xp.take(data, idx, axis=int(axis))


@op("NonMaxSuppression", foldable=False)
def non_max_suppression(ctx: OpContext, *args):
    _dynamic_shape_error(
        "NonMaxSuppression",
        "Use an NMS-free head (top-k + threshold, as YOLO26 does) or run "
        "NMS on host over the fixed-size candidate set.")
