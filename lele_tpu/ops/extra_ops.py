"""Long-tail ONNX ops beyond the reference's ~70-op surface.

The reference implements only the ops its five model families need
(SURVEY.md §2.1 emitter tables); everything here EXCEEDS it, completing
the practical ai.onnx opset so arbitrary exported graphs compile. All
implementations are XLA-first: gathers/scatters stay on device, windows
use lax.reduce_window, sampling ops are vectorized (no Python loops over
data-dependent extents).
"""

from __future__ import annotations

import numpy as np

from .registry import OpContext, op
from .tensor_ops import static_ints


# -- trivially-missing elementwise --------------------------------------------


@op("Acosh")
def acosh(ctx: OpContext, x):
    return ctx.xp.arccosh(x)


@op("Asinh")
def asinh(ctx: OpContext, x):
    return ctx.xp.arcsinh(x)


@op("Atanh")
def atanh(ctx: OpContext, x):
    return ctx.xp.arctanh(x)


@op("BitShift")
def bit_shift(ctx: OpContext, x, y):
    direction = ctx.attr("direction", "LEFT")
    if isinstance(direction, bytes):
        direction = direction.decode()
    fn = ctx.xp.left_shift if direction == "LEFT" else ctx.xp.right_shift
    return fn(x, y)


@op("BitwiseAnd")
def bitwise_and(ctx: OpContext, x, y):
    return ctx.xp.bitwise_and(x, y)


@op("BitwiseOr")
def bitwise_or(ctx: OpContext, x, y):
    return ctx.xp.bitwise_or(x, y)


@op("BitwiseXor")
def bitwise_xor(ctx: OpContext, x, y):
    return ctx.xp.bitwise_xor(x, y)


@op("BitwiseNot")
def bitwise_not(ctx: OpContext, x):
    return ctx.xp.invert(x)


@op("Shrink")
def shrink(ctx: OpContext, x):
    lambd = ctx.attr("lambd", 0.5)
    bias = ctx.attr("bias", 0.0)
    xp = ctx.xp
    return xp.where(x < -lambd, x + bias, xp.where(x > lambd, x - bias, 0.0)).astype(
        np.asarray(x).dtype if ctx.is_fold else x.dtype
    )


@op("Hardmax")
def hardmax(ctx: OpContext, x):
    xp = ctx.xp
    axis = ctx.attr("axis", -1 if ctx.opset >= 13 else 1)
    dt = np.asarray(x).dtype if ctx.is_fold else x.dtype
    if ctx.opset < 13:
        # pre-13 semantics: flatten to 2-D at `axis`, one hot per trailing
        # BLOCK (same coercion this file's Softmax/LogSoftmax apply)
        shape = np.shape(x)
        axis = axis if axis >= 0 else axis + len(shape)
        lead = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
        flat = xp.reshape(x, (lead, -1))
        idx = xp.argmax(flat, axis=-1)
        eye = xp.eye(flat.shape[-1] if not ctx.is_fold else
                     np.shape(flat)[-1], dtype=dt)
        return xp.reshape(eye[idx], shape)
    idx = xp.argmax(x, axis=axis)
    n = np.shape(x)[axis]
    eye = xp.eye(n, dtype=dt)
    out = eye[idx]  # one-hot goes to the last axis
    return xp.moveaxis(out, -1, axis)


@op("EyeLike")
def eye_like(ctx: OpContext, x):
    from .tensor_ops import canonical_dtype
    from ..onnx.loader import DTYPE_MAP

    k = int(ctx.attr("k", 0))
    dt = ctx.attr("dtype")
    dtype = (
        canonical_dtype(DTYPE_MAP[int(dt)], device=not ctx.is_fold)
        if dt is not None
        else (np.asarray(x).dtype if ctx.is_fold else x.dtype)
    )
    n, m = np.shape(x)
    return ctx.xp.eye(n, m, k=k, dtype=dtype)


@op("Det")
def det(ctx: OpContext, x):
    return ctx.xp.linalg.det(x)


@op("ReduceLogSum", static_args=(1,))
def reduce_log_sum(ctx: OpContext, x, axes=None):
    from .math_ops import _reduce

    return ctx.xp.log(_reduce(ctx, "sum", x, axes))


# -- normalization / pooling --------------------------------------------------


@op("LRN", foldable=False)
def lrn(ctx: OpContext, x):
    """Local response normalization across channels (axis 1), windowed
    square-sum via a cumulative sum (O(C) instead of O(C·size))."""
    import jax.numpy as jnp

    size = int(ctx.attr("size"))
    alpha = ctx.attr("alpha", 1e-4)
    beta = ctx.attr("beta", 0.75)
    bias = ctx.attr("bias", 1.0)
    C = np.shape(x)[1]
    lo, hi = (size - 1) // 2, size // 2  # window [c-lo, c+hi]
    sq = jnp.square(x)
    cs = jnp.cumsum(sq, axis=1)
    cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)  # prefix sums
    upper = jnp.minimum(jnp.arange(C) + hi + 1, C)
    lower = jnp.maximum(jnp.arange(C) - lo, 0)
    win = jnp.take(cs, upper, axis=1) - jnp.take(cs, lower, axis=1)
    return x / jnp.power(bias + (alpha / size) * win, beta)


@op("GlobalLpPool", foldable=False)
def global_lp_pool(ctx: OpContext, x):
    import jax.numpy as jnp

    p = int(ctx.attr("p", 2))
    axes = tuple(range(2, np.ndim(x)))
    s = jnp.sum(jnp.power(jnp.abs(x), p), axis=axes, keepdims=True)
    return jnp.power(s, 1.0 / p)


@op("LpPool", foldable=False)
def lp_pool(ctx: OpContext, x):
    import jax
    import jax.numpy as jnp

    from .nn_ops import _pool

    p = int(ctx.attr("p", 2))
    s = _pool(ctx, jnp.power(jnp.abs(x), p), jax.lax.add, 0.0)
    return jnp.power(s, 1.0 / p)


# (MeanVarianceNormalization lives in nn_ops.py — this module used to carry
# a second registration with different numerics that silently lost the
# import-order race; one copy only.)


# -- sequence-axis utilities ---------------------------------------------------


@op("ReverseSequence", foldable=False)
def reverse_sequence(ctx: OpContext, x, seq_lens):
    """Per-batch reversal within [0, seq_lens[b]) along time_axis (shares
    nn_ops._seq_reverse, the same gather the ragged RNNs use)."""
    import jax.numpy as jnp

    from .nn_ops import _seq_reverse

    batch_axis = int(ctx.attr("batch_axis", 1))
    time_axis = int(ctx.attr("time_axis", 0))
    xt = jnp.moveaxis(jnp.asarray(x), (time_axis, batch_axis), (0, 1))
    out = _seq_reverse(xt, seq_lens)
    return jnp.moveaxis(out, (0, 1), (time_axis, batch_axis))


# -- spectral ------------------------------------------------------------------


def _cosine_window(ctx: OpContext, size, a0, a1, a2=0.0):
    from .tensor_ops import canonical_dtype
    from ..onnx.loader import DTYPE_MAP

    xp = ctx.xp
    n = int(np.asarray(size))
    periodic = int(ctx.attr("periodic", 1))
    dt = ctx.attr("output_datatype", 1)
    dtype = canonical_dtype(DTYPE_MAP[int(dt)], device=not ctx.is_fold)
    denom = n if periodic else n - 1
    i = xp.arange(n)
    w = (
        a0
        - a1 * xp.cos(2 * np.pi * i / denom)
        + a2 * xp.cos(4 * np.pi * i / denom)
    )
    return w.astype(dtype)


@op("HannWindow", static_args=(0,))
def hann_window(ctx: OpContext, size):
    return _cosine_window(ctx, size, 0.5, 0.5)


@op("HammingWindow", static_args=(0,))
def hamming_window(ctx: OpContext, size):
    # onnx spec coefficients (25/46)
    return _cosine_window(ctx, size, 25.0 / 46.0, 1 - 25.0 / 46.0)


@op("BlackmanWindow", static_args=(0,))
def blackman_window(ctx: OpContext, size):
    return _cosine_window(ctx, size, 0.42, 0.5, 0.08)


@op("MelWeightMatrix", static_args=(0, 1, 2, 3, 4))
def mel_weight_matrix(ctx: OpContext, num_mel_bins, dft_length, sample_rate,
                      lower_edge_hertz, upper_edge_hertz):
    """HTK-mel triangular filterbank, integer-bin triangles per the onnx
    reference algorithm. (The audio front-end has its own sparse mel bank —
    features/mel.py — this op serves generic exported graphs.)"""
    from .tensor_ops import canonical_dtype
    from ..onnx.loader import DTYPE_MAP

    nm = int(np.asarray(num_mel_bins))
    nfft = int(np.asarray(dft_length))
    sr = int(np.asarray(sample_rate))
    f_lo = float(np.asarray(lower_edge_hertz))
    f_hi = float(np.asarray(upper_edge_hertz))
    dt = ctx.attr("output_datatype", 1)
    dtype = canonical_dtype(DTYPE_MAP[int(dt)], device=not ctx.is_fold)

    n_spec = nfft // 2 + 1
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    m = np.arange(nm + 2, dtype=np.float64)
    m = m * (mel(f_hi) - mel(f_lo)) / (nm + 2) + mel(f_lo)
    hz = 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    bins = (((nfft + 1) * hz) // sr).astype(np.int64)  # [nm+2]
    lower, center, upper = bins[:-2], bins[1:-1], bins[2:]
    j = np.arange(n_spec, dtype=np.int64)[:, None]
    up = (j - lower) / np.maximum(center - lower, 1)
    down = (upper - j) / np.maximum(upper - center, 1)
    w = np.where(
        (j >= lower) & (j < center), up,
        np.where((j >= center) & (j < upper), down, 0.0),
    )
    out = w.astype(dtype)
    return out if ctx.is_fold else ctx.xp.asarray(out)


@op("DFT", foldable=False, static_args=(1, 2))
def dft(ctx: OpContext, x, dft_length=None, axis_in=None):
    """ONNX DFT (opset 17 attrs / opset 20 axis input); last input dim is
    the real/imag component axis. XLA FFT custom call underneath."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    inverse = int(ctx.attr("inverse", 0))
    onesided = int(ctx.attr("onesided", 0))
    axis = int(np.asarray(axis_in)) if axis_in is not None else int(ctx.attr("axis", 1))
    if axis < 0:
        axis += x.ndim  # spec: negative axis counts from the FULL rank
        # (including the trailing component dim), so -2 on [B, n, 2] → 1
    if x.shape[-1] == 2:
        sig = x[..., 0].astype(jnp.float32) + 1j * x[..., 1].astype(jnp.float32)
    else:
        sig = x[..., 0].astype(jnp.float32)
    n = int(np.asarray(dft_length)) if dft_length is not None else sig.shape[axis]
    if inverse:
        out = jnp.fft.ifft(sig, n=n, axis=axis)
    else:
        out = jnp.fft.fft(sig, n=n, axis=axis)
    if onesided:
        keep = n // 2 + 1
        out = jnp.take(out, jnp.arange(keep), axis=axis)
    return jnp.stack([out.real, out.imag], axis=-1).astype(x.dtype)


# -- random --------------------------------------------------------------------


@op("Bernoulli", foldable=False)
def bernoulli(ctx: OpContext, x):
    import jax

    from .tensor_ops import _rng_key, canonical_dtype
    from ..onnx.loader import DTYPE_MAP

    dt = ctx.attr("dtype")
    dtype = (
        canonical_dtype(DTYPE_MAP[int(dt)], device=True)
        if dt is not None
        else x.dtype
    )
    return jax.random.bernoulli(_rng_key(ctx), x).astype(dtype)


@op("Multinomial", foldable=False)
def multinomial(ctx: OpContext, x):
    import jax
    import jax.numpy as jnp

    from .tensor_ops import _rng_key, canonical_dtype
    from ..onnx.loader import DTYPE_MAP

    n = int(ctx.attr("sample_size", 1))
    dt = ctx.attr("dtype", 6)  # default int32
    dtype = canonical_dtype(DTYPE_MAP[int(dt)], device=True)
    # spec: input IS unnormalized log-probabilities — no log() here
    logits = jnp.asarray(x)
    out = jax.random.categorical(_rng_key(ctx), logits, axis=-1, shape=(n,) + np.shape(x)[:1])
    return jnp.swapaxes(out, 0, 1).astype(dtype)  # [batch, sample_size]


# -- losses --------------------------------------------------------------------


def _nll(ctx: OpContext, log_p, target, weight):
    """Shared NLL core on log-probabilities [N, C, d...]."""
    import jax.numpy as jnp

    reduction = ctx.attr("reduction", "mean")
    if isinstance(reduction, bytes):
        reduction = reduction.decode()
    ignore_index = ctx.attr("ignore_index")
    tgt = jnp.asarray(target).astype(jnp.int32)
    valid = None
    if ignore_index is not None:
        valid = tgt != int(ignore_index)
        tgt = jnp.where(valid, tgt, 0)
    # gather log_p[n, tgt, d...]
    picked = jnp.take_along_axis(log_p, tgt[:, None], axis=1)[:, 0]
    w = None
    if weight is not None:
        w = jnp.asarray(weight)[tgt]
    loss = -picked
    if w is not None:
        loss = loss * w
    if valid is not None:
        loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    denom = None
    if w is not None:
        denom = jnp.sum(jnp.where(valid, w, 0.0) if valid is not None else w)
    elif valid is not None:
        denom = jnp.sum(valid.astype(loss.dtype))
    return jnp.sum(loss) / denom if denom is not None else jnp.mean(loss)


@op("NegativeLogLikelihoodLoss", foldable=False)
def negative_log_likelihood_loss(ctx: OpContext, x, target, weight=None):
    import jax.numpy as jnp

    return _nll(ctx, jnp.asarray(x), target, weight)


@op("SoftmaxCrossEntropyLoss", foldable=False)
def softmax_cross_entropy_loss(ctx: OpContext, scores, labels, weight=None):
    import jax

    log_p = jax.nn.log_softmax(jax.numpy.asarray(scores), axis=1)
    loss = _nll(ctx, log_p, labels, weight)
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out > 1 and ctx.node.output[1]:
        return loss, log_p
    return loss


# -- shape surgery -------------------------------------------------------------


@op("CenterCropPad", foldable=False, static_args=(1,))
def center_crop_pad(ctx: OpContext, x, shape):
    """Center-crop or zero-pad each selected axis to the requested extent."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    want = static_ints(shape, "CenterCropPad shape")
    axes = ctx.attr_ints("axes", list(range(len(want))))
    axes = [a + x.ndim if a < 0 else a for a in axes]
    out = x
    for a, tgt in zip(axes, want):
        cur = out.shape[a]
        if tgt < cur:  # crop
            start = (cur - tgt) // 2
            out = jnp.take(out, jnp.arange(start, start + tgt), axis=a)
        elif tgt > cur:  # pad
            before = (tgt - cur) // 2
            pads = [(0, 0)] * out.ndim
            pads[a] = (before, tgt - cur - before)
            out = jnp.pad(out, pads)
    return out


@op("Col2Im", foldable=False, static_args=(1, 2))
def col2im(ctx: OpContext, cols, image_shape, block_shape):
    """Inverse im2col: scatter-add column patches back into the image."""
    import jax.numpy as jnp

    img = static_ints(image_shape, "Col2Im image_shape")
    blk = static_ints(block_shape, "Col2Im block_shape")
    nd = len(img)
    dil = ctx.attr_ints("dilations", [1] * nd)
    pads = ctx.attr_ints("pads", [0] * (2 * nd))
    strides = ctx.attr_ints("strides", [1] * nd)
    cols = jnp.asarray(cols)
    N = cols.shape[0]
    C = cols.shape[1] // int(np.prod(blk))
    # per-dim output step counts
    steps = [
        (img[i] + pads[i] + pads[nd + i] - dil[i] * (blk[i] - 1) - 1) // strides[i] + 1
        for i in range(nd)
    ]
    K, L = int(np.prod(blk)), int(np.prod(steps))
    cols = cols.reshape(N, C, K, L)
    # absolute coords per (kernel offset, step): [K, L] each dim
    k_off = np.stack(np.unravel_index(np.arange(K), blk))  # [nd, K]
    s_off = np.stack(np.unravel_index(np.arange(L), steps))  # [nd, L]
    coords = [
        k_off[i][:, None] * dil[i] + s_off[i][None, :] * strides[i] - pads[i]
        for i in range(nd)
    ]  # each [K, L], in image frame
    inbound = np.ones((K, L), bool)
    flat = np.zeros((K, L), np.int64)
    for i in range(nd):
        inbound &= (coords[i] >= 0) & (coords[i] < img[i])
        flat = flat * img[i] + np.clip(coords[i], 0, img[i] - 1)
    vals = jnp.where(jnp.asarray(inbound)[None, None], cols, 0.0)
    out = jnp.zeros((N, C, int(np.prod(img))), cols.dtype)
    out = out.at[:, :, jnp.asarray(flat.reshape(-1))].add(vals.reshape(N, C, -1))
    return out.reshape((N, C) + tuple(img))


@op("MaxUnpool", foldable=False, static_args=(2,))
def max_unpool(ctx: OpContext, x, indices, output_shape=None):
    """Scatter pooled values back to their argmax positions (indices are
    ONNX-flat over the full output tensor)."""
    import jax.numpy as jnp

    kshape = ctx.attr_ints("kernel_shape")
    nd = len(kshape)
    strides = ctx.attr_ints("strides", [1] * nd)
    pads = ctx.attr_ints("pads", [0] * (2 * nd))
    xshp = np.shape(x)
    if output_shape is not None:
        out_shape = tuple(static_ints(output_shape, "MaxUnpool output_shape"))
    else:
        spatial = [
            (xshp[2 + i] - 1) * strides[i] - pads[i] - pads[nd + i] + kshape[i]
            for i in range(nd)
        ]
        out_shape = (xshp[0], xshp[1]) + tuple(spatial)
    total = int(np.prod(out_shape))
    flat = jnp.zeros((total,), x.dtype)
    flat = flat.at[jnp.asarray(indices).reshape(-1)].set(jnp.asarray(x).reshape(-1))
    return flat.reshape(out_shape)


# -- spatial sampling ----------------------------------------------------------


def _bilinear_gather(img, iy, ix, pad_zeros):
    """img [C, H, W]; iy/ix [...] float sample coords. Border-clamped gather
    with optional zero masking outside; returns [C, ...]."""
    import jax.numpy as jnp

    H, W = img.shape[-2], img.shape[-1]
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy = iy - y0
    wx = ix - x0

    def at(yy, xx):
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        v = img[..., yc, xc]  # [C, ...]
        if pad_zeros:
            ok = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
            v = jnp.where(ok, v, 0.0)
        return v

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


@op("GridSample", foldable=False)
def grid_sample(ctx: OpContext, x, grid):
    """4-D GridSample (bilinear/nearest; zeros/border padding; reflection
    maps to border after coordinate reflection)."""
    import jax
    import jax.numpy as jnp

    mode = ctx.attr("mode", "linear")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if mode not in ("linear", "bilinear", "nearest"):
        # bicubic would silently evaluate as bilinear — wrong numbers are
        # worse than an error (Resize raises for cubic the same way)
        raise NotImplementedError(f"GridSample mode {mode!r} unsupported")
    padding = ctx.attr("padding_mode", "zeros")
    if isinstance(padding, bytes):
        padding = padding.decode()
    align = int(ctx.attr("align_corners", 0))
    x = jnp.asarray(x)
    grid = jnp.asarray(grid)
    if x.ndim != 4:
        raise NotImplementedError("GridSample: only 4-D inputs supported")
    N, C, H, W = x.shape
    gx, gy = grid[..., 0], grid[..., 1]  # [N, Ho, Wo]

    def unnorm(g, size):
        if align:
            return (g + 1) / 2 * (size - 1)
        return ((g + 1) * size - 1) / 2

    ix, iy = unnorm(gx, W), unnorm(gy, H)
    if padding == "reflection":
        def reflect(v, lo, hi):
            span = hi - lo
            v = jnp.abs(jnp.mod(v - lo, 2 * span + 1e-12))
            return jnp.where(v > span, 2 * span - v, v) + lo

        if align:
            ix = reflect(ix, 0.0, W - 1.0)
            iy = reflect(iy, 0.0, H - 1.0)
        else:
            ix = jnp.clip(reflect(ix, -0.5, W - 0.5), 0, W - 1)
            iy = jnp.clip(reflect(iy, -0.5, H - 0.5), 0, H - 1)
    zeros = padding == "zeros"

    def per_image(img, iy_i, ix_i):
        if mode in ("nearest",):
            yy = jnp.floor(iy_i + 0.5)
            xx = jnp.floor(ix_i + 0.5)
            yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            v = img[:, yc, xc]
            if zeros:
                ok = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
                v = jnp.where(ok, v, 0.0)
            return v
        return _bilinear_gather(img, iy_i, ix_i, zeros)

    return jax.vmap(per_image)(x, iy, ix)  # [N, C, Ho, Wo]


@op("RoiAlign", foldable=False)
def roi_align(ctx: OpContext, x, rois, batch_indices):
    """ROI Align with bilinear sampling, avg/max over a fixed sampling grid.
    sampling_ratio=0 (adaptive, data-dependent) uses a static 2×2 grid per
    bin — XLA needs static extents; documented deviation."""
    import jax
    import jax.numpy as jnp

    oh = int(ctx.attr("output_height", 1))
    ow = int(ctx.attr("output_width", 1))
    sr = int(ctx.attr("sampling_ratio", 0)) or 2
    scale = ctx.attr("spatial_scale", 1.0)
    mode = ctx.attr("mode", "avg")
    if isinstance(mode, bytes):
        mode = mode.decode()
    ctm = ctx.attr("coordinate_transformation_mode", "half_pixel")
    if isinstance(ctm, bytes):
        ctm = ctm.decode()
    x = jnp.asarray(x)
    rois = jnp.asarray(rois).astype(jnp.float32) * scale
    if ctm == "half_pixel":
        rois = rois - 0.5
    bi = jnp.asarray(batch_indices).astype(jnp.int32)

    def one_roi(roi, b):
        x1, y1, x2, y2 = roi
        bin_h = (y2 - y1) / oh
        bin_w = (x2 - x1) / ow
        gy = y1 + (jnp.arange(oh)[:, None] + (jnp.arange(sr)[None, :] + 0.5) / sr) * bin_h
        gx = x1 + (jnp.arange(ow)[:, None] + (jnp.arange(sr)[None, :] + 0.5) / sr) * bin_w
        iy = jnp.broadcast_to(gy[:, None, :, None], (oh, ow, sr, sr))
        ix = jnp.broadcast_to(gx[None, :, None, :], (oh, ow, sr, sr))
        v = _bilinear_gather(x[b], iy, ix, pad_zeros=False)  # [C, oh, ow, sr, sr]
        if mode == "max":
            return jnp.max(v, axis=(-2, -1))
        return jnp.mean(v, axis=(-2, -1))

    return jax.vmap(one_roi)(rois, bi)  # [R, C, oh, ow]


@op("MaxRoiPool", foldable=False)
def max_roi_pool(ctx: OpContext, x, rois):
    """Caffe-style ROI max pooling (ONNX opset 1): integer-rounded ROI
    coords, ceil/floor bin edges, max per bin; empty bins read 0. Bin
    membership is computed as coordinate masks so data-dependent ROI
    extents stay XLA-expressible (reference handles ROI ops not at all —
    this exceeds its surface like the rest of this module)."""
    import jax
    import jax.numpy as jnp

    ph, pw = static_ints(ctx.attr("pooled_shape"), "pooled_shape")
    scale = float(ctx.attr("spatial_scale", 1.0))
    x = jnp.asarray(x)
    H, W = x.shape[2], x.shape[3]
    rois = jnp.asarray(rois).astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        # half-away-from-zero (onnxruntime std::round), NOT jnp.round's
        # half-to-even: with spatial_scale like 1/16 coords hit exact .5
        # and the window would shift a pixel. ONNX ROI coords are >= 0, so
        # floor(v + 0.5) is exactly round-half-away-from-zero here.
        x1, y1, x2, y2 = jnp.floor(roi[1:] * scale + 0.5)
        roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
        roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
        ib = jnp.arange(ph, dtype=jnp.float32)
        jb = jnp.arange(pw, dtype=jnp.float32)
        hs = jnp.clip(jnp.floor(ib * roi_h / ph) + y1, 0, H)
        he = jnp.clip(jnp.ceil((ib + 1.0) * roi_h / ph) + y1, 0, H)
        ws = jnp.clip(jnp.floor(jb * roi_w / pw) + x1, 0, W)
        we = jnp.clip(jnp.ceil((jb + 1.0) * roi_w / pw) + x1, 0, W)
        ys = jnp.arange(H, dtype=jnp.float32)
        xs = jnp.arange(W, dtype=jnp.float32)
        my = (ys[None, :] >= hs[:, None]) & (ys[None, :] < he[:, None])
        mx = (xs[None, :] >= ws[:, None]) & (xs[None, :] < we[:, None])
        # SEPARABLE masked max — rows then cols — so the worst-case
        # intermediate is [ph,C,H,W] then [ph,pw,C,W], never the
        # [C,ph,pw,H,W] full-plane product (O(100 GB) at detector sizes,
        # R~300/C=256/14x14/50x50, if XLA declined to fuse it)
        xb = x[b]  # [C,H,W]
        rowm = jnp.where(my[:, None, :, None], xb[None], neg).max(axis=2)
        v = jnp.where(mx[None, :, None, :], rowm[:, None], neg).max(axis=-1)
        out = jnp.transpose(v, (2, 0, 1))  # [C,ph,pw]
        nonempty = jnp.any(my, axis=-1)[:, None] & jnp.any(mx, axis=-1)[None]
        return jnp.where(nonempty[None], out, 0.0)

    # sequential over ROIs (lax.map): peak live memory stays one ROI's
    # intermediates instead of R× them — ROI counts are runtime-sized and
    # this op is postprocessing-scale, not the hot path
    return jax.lax.map(one_roi, rois)  # [R, C, ph, pw]


# -- optionals (trace-time maybe-values) ----------------------------------------


class OptionalVal:
    """ONNX optional value: a trace-time wrapper holding a tensor/sequence
    or nothing. Optional STRUCTURE is static (graphs branch on it via
    OptionalHasElement, which folds), so no device representation needed."""

    def __init__(self, value=None):
        self.value = value


@op("Optional", foldable=False)
def optional(ctx: OpContext, x=None):
    return OptionalVal(x)


@op("OptionalHasElement", foldable=False)
def optional_has_element(ctx: OpContext, x=None):
    if isinstance(x, OptionalVal):
        x = x.value
    return np.array(x is not None)


@op("OptionalGetElement", foldable=False)
def optional_get_element(ctx: OpContext, x):
    if isinstance(x, OptionalVal):
        if x.value is None:
            raise ValueError("OptionalGetElement on an empty optional")
        return x.value
    return x  # opset-18 allows tensor/sequence input directly


@op("Scatter", foldable=False)
def scatter_deprecated(ctx: OpContext, data, indices, updates):
    """Deprecated opset-9/10 alias of ScatterElements."""
    from .tensor_ops import scatter_elements

    return scatter_elements(ctx, data, indices, updates)


# -- sequences (host-level tensor lists) ---------------------------------------


class TensorSeq(list):
    """ONNX sequence value: a trace-time list whose elements are tensors.
    Sequence structure is static (XLA needs static shapes); elements may be
    traced device values."""


@op("SequenceEmpty", foldable=False)
def sequence_empty(ctx: OpContext):
    return TensorSeq()


@op("SequenceConstruct", foldable=False)
def sequence_construct(ctx: OpContext, *tensors):
    return TensorSeq(tensors)


@op("SequenceLength", foldable=False)
def sequence_length(ctx: OpContext, seq):
    return np.array(len(seq), np.int64)


def _seq_pos(position, n, default):
    if position is None:
        return default
    p = int(np.asarray(position))
    return p + n if p < 0 else p


@op("SequenceAt", foldable=False, static_args=(1,))
def sequence_at(ctx: OpContext, seq, position):
    return seq[_seq_pos(position, len(seq), 0)]


@op("SequenceInsert", foldable=False, static_args=(2,))
def sequence_insert(ctx: OpContext, seq, tensor, position=None):
    out = TensorSeq(seq)
    out.insert(_seq_pos(position, len(seq), len(seq)), tensor)
    return out


@op("SequenceErase", foldable=False, static_args=(1,))
def sequence_erase(ctx: OpContext, seq, position=None):
    out = TensorSeq(seq)
    del out[_seq_pos(position, len(seq), len(seq) - 1)]
    return out


@op("SplitToSequence", foldable=False, static_args=(1,))
def split_to_sequence(ctx: OpContext, x, split=None):
    import jax.numpy as jnp

    axis = int(ctx.attr("axis", 0))
    keepdims = int(ctx.attr("keepdims", 1))
    x = jnp.asarray(x)
    n = x.shape[axis]
    if split is None:
        parts = jnp.split(x, n, axis=axis)
        if not keepdims:
            parts = [jnp.squeeze(p, axis=axis) for p in parts]
        return TensorSeq(parts)
    sp = np.asarray(split)
    if sp.ndim == 0:
        size = int(sp)
        cuts = list(range(size, n, size))
    else:
        cuts = np.cumsum(sp.astype(np.int64))[:-1].tolist()
    return TensorSeq(jnp.split(x, cuts, axis=axis))


@op("ConcatFromSequence", foldable=False)
def concat_from_sequence(ctx: OpContext, seq):
    import jax.numpy as jnp

    axis = int(ctx.attr("axis"))
    if int(ctx.attr("new_axis", 0)):
        return jnp.stack([jnp.asarray(t) for t in seq], axis=axis)
    return jnp.concatenate([jnp.asarray(t) for t in seq], axis=axis)
