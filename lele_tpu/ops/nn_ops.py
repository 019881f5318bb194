"""NN op emitters: conv/pool/resize/normalization/recurrent.

Covers the reference's ops/nn.rs set (/root/reference/src/compiler/ops/
nn.rs:12-499) — Conv, Gemm (in math_ops), LSTM, GRU, LayerNormalization,
ConvInteger (in quant_ops), BatchNormalization, MaxPool, Resize,
ConvTranspose — built on lax so XLA tiles convs/matmuls onto the MXU instead
of the reference's im2col+GEMM SIMD paths (kernels/conv2d.rs, conv1d.rs).

Recurrent ops use `lax.scan` over a fused gate step, replacing the
reference's per-timestep faer GEMM + AVX2 gate kernels (kernels/rnn.rs:15).
"""

from __future__ import annotations

import numpy as np

from .math_ops import _prec
from .registry import OpContext, op, static_ints


def _conv_dims(spatial_rank: int):
    """ONNX NCHW / OIHW dimension numbers for any spatial rank."""
    sp = "DHW"[3 - spatial_rank :]
    return (f"NC{sp}", f"OI{sp}", f"NC{sp}")


def _resolve_pads(ctx: OpContext, x_shape, k_shape, strides, dilations):
    """auto_pad / pads resolution shared by Conv and pooling."""
    rank = len(k_shape)
    auto = ctx.attr("auto_pad", "NOTSET")
    if auto in ("NOTSET", "", None):
        pads = ctx.attr_ints("pads", [0] * (2 * rank))
        return [(pads[i], pads[i + rank]) for i in range(rank)]
    if auto == "VALID":
        return [(0, 0)] * rank
    out = []
    for i in range(rank):
        in_dim = x_shape[2 + i]
        eff_k = (k_shape[i] - 1) * dilations[i] + 1
        out_dim = -(-in_dim // strides[i])
        total = max(0, (out_dim - 1) * strides[i] + eff_k - in_dim)
        half = total // 2
        if auto == "SAME_UPPER":
            out.append((half, total - half))
        else:  # SAME_LOWER
            out.append((total - half, half))
    return out


@op("Conv", foldable=False)
def conv(ctx: OpContext, x, w, b=None):
    import jax

    rank = np.ndim(x) - 2
    kshape = ctx.attr_ints("kernel_shape", list(np.shape(w)[2:]))
    strides = ctx.attr_ints("strides", [1] * rank)
    dilations = ctx.attr_ints("dilations", [1] * rank)
    group = ctx.attr("group", 1)
    pads = _resolve_pads(ctx, np.shape(x), kshape, strides, dilations)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=strides,
        padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dims(rank),
        feature_group_count=group,
        precision=_prec(),
    )
    if b is not None:
        out = out + b.astype(out.dtype).reshape((1, -1) + (1,) * rank)
    return out


@op("ConvTranspose", foldable=False)
def conv_transpose(ctx: OpContext, x, w, b=None):
    """Transposed conv as an input-dilated conv with a flipped kernel.

    ONNX weight layout is [C_in, C_out/group, *k]; regrouped to OIHW with
    grouped output blocks so `feature_group_count` handles group > 1.
    """
    import jax

    rank = np.ndim(x) - 2
    kshape = list(np.shape(w)[2:])
    strides = ctx.attr_ints("strides", [1] * rank)
    dilations = ctx.attr_ints("dilations", [1] * rank)
    group = ctx.attr("group", 1)
    out_pad = ctx.attr_ints("output_padding", [0] * rank)
    out_shape = ctx.attr_ints("output_shape")
    pads_attr = ctx.attr_ints("pads")
    if out_shape is not None:
        # spec: output_shape OVERRIDES pads — total padding derives from
        # the requested spatial size
        auto = ctx.attr("auto_pad", "NOTSET")
        heads, tails = [], []
        for i in range(rank):
            eff_k = (kshape[i] - 1) * dilations[i] + 1
            in_dim = np.shape(x)[2 + i]
            total = max(0, strides[i] * (in_dim - 1) + out_pad[i] + eff_k
                        - int(out_shape[i]))
            half = total // 2
            if auto == "SAME_UPPER":
                heads.append(total - half)
                tails.append(half)
            else:
                heads.append(half)
                tails.append(total - half)
        pads_attr = heads + tails
    elif pads_attr is None:
        auto = ctx.attr("auto_pad", "NOTSET")
        if auto in ("NOTSET", "", None, "VALID"):
            pads_attr = [0] * (2 * rank)
        else:
            # SAME_*: output = input * stride
            pads_attr = []
            tails = []
            for i in range(rank):
                eff_k = (kshape[i] - 1) * dilations[i] + 1
                total = max(0, eff_k - strides[i] + out_pad[i])
                half = total // 2
                if auto == "SAME_UPPER":
                    pads_attr.append(half)
                    tails.append(total - half)
                else:
                    pads_attr.append(total - half)
                    tails.append(half)
            pads_attr += tails
    cin = np.shape(w)[0]
    cout_pg = np.shape(w)[1]
    wg = w.reshape((group, cin // group, cout_pg) + tuple(kshape))
    wg = wg.transpose((0, 2, 1) + tuple(range(3, 3 + rank)))
    wg = wg.reshape((group * cout_pg, cin // group) + tuple(kshape))
    wg = wg[(...,) + tuple(slice(None, None, -1) for _ in range(rank))]  # flip
    pad_pairs = []
    for i in range(rank):
        eff_k = (kshape[i] - 1) * dilations[i] + 1
        pb = eff_k - 1 - pads_attr[i]
        pe = eff_k - 1 - pads_attr[rank + i] + out_pad[i]
        pad_pairs.append((pb, pe))
    out = jax.lax.conv_general_dilated(
        x,
        wg.astype(x.dtype),
        window_strides=[1] * rank,
        padding=pad_pairs,
        lhs_dilation=strides,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dims(rank),
        feature_group_count=group,
        precision=_prec(),
    )
    if b is not None:
        out = out + b.astype(out.dtype).reshape((1, -1) + (1,) * rank)
    return out


def _pool_geometry(ctx: OpContext, xshape):
    """kernel/strides/dilations/pads shared by the pooling family,
    including ceil_mode tail-pad extension."""
    rank = len(xshape) - 2
    kshape = ctx.attr_ints("kernel_shape")
    strides = ctx.attr_ints("strides", [1] * len(kshape))
    dilations = ctx.attr_ints("dilations", [1] * len(kshape))
    ceil_mode = bool(ctx.attr("ceil_mode", 0))
    pads = _resolve_pads(ctx, xshape, kshape, strides, dilations)
    if ceil_mode:
        # extend tail padding so the last partial window is included
        new_pads = []
        for i in range(rank):
            in_dim = xshape[2 + i]
            eff_k = (kshape[i] - 1) * dilations[i] + 1
            padded = in_dim + pads[i][0] + pads[i][1]
            out_f = (padded - eff_k) / strides[i] + 1
            out_c = -(-(padded - eff_k) // strides[i]) + 1
            extra = (out_c - 1) * strides[i] + eff_k - padded if out_c > out_f else 0
            new_pads.append((pads[i][0], pads[i][1] + max(0, extra)))
        pads = new_pads
    return kshape, strides, dilations, pads


def _pool(ctx: OpContext, x, reducer, init, is_avg=False):
    import jax

    kshape, strides, dilations, pads = _pool_geometry(ctx, np.shape(x))
    window = (1, 1) + tuple(kshape)
    w_strides = (1, 1) + tuple(strides)
    w_dil = (1, 1) + tuple(dilations)
    full_pads = [(0, 0), (0, 0)] + pads
    out = jax.lax.reduce_window(
        x, init, reducer, window, w_strides, full_pads, window_dilation=w_dil
    )
    if is_avg:
        count_include_pad = bool(ctx.attr("count_include_pad", 0))
        if count_include_pad:
            denom = float(np.prod(kshape))
            out = out / denom
        else:
            ones = jax.numpy.ones(np.shape(x), x.dtype)
            counts = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, window, w_strides, full_pads,
                window_dilation=w_dil,
            )
            out = out / counts
    return out


@op("MaxPool", foldable=False)
def max_pool(ctx: OpContext, x):
    import jax

    dt = np.dtype(str(x.dtype))
    # identity must be representable IN x's dtype (np.int32 min overflows
    # i8/u8 at trace time and under-reaches i64), and reduce_window wants
    # the init value in the operand dtype exactly
    init = (np.array(-np.inf, dt) if np.issubdtype(dt, np.floating)
            else np.array(np.iinfo(dt).min, dt))[()]
    out = _pool(ctx, x, jax.lax.max, init)
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out > 1 and ctx.node.output[1]:
        return out, _max_pool_indices(ctx, x)
    return out


def _max_pool_indices(ctx: OpContext, x):
    """ONNX MaxPool Indices output: within-window argmax (first max wins,
    matching ORT's scan order) mapped to flat row-major [N,C,*spatial]
    positions. Windows are extracted with conv_general_dilated_patches on a
    -inf-padded input; the argmax offset is converted back to input
    coordinates arithmetically (no giant iota gathers)."""
    import jax
    import jax.numpy as jnp

    if int(ctx.attr("storage_order", 0)):
        raise NotImplementedError("MaxPool: storage_order=1 (col-major)")
    xshape = np.shape(x)
    nd = len(xshape) - 2
    N, C = xshape[0], xshape[1]
    kshape, strides, dilations, pads = _pool_geometry(ctx, xshape)
    K = int(np.prod(kshape))
    # finite lowest value, NOT -inf: patches extraction is a convolution, and
    # -inf * 0 kernel taps would poison whole windows with NaN
    dt = np.dtype(str(np.asarray(x).dtype) if ctx.is_fold else str(x.dtype))
    lowest = np.finfo(dt).min if np.issubdtype(dt, np.floating) else np.iinfo(dt).min
    xpad = jnp.pad(
        jnp.asarray(x), [(0, 0), (0, 0)] + [tuple(p) for p in pads],
        constant_values=lowest,
    )
    patches = jax.lax.conv_general_dilated_patches(
        xpad, tuple(kshape), tuple(strides), "VALID",
        rhs_dilation=tuple(dilations),
        precision=jax.lax.Precision.HIGHEST,  # exact one-hot taps: TPU's
        # default bf16 conv would round values and overflow the pad constant
    )  # [N, C*K, *out] with feature dim ordered (C slow, K fast)
    out_sp = patches.shape[2:]
    patches = patches.reshape((N, C, K) + out_sp)
    k_idx = jnp.argmax(patches, axis=2)  # [N, C, *out]
    # unravel window offset and rebuild input coordinates
    offs = np.stack(np.unravel_index(np.arange(K), kshape))  # [nd, K]
    flat = jnp.zeros_like(k_idx)
    for i in range(nd):
        o_i = jnp.arange(out_sp[i]).reshape(
            (1, 1) + (1,) * i + (-1,) + (1,) * (nd - 1 - i)
        )
        off_i = jnp.take(jnp.asarray(offs[i]), k_idx)
        coord = o_i * strides[i] - pads[i][0] + off_i * dilations[i]
        flat = flat * xshape[2 + i] + coord
    nc = (jnp.arange(N).reshape((-1, 1) + (1,) * nd) * C
          + jnp.arange(C).reshape((1, -1) + (1,) * nd))
    spatial_total = int(np.prod(xshape[2:]))
    return (nc * spatial_total + flat).astype(jnp.int32)


@op("AveragePool", foldable=False)
def average_pool(ctx: OpContext, x):
    import jax

    return _pool(ctx, x, jax.lax.add, 0.0, is_avg=True)


@op("GlobalAveragePool", foldable=False)
def global_average_pool(ctx: OpContext, x):
    import jax.numpy as jnp

    axes = tuple(range(2, np.ndim(x)))
    return jnp.mean(x, axis=axes, keepdims=True)


@op("GlobalMaxPool", foldable=False)
def global_max_pool(ctx: OpContext, x):
    import jax.numpy as jnp

    return jnp.max(x, axis=tuple(range(2, np.ndim(x))), keepdims=True)


# -- Resize ------------------------------------------------------------------


def _coords(out_size, in_size, scale, mode, xp):
    x_out = xp.arange(out_size, dtype=xp.float32)
    if mode == "half_pixel":
        return (x_out + 0.5) / scale - 0.5
    if mode == "pytorch_half_pixel":
        return (x_out + 0.5) / scale - 0.5 if out_size > 1 else xp.zeros_like(x_out)
    if mode == "align_corners":
        if out_size == 1:
            return xp.zeros_like(x_out)
        return x_out * (in_size - 1) / (out_size - 1)
    if mode == "asymmetric":
        return x_out / scale
    raise NotImplementedError(f"coordinate_transformation_mode {mode}")


@op("Resize", foldable=False, static_args=(2, 3))
def resize(ctx: OpContext, x, roi=None, scales=None, sizes=None):
    """ONNX Resize: nearest (exact mode semantics) and linear (separable).

    Reference: resize_nearest in kernels/conv2d.rs:1261. Implemented as
    per-axis gathers / interpolation so every mode matches the spec.
    """
    import jax.numpy as jnp

    mode = ctx.attr("mode", "nearest")
    ct_mode = ctx.attr("coordinate_transformation_mode", "half_pixel")
    nearest_mode = ctx.attr("nearest_mode", "round_prefer_floor")
    in_shape = list(np.shape(x))
    rank = len(in_shape)
    if sizes is not None:
        out_shape = static_ints(sizes, "resize sizes")
        scale_l = [out_shape[i] / in_shape[i] for i in range(rank)]
    else:
        scale_l = [float(s) for s in np.asarray(scales).reshape(-1)]
        out_shape = [int(np.floor(in_shape[i] * scale_l[i])) for i in range(rank)]
    out = jnp.asarray(x)
    for ax in range(rank):
        if out_shape[ax] == in_shape[ax]:
            continue
        c = _coords(out_shape[ax], in_shape[ax], scale_l[ax], ct_mode, jnp)
        if mode == "nearest":
            if nearest_mode == "round_prefer_floor":
                idx = jnp.ceil(c - 0.5)
            elif nearest_mode == "round_prefer_ceil":
                idx = jnp.floor(c + 0.5)
            elif nearest_mode == "floor":
                idx = jnp.floor(c)
            else:  # ceil
                idx = jnp.ceil(c)
            idx = jnp.clip(idx, 0, in_shape[ax] - 1).astype(jnp.int32)
            out = jnp.take(out, idx, axis=ax)
        elif mode == "linear":
            c = jnp.clip(c, 0.0, in_shape[ax] - 1)
            lo = jnp.floor(c).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, in_shape[ax] - 1)
            w_hi = (c - lo).astype(x.dtype)
            a = jnp.take(out, lo, axis=ax)
            b = jnp.take(out, hi, axis=ax)
            shape = [1] * out.ndim
            shape[ax] = -1
            w_hi = w_hi.reshape(shape)
            out = a * (1 - w_hi) + b * w_hi
        else:
            raise NotImplementedError(f"Resize mode {mode}")
    return out


@op("Upsample", foldable=False, static_args=(1,))
def upsample(ctx: OpContext, x, scales=None):
    sc = scales if scales is not None else np.asarray(ctx.attr("scales"), np.float32)
    ctx.attrs.setdefault("coordinate_transformation_mode", "asymmetric")
    ctx.attrs.setdefault("nearest_mode", "floor")
    return resize(ctx, x, None, sc, None)


# -- normalization -----------------------------------------------------------


@op("BatchNormalization", foldable=False)
def batch_norm(ctx: OpContext, x, scale, b, mean, var):
    eps = ctx.attr("epsilon", 1e-5)
    rank = np.ndim(x)
    shape = (1, -1) + (1,) * (rank - 2)
    inv = (var.astype(x.dtype) + np.asarray(eps, dtype=str(x.dtype))) ** -0.5
    return (x - mean.astype(x.dtype).reshape(shape)) * (
        scale.astype(x.dtype) * inv
    ).reshape(shape) + b.astype(x.dtype).reshape(shape)


@op("LayerNormalization", foldable=False)
def layer_norm(ctx: OpContext, x, scale, b=None):
    import jax.numpy as jnp

    axis = ctx.attr("axis", -1)
    eps = ctx.attr("epsilon", 1e-5)
    rank = np.ndim(x)
    axis = axis if axis >= 0 else axis + rank
    axes = tuple(range(axis, rank))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    inv_std = 1.0 / jnp.sqrt(var + eps)
    out = (x - mean) * inv_std * scale
    if b is not None:
        out = out + b
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1:
        return out
    return (out, mean, inv_std)[:n_out]


@op("InstanceNormalization", foldable=False)
def instance_norm(ctx: OpContext, x, scale, b):
    import jax.numpy as jnp

    eps = ctx.attr("epsilon", 1e-5)
    rank = np.ndim(x)
    axes = tuple(range(2, rank))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (rank - 2)
    return (x - mean) / jnp.sqrt(var + eps) * scale.reshape(shape) + b.reshape(shape)


@op("GroupNormalization", foldable=False)
def group_norm(ctx: OpContext, x, scale, b):
    import jax.numpy as jnp

    eps = ctx.attr("epsilon", 1e-5)
    g = ctx.attr("num_groups")
    n, c = np.shape(x)[:2]
    sp = np.shape(x)[2:]
    xg = jnp.reshape(x, (n, g, c // g) + tuple(sp))
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    out = jnp.reshape(xg, np.shape(x))
    shape = (1, -1) + (1,) * (len(sp))
    return out * scale.reshape(shape) + b.reshape(shape)


@op("MeanVarianceNormalization", foldable=False)
def mvn(ctx: OpContext, x):
    import jax.numpy as jnp

    axes = tuple(ctx.attr_ints("axes", [0, 2, 3]))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-9)


@op("RMSNormalization", foldable=False)
def rms_norm(ctx: OpContext, x, scale):
    import jax.numpy as jnp

    axis = ctx.attr("axis", -1)
    eps = ctx.attr("epsilon", 1e-5)
    ms = jnp.mean(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(ms + eps) * scale


@op("LpNormalization", foldable=False)
def lp_norm(ctx: OpContext, x):
    import jax.numpy as jnp

    axis = ctx.attr("axis", -1)
    p = ctx.attr("p", 2)
    if p == 1:
        n = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / n


# -- recurrent ---------------------------------------------------------------


def _use_pallas_rnn(S: int, B: int, hidden: int) -> bool:
    """Kernel eligibility: TPU backend, config on, VMEM-resident sizes."""
    from ..config import config as _cfg

    if not _cfg.use_pallas_rnn:
        return False
    try:
        import jax as _jax

        if _jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    # xproj + states comfortably in VMEM
    return S * B * 4 * hidden * 4 < 4 * 1024 * 1024 and B * hidden * 4 < 256 * 1024


def _rnn_prep(ctx: OpContext, x, seq_axis_layout):
    layout = ctx.attr("layout", 0)
    if layout == 1:  # [B, S, I] → [S, B, I]
        x = ctx.xp.swapaxes(x, 0, 1)
    return x, layout


def _rnn_init_state(ctx: OpContext, init, layout):
    """layout=1 stores initial states [B, num_dir, H]; the loops below
    index direction-major [num_dir, B, H]."""
    if init is None or layout != 1:
        return init
    return ctx.xp.swapaxes(init, 0, 1)


def _directions(direction: str):
    if direction == "bidirectional":
        return [False, True]
    return [direction == "reverse"]


def _ragged_lens(seq_lens, S):
    """sequence_lens for ragged batches: None when absent or statically
    full-length (the fast paths apply); else int32 lengths [B]."""
    if seq_lens is None:
        return None
    if isinstance(seq_lens, (np.ndarray, np.generic, list, tuple)):
        arr = np.asarray(seq_lens)
        if arr.size and np.all(arr == S):
            return None
        return arr.astype(np.int32)
    return seq_lens


def _seq_reverse(x, lens):
    """Per-batch time reversal of x[S,B,...] within each valid region
    [0, lens[b]); rows past the length keep their position."""
    import jax.numpy as jnp

    S = x.shape[0]
    t = jnp.arange(S, dtype=jnp.int32)[:, None]
    L = jnp.asarray(lens).astype(jnp.int32)[None, :]
    src = jnp.where(t < L, L - 1 - t, t)
    idx = src.reshape(src.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=0)


def _seq_mask(lens, S):
    """[S, B, 1] bool validity mask (t < lens[b])."""
    import jax.numpy as jnp

    t = jnp.arange(S, dtype=jnp.int32)[:, None]
    L = jnp.asarray(lens).astype(jnp.int32)[None, :]
    return (t < L)[..., None]


@op("LSTM", foldable=False, static_args=(4,))
def lstm(ctx: OpContext, x, w, r, b=None, seq_lens=None, init_h=None, init_c=None, p=None):
    """ONNX LSTM via lax.scan; gate order i,o,f,c (spec §LSTM).

    Reference: kernels/rnn.rs:67. The per-step x@W^T for the whole sequence
    is hoisted out of the scan as one big MXU matmul. Ragged batches
    (sequence_lens) mask the recurrence: Y rows past a sequence's length
    are zero and Y_h/Y_c hold the last valid step's states (ORT semantics).
    """
    import jax
    import jax.numpy as jnp

    x, layout = _rnn_prep(ctx, x, 0)
    init_h = _rnn_init_state(ctx, init_h, layout)
    init_c = _rnn_init_state(ctx, init_c, layout)
    direction = ctx.attr("direction", "forward")
    hidden = ctx.attr("hidden_size", np.shape(r)[-1])
    S, B = np.shape(x)[0], np.shape(x)[1]
    num_dir = np.shape(w)[0]
    lens = _ragged_lens(seq_lens, S)
    msk = _seq_mask(lens, S) if lens is not None else None
    outs, h_outs, c_outs = [], [], []
    for d, rev in enumerate(_directions(direction)):
        wd, rd = w[d], r[d]  # [4H, I], [4H, H]
        bias = None
        if b is not None:
            bias = b[d, : 4 * hidden] + b[d, 4 * hidden :]
        # peepholes (spec order Pi, Po, Pf): i/f gates see C_{t-1}, o sees C_t
        pi = po = pf = None
        if p is not None:
            pd = jnp.asarray(p[d]).astype(x.dtype)
            pi, po, pf = pd[:hidden], pd[hidden : 2 * hidden], pd[2 * hidden :]
        h0 = jnp.zeros((B, hidden), x.dtype) if init_h is None else init_h[d]
        c0 = jnp.zeros((B, hidden), x.dtype) if init_c is None else init_c[d]
        if lens is not None:
            xs = _seq_reverse(x, lens) if rev else x
        else:
            xs = jnp.flip(x, 0) if rev else x
        # hoist input projection: [S, B, 4H]
        xproj = jnp.einsum("sbi,gi->sbg", xs, wd.astype(x.dtype), precision=_prec())
        if bias is not None:
            xproj = xproj + bias.astype(x.dtype)

        if p is None and lens is None and _use_pallas_rnn(S, B, hidden):
            # ONNX gate order i,o,f,c → kernel order i,f,g,o
            from ..kernels.lstm import lstm_seq_pallas

            xi, xo, xf, xc = jnp.split(xproj, 4, axis=-1)
            xproj_k = jnp.concatenate([xi, xf, xc, xo], axis=-1)
            ri, ro, rf, rc = jnp.split(rd, 4, axis=0)
            rh_k = jnp.concatenate([ri, rf, rc, ro], axis=0).T  # [H, 4H]
            hs, h_f, c_f = lstm_seq_pallas(xproj_k, rh_k, h0, c0)
        else:
            def step(carry, inp):
                xp_t, m_t = inp if msk is not None else (inp, None)
                h_prev, c_prev = carry
                g = xp_t + jnp.matmul(h_prev, rd.T.astype(x.dtype), precision=_prec())
                gi, go, gf = g[:, :hidden], g[:, hidden : 2 * hidden], g[:, 2 * hidden : 3 * hidden]
                if pi is not None:
                    gi = gi + pi * c_prev
                    gf = gf + pf * c_prev
                i = jax.nn.sigmoid(gi)
                f = jax.nn.sigmoid(gf)
                ct = jnp.tanh(g[:, 3 * hidden :])
                c_new = f * c_prev + i * ct
                if po is not None:
                    go = go + po * c_new
                o = jax.nn.sigmoid(go)
                h_new = o * jnp.tanh(c_new)
                if m_t is None:
                    return (h_new, c_new), h_new
                return (
                    (jnp.where(m_t, h_new, h_prev), jnp.where(m_t, c_new, c_prev)),
                    jnp.where(m_t, h_new, jnp.zeros_like(h_new)),
                )

            scan_xs = xproj if msk is None else (xproj, msk)
            (h_f, c_f), hs = jax.lax.scan(step, (h0, c0), scan_xs)
        if rev:
            hs = _seq_reverse(hs, lens) if lens is not None else jnp.flip(hs, 0)
        outs.append(hs)
        h_outs.append(h_f)
        c_outs.append(c_f)
    y = jnp.stack(outs, axis=1)  # [S, D, B, H]
    y_h = jnp.stack(h_outs, axis=0)
    y_c = jnp.stack(c_outs, axis=0)
    if layout == 1:
        y = jnp.transpose(y, (2, 1, 0, 3))  # → [B, D, S, H]? spec: [B,S,D,H]
        y = jnp.transpose(y, (0, 2, 1, 3))
        y_h = jnp.swapaxes(y_h, 0, 1)
        y_c = jnp.swapaxes(y_c, 0, 1)
    return y, y_h, y_c


@op("RNN", foldable=False, static_args=(4,))
def rnn_op(ctx: OpContext, x, w, r, b=None, seq_lens=None, init_h=None):
    """ONNX vanilla (Elman) RNN via lax.scan — beyond the reference, which
    implements only LSTM/GRU (kernels/rnn.rs). Supports forward/reverse/
    bidirectional, per-direction activations, and sequence_lens masking."""
    import jax
    import jax.numpy as jnp

    x, layout = _rnn_prep(ctx, x, 0)
    init_h = _rnn_init_state(ctx, init_h, layout)
    direction = ctx.attr("direction", "forward")
    hidden = ctx.attr("hidden_size", np.shape(r)[-1])
    acts = ctx.attr("activations", None) or ["Tanh"] * 2
    act_fns = {"Tanh": jnp.tanh, "Relu": jax.nn.relu, "Sigmoid": jax.nn.sigmoid}
    S, B = np.shape(x)[0], np.shape(x)[1]
    lens = _ragged_lens(seq_lens, S)
    msk = _seq_mask(lens, S) if lens is not None else None
    outs, h_outs = [], []
    for d, rev in enumerate(_directions(direction)):
        a_name = acts[d] if d < len(acts) else acts[0]
        if isinstance(a_name, bytes):
            a_name = a_name.decode()
        act = act_fns[a_name]
        wd, rd = w[d].astype(x.dtype), r[d].astype(x.dtype)  # [H, I], [H, H]
        bias = None
        if b is not None:
            bias = (b[d, :hidden] + b[d, hidden:]).astype(x.dtype)
        h0 = jnp.zeros((B, hidden), x.dtype) if init_h is None else init_h[d]
        if lens is not None:
            xs = _seq_reverse(x, lens) if rev else x
        else:
            xs = jnp.flip(x, 0) if rev else x
        xproj = jnp.einsum("sbi,gi->sbg", xs, wd, precision=_prec())
        if bias is not None:
            xproj = xproj + bias

        def step(h_prev, inp):
            xp_t, m_t = inp if msk is not None else (inp, None)
            h_new = act(xp_t + jnp.matmul(h_prev, rd.T, precision=_prec()))
            if m_t is None:
                return h_new, h_new
            kept = jnp.where(m_t, h_new, h_prev)
            return kept, jnp.where(m_t, h_new, jnp.zeros_like(h_new))

        scan_xs = xproj if msk is None else (xproj, msk)
        h_f, hs = jax.lax.scan(step, h0, scan_xs)
        if rev:
            hs = _seq_reverse(hs, lens) if lens is not None else jnp.flip(hs, 0)
        outs.append(hs)
        h_outs.append(h_f)
    y = jnp.stack(outs, axis=1)
    y_h = jnp.stack(h_outs, axis=0)
    if layout == 1:
        y = jnp.transpose(y, (2, 0, 1, 3))
        y_h = jnp.swapaxes(y_h, 0, 1)
    return y, y_h


@op("GRU", foldable=False, static_args=(4,))
def gru(ctx: OpContext, x, w, r, b=None, seq_lens=None, init_h=None):
    """ONNX GRU via lax.scan; gates z,r,h; supports linear_before_reset and
    ragged batches via sequence_lens masking (ORT semantics).

    Reference: kernels/rnn.rs:246 (+ linear_before_reset regression test
    tests/regression_kernels.rs:687).
    """
    import jax
    import jax.numpy as jnp

    x, layout = _rnn_prep(ctx, x, 0)
    init_h = _rnn_init_state(ctx, init_h, layout)
    direction = ctx.attr("direction", "forward")
    hidden = ctx.attr("hidden_size", np.shape(r)[-1])
    lbr = bool(ctx.attr("linear_before_reset", 0))
    S, B = np.shape(x)[0], np.shape(x)[1]
    lens = _ragged_lens(seq_lens, S)
    msk = _seq_mask(lens, S) if lens is not None else None
    outs, h_outs = [], []
    for d, rev in enumerate(_directions(direction)):
        wd, rd = w[d].astype(x.dtype), r[d].astype(x.dtype)  # [3H, I], [3H, H]
        wb = rb = None
        if b is not None:
            wb = b[d, : 3 * hidden].astype(x.dtype)
            rb = b[d, 3 * hidden :].astype(x.dtype)
        h0 = jnp.zeros((B, hidden), x.dtype) if init_h is None else init_h[d]
        if lens is not None:
            xs = _seq_reverse(x, lens) if rev else x
        else:
            xs = jnp.flip(x, 0) if rev else x
        xproj = jnp.einsum("sbi,gi->sbg", xs, wd, precision=_prec())
        if wb is not None:
            xproj = xproj + wb

        if lens is None and _use_pallas_rnn(S, B, hidden):
            from ..kernels.gru import gru_seq_pallas

            rb_full = (
                rb if rb is not None else jnp.zeros((3 * hidden,), jnp.float32)
            )
            hs, h_f = gru_seq_pallas(xproj, rd.T, rb_full, h0, bool(lbr))
            if rev:
                hs = jnp.flip(hs, 0)
            outs.append(hs)
            h_outs.append(h_f)
            continue

        rz = rd[: 2 * hidden]  # z and r recurrent weights
        rh = rd[2 * hidden :]
        rbz = rb[: 2 * hidden] if rb is not None else None
        rbh = rb[2 * hidden :] if rb is not None else None

        def step(h_prev, inp):
            xp_t, m_t = inp if msk is not None else (inp, None)
            gzr = xp_t[:, : 2 * hidden] + jnp.matmul(h_prev, rz.T, precision=_prec())
            if rbz is not None:
                gzr = gzr + rbz
            z = jax.nn.sigmoid(gzr[:, :hidden])
            rr = jax.nn.sigmoid(gzr[:, hidden:])
            if lbr:
                hh = jnp.matmul(h_prev, rh.T, precision=_prec())
                if rbh is not None:
                    hh = hh + rbh
                g_h = xp_t[:, 2 * hidden :] + rr * hh
            else:
                g_h = xp_t[:, 2 * hidden :] + jnp.matmul(
                    rr * h_prev, rh.T, precision=_prec()
                )
                if rbh is not None:
                    g_h = g_h + rbh
            ht = jnp.tanh(g_h)
            h_new = (1 - z) * ht + z * h_prev
            if m_t is None:
                return h_new, h_new
            kept = jnp.where(m_t, h_new, h_prev)
            return kept, jnp.where(m_t, h_new, jnp.zeros_like(h_new))

        scan_xs = xproj if msk is None else (xproj, msk)
        h_f, hs = jax.lax.scan(step, h0, scan_xs)
        if rev:
            hs = _seq_reverse(hs, lens) if lens is not None else jnp.flip(hs, 0)
        outs.append(hs)
        h_outs.append(h_f)
    y = jnp.stack(outs, axis=1)
    y_h = jnp.stack(h_outs, axis=0)
    if layout == 1:
        y = jnp.transpose(y, (2, 0, 1, 3))
        y_h = jnp.swapaxes(y_h, 0, 1)
    return y, y_h
