"""Space-to-depth image-stem rewrite for compiled ONNX graphs.

An ONNX vision model's first Conv reads [B, 3, H, W] — on TPU the C=3
minor/lane padding and the small contraction make the stem the single
most expensive conv in the graph (~0.33 ms at 640² whatever the device
layout, docs/PERF.md r2). The native YOLO model fixes this with the s2d
conv domain (models/s2d.py); this pass brings the SAME rewrite to any
compiled checkpoint:

- the graph INPUT becomes host-packed s2d4 [B, H/4, W/4, 16C] (the
  CompiledModel packs incoming NCHW numpy transparently, so `run_np`
  keeps its drop-in ONNX signature);
- the stem Conv is replaced by an equivalent stride-1 conv on the packed
  cells whose kernel is EXTRACTED NUMERICALLY by impulse-probing the
  original conv at trace time (exact for any pads/kernel — the 2-D
  sibling of models/packed1d.extract_packed_conv), then unpacked back to
  the NCHW tensor every downstream node expects.

Applies only when the input feeds exactly that one Conv (stride 2,
C_in ≤ 4, square kernel, H and W divisible by 4) — otherwise the graph
compiles unchanged. Reference counterpart: none (lele's NEON conv2d has
small-channel fast paths instead, conv2d.rs:535-567).
"""

from __future__ import annotations

import numpy as np


def _attr(node, name, default=None):
    from ..ops.registry import parse_attr

    for a in node.attribute:
        if a.name == name:
            return parse_attr(a)
    return default


def _attr_ints(node, name, default=None):
    v = _attr(node, name)
    return default if v is None else [int(x) for x in np.atleast_1d(v)]


def _attr_int(node, name, default=0):
    v = _attr(node, name)
    return default if v is None else int(v)


def detect_stem(model, specs):
    """→ (node_index, input_name, weight_name, bias_name) or None."""
    nodes = list(model.graph.node)
    input_names = set(model.input_names())
    inits = set(model.initializers)
    for i, n in enumerate(nodes):
        if n.op_type != "Conv":
            continue
        x = n.input[0]
        if x not in input_names or x not in specs:
            return None  # first Conv isn't on a graph input
        shape = specs[x][0]
        if len(shape) != 4 or shape[1] > 4 or shape[2] % 4 or shape[3] % 4:
            return None
        if _attr_ints(n, "strides", [1, 1]) != [2, 2]:
            return None
        if _attr_int(n, "group", 1) != 1:
            return None
        if _attr_ints(n, "dilations", [1, 1]) != [1, 1]:
            return None
        consumers = [m for m in nodes if x in list(m.input)]
        if len(consumers) != 1:
            return None
        if n.input[1] not in inits:
            return None
        bias = n.input[2] if len(n.input) > 2 else None
        return i, x, n.input[1], bias
    return None


def extract_packed_conv2d(fn, Cin_p: int, grid: int = 16):
    """2-D impulse extraction: `fn` maps [1, G, G, Cin_p] → [1, G, G, Cout_p]
    linearly and shift-equivariantly on interior cells. Returns a CENTERED
    kernel W [kh, kw, Cin_p, Cout_p] (odd kh/kw, symmetric zero padding)
    with y[r, s] = sum_{dy,dx} x[r+dy-mh, s+dx-mw] @ W[dy, dx]."""
    import jax
    import jax.numpy as jnp

    t0 = grid // 2
    basis = np.zeros((Cin_p, grid, grid, Cin_p), np.float32)
    for ci in range(Cin_p):
        basis[ci, t0, t0, ci] = 1.0
    # probe on CPU: avoids a remote-TPU compile round trip at load time
    import contextlib

    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        ctx = contextlib.nullcontext()
    with ctx:
        resp = np.asarray(
            jax.jit(jax.vmap(lambda x: fn(x[None])[0]))(jnp.asarray(basis)))
    amax = np.abs(resp).max()
    if amax == 0.0:  # degenerate (all-zero weights): 1×1 zero kernel
        return np.zeros((1, 1, Cin_p, resp.shape[-1]), np.float32)
    ys = np.nonzero(np.abs(resp).max(axis=(0, 2, 3)) > 1e-6 * amax)[0]
    xs = np.nonzero(np.abs(resp).max(axis=(0, 1, 3)) > 1e-6 * amax)[0]
    lo_y, hi_y = int(ys.min()), int(ys.max())
    lo_x, hi_x = int(xs.min()), int(xs.max())
    mh = max(hi_y - t0, t0 - lo_y)
    mw = max(hi_x - t0, t0 - lo_x)
    Cout_p = resp.shape[-1]
    W = np.zeros((2 * mh + 1, 2 * mw + 1, Cin_p, Cout_p), np.float32)
    # y[r,s] += x[r+dy-mh, s+dx-mw] W[dy,dx]: an impulse at (t0,t0) lands
    # in y[t0+mh-dy, t0+mw-dx]
    for dy in range(2 * mh + 1):
        for dx in range(2 * mw + 1):
            ry, rx = t0 + mh - dy, t0 + mw - dx
            if 0 <= ry < grid and 0 <= rx < grid:
                W[dy, dx] = resp[:, ry, rx, :]
    return W


def pack_host(x: np.ndarray) -> np.ndarray:
    """Host packer: NCHW [B, C, H, W] → s2d4 [B, H/4, W/4, 16C], slot
    (u*4+v)*C + c (models/s2d.py layout)."""
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // 4, 4, W // 4, 4)
    x = x.transpose(0, 2, 4, 3, 5, 1)
    return np.ascontiguousarray(x.reshape(B, H // 4, W // 4, 16 * C))


def build_stem_rewrite(model, specs):
    """If the graph has a rewritable stem, return
    (new_specs, pattern_fn, packers) else None. Run before tracing."""
    import jax
    import jax.numpy as jnp

    hit = detect_stem(model, specs)
    if hit is None:
        return None
    idx, x_name, w_name, b_name = hit
    node = list(model.graph.node)[idx]
    w_np = model.initializer_array(w_name)
    if w_np is None:
        return None
    w_np = np.asarray(w_np, np.float32)  # OIHW
    Cout, Cin, kh, kw = w_np.shape
    shape = specs[x_name][0]
    B, C, H, W = shape
    if C != Cin:
        return None
    pads = _attr_ints(node, "pads", None)
    if pads is None:
        auto = _attr(node, "auto_pad", "") or ""
        if isinstance(auto, bytes):
            auto = auto.decode()
        if auto in ("", "NOTSET", "VALID"):
            pads = [0, 0, 0, 0]
        else:
            total_h = max(0, kh - 2)
            total_w = max(0, kw - 2)
            if auto == "SAME_UPPER":
                pads = [total_h // 2, total_w // 2,
                        total_h - total_h // 2, total_w - total_w // 2]
            else:
                pads = [total_h - total_h // 2, total_w - total_w // 2,
                        total_h // 2, total_w // 2]

    # the packed rewrite assumes the stem preserves out == H/2 exactly
    # (s2d2-form output); reject pads/kernel combos that don't (e.g.
    # ONNX-default VALID pads) — the graph then compiles unchanged
    out_h = (H + pads[0] + pads[2] - kh) // 2 + 1
    out_w = (W + pads[1] + pads[3] - kw) // 2 + 1
    if out_h * 2 != H or out_w * 2 != W:
        return None

    w_dev = jnp.asarray(w_np)

    def orig_conv_nchw(x_nchw):
        # HIGHEST precision: the impulse responses ARE the extracted
        # weights — default (bf16-multiply) precision would bake ~1e-2
        # rounding into the kernel
        return jax.lax.conv_general_dilated(
            x_nchw, w_dev, (2, 2),
            [(pads[0], pads[2]), (pads[1], pads[3])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )

    from ..models.s2d import s2d, s2d_undo

    def packed_view(xp):  # [1, G, G, 16C] → [1, G, G, 4*Cout]
        x = s2d_undo(xp, 4)                      # NHWC [1, 4G, 4G, C]
        x = jnp.transpose(x, (0, 3, 1, 2))       # NCHW
        y = orig_conv_nchw(x)                    # NCHW [1, Cout, 2G, 2G]
        y = jnp.transpose(y, (0, 2, 3, 1))       # NHWC
        return s2d(y, 2)                         # [1, G, G, 4*Cout]

    Wp = jnp.asarray(extract_packed_conv2d(packed_view, 16 * C))
    mh = (Wp.shape[0] - 1) // 2
    mw = (Wp.shape[1] - 1) // 2

    b_np = None
    if b_name:
        b_np = model.initializer_array(b_name)

    def pattern(tracer, state, nodes, i, env, scope):
        if scope or i != idx:
            return None
        xp = env.get(x_name)
        if xp is None or tuple(np.shape(xp)) != (B, H // 4, W // 4, 16 * C):
            return None
        Wd = state.to_device("__s2d_stem_w__", np.asarray(Wp))
        from ..ops.math_ops import _prec

        # dtype-preserving (see conv_domain.py): bf16 compute mode must not
        # be silently upcast back to f32 here
        xp = jnp.asarray(xp)
        if xp.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            xp = xp.astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            xp, jnp.asarray(Wd).astype(xp.dtype), (1, 1),
            [(mh, mh), (mw, mw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_prec(),
        )
        y = s2d_undo(y, 2)                       # NHWC [B, H/2, W/2, Cout]
        y = jnp.transpose(y, (0, 3, 1, 2))       # NCHW for downstream
        if b_np is not None:
            bd = state.to_device("__s2d_stem_b__", np.asarray(b_np, np.float32))
            y = y + jnp.asarray(bd).astype(y.dtype).reshape(1, -1, 1, 1)
        return {i}, {node.output[0]: y}

    pattern.__name__ = "s2d_stem"  # tracer books pattern_hits by this name

    new_specs = dict(specs)
    new_specs[x_name] = ((B, H // 4, W // 4, 16 * C), specs[x_name][1])
    packers = {x_name: (tuple(shape), pack_host)}
    return new_specs, pattern, packers
