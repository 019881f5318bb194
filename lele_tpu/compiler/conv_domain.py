"""Packed conv-DOMAIN pass for compiled vision graphs (VERDICT r2 #2).

The s2d stem rewrite (compiler/s2d_stem.py) fixes the single worst conv —
but then unpacks to NCHW and leaves every following small-channel stage
lane-starved (C=16..64 pads to 128 lanes; the native YOLO26 runs its whole
early backbone in the packed domain, models/s2d.py). This pass keeps a
compiled graph's leading conv CHAIN in the packed domain:

    input  → host s2d4 pack [B, H/4, W/4, 16C]
    Conv(s2)            → impulse-extracted packed conv (grid constant;
                          stride-2 first repacks s2d2→s2d4 via `s2d`)
    BatchNormalization  → per-channel affine, params TILED ×4 over the
                          packed slot blocks (exact — slot = (u·2+v)·C + c)
    Sigmoid/Mul (SiLU), Relu, Tanh, LeakyRelu … → elementwise, layout-free
    Conv(s1)            → impulse-extracted packed conv
    … until: channels reach lane width, an op the domain doesn't cover,
    or the tensor fans out — then ONE `s2d_undo` + NCHW transpose hands
    the rest of the graph to the per-op path.

Extraction is ANALYTIC (`packed_conv_weight` below): each conv's packed
equivalent is derived directly from its OIHW weights and pads via the
s2d slot algebra — exact for any kernel/pad combo that preserves the
s2d2-form output, with parity gates in tests/test_conv_domain.py.
Everything is planned BEFORE tracing; the installed pattern replays the
plan on device values at trace time.

Reference counterpart: none (lele's answer to small-channel convs is NEON
fast paths, conv2d.rs:535-567; this is the TPU answer).
"""

from __future__ import annotations

import numpy as np

from .s2d_stem import (
    _attr,
    _attr_int,
    _attr_ints,
    detect_stem,
    pack_host,
)


def packed_conv_weight(w_oihw: np.ndarray, stride: int, pl: int, pw: int,
                       block: int = 2):
    """EXACT packed-domain weight for an original conv, by analytic tap
    rearrangement (no probing — the packed map is channel-diagonal, so
    every packed tap is an original tap placed at a cell offset):

    output cell slot (p,q) of out pixel (2a+p, 2b+q) reads original input
    pixel  stride·(2a+p) + m − pl  =  S·a + (stride·p + m − pl)  with
    S = `block` the INPUT cell factor (2 = s2d2 chain tensor, 4 = the
    host-packed s2d4 stem input). divmod by S gives the relative input
    cell `da` and its slot `u`; the leftover factor 2·stride/S becomes
    the conv's spatial stride in the packed domain. Zero padding commutes
    with packing, so boundaries are exact too.

    The stride-2 / block-2 case is the key one (r3): a stride-2 conv on
    an s2d2 tensor is a WINDOW-STRIDE-2 packed conv — the r2 design
    instead repacked s2d2→s2d4 before every stride-2 conv, and those 8-D
    reshape/transpose shuffles were ~60% of compiled-YOLO device time
    (94 µs + 59 µs on a 0.35 ms forward, per the r3 profiler trace).

    w_oihw: [O, C, kh, kw] → (W [KH, KW, S²C, 4O] HWIO, pad_h (lo,hi),
    pad_w (lo,hi), conv_stride) for an NHWC conv on the packed tensor.
    """
    O, C, kh, kw = w_oihw.shape
    S = block
    if (2 * stride) % S:
        raise ValueError(f"stride {stride} not expressible on block {S}")
    conv_stride = 2 * stride // S
    taps: dict[tuple, np.ndarray] = {}
    for p in range(2):
        for q in range(2):
            for m in range(kh):
                for mw_ in range(kw):
                    da, u = divmod(stride * p + m - pl, S)
                    db, v = divmod(stride * q + mw_ - pw, S)
                    blk = taps.setdefault(
                        (da, db), np.zeros((S * S * C, 4 * O), np.float32))
                    blk[(u * S + v) * C:(u * S + v + 1) * C,
                        (p * 2 + q) * O:(p * 2 + q + 1) * O] += \
                        w_oihw[:, :, m, mw_].T
    das = [d for d, _ in taps]
    dbs = [d for _, d in taps]
    lo_a, hi_a = min(das), max(das)
    lo_b, hi_b = min(dbs), max(dbs)
    W = np.zeros((hi_a - lo_a + 1, hi_b - lo_b + 1, S * S * C, 4 * O),
                 np.float32)
    for (da, db), blk in taps.items():
        W[da - lo_a, db - lo_b] = blk
    return W, (-lo_a, hi_a), (-lo_b, hi_b), conv_stride

# stop packing once channels fill the lanes on their own
_LANE_FULL = 128
# elementwise unary ops that are layout-free in the packed domain
_EW_UNARY = {"Sigmoid", "Relu", "Tanh", "Softplus", "Erf", "Exp", "Neg",
             "Sqrt", "HardSigmoid", "HardSwish", "Elu", "LeakyRelu",
             "Selu", "Celu", "Mish"}


def _resolve_conv_pads(node, kh, kw, H, W, stride):
    pads = _attr_ints(node, "pads", None)
    if pads is not None:
        return pads
    auto = _attr(node, "auto_pad", "") or ""
    if isinstance(auto, bytes):
        auto = auto.decode()
    if auto in ("", "NOTSET", "VALID"):
        return [0, 0, 0, 0]
    out_h = -(-H // stride)
    out_w = -(-W // stride)
    th = max(0, (out_h - 1) * stride + kh - H)
    tw = max(0, (out_w - 1) * stride + kw - W)
    if auto == "SAME_UPPER":
        return [th // 2, tw // 2, th - th // 2, tw - tw // 2]
    return [th - th // 2, tw - tw // 2, th // 2, tw // 2]


def build_conv_domain(model, specs):
    """If the graph opens with a packable image-conv chain, return
    (new_specs, pattern_fn, packers) else None. Planned before tracing;
    supersedes s2d_stem.build_stem_rewrite (chain length 1 ≡ old stem)."""
    import jax
    import jax.numpy as jnp

    from ..ops import OPS, make_ctx

    hit = detect_stem(model, specs)
    if hit is None:
        return None
    nodes = list(model.graph.node)
    stem_idx, x_name, _w_name, _b_name = hit
    graph_outputs = {vi.name for vi in model.graph.output}
    cons: dict[str, list[int]] = {}
    for j, n in enumerate(nodes):
        for name in n.input:
            if name:
                cons.setdefault(name, []).append(j)
        for a in n.attribute:  # names read inside If/Loop bodies escape too
            from .patterns import _collect_subgraph_refs

            if a.type == 5:
                _collect_subgraph_refs(a.g, graph_outputs)
            elif a.type == 10:
                for g in a.graphs:
                    _collect_subgraph_refs(g, graph_outputs)

    B, C0, H0, W0 = specs[x_name][0]

    # -- plan the chain ------------------------------------------------------
    # state while planning: current ORIGINAL-space H/W/C and the producing
    # node's output name; steps are replayed on packed values at trace time
    steps: list[dict] = []
    consumed: list[int] = []

    def node_index(n):
        return next(j for j, m in enumerate(nodes) if m is n)

    def plan_conv(node, H, W, C, first: bool):
        w_np = model.initializer_array(node.input[1])
        if w_np is None:
            return None
        w_np = np.asarray(w_np, np.float32)  # OIHW
        if w_np.ndim != 4:
            return None
        Cout, Cin, kh, kw = w_np.shape
        if Cin != C or _attr_int(node, "group", 1) != 1:
            return None
        # pack only while the original channels under-fill the lanes enough
        # to pay for the packed MACs (stride-1 packed = 4× MACs at full
        # lanes; native s2d measured a win through C=64, models/s2d.py)
        if Cin > _LANE_FULL // 2:
            return None
        strides = _attr_ints(node, "strides", [1, 1])
        if strides not in ([1, 1], [2, 2]):
            return None
        if _attr_ints(node, "dilations", [1, 1]) != [1, 1]:
            return None
        s = strides[0]
        pads = _resolve_conv_pads(node, kh, kw, H, W, s)
        out_h = (H + pads[0] + pads[2] - kh) // s + 1
        out_w = (W + pads[1] + pads[3] - kw) // s + 1
        # s2d2-form closure: stride-2 must halve, stride-1 must preserve
        if s == 2 and (out_h * 2 != H or out_w * 2 != W):
            return None
        if s == 1 and (out_h != H or out_w != W):
            return None
        # stride-2 runs as a window-stride-2 packed conv over the s2d2
        # grid [H/2, W/2] → needs an even grid (true for pow-2 image dims)
        if s == 2 and not first and (H % 4 or W % 4):
            return None
        b_np = None
        if len(node.input) > 2 and node.input[2]:
            b_np = model.initializer_array(node.input[2])
            if b_np is None:
                return None
        Wp, (ph_lo, ph_hi), (pw_lo, pw_hi), cs = packed_conv_weight(
            w_np, s, pads[0], pads[1],
            # the FIRST conv's input arrives host-packed s2d4; the chain
            # then stays s2d2 forever (no repacks — see packed_conv_weight)
            block=4 if first else 2)
        return {
            "kind": "conv",
            "W": Wp,
            "pad": ((ph_lo, ph_hi), (pw_lo, pw_hi)),
            "stride": cs,
            "bias": None if b_np is None else np.tile(
                np.asarray(b_np, np.float32).reshape(-1), 4),
            "out_h": out_h, "out_w": out_w, "cout": Cout,
        }

    stem_node = nodes[stem_idx]
    st = plan_conv(stem_node, H0, W0, C0, first=True)
    if st is None:
        return None
    steps.append(st)
    consumed.append(stem_idx)
    cur_name = stem_node.output[0]
    H, W, C = st["out_h"], st["out_w"], st["cout"]

    while True:
        cs = [] if cur_name in graph_outputs else cons.get(cur_name, [])
        if len(cs) == 2:
            # SiLU as exported: x → Sigmoid, then Mul(x, sigmoid(x)) —
            # x legitimately has TWO consumers forming one fused op
            a, b = nodes[cs[0]], nodes[cs[1]]
            sig = a if a.op_type == "Sigmoid" else (
                b if b.op_type == "Sigmoid" else None)
            mul = b if sig is a else a
            if (sig is not None and sig.input[0] == cur_name
                    and mul.op_type == "Mul"
                    and set(mul.input) == {cur_name, sig.output[0]}
                    and sig.output[0] not in graph_outputs
                    and cons.get(sig.output[0], []) == [node_index(mul)]):
                steps.append({"kind": "silu"})
                consumed.append(node_index(sig))
                consumed.append(node_index(mul))
                cur_name = mul.output[0]
                continue
            break
        if len(cs) != 1:
            break
        n = nodes[cs[0]]
        if n.op_type == "Conv":
            pc = plan_conv(n, H, W, C, first=False)
            if pc is None:
                break
            steps.append(pc)
            consumed.append(node_index(n))
            cur_name = n.output[0]
            H, W, C = pc["out_h"], pc["out_w"], pc["cout"]
            continue
        if n.op_type == "BatchNormalization":
            arrs = [model.initializer_array(nm) for nm in n.input[1:5]]
            if any(a is None for a in arrs) or len(n.output) != 1:
                break
            g, beta, mean, var = (np.asarray(a, np.float32).reshape(-1)
                                  for a in arrs)
            if g.shape != (C,):
                break
            eps = float(_attr(n, "epsilon", 1e-5))
            scale = g / np.sqrt(var + eps)
            shift = beta - mean * scale
            steps.append({"kind": "affine",
                          "scale": np.tile(scale, 4),
                          "shift": np.tile(shift, 4)})
            consumed.append(node_index(n))
            cur_name = n.output[0]
            continue
        if n.op_type in _EW_UNARY and n.op_type in OPS:
            steps.append({"kind": "ew", "node": n})
            consumed.append(node_index(n))
            cur_name = n.output[0]
            continue
        break

    if not steps:
        return None
    final_name = cur_name
    consumed_set = set(consumed)
    # every intermediate must be internal to the chain
    for j in consumed_set:
        for out in nodes[j].output:
            if out == final_name:
                continue
            if out in graph_outputs:
                return None
            if any(k not in consumed_set for k in cons.get(out, [])):
                return None

    from ..models.s2d import s2d_undo

    n_chain = len(steps)

    def pattern(tracer, state, nodes_, i, env, scope):
        if scope or i != stem_idx:
            return None
        xp = env.get(x_name)
        if xp is None or tuple(np.shape(xp)) != (
            B, H0 // 4, W0 // 4, 16 * C0
        ):
            return None
        # dtype-preserving: under compute="bfloat16" the walk wrapper hands
        # us a bf16 input and the engine stores the packed weights as bf16
        # params — forcing f32 here would silently run the whole chain (and
        # everything downstream of it) at 2× the HBM traffic
        xp = jnp.asarray(xp)
        if xp.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            xp = xp.astype(jnp.float32)
        for si, stp in enumerate(steps):
            if stp["kind"] == "conv":
                Wd = state.to_device(f"__s2d_chain_{si}_w__", stp["W"])
                from ..ops.math_ops import _prec

                xp = jax.lax.conv_general_dilated(
                    xp, jnp.asarray(Wd).astype(xp.dtype),
                    (stp["stride"], stp["stride"]),
                    list(stp["pad"]),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=_prec(),
                )
                if stp["bias"] is not None:
                    bd = state.to_device(f"__s2d_chain_{si}_b__", stp["bias"])
                    xp = xp + jnp.asarray(bd).astype(xp.dtype).reshape(
                        1, 1, 1, -1)
            elif stp["kind"] == "affine":
                sc = state.to_device(f"__s2d_chain_{si}_s__", stp["scale"])
                sh = state.to_device(f"__s2d_chain_{si}_t__", stp["shift"])
                xp = xp * jnp.asarray(sc).astype(xp.dtype).reshape(
                    1, 1, 1, -1) \
                    + jnp.asarray(sh).astype(xp.dtype).reshape(1, 1, 1, -1)
            elif stp["kind"] == "silu":
                xp = xp * jax.nn.sigmoid(xp)
            else:  # elementwise unary via the op registry (exact emitter,
                # original node carried so attrs like LeakyRelu alpha apply)
                ctx = make_ctx(jnp, stp["node"], model.opset, tracer=tracer)
                xp = OPS[stp["node"].op_type].fn(ctx, xp)
        y = s2d_undo(xp, 2)
        y = jnp.transpose(y, (0, 3, 1, 2))  # NCHW for the per-op remainder
        state.pattern_hits["s2d_chain_ops"] = (
            state.pattern_hits.get("s2d_chain_ops", 0) + n_chain
        )
        return consumed_set, {final_name: y}

    pattern.__name__ = "s2d_stem"  # pattern_hits compatibility

    new_specs = dict(specs)
    new_specs[x_name] = ((B, H0 // 4, W0 // 4, 16 * C0), specs[x_name][1])
    packers = {x_name: ((B, C0, H0, W0), pack_host)}
    return new_specs, pattern, packers
