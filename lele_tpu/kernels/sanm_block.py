"""Fully fused SAN-M encoder layer as ONE Pallas TPU kernel.

Batch-1 encoder inference is op-latency + weight-stream bound: the XLA
lowering of a SAN-M block is ~15 fused kernels with HBM round trips for
every [T, D] intermediate (slope-probe measurement: ~19 µs/layer at
T≈100, D=512 — docs/PERF.md r2). This kernel keeps the ENTIRE layer
resident in VMEM:

    LN1 → qkv GEMM (w8a16 int8 weights, dequant in epilogue)
        → per-head attention (QK^T, mask, softmax, AV)
        → FSMN depthwise memory conv (k shifted multiply-adds)
        → out GEMM (w8) → residual → LN2 → FFN (w8 ×2, ReLU) → residual

so HBM traffic per layer is exactly: x in, int8 weights once, y out. The
reference's analogous move is its fused DQ-GEMM + hand-scheduled NEON
blocks (neon/quantization.rs:751); on TPU the win is fusing ACROSS the
whole layer, which XLA will not do on its own.

Weights use per-output-channel int8 (kernels/quant_matmul.quantize_weight_
int8); activations stay f32/bf16 with f32 accumulation. The jnp oracle is
models/sensevoice.sanm_block with weight_int8 — parity-tested in
tests/test_pallas_parity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ln(x, g, b, eps=1e-12):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _w8dot(x, wq, scale, bias):
    """x f32 [T, K] @ int8 [K, N] with per-channel dequant epilogue; bf16
    MXU dot, f32 accumulation."""
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), wq[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y * scale + bias


def _kernel(n_heads, fsmn_k, T_pad,
            x_ref, mask_ref,
            g1_ref, b1_ref, wqkv_ref, sqkv_ref, bqkv_ref, fsmn_ref,
            wo_ref, so_ref, bo_ref, g2_ref, b2_ref,
            w1_ref, s1_ref, b1f_ref, w2_ref, s2_ref, b2f_ref,
            out_ref):
    x = x_ref[:]                       # [Tp, D] f32
    m = mask_ref[:]                    # [1, Tp] f32 (1 = valid)
    D = x.shape[-1]
    hd = D // n_heads
    pad = (fsmn_k - 1) // 2

    h = _ln(x, g1_ref[:], b1_ref[:])
    qkv = _w8dot(h, wqkv_ref, sqkv_ref[:], bqkv_ref[:])   # [Tp, 3D]
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    # FSMN: depthwise centered conv as k shifted multiply-adds on the
    # zero-padded masked values — pure VPU work on VMEM values
    vm = v * m.reshape(-1, 1)[:T_pad]
    zpad = jnp.zeros((pad, D), jnp.float32)
    vp = jnp.concatenate(
        [zpad, vm, jnp.zeros((fsmn_k - 1 - pad, D), jnp.float32)], axis=0
    )
    fw = fsmn_ref[:]                   # [k, D]
    fsmn = jnp.zeros_like(vm)
    for kk in range(fsmn_k):
        fsmn = fsmn + vp[kk : kk + T_pad] * fw[kk]

    # attention, head by head (static slices; dims contract without
    # explicit transposes)
    neg = (m - 1.0) * 1e9              # [1, Tp] bias over the key axis
    inv = 1.0 / np.sqrt(hd)
    ctxs = []
    for hh in range(n_heads):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        sc = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv + neg
        sc = sc - jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc)
        att = e / jnp.sum(e, axis=-1, keepdims=True)
        ctxs.append(jax.lax.dot_general(
            att.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    ctx = jnp.concatenate(ctxs, axis=-1)

    ao = _w8dot(ctx + fsmn, wo_ref, so_ref[:], bo_ref[:])
    x1 = x + ao
    h2 = _ln(x1, g2_ref[:], b2_ref[:])
    f1 = jnp.maximum(_w8dot(h2, w1_ref, s1_ref[:], b1f_ref[:]), 0.0)
    f2 = _w8dot(f1, w2_ref, s2_ref[:], b2f_ref[:])
    out_ref[:] = x1 + f2


def sanm_layer_w8_pallas(x, mask, lp, n_heads: int, fsmn_k: int,
                         interpret: bool = False):
    """One SAN-M layer, fully fused. x: f32 [T, D]; mask: f32 [T];
    lp: layer params with w8-prepared linears (wq8/ws8/b) + norms + fsmn.
    Returns f32 [T, D]."""
    from jax.experimental import pallas as pl

    T, D = x.shape
    Tp = -(-T // 16) * 16
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, (0, Tp - T))
    mask2 = mask.reshape(1, Tp).astype(jnp.float32)

    def row(a):  # 1-D param vectors → [1, N] for clean VMEM layout
        return jnp.asarray(a, jnp.float32).reshape(1, -1)

    args = (
        x.astype(jnp.float32), mask2,
        row(lp["norm1"]["g"]), row(lp["norm1"]["b"]),
        lp["qkv"]["wq8"], row(lp["qkv"]["ws8"]), row(lp["qkv"]["b"]),
        jnp.asarray(lp["fsmn"]["w"], jnp.float32),
        lp["out"]["wq8"], row(lp["out"]["ws8"]), row(lp["out"]["b"]),
        row(lp["norm2"]["g"]), row(lp["norm2"]["b"]),
        lp["ffn1"]["wq8"], row(lp["ffn1"]["ws8"]), row(lp["ffn1"]["b"]),
        lp["ffn2"]["wq8"], row(lp["ffn2"]["ws8"]), row(lp["ffn2"]["b"]),
    )
    F = lp["ffn1"]["wq8"].shape[1]
    flops = 2 * Tp * D * (3 * D + D + 2 * F) + 4 * Tp * Tp * D
    bytes_acc = (Tp * D * 8 + D * (3 * D + D) + 2 * D * F
                 + 4 * (6 * D + 2 * F))
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads, fsmn_k, Tp),
        out_shape=jax.ShapeDtypeStruct((Tp, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=Tp * Tp,
        ),
        interpret=interpret,
    )(*args)
    return out[:T]


# ---------------------------------------------------------------------------
# Whole-ENCODER kernel: the layer index is the Pallas grid dimension, so
# Mosaic's revolving buffers DMA layer i+1's int8 weights from HBM while
# layer i computes — the double-buffered weight stream a single-shot kernel
# (above) cannot get. The activation lives in a persistent VMEM scratch
# across grid steps; HBM traffic for the whole stack is x in, each layer's
# int8 weights exactly once, y out.


def _stack_kernel(n_heads, fsmn_k, T_pad, L,
                  x_ref, mask_ref,
                  g1_ref, b1_ref, wqkv_ref, sqkv_ref, bqkv_ref, fsmn_ref,
                  wo_ref, so_ref, bo_ref, g2_ref, b2_ref,
                  w1_ref, s1_ref, b1f_ref, w2_ref, s2_ref, b2f_ref,
                  out_ref, xbuf):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xbuf[:] = x_ref[:]

    x = xbuf[:]
    m = mask_ref[:]
    D = x.shape[-1]
    hd = D // n_heads
    pad = (fsmn_k - 1) // 2

    h = _ln(x, g1_ref[0], b1_ref[0])
    qkv = _w8dot(h, wqkv_ref[0], sqkv_ref[0], bqkv_ref[0])
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    vm = v * m.reshape(-1, 1)[:T_pad]
    vp = jnp.concatenate(
        [jnp.zeros((pad, D), jnp.float32), vm,
         jnp.zeros((fsmn_k - 1 - pad, D), jnp.float32)], axis=0
    )
    fw = fsmn_ref[0]
    fsmn = jnp.zeros_like(vm)
    for kk in range(fsmn_k):
        fsmn = fsmn + vp[kk : kk + T_pad] * fw[kk]

    neg = (m - 1.0) * 1e9
    inv = 1.0 / np.sqrt(hd)
    ctxs = []
    for hh in range(n_heads):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        sc = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv + neg
        sc = sc - jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc)
        att = e / jnp.sum(e, axis=-1, keepdims=True)
        ctxs.append(jax.lax.dot_general(
            att.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    ctx = jnp.concatenate(ctxs, axis=-1)

    ao = _w8dot(ctx + fsmn, wo_ref[0], so_ref[0], bo_ref[0])
    x1 = x + ao
    h2 = _ln(x1, g2_ref[0], b2_ref[0])
    f1 = jnp.maximum(_w8dot(h2, w1_ref[0], s1_ref[0], b1f_ref[0]), 0.0)
    f2 = _w8dot(f1, w2_ref[0], s2_ref[0], b2f_ref[0])
    y = x1 + f2
    xbuf[:] = y

    @pl.when(i == L - 1)
    def _():
        out_ref[:] = y


def sanm_stack_w8_pallas(x, mask, stacked, n_heads: int, fsmn_k: int,
                         interpret: bool = False):
    """The whole L-layer encoder stack in ONE pallas_call. x: f32 [T, D];
    mask: f32 [T]; stacked: stack_layer_params output (leading L axis on
    every leaf, w8-prepared linears). Returns f32 [T, D]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, D = x.shape
    L = stacked["qkv"]["wq8"].shape[0]
    Tp = -(-T // 16) * 16
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, (0, Tp - T))
    mask2 = mask.reshape(1, Tp).astype(jnp.float32)

    def row(a):  # [L, N] f32 per-layer vectors → [L, 1, N]
        return jnp.asarray(a, jnp.float32).reshape(L, 1, -1)

    args = (
        x.astype(jnp.float32), mask2,
        row(stacked["norm1"]["g"]), row(stacked["norm1"]["b"]),
        stacked["qkv"]["wq8"], row(stacked["qkv"]["ws8"]),
        row(stacked["qkv"]["b"]),
        jnp.asarray(stacked["fsmn"]["w"], jnp.float32),
        stacked["out"]["wq8"], row(stacked["out"]["ws8"]),
        row(stacked["out"]["b"]),
        row(stacked["norm2"]["g"]), row(stacked["norm2"]["b"]),
        stacked["ffn1"]["wq8"], row(stacked["ffn1"]["ws8"]),
        row(stacked["ffn1"]["b"]),
        stacked["ffn2"]["wq8"], row(stacked["ffn2"]["ws8"]),
        row(stacked["ffn2"]["b"]),
    )

    def whole(a):  # same full block every step
        nd = np.ndim(a) if not hasattr(a, "ndim") else a.ndim
        return pl.BlockSpec(tuple(a.shape), lambda i: (0,) * nd)

    def per_layer(a):  # leading L axis sliced by the grid index
        shape = (1,) + tuple(a.shape[1:])
        nd = a.ndim
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (nd - 1))

    in_specs = [whole(args[0]), whole(args[1])]
    in_specs += [per_layer(a) for a in args[2:]]
    F = stacked["ffn1"]["wq8"].shape[-1]
    flops = L * (2 * Tp * D * (4 * D + 2 * F) + 4 * Tp * Tp * D)
    bytes_acc = (Tp * D * 8
                 + L * (D * 4 * D + 2 * D * F + 4 * (6 * D + 2 * F)))
    out = pl.pallas_call(
        functools.partial(_stack_kernel, n_heads, fsmn_k, Tp, L),
        grid=(L,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Tp, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Tp, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc,
            transcendentals=L * Tp * Tp,
        ),
        interpret=interpret,
    )(*args)
    return out[:T]


def fused_layer_available(cfg, params_layer) -> bool:
    """The fused kernel covers the standard block shape: w8-prepared
    linears, no MoE, head dim a lane multiple."""
    return (
        "wq8" in params_layer.get("qkv", {})
        and "moe" not in params_layer
        and cfg.d_model % cfg.n_heads == 0
        and (cfg.d_model // cfg.n_heads) % 128 == 0
    )


# ---------------------------------------------------------------------------
# DQL-exact whole-encoder stack: the COMPILED-ONNX flagship kernel.
#
# The w8 stack above serves the native model (w8a16: f32/bf16 activations,
# int8 weights). Compiled int8 exports carry different semantics — ONNX
# DynamicQuantizeLinear per linear (activation u8-quantized against its own
# global min/max, int8×int8→int32 MXU dot, zero-point col-sum correction,
# dequant epilogue; reference emits these via `linear_quantized*` snippets,
# /root/reference/src/snippets/default_methods.rs:96). This variant keeps
# those semantics EXACTLY, so the compiler can route whole matched SAN-M
# layers here (compiler/sanm_fuse.py) and stay parity-tested against the
# per-op trace of the same graph.
#
# Exactness under padding: rows are masked to zero before each DQL —
# ONNX DQL clamps min/max to include 0, so zero rows never perturb the
# activation scale, making the kernel's T→Tp padding invisible to the
# quantization grid. Attention bias / FSMN value-mask are taken as VALUES
# from the traced graph (one [L, T] stack each), not re-derived, so any
# masking scheme the export uses is preserved verbatim.


def _dql_dot(x, rowmask, wq_ref, colsum_ref, ws_ref, b_ref):
    """Exact ONNX DQL + MatMulInteger + dequant + bias.

    x: f32 [Tp, K]; rowmask: f32 [Tp, 1] (1 = real row); wq: i8 [K, N]
    (pre-shifted from u8 by -128 at trace time); colsum: i32 [1, N];
    ws: f32 [1, N] (weight scale, per-tensor broadcast or per-channel);
    b: f32 [1, N]."""
    xm = x * rowmask
    x_min = jnp.minimum(jnp.min(xm), 0.0)
    x_max = jnp.maximum(jnp.max(xm), 0.0)
    scale = (x_max - x_min) / 255.0
    safe = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.round(jnp.clip(-x_min / safe, 0.0, 255.0))
    q = jnp.clip(jnp.round(xm / safe) + zp, 0.0, 255.0)
    ai = (q - 128.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        ai, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    zp_i = (zp - 128.0).astype(jnp.int32)
    acc = acc - zp_i * colsum_ref[:]
    return acc.astype(jnp.float32) * (scale * ws_ref[:]) + b_ref[:]


def _stack_kernel_dql(n_heads, fsmn_k, T_pad, T, L, pad_left, eps1, eps2,
                      att_scale,
                      x_ref, bias_ref, vmask_ref,
                      g1_ref, b1_ref, wqkv_ref, cqkv_ref, sqkv_ref, bqkv_ref,
                      fsmn_ref,
                      wo_ref, co_ref, so_ref, bo_ref, g2_ref, b2_ref,
                      w1_ref, c1_ref, s1_ref, b1f_ref,
                      w2_ref, c2_ref, s2_ref, b2f_ref,
                      out_ref, xbuf):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xbuf[:] = x_ref[:]

    x = xbuf[:]
    D = x.shape[-1]
    hd = D // n_heads
    rowmask = (
        jax.lax.broadcasted_iota(jnp.int32, (T_pad, 1), 0) < T
    ).astype(jnp.float32)
    neg_pad = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, T_pad), 1) < T, 0.0, -1e9
    )
    bias_k = bias_ref[0] + neg_pad           # [1, Tp] over the key axis
    vmask = vmask_ref[:].reshape(-1, 1)[:T_pad] * rowmask

    h = _ln(x, g1_ref[0], b1_ref[0], eps=eps1)
    qkv = _dql_dot(h, rowmask, wqkv_ref[0], cqkv_ref[0], sqkv_ref[0],
                   bqkv_ref[0])
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    # FSMN depthwise memory conv on masked values (graph's pads preserved)
    vm = v * vmask
    vp = jnp.concatenate(
        [jnp.zeros((pad_left, D), jnp.float32), vm,
         jnp.zeros((fsmn_k - 1 - pad_left, D), jnp.float32)], axis=0
    )
    fw = fsmn_ref[0]
    fsmn = jnp.zeros_like(vm)
    for kk in range(fsmn_k):
        fsmn = fsmn + vp[kk : kk + T_pad] * fw[kk]

    ctxs = []
    for hh in range(n_heads):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        sc = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * att_scale + bias_k
        sc = sc - jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc)
        att = e / jnp.sum(e, axis=-1, keepdims=True)
        ctxs.append(jax.lax.dot_general(
            att, vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    ctx = jnp.concatenate(ctxs, axis=-1)

    ao = _dql_dot(ctx + fsmn, rowmask, wo_ref[0], co_ref[0], so_ref[0],
                  bo_ref[0])
    x1 = x + ao
    h2 = _ln(x1, g2_ref[0], b2_ref[0], eps=eps2)
    f1 = jnp.maximum(
        _dql_dot(h2, rowmask, w1_ref[0], c1_ref[0], s1_ref[0], b1f_ref[0]),
        0.0)
    f2 = _dql_dot(f1, rowmask, w2_ref[0], c2_ref[0], s2_ref[0], b2f_ref[0])
    y = x1 + f2
    xbuf[:] = y

    @pl.when(i == L - 1)
    def _():
        out_ref[:] = y


def sanm_stack_dql_pallas(x, attn_bias, vmask, stacked, n_heads: int,
                          fsmn_k: int, pad_left: int,
                          eps1: float = 1e-5, eps2: float = 1e-5,
                          att_scale: float | None = None,
                          interpret: bool = False):
    """L SAN-M layers with exact compiled-int8 (DQL/a8w8) semantics in ONE
    pallas_call. x: f32 [T, D]; attn_bias: f32 [L, T] (added over the key
    axis); vmask: f32 [L, T] (multiplies values ahead of the FSMN conv);
    stacked: per-linear {"wq" i8 [L,K,N], "colsum" i32 [L,1,N], "ws" f32
    [L,1,N], "b" f32 [L,1,N]} under qkv/out/ffn1/ffn2 + norm1/norm2 g,b
    [L,1,D] + fsmn [L,k,D]. Returns f32 [T, D]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, D = x.shape
    L = stacked["qkv"]["wq"].shape[0]
    if att_scale is None:
        att_scale = 1.0 / float(np.sqrt(D // n_heads))
    Tp = -(-T // 32) * 32  # i8 operand sublane tile
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        attn_bias = jnp.pad(attn_bias, ((0, 0), (0, Tp - T)))
        vmask = jnp.pad(vmask, ((0, 0), (0, Tp - T)))
    attn_bias = attn_bias.reshape(L, 1, Tp).astype(jnp.float32)
    vmask = vmask.reshape(L, 1, Tp).astype(jnp.float32)

    def lin(p):
        return (p["wq"], p["colsum"].astype(jnp.int32),
                p["ws"].astype(jnp.float32), p["b"].astype(jnp.float32))

    args = (
        x.astype(jnp.float32), attn_bias, vmask,
        stacked["norm1"]["g"], stacked["norm1"]["b"],
        *lin(stacked["qkv"]),
        jnp.asarray(stacked["fsmn"], jnp.float32),
        *lin(stacked["out"]),
        stacked["norm2"]["g"], stacked["norm2"]["b"],
        *lin(stacked["ffn1"]),
        *lin(stacked["ffn2"]),
    )

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(tuple(a.shape), lambda i: (0,) * nd)

    def per_layer(a):
        shape = (1,) + tuple(a.shape[1:])
        nd = a.ndim
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (nd - 1))

    in_specs = [whole(args[0])] + [per_layer(a) for a in args[1:]]
    F = stacked["ffn1"]["wq"].shape[-1]
    flops = L * (2 * Tp * D * (4 * D + 2 * F) + 4 * Tp * Tp * D)
    bytes_acc = (Tp * D * 8
                 + L * (D * 4 * D + 2 * D * F + 12 * (6 * D + 2 * F)))
    out = pl.pallas_call(
        functools.partial(_stack_kernel_dql, n_heads, fsmn_k, Tp, T, L,
                          pad_left, float(eps1), float(eps2),
                          float(att_scale)),
        grid=(L,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Tp, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Tp, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc,
            transcendentals=L * Tp * Tp,
        ),
        interpret=interpret,
    )(*args)
    return out[:T]


# ---------------------------------------------------------------------------
# w4a16 stack: same grid-over-layers structure with GROUPWISE int4 weights
# (kernels/w4_matmul.py packing: low nibble = rows [0, K/2), high nibble =
# rows [K/2, K); scales [K/group, N] applied BEFORE the contraction, so the
# dot splits into low/high K-half planes). Streams HALF the w8 bytes, but
# on v5e the in-kernel dequant (unpack + scale over every weight element,
# VPU work the w8 kernel's tiny [T,N] epilogue doesn't pay) eats the
# bandwidth saving: interleaved slope trials read 0.41 ms vs w8's 0.385
# (docs/PERF.md r2). Ship int4 for CAPACITY (2× smaller resident weights),
# not latency, on this generation.


def _w4dot(x, wp, s, b, group, n_g):
    """x f32 [Tp, K] @ groupwise-int4 [K/2, N] packed + scales [≥n_g, N]
    (first n_g rows real) + bias [N] → f32 [Tp, N]."""
    K = x.shape[1]
    half = K // 2
    N = wp.shape[-1]
    pi = wp.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(pi, 28), 28)
    hi = jnp.right_shift(pi, 4)
    gh = n_g // 2  # scale groups per nibble plane

    def dq(qi, s_plane):
        sp = s_plane.reshape(gh, 1, N)
        sp = jnp.broadcast_to(sp, (gh, group, N)).reshape(half, N)
        return (qi.astype(jnp.float32) * sp).astype(jnp.bfloat16)

    y = jax.lax.dot_general(
        x[:, :half].astype(jnp.bfloat16), dq(lo, s[:gh]),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + jax.lax.dot_general(
        x[:, half:].astype(jnp.bfloat16), dq(hi, s[gh:n_g]),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + b


def _stack_kernel_w4(n_heads, fsmn_k, T_pad, L, group, n_gs,
                     x_ref, mask_ref,
                     g1_ref, b1_ref, wqkv_ref, sqkv_ref, bqkv_ref, fsmn_ref,
                     wo_ref, so_ref, bo_ref, g2_ref, b2_ref,
                     w1_ref, s1_ref, b1f_ref, w2_ref, s2_ref, b2f_ref,
                     out_ref, xbuf):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xbuf[:] = x_ref[:]

    x = xbuf[:]
    m = mask_ref[:]
    D = x.shape[-1]
    hd = D // n_heads
    pad = (fsmn_k - 1) // 2
    g_qkv, g_out, g_f1, g_f2 = n_gs

    h = _ln(x, g1_ref[0], b1_ref[0])
    qkv = _w4dot(h, wqkv_ref[0], sqkv_ref[0], bqkv_ref[0], group, g_qkv)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    vm = v * m.reshape(-1, 1)[:T_pad]
    vp = jnp.concatenate(
        [jnp.zeros((pad, D), jnp.float32), vm,
         jnp.zeros((fsmn_k - 1 - pad, D), jnp.float32)], axis=0
    )
    fw = fsmn_ref[0]
    fsmn = jnp.zeros_like(vm)
    for kk in range(fsmn_k):
        fsmn = fsmn + vp[kk : kk + T_pad] * fw[kk]

    neg = (m - 1.0) * 1e9
    inv = 1.0 / np.sqrt(hd)
    ctxs = []
    for hh in range(n_heads):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        sc = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv + neg
        sc = sc - jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc)
        att = e / jnp.sum(e, axis=-1, keepdims=True)
        ctxs.append(jax.lax.dot_general(
            att.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    ctx = jnp.concatenate(ctxs, axis=-1)

    ao = _w4dot(ctx + fsmn, wo_ref[0], so_ref[0], bo_ref[0], group, g_out)
    x1 = x + ao
    h2 = _ln(x1, g2_ref[0], b2_ref[0])
    f1 = jnp.maximum(
        _w4dot(h2, w1_ref[0], s1_ref[0], b1f_ref[0], group, g_f1), 0.0)
    f2 = _w4dot(f1, w2_ref[0], s2_ref[0], b2f_ref[0], group, g_f2)
    y = x1 + f2
    xbuf[:] = y

    @pl.when(i == L - 1)
    def _():
        out_ref[:] = y


def sanm_stack_w4_pallas(x, mask, stacked, n_heads: int, fsmn_k: int,
                         group: int = 128, interpret: bool = False):
    """w4a16 whole-encoder kernel. stacked: stack_layer_params over
    prepare_w4_params output (wq4 [L, K/2, N], ws4 [L, K/group, N])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, D = x.shape
    L = stacked["qkv"]["wq4"].shape[0]
    Tp = -(-T // 16) * 16
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, (0, Tp - T))
    mask2 = mask.reshape(1, Tp).astype(jnp.float32)

    def row(a):
        return jnp.asarray(a, jnp.float32).reshape(L, 1, -1)

    def scales(a):
        # pad group rows to a sublane multiple (Mosaic wants ≥8-row blocks)
        a = jnp.asarray(a, jnp.float32)
        n_g = a.shape[1]
        pad = (-n_g) % 8
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        return a, n_g

    sqkv, g_qkv = scales(stacked["qkv"]["ws4"])
    so, g_out = scales(stacked["out"]["ws4"])
    s1, g_f1 = scales(stacked["ffn1"]["ws4"])
    s2, g_f2 = scales(stacked["ffn2"]["ws4"])
    for name, g in (("qkv", g_qkv), ("out", g_out), ("ffn1", g_f1),
                    ("ffn2", g_f2)):
        if g % 2:
            raise ValueError(
                f"{name}: K/group={g} must be even (groups must not "
                f"straddle the nibble-plane boundary)")

    args = (
        x.astype(jnp.float32), mask2,
        row(stacked["norm1"]["g"]), row(stacked["norm1"]["b"]),
        stacked["qkv"]["wq4"], sqkv, row(stacked["qkv"]["b"]),
        jnp.asarray(stacked["fsmn"]["w"], jnp.float32),
        stacked["out"]["wq4"], so, row(stacked["out"]["b"]),
        row(stacked["norm2"]["g"]), row(stacked["norm2"]["b"]),
        stacked["ffn1"]["wq4"], s1, row(stacked["ffn1"]["b"]),
        stacked["ffn2"]["wq4"], s2, row(stacked["ffn2"]["b"]),
    )

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(tuple(a.shape), lambda i: (0,) * nd)

    def per_layer(a):
        shape = (1,) + tuple(a.shape[1:])
        nd = a.ndim
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (nd - 1))

    in_specs = [whole(args[0]), whole(args[1])]
    in_specs += [per_layer(a) for a in args[2:]]
    F = stacked["ffn1"]["wq4"].shape[-1]
    flops = L * (2 * Tp * D * (4 * D + 2 * F) + 4 * Tp * Tp * D)
    bytes_acc = (Tp * D * 8
                 + L * (D * 2 * D + D * F + 4 * (6 * D + 2 * F)))
    out = pl.pallas_call(
        functools.partial(_stack_kernel_w4, n_heads, fsmn_k, Tp, L, group,
                          (g_qkv, g_out, g_f1, g_f2)),
        grid=(L,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Tp, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Tp, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc,
            transcendentals=L * Tp * Tp,
        ),
        interpret=interpret,
    )(*args)
    return out[:T]
