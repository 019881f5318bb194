"""Weight-only int4 GEMM (w4a16, groupwise scales) — Pallas TPU kernel.

Two in-kernel forms, picked by activation dtype:

- **bf16 x (the a16 deployment dtype): group-accumulator form.** The
  per-element VPU work is unpack + int→bf16 convert ONLY (int4 values
  are exactly representable in bf16); each scale group contributes one
  small MXU dot whose [M, tn] f32 partial is multiplied by that group's
  scale row before accumulating. Scales never touch the [K, N]-sized
  operand, so the VPU stops being the bottleneck: measured 5.6 µs at
  M8/K4096/N4096/g64 — ~1.5 TB/s effective packed-weight stream,
  ≈ the HBM roofline, 13× faster than streaming dense f32 and 8× faster
  than this kernel's own f32 whole-tile form (probe 2026-08-19).
- **f32 x: whole-tile scaled-operand form.** Numerics-exact w4a32
  (dequant in f32, HIGHEST-precision dot). The per-element scale
  multiply + 6-pass f32 MXU dots cap it at ~47 µs on the same shape —
  kept because exactness is its contract, not speed.

Per-output-channel scales are too coarse at 4 bits, so scales are
GROUPWISE along K (default g=128, the AWQ/GPTQ deployment standard);
K-varying scales don't commute with the full K-sum (unlike the w8
kernel's N-scales epilogue), which is exactly why the bf16 form applies
them per-group on the accumulator instead.

Packing is BLOCK layout, not interleaved: byte i of the packed tensor
holds q[i] in the low nibble and q[i + K/2] in the high nibble. Unpacking
then needs only CONTIGUOUS K-slices of x (lane-strided gathers are slow on
the TPU vector unit):

    y = x[:, :K/2] @ dq(low) + x[:, K/2:] @ dq(high)

The Pallas grid tiles N and packed-K; the x block for each packed K-tile
is fed twice with two index maps (low rows j·tk, high rows K/2 + j·tk).

Reference lineage: the prepared-weights concept (neon/quantization.rs:24)
taken to int4 — no reference counterpart (lele's floor is int8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant_matmul import _VMEM_BUDGET, _on_tpu


def quantize_weight_int4(w, group: int = 128):
    """Groupwise symmetric int4 quantization of a [K, N] weight.

    → (packed i8 [K/2, N], scales f32 [K/group, N]). Requires K even and
    K % group == 0 (model dims here are powers of two; pad upstream
    otherwise). Values live in [-7, 7] (symmetric, zero exactly
    representable)."""
    w = jnp.asarray(w, jnp.float32)
    K, N = w.shape
    if K % 2 or K % group:
        raise ValueError(f"K={K} must be even and divisible by group={group}")
    g = K // group
    wg = w.reshape(g, group, N)
    amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(K, N)
    half = K // 2
    lo = q[:half]
    hi = q[half:]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, 0xF), jnp.left_shift(hi, 4)
    ).astype(jnp.int8)
    return packed, scale.reshape(g, N)


def _unpack_nibbles(p):
    """packed i8 → (low i32, high i32), both sign-extended int4 values."""
    pi = p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(pi, 28), 28)
    hi = jnp.right_shift(pi, 4)  # i32 already sign-extends the byte
    return lo, hi


def dequantize_int4(packed, scales, group: int = 128):
    """Inverse of quantize_weight_int4 → f32 [K, N] (the numerics oracle)."""
    half, N = packed.shape
    K = half * 2
    lo, hi = _unpack_nibbles(packed)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    srep = jnp.repeat(scales, group, axis=0)
    return q * srep


def w4_matmul(x, packed, scales, group: int = 128,
              tn: int = 512, tk: int = 512):
    """Guarded entry: Pallas on TPU when blocks fit VMEM, identical-math
    jnp dequant-dot otherwise. x: [M, K] bf16/f32; packed: i8 [K/2, N];
    scales: f32 [K/group, N]. → f32 [M, N] ≈ x @ dequant(packed).

    LELE_W4_IMPL=jnp|pallas forces one implementation."""
    import os

    impl = os.environ.get("LELE_W4_IMPL", "")
    m, k2 = x.shape[0], packed.shape[0] * 2
    n = packed.shape[1]
    if x.shape[1] != k2:
        raise ValueError(f"x K={x.shape[1]} != packed K={k2}")
    if impl == "jnp":
        return _w4_matmul_jnp(x, packed, scales, group)
    if _on_tpu() or impl == "pallas":
        itemsize = jnp.dtype(x.dtype).itemsize
        sublane = 16 if x.dtype == jnp.bfloat16 else 8
        mp = -(-m // sublane) * sublane
        for tn_, tk_ in ((tn, tk), (256, 256), (128, 128)):
            tn_ = min(tn_, n)
            tk_ = min(tk_, k2 // 2)
            if (k2 // 2) % tk_ or tk_ % group:
                continue  # tile must align to groups and divide packed K
            # two double-buffered x blocks + packed w + scales + unpack
            # temps (2 i32 copies) + out + acc
            need = (4 * mp * tk_ * itemsize + 2 * tk_ * tn_
                    + 2 * (tk_ // group) * tn_ * 4
                    + 8 * tk_ * tn_ + 2 * mp * tn_ * 4)
            if need <= _VMEM_BUDGET:
                return w4_matmul_pallas(x, packed, scales, group,
                                        tn=tn_, tk=tk_)
        if impl == "pallas":
            raise ValueError(
                f"LELE_W4_IMPL=pallas forced but no tile fits "
                f"(K={k2}, N={n}, group={group}) — shapes must tile by "
                f"group and fit VMEM")
    return _w4_matmul_jnp(x, packed, scales, group)


def _w4_matmul_jnp(x, packed, scales, group: int):
    """Oracle with the kernel's numerics: dequant to f32, cast to x.dtype,
    f32-accumulating dot."""
    wf = dequantize_int4(packed, scales, group).astype(x.dtype)
    return jnp.matmul(
        x, wf,
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST
                   if x.dtype == jnp.float32 else None),
    )


def w4_matmul_pallas(x, packed, scales, group: int = 128,
                     tn: int = 512, tk: int = 512, interpret: bool = False):
    """x: [M, K]; packed: i8 [K/2, N]; scales: f32 [K/group, N] → f32 [M, N].

    Grid tiles (N, packed-K). Per tile the kernel unpacks both nibbles,
    applies the groupwise scales (broadcast g→tk via reshape), and issues
    TWO MXU dots against the matching low/high x slices, accumulating in
    an f32 VMEM scratch. tk is the PACKED tile height (logical 2·tk per
    step, split across the two nibble planes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, K = x.shape
    half, n = packed.shape
    if K != 2 * half:
        raise ValueError("x/packed K mismatch")
    if half % group:
        # a scale group would straddle the low/high nibble plane boundary,
        # breaking the kernel's per-plane scale split — use the jnp path
        raise ValueError(f"K/2={half} must be a multiple of group={group}")
    if half % tk or tk % group:
        raise ValueError(f"packed K {half} must tile by tk={tk} "
                         f"(tk multiple of group={group})")
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    mp = -(-m // sublane) * sublane
    np_ = -(-n // tn) * tn
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        packed = jnp.pad(packed, ((0, 0), (0, np_ - n)))
        scales = jnp.pad(scales, ((0, 0), (0, np_ - n)))
    grid = (np_ // tn, half // tk)
    sg = tk // group  # scale rows per packed tile (per nibble plane)
    n_kt = half // tk
    # Mosaic wants the last-two block dims (sublane, lane) to be 8/128-
    # aligned; sg is 1-4 at practical tiles, so scales are PRE-TILED on the
    # host into [n_tiles, 8, N] with the first sg sublanes real — tiny
    # arrays, and each grid step then reads one aligned (1, 8, tn) block.
    sg_pad = max(8, sg)
    if sg > 8 and sg % 8:
        raise ValueError(f"tk/group={sg} must be ≤8 or a multiple of 8")

    def tile_plane(s_plane):  # [G/2, N] → [n_kt, sg_pad, N]
        st = s_plane.reshape(n_kt, sg, np_)
        if sg_pad != sg:
            st = jnp.pad(st, ((0, 0), (0, sg_pad - sg), (0, 0)))
        return st

    g_half = scales.shape[0] // 2
    s_lo = tile_plane(scales[:g_half])
    s_hi = tile_plane(scales[g_half:])

    group_acc = x.dtype == jnp.bfloat16

    def kernel(xl_ref, xh_ref, w_ref, sl_ref, sh_ref, out_ref, acc_ref):
        k_idx = pl.program_id(1)

        @pl.when(k_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(pi, 28), 28)
        hi = jnp.right_shift(pi, 4)
        dn = (((1,), (0,)), ((), ()))

        if group_acc:
            # bf16 fast form: raw int4 planes as bf16 (exact), one small
            # dot per scale group, scale applied to the [M, tn] partial
            for qi, x_ref, s_ref in ((lo, xl_ref, sl_ref),
                                     (hi, xh_ref, sh_ref)):
                qf = qi.astype(xl_ref.dtype)
                for g in range(sg):
                    d = jax.lax.dot_general(
                        x_ref[:, g * group:(g + 1) * group],
                        qf[g * group:(g + 1) * group],
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    acc_ref[:] += d * s_ref[0, g, :][None, :]
        else:
            # f32 exact form: dequant the whole tile, HIGHEST-prec dots
            def scaled(qi, s_ref):
                s = s_ref[0, :sg, :].reshape(sg, 1, tn)
                s = jnp.broadcast_to(s, (sg, group, tn)).reshape(tk, tn)
                return (qi.astype(jnp.float32) * s).astype(xl_ref.dtype)

            prec = (jax.lax.Precision.HIGHEST
                    if xl_ref.dtype == jnp.float32 else None)
            acc_ref[:] += jax.lax.dot_general(
                xl_ref[:], scaled(lo, sl_ref), dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec)
            acc_ref[:] += jax.lax.dot_general(
                xh_ref[:], scaled(hi, sh_ref), dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec)

        @pl.when(k_idx == grid[1] - 1)
        def _():
            out_ref[:] = acc_ref[:]

    half_k_blocks = half // tk  # x low/high planes, in tk-row steps
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # low-plane x rows [kk*tk, ...) ; high plane offset by K/2
            pl.BlockSpec((mp, tk), lambda j, kk: (0, kk)),
            pl.BlockSpec((mp, tk),
                         lambda j, kk: (0, kk + half_k_blocks)),
            pl.BlockSpec((tk, tn), lambda j, kk: (kk, j)),
            pl.BlockSpec((1, sg_pad, tn), lambda j, kk: (kk, 0, j)),
            pl.BlockSpec((1, sg_pad, tn), lambda j, kk: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((mp, tn), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * K,
            bytes_accessed=2 * mp * K + half * np_ + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, packed, s_lo, s_hi)
    return out[:m, :n]
