"""Fused flow-estimator step: all 8 attention blocks as ONE Pallas kernel.

The Supertonic VectorEstimator runs 4 layers × (self + cross) attention at
[T=512, d=256] — ~30 small XLA ops per block, so a step is launch-latency
bound (~63 µs measured for ~0.7 GFLOP, docs/PERF.md r2). This kernel keeps
the activation in a VMEM scratch and walks the 8 blocks as the Pallas grid
(even steps = self-attention, odd = cross-attention against the resident
text memory), streaming each block's weights while the previous computes —
the same revolving-buffer structure as kernels/sanm_block.py.

Numerics: bf16 MXU dots with f32 accumulation; softmax/layernorm and the
tanh-form GELU (jax.nn.gelu default) run f32. Oracle:
models/supertonic._attn_block (f32); parity gated in tests/test_est_block.py
at bf16-dot tolerance.

Reference counterpart: none on the kernel level (lele chains 4 generated
programs over host copies, main.rs:240); this is the TPU answer to the
flow loop being the TTS hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ln(x, g, b, eps=1e-12):  # models/common.layer_norm eps
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(n_heads, Tp, Tk, n_blocks,
            x_ref, text_ref, lmask_ref, tmask_ref,
            g1_ref, b1_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
            wo_ref, bo_ref, g2_ref, b2_ref,
            w1_ref, b1f_ref, w2_ref, b2f_ref,
            out_ref, xbuf):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xbuf[:] = x_ref[:]

    x = xbuf[:]                        # [Tp, D] f32
    D = x.shape[-1]
    hd = D // n_heads
    is_self = (i % 2) == 0

    h = _ln(x, g1_ref[0], b1_ref[0])
    q = _dot(h, wq_ref[0]) + bq_ref[0]
    # kv source: self → h; cross → layer-norm of the text memory with the
    # SAME norm1 weights (models/supertonic._attn_block semantics). Both
    # branches compute (tiny at these dims); a traced where() selects.
    t_n = _ln(text_ref[:], g1_ref[0], b1_ref[0])
    kvp_self = _dot(h, wkv_ref[0]) + bkv_ref[0]       # [Tp, 2D]
    kvp_cross = _dot(t_n, wkv_ref[0]) + bkv_ref[0]    # [Tkp, 2D]
    neg_l = (lmask_ref[:] - 1.0) * 1e9                # [1, Tp]
    neg_t = (tmask_ref[:] - 1.0) * 1e9                # [1, Tkp]
    inv = 1.0 / np.sqrt(hd)
    # hd=64 lane slices are not Mosaic-friendly; per-head dots run FULL-D
    # with a head lane-mask (other lanes contribute exact zeros)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)

    def attend(kvp, neg):
        k, v = kvp[:, :D], kvp[:, D:]
        ctx = jnp.zeros((q.shape[0], D), jnp.float32)
        for hh in range(n_heads):
            mh = ((lane // hd) == hh).astype(jnp.float32)
            sc = jax.lax.dot_general(
                (q * mh).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv + neg
            sc = sc - jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc)
            att = e / jnp.sum(e, axis=-1, keepdims=True)
            ctx = ctx + _dot(att, v * mh)
        return ctx

    ctx = jnp.where(is_self,
                    attend(kvp_self, neg_l),
                    attend(kvp_cross, neg_t))
    x1 = x + (_dot(ctx, wo_ref[0]) + bo_ref[0])
    h2 = _ln(x1, g2_ref[0], b2_ref[0])
    f1 = _dot(h2, w1_ref[0]) + b1f_ref[0]
    # jax.nn.gelu default (approximate=True): tanh form
    f1 = 0.5 * f1 * (1.0 + jnp.tanh(
        0.7978845608028654 * (f1 + 0.044715 * f1 * f1 * f1)))
    y = x1 + (_dot(f1, w2_ref[0]) + b2f_ref[0])
    xbuf[:] = y

    @pl.when(i == n_blocks - 1)
    def _():
        out_ref[:] = y


def _stack_est_blocks(blocks):
    """[{self: blk, cross: blk}, ...] → stacked [2L, ...] pytree with
    block order self0, cross0, self1, cross1, ..."""
    flat = []
    for b in blocks:
        flat.append(b["self"])
        flat.append(b["cross"])
    return jax.tree.map(lambda *xs: jnp.stack(xs), *flat)


def estimator_blocks_pallas(x, text_emb, latent_mask, text_mask, blocks,
                            n_heads: int, interpret: bool = False):
    """x: f32 [T, D] (post in/style/time/pos projections); text_emb: f32
    [Tk, D]; masks: f32 [T] / [Tk]; blocks: list of {self, cross} attn
    params (models/supertonic._init_attn_block layout). → f32 [T, D]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, D = x.shape
    Tk = text_emb.shape[0]
    Tp = -(-T // 16) * 16
    Tkp = -(-Tk // 16) * 16
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        latent_mask = jnp.pad(latent_mask, (0, Tp - T))
    if Tkp != Tk:
        text_emb = jnp.pad(text_emb, ((0, Tkp - Tk), (0, 0)))
        text_mask = jnp.pad(text_mask, (0, Tkp - Tk))
    st = _stack_est_blocks(blocks)
    L2 = st["q"]["w"].shape[0]

    def row(a):
        return jnp.asarray(a, jnp.float32).reshape(L2, 1, -1)

    args = (
        x.astype(jnp.float32), text_emb.astype(jnp.float32),
        latent_mask.reshape(1, Tp).astype(jnp.float32),
        text_mask.reshape(1, Tkp).astype(jnp.float32),
        row(st["norm1"]["g"]), row(st["norm1"]["b"]),
        jnp.asarray(st["q"]["w"], jnp.float32), row(st["q"]["b"]),
        jnp.asarray(st["kv"]["w"], jnp.float32), row(st["kv"]["b"]),
        jnp.asarray(st["out"]["w"], jnp.float32), row(st["out"]["b"]),
        row(st["norm2"]["g"]), row(st["norm2"]["b"]),
        jnp.asarray(st["ffn1"]["w"], jnp.float32), row(st["ffn1"]["b"]),
        jnp.asarray(st["ffn2"]["w"], jnp.float32), row(st["ffn2"]["b"]),
    )

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(tuple(a.shape), lambda i: (0,) * nd)

    def per_layer(a):
        shape = (1,) + tuple(a.shape[1:])
        nd = a.ndim
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (nd - 1))

    in_specs = [whole(a) for a in args[:4]]
    in_specs += [per_layer(a) for a in args[4:]]
    F = st["ffn1"]["w"].shape[-1]
    flops = L2 * (2 * Tp * D * (4 * D + 2 * F) + 4 * Tp * max(Tp, Tkp) * D)
    bytes_acc = Tp * D * 8 + L2 * 4 * (4 * D * D + 2 * D * F)
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads, Tp, Tkp, L2),
        grid=(L2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Tp, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Tp, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc,
            transcendentals=L2 * Tp * (Tp + Tkp),
        ),
        interpret=interpret,
    )(*args)
    return out[:T]
