"""Fused LSTM sequence kernel (Pallas TPU).

Reference counterpart: kernels/rnn.rs:15 `lstm_gates_avx2` — fused gate
nonlinearities after per-step GEMMs. On TPU the equivalent bottleneck is
`lax.scan` issuing one tiny HBM-visiting step per timestep; this kernel runs
the ENTIRE recurrence inside one Pallas program with the recurrent weight
matrix and the (h, c) state resident in VMEM, so each step is one small MXU
matmul + VPU gates with zero HBM traffic.

Layout: the input projection x_t @ Wx + b (no recurrence) is hoisted to one
big MXU matmul outside the kernel; the kernel consumes xproj [S, B, 4H].
Gate order i,f,g,o (matches models/common.lstm_cell).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_seq_pallas(xproj, wh, h0, c0, interpret: bool = False):
    """xproj: [S, B, 4H] (x@Wx + b precomputed); wh: [H, 4H];
    h0, c0: [B, H] → (hs [S, B, H], h_final, c_final)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, B, H4 = xproj.shape
    H = H4 // 4

    def kernel(xp_ref, wh_ref, h0_ref, c0_ref, hs_ref, hf_ref, cf_ref,
               h_sc, c_sc):
        h_sc[:] = h0_ref[:]
        c_sc[:] = c0_ref[:]
        wh = wh_ref[:]

        def step(t, _):
            g = xp_ref[t] + jnp.dot(
                h_sc[:], wh, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            i = jax.nn.sigmoid(g[:, :H])
            f = jax.nn.sigmoid(g[:, H : 2 * H])
            gg = jnp.tanh(g[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(g[:, 3 * H :])
            c_new = f * c_sc[:] + i * gg
            h_new = o * jnp.tanh(c_new)
            h_sc[:] = h_new
            c_sc[:] = c_new
            hs_ref[t] = h_new
            return 0

        jax.lax.fori_loop(0, S, step, 0)
        hf_ref[:] = h_sc[:]
        cf_ref[:] = c_sc[:]

    hs, hf, cf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((S, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xproj: S*4H*4B must fit
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xproj.astype(jnp.float32), wh.astype(jnp.float32),
      h0.astype(jnp.float32), c0.astype(jnp.float32))
    return hs, hf, cf


def lstm_seq_reference(xproj, wh, h0, c0):
    """lax.scan oracle with identical math (the jnp-reference backend)."""

    def step(carry, xp_t):
        h, c = carry
        g = xp_t + jnp.matmul(h, wh, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        H = h.shape[-1]
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H : 2 * H])
        gg = jnp.tanh(g[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H :])
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (hf, cf), hs = jax.lax.scan(step, (h0, c0), xproj)
    return hs, hf, cf
