"""Fused GRU sequence kernel (Pallas TPU) — the GRU sibling of
kernels/lstm.py (reference counterpart: kernels/rnn.rs:246 + AVX2 gate
fusion). Whole recurrence in one program, recurrent weights and state in
VMEM.

Gate order z, r, h (ONNX). Supports both `linear_before_reset` variants.
xproj = x @ Wx + Wb precomputed outside ([S, B, 3H]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def gru_seq_pallas(xproj, rh, rb, h0, linear_before_reset: bool = True,
                   interpret: bool = False):
    """xproj: [S, B, 3H]; rh: [H, 3H] (recurrent weights, transposed);
    rb: [3H] recurrent bias (zeros if absent); h0: [B, H]
    → (hs [S, B, H], h_final)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, B, H3 = xproj.shape
    H = H3 // 3

    def kernel(xp_ref, rh_ref, rb_ref, h0_ref, hs_ref, hf_ref, h_sc):
        h_sc[:] = h0_ref[:]
        rh_all = rh_ref[:]
        rb_all = rb_ref[:]

        def step(t, _):
            h = h_sc[:]
            rproj = jnp.dot(h, rh_all, preferred_element_type=jnp.float32,
                            precision=_PREC) + rb_all
            g = xp_ref[t]
            z = jax.nn.sigmoid(g[:, :H] + rproj[:, :H])
            r = jax.nn.sigmoid(g[:, H : 2 * H] + rproj[:, H : 2 * H])
            if linear_before_reset:
                hh = jnp.tanh(g[:, 2 * H :] + r * rproj[:, 2 * H :])
            else:
                # (r*h) @ Rh^T + rbh: needs a second dot on the gated state
                gated = jnp.dot(r * h, rh_all[:, 2 * H :],
                                preferred_element_type=jnp.float32,
                                precision=_PREC)
                hh = jnp.tanh(g[:, 2 * H :] + gated + rb_all[:, 2 * H :])
            h_new = (1.0 - z) * hh + z * h
            h_sc[:] = h_new
            hs_ref[t] = h_new
            return 0

        jax.lax.fori_loop(0, S, step, 0)
        hf_ref[:] = h_sc[:]

    hs, hf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((S, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(
        xproj.astype(jnp.float32), rh.astype(jnp.float32),
        rb.astype(jnp.float32).reshape(1, -1) if rb.ndim == 1 else rb,
        h0.astype(jnp.float32),
    )
    return hs, hf


def gru_seq_reference(xproj, rh, rb, h0, linear_before_reset: bool = True):
    """lax.scan oracle with identical math."""
    H = h0.shape[-1]
    rb = rb.reshape(-1)

    def step(h, g):
        rproj = jnp.matmul(h, rh, preferred_element_type=jnp.float32,
                           precision=_PREC) + rb
        z = jax.nn.sigmoid(g[:, :H] + rproj[:, :H])
        r = jax.nn.sigmoid(g[:, H : 2 * H] + rproj[:, H : 2 * H])
        if linear_before_reset:
            hh = jnp.tanh(g[:, 2 * H :] + r * rproj[:, 2 * H :])
        else:
            gated = jnp.matmul(r * h, rh[:, 2 * H :],
                               preferred_element_type=jnp.float32,
                               precision=_PREC)
            hh = jnp.tanh(g[:, 2 * H :] + gated + rb[2 * H :])
        h_new = (1.0 - z) * hh + z * h
        return h_new, h_new

    hf, hs = jax.lax.scan(step, h0, xproj)
    return hs, hf
