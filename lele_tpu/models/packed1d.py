"""Lane-packed 1-D conv domain for long, thin vocoder signals (TPU trick).

A vocoder's deep levels are [T up to 131k, C = 16..32] — the C lane
dimension pads to 128, so every conv there reads/writes 4-8× phantom
bytes, and the reference-shape Supertonic vocoder spends 2.1 of 2.7 ms in
its last two levels + output conv. Fix (the 1-D sibling of models/s2d.py):
hold the signal as [T/P, P·C] with P chosen so P·C = 128, and run every
stride-1 conv / ×4 ConvTranspose as an equivalent stride-1 conv on the
packed rows.

Instead of deriving each packed kernel's index algebra by hand, kernels
are EXTRACTED NUMERICALLY: any shift-equivariant linear op equals a
stride-1 conv in the packed domain, so probing the original op with unit
impulses (one batched call per level, at prepare time) reads the packed
weights off directly — correct by construction for whatever padding
convention the original op uses. Edges are exact too: both domains
zero-pad (SAME frames ≡ zero packed rows), so the packed conv reproduces
boundary behavior bit-for-bit. Parity is gated in tests/test_packed1d.py.

No reference counterpart (lele runs its vocoder on NEON conv1d with
single-channel fast paths, conv1d.rs:900-947; this is the TPU answer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_rows(x, P: int):
    """[B, T, C] → [B, T/P, P*C] (row-major: slot u*C + c = frame T0+u)."""
    B, T, C = x.shape
    return x.reshape(B, T // P, P * C)


def unpack_rows(x, P: int):
    B, R, PC = x.shape
    return x.reshape(B, R * P, PC // P)


def extract_packed_conv(fn, Cin: int, T_probe: int = 64,
                        rtol: float = 1e-6):
    """`fn`: [1, T, Cin] → [1, T, Cout], LINEAR and shift-equivariant on
    interior rows (a packed view of any stride-1/integer-ratio conv
    pipeline). Returns (W [kp, Cin, Cout], pad_lo) such that

        y[t] = sum_d x[t + d - pad_lo] @ W[d]

    reproduces fn on interior rows. Probes with Cin unit impulses at the
    center row in one batched call."""
    t0 = T_probe // 2
    basis = np.zeros((Cin, T_probe, Cin), np.float32)
    for ci in range(Cin):
        basis[ci, t0, ci] = 1.0
    # Probe on the CPU backend: the compute is microscopic, but on a
    # remote/tunneled TPU each probe would pay a fresh remote compile
    # (measured: minutes of cold-start for the whole vocoder prepare).
    import contextlib

    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        ctx = contextlib.nullcontext()
    with ctx:
        resp = np.asarray(
            jax.jit(jax.vmap(lambda x: fn(x[None])[0]))(jnp.asarray(basis)))
    # resp[ci, t, co] = W[t0 - t + pad, ci, co]
    Cout = resp.shape[-1]
    amax = np.abs(resp).max()
    if amax == 0.0:  # degenerate (all-zero op): a 1-tap zero kernel
        return jnp.zeros((1, Cin, Cout), jnp.float32), 0
    rows = np.nonzero(np.abs(resp).max(axis=(0, 2)) > rtol * amax)[0]
    lo_t, hi_t = int(rows.min()), int(rows.max())
    kp = hi_t - lo_t + 1
    # y[t] = sum_d x[t + d - pad_lo] W[d]: response row t corresponds to
    # d = t0 + pad_lo - t; choosing pad_lo = hi_t - t0 makes d range
    # 0..kp-1 as t goes hi_t..lo_t
    pad_lo = hi_t - t0
    W = np.zeros((kp, Cin, Cout), np.float32)
    for d in range(kp):
        W[d] = resp[:, t0 + pad_lo - d, :]
    # Re-center with zero taps so padding is derivable from the kernel
    # shape alone ((kp'-1)//2 each side) — pads must be STATIC under jit,
    # and pytree leaves get traced.
    ph = kp - 1 - pad_lo
    m = max(pad_lo, ph)
    W2 = np.zeros((2 * m + 1, Cin, Cout), np.float32)
    W2[m - pad_lo : m - pad_lo + kp] = W
    return jnp.asarray(W2), m


def packed_conv(x, W, pad_lo=None):
    """y[t] = sum_d x[t + d - m] @ W[d], m = (kp-1)//2 (kernels are
    centered by extract_packed_conv; pad_lo arg kept for API compat and
    ignored)."""
    kp = W.shape[0]
    m = (kp - 1) // 2
    return jax.lax.conv_general_dilated(
        x, W, (1,), [(m, m)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Vocoder-specific packing (models/supertonic.py vocoder_forward).
# Levels (reference dims): [T,64] →L1→ [4T,128] →L2→ [16T,64] →L3→
# [64T,32] →L4→ [256T,16] →out→ [256T]. Packed row forms keep P·C = 128:
# L2 out pack2, L3 out pack4, L4 out pack8.


def _convt_subpixel_fn(w, b):
    """Original ×4 SAME ConvTranspose as a fn for kernel extraction,
    OUTPUT IN SUBPIXEL FORM [T, 4*Cout] (so it is shift-equivariant on the
    input rows)."""
    def fn(x):
        y = jax.lax.conv_transpose(
            x, w, strides=(4,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"))
        B, T4, Co = y.shape
        return y.reshape(B, T4 // 4, 4 * Co) + jnp.tile(b, 4)
    return fn


def _res_packed_fn(w_res, b_res, P):
    """Original residual conv (k7 SAME, C→C) viewed through pack-P rows."""
    def fn(xp):
        x = unpack_rows(xp, P)
        y = jax.lax.conv_general_dilated(
            x, w_res, (1,), "SAME",
            dimension_numbers=("NHC", "HIO", "NHC")) + b_res
        return pack_rows(y, P)
    return fn


def prepare_vocoder_packed(voc: dict, cfg) -> dict:
    """Extract packed kernels for levels 2-4 + out conv. Returns the
    vocoder params dict with a "packed" subtree added; vocoder_forward
    then takes the packed path. Run once at load time."""
    import numpy as _np

    def hwio1d(p):  # stored [C_out, C_in, k] → [k, C_in, C_out]
        return jnp.transpose(jnp.asarray(p["w"], jnp.float32), (2, 1, 0))

    ups = voc["ups"]
    packed: dict = {}
    # L2: input [T1=4T, 128] unpacked → subpixel [T1, 4*64] (reshape →
    # pack2 of [4*T1, 64])
    for idx, (name, P_in) in enumerate((("l2", 1), ("l3", 2), ("l4", 4))):
        up = ups[idx + 1]
        w = jnp.asarray(up["w"], jnp.float32)  # [8, C_in, C_out]
        b = jnp.asarray(up["b"], jnp.float32)
        C_in = w.shape[1]
        if P_in == 1:
            fn_t = _convt_subpixel_fn(w, jnp.zeros_like(b))
        else:
            inner = _convt_subpixel_fn(w, jnp.zeros_like(b))

            def fn_t(xp, inner=inner, P_in=P_in):
                # packed rows → frames → subpixel per frame → repack so
                # the op stays row-shift-equivariant
                x = unpack_rows(xp, P_in)
                y = inner(x)               # [B, T, 4*C_out]
                return pack_rows(y, P_in)  # [B, T/P_in, P_in*4*C_out]
        Wt, _ = extract_packed_conv(fn_t, P_in * C_in)
        packed[name + "_t"] = {"w": Wt, "b": jnp.tile(b, 4 * P_in)}
        # residual conv in the OUTPUT packing (P_out = 2 * P_in... C
        # halves, frames ×4 → pack doubles per level: 2, 4, 8)
        P_out = 2 * P_in
        C_out = w.shape[2]
        w_res = hwio1d(up["res"])
        b_res = jnp.asarray(up["res"]["b"], jnp.float32)
        Wr, _ = extract_packed_conv(
            _res_packed_fn(w_res, jnp.zeros_like(b_res), P_out),
            P_out * C_out)
        packed[name + "_r"] = {"w": Wr, "b": jnp.tile(b_res, P_out)}
    # out conv k7 C16→1 in pack8 form
    w_out = hwio1d(voc["out"])
    b_out = jnp.asarray(voc["out"]["b"], jnp.float32)
    Wo, _ = extract_packed_conv(
        _res_packed_fn(w_out, jnp.zeros_like(b_out), 8), 8 * 16)
    packed["out"] = {"w": Wo, "b": jnp.tile(b_out, 8)}
    out = dict(voc)
    out["packed"] = packed
    return out


def vocoder_forward_packed(p: dict, latent, cfg):
    """Packed-domain vocoder: levels 1 runs plain (C=128 already), levels
    2-4 + out conv run on [rows, 128] packed forms. Exactly the same math
    as the plain path (kernels numerically extracted from it)."""
    from .common import conv1d

    pk = p["packed"]
    x = jax.nn.leaky_relu(conv1d(p["pre"], latent), 0.1)
    up = p["ups"][0]
    x = jax.lax.conv_transpose(
        x, up["w"], strides=(4,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC")) + up["b"]
    x = jax.nn.leaky_relu(x, 0.1)
    x = x + jnp.tanh(conv1d(up["res"], x))       # [B, 4T, 128]

    P = 1
    for idx, name in enumerate(("l2", "l3", "l4")):
        C_out = p["ups"][idx + 1]["w"].shape[2]
        t = pk[name + "_t"]
        y = packed_conv(x, t["w"]) + t["b"]
        # [B, R, P*4*C_out] → repack to P_out = 2P rows of 128 lanes
        B, R, _ = y.shape
        y = y.reshape(B, R * P * 4, C_out)        # true frame form
        P = 2 * P
        x = pack_rows(jax.nn.leaky_relu(y, 0.1), P)
        r = pk[name + "_r"]
        x = x + jnp.tanh(packed_conv(x, r["w"]) + r["b"])
    o = pk["out"]
    y = jnp.tanh(packed_conv(x, o["w"]) + o["b"])  # [B, R, P]
    B, R, _ = y.shape
    return y.reshape(B, R * P)
