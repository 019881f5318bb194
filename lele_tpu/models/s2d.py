"""Space-to-depth conv domain for small-channel image stages (TPU trick).

NHWC tensors with C < 128 waste MXU/VPU lanes (C is the lane dimension and
pads to 128): a 640x640x3 image reads like ~43x its real bytes, and the
YOLO stem conv alone slope-measures 0.45 ms — 65% of the whole detector.
The fix (same one MLPerf TPU ResNets use for conv0): re-express the early
convs in a space-to-depth domain where a [H, W, C] map is stored as
[H/2, W/2, 4C] (2x2 pixel blocks stacked on channels). Every stride-1 or
stride-2 3x3 conv has an EXACT equivalent conv in that domain — same math,
relayouted weights with zero taps — but with full channel lanes, e.g. the
stage-0 CSP convs become [3,3,256,256] at 80^2 instead of [3,3,64,64] at
160^2: 4x the raw MACs, ~10x the throughput (slope-measured 0.017 ms vs
0.052 ms).

Block layouts (fixed by `s2d`/`s2d4` below):
    s2d2: channel slot (u*2 + v)*C + c   holds orig pixel (2a+u, 2b+v)
    s2d4: channel slot (u*4 + v)*C + c   holds orig pixel (4a+u, 4b+v)

Weight transforms map an original [kh, kw, C, O] HWIO weight to the
equivalent s2d-domain weight; taps that fall outside the original kernel
are zero. Derivations (out pixel y reads orig rows s*y + m, XLA SAME
padding lo=0/hi=1 for k=3 s=2 on even sizes, lo=hi=1 for k=3 s=1):

    stem  (k3 s2, img s2d4 in, s2d2-form out): m = 4*du + u - 2*p
    down  (k3 s2, s2d2 in,      s2d2-form out): m = 2*da + u - 2*p
    conv1 (k3 s1, s2d2 in,      s2d2-form out): m = 2*(da-1) + u + 1 - p
    exit  (k3 s2, s2d2 in,      orig-form out): m = 2*da + u

No reference counterpart (lele's NEON conv2d has its own small-channel
fast paths, conv2d.rs:535-567 — this is the TPU answer to the same
problem).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def s2d(x, b: int = 2):
    """[B, H, W, C] → [B, H/b, W/b, b*b*C]; slot (u*b+v)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def s2d_chw(x, b: int = 4):
    """[B, C, H, W] (CHW — the layout an image SHOULD arrive in: minor dim
    W tiles cleanly, where NHWC's minor dim C=3 pads to 128 lanes and
    costs ~0.3 ms just to read at 640²) → [B, H/b, W/b, b*b*C] with the
    same slot order as `s2d` ((u*b+v)*C + c)."""
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // b, b, W // b, b)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # [B, H/b, W/b, u, v, C]
    return x.reshape(B, H // b, W // b, b * b * C)


def s2d_undo(x, b: int = 2):
    """Inverse of s2d."""
    B, H, W, CC = x.shape
    C = CC // (b * b)
    x = x.reshape(B, H, W, b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * b, W * b, C)


def _zeros(shape):
    return np.zeros(shape, np.float32)


def w_stem_s2d4(w):
    """[3,3,C,O] (k3 s2, pad lo0/hi1) → [2,2,16C,4O]: s2d4 input,
    s2d2-form output."""
    kh, kw, C, O = w.shape
    w = np.asarray(w, np.float32)
    out = _zeros((2, 2, 16 * C, 4 * O))
    for du in range(2):
        for dv in range(2):
            for u in range(4):
                for v in range(4):
                    for p in range(2):
                        for q in range(2):
                            m = 4 * du + u - 2 * p
                            mw = 4 * dv + v - 2 * q
                            if 0 <= m < kh and 0 <= mw < kw:
                                out[du, dv,
                                    (u * 4 + v) * C:(u * 4 + v + 1) * C,
                                    (p * 2 + q) * O:(p * 2 + q + 1) * O] = \
                                    w[m, mw]
    return out


def w_down_s2d2(w):
    """[3,3,C,O] (k3 s2, pad lo0/hi1) → [3,3,4C,4O] stride-2 conv:
    s2d2 input, s2d2-form output."""
    kh, kw, C, O = w.shape
    w = np.asarray(w, np.float32)
    out = _zeros((3, 3, 4 * C, 4 * O))
    for da in range(3):
        for db in range(3):
            for u in range(2):
                for v in range(2):
                    for p in range(2):
                        for q in range(2):
                            m = 2 * da + u - 2 * p
                            mw = 2 * db + v - 2 * q
                            if 0 <= m < kh and 0 <= mw < kw:
                                out[da, db,
                                    (u * 2 + v) * C:(u * 2 + v + 1) * C,
                                    (p * 2 + q) * O:(p * 2 + q + 1) * O] = \
                                    w[m, mw]
    return out


def w_conv1_s2d2(w):
    """[3,3,C,O] (k3 s1, pad 1) → [3,3,4C,4O] stride-1 conv (pad 1):
    s2d2 input, s2d2-form output."""
    kh, kw, C, O = w.shape
    w = np.asarray(w, np.float32)
    out = _zeros((3, 3, 4 * C, 4 * O))
    for da in range(3):
        for db in range(3):
            for u in range(2):
                for v in range(2):
                    for p in range(2):
                        for q in range(2):
                            m = 2 * (da - 1) + u + 1 - p
                            mw = 2 * (db - 1) + v + 1 - q
                            if 0 <= m < kh and 0 <= mw < kw:
                                out[da, db,
                                    (u * 2 + v) * C:(u * 2 + v + 1) * C,
                                    (p * 2 + q) * O:(p * 2 + q + 1) * O] = \
                                    w[m, mw]
    return out


def w_exit_s2d2(w):
    """[3,3,C,O] (k3 s2, pad lo0/hi1) → [2,2,4C,O]: s2d2 input,
    ORIGINAL-form output (leaves the s2d domain)."""
    kh, kw, C, O = w.shape
    w = np.asarray(w, np.float32)
    out = _zeros((2, 2, 4 * C, O))
    for da in range(2):
        for db in range(2):
            for u in range(2):
                for v in range(2):
                    m = 2 * da + u
                    mw = 2 * db + v
                    if 0 <= m < kh and 0 <= mw < kw:
                        out[da, db, (u * 2 + v) * C:(u * 2 + v + 1) * C, :] \
                            = w[m, mw]
    return out


def conv_s2d(x, w, stride: int, pad, dtype=None):
    """Plain XLA conv with explicit padding, NHWC/HWIO."""
    import jax

    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
