"""Shared functional building blocks for the native model families.

The reference's model zoo is ONNX graphs compiled by lele_gen; here each
family also ships as a native JAX architecture (params = nested dict pytree)
so the framework runs end to end without downloaded weights, and ONNX
checkpoints can be mapped onto the same structure. Pure functional style:
``init_*`` builds params with jax.random; apply fns are jit/pjit-friendly.

Compute dtype policy: params stored f32; matmul-heavy blocks cast to
``dtype`` (bf16 on TPU) with f32 accumulation via preferred_element_type —
the MXU-first layout the task brief calls for.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def init_linear(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(d_in)
    p = {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def linear(p: Params, x, dtype=None):
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def init_layer_norm(key, d: int) -> Params:
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def layer_norm(p: Params, x, eps: float = 1e-12):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def init_conv1d(key, c_in: int, c_out: int, k: int, groups: int = 1) -> Params:
    scale = 1.0 / np.sqrt(c_in // groups * k)
    return {
        "w": jax.random.uniform(
            key, (c_out, c_in // groups, k), jnp.float32, -scale, scale
        ),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def conv1d(p: Params, x, stride: int = 1, padding="SAME", groups: int = 1,
           dilation: int = 1, dtype=None):
    """x: [B, T, C] (feature-last — TPU-friendly); returns [B, T', C']."""
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [tuple(padding)]
    y = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w, (2, 1, 0)),  # [k, C_in/g, C_out]
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def init_conv2d(key, c_in: int, c_out: int, k: int, groups: int = 1) -> Params:
    scale = 1.0 / np.sqrt(c_in // groups * k * k)
    return {
        "w": jax.random.uniform(
            key, (c_out, c_in // groups, k, k), jnp.float32, -scale, scale
        ),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def conv2d(p: Params, x, stride: int = 1, padding="SAME", groups: int = 1,
           dtype=None):
    """x: [B, H, W, C] (NHWC — the TPU conv layout); returns [B, H', W', C']."""
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w, (2, 3, 1, 0)),  # [kh, kw, C_in/g, C_out]
        window_strides=(stride, stride),
        padding=padding if isinstance(padding, str) else padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def init_lstm_cell(key, d_in: int, d_hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    s1, s2 = 1.0 / np.sqrt(d_in), 1.0 / np.sqrt(d_hidden)
    return {
        "wx": jax.random.uniform(k1, (d_in, 4 * d_hidden), jnp.float32, -s1, s1),
        "wh": jax.random.uniform(k2, (d_hidden, 4 * d_hidden), jnp.float32, -s2, s2),
        "b": jnp.zeros((4 * d_hidden,), jnp.float32),
    }


def lstm_cell(p: Params, x, h, c):
    """One step; gate order i,f,g,o. Returns (h', c')."""
    gates = (
        jnp.matmul(x, p["wx"], preferred_element_type=jnp.float32)
        + jnp.matmul(h, p["wh"], preferred_element_type=jnp.float32)
        + p["b"]
    )
    hd = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hd])
    f = jax.nn.sigmoid(gates[..., hd : 2 * hd])
    g = jnp.tanh(gates[..., 2 * hd : 3 * hd])
    o = jax.nn.sigmoid(gates[..., 3 * hd :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def sinusoidal_positions(t: int, d: int, offset: int = 1) -> np.ndarray:
    """FunASR-style sinusoidal position encoding (positions start at 1)."""
    pos = np.arange(offset, t + offset, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(np.log(10000.0) / d))
    pe = np.zeros((t, d), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def count_params(p) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(p))


def cast_big_params(params, dtype) -> Params:
    """Store matmul-class weights (rank ≥ 2) in the compute dtype so the
    per-forward HBM traffic halves (bf16); norms/biases stay f32 — they're
    tiny and feed f32 statistics. At batch 1 inference is bandwidth-bound,
    so this is ~2× on the weight-streaming floor."""
    def cast(a):
        if a.ndim >= 2 and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a  # int8 prepared weights / small vectors stay as-is

    return jax.tree.map(cast, params)
