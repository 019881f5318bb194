"""Cepstral mean/variance normalization (parity: features/cmvn.rs:14-92).

Utterance-level: per-dim mean/std over time with biased variance and
std = sqrt(max(var,0) + eps). `apply_cmvn_stats` mirrors apply_with_stats
(global stats, note the reference adds eps to std, not var, in that path).
"""

from __future__ import annotations


def cmvn(x, eps: float = 1e-5):
    import jax.numpy as jnp

    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x), axis=0, keepdims=True) - mean**2, 0.0)
    return (x - mean) / jnp.sqrt(var + eps)


def apply_cmvn_stats(x, mean, std, eps: float = 1e-5):
    import jax.numpy as jnp

    return (x - jnp.asarray(mean)) / (jnp.asarray(std) + eps)
