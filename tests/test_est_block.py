"""Fused estimator-block kernel (kernels/est_block.py) vs the jnp
_attn_block oracle — interpreter-mode backend-equivalence pattern."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lele_tpu.kernels.est_block import estimator_blocks_pallas  # noqa: E402
from lele_tpu.models.supertonic import (  # noqa: E402
    _attn_block,
    _init_attn_block,
)


def _blocks(key, n_layers, d, ffn):
    ks = jax.random.split(key, n_layers)
    return [
        {"self": _init_attn_block(jax.random.fold_in(k, 0), d, ffn),
         "cross": _init_attn_block(jax.random.fold_in(k, 1), d, ffn)}
        for k in ks
    ]


@pytest.mark.parametrize("T,Tk", [(48, 19), (32, 32)])
def test_fused_blocks_match_jnp(T, Tk):
    rng = np.random.default_rng(0)
    d, ffn, heads, L = 256, 512, 4, 2
    blocks = _blocks(jax.random.PRNGKey(1), L, d, ffn)
    x = jnp.asarray(rng.standard_normal((1, T, d)) * 0.3, jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, Tk, d)) * 0.3, jnp.float32)
    lm = np.ones((T,), np.float32)
    lm[-5:] = 0.0
    tm = np.ones((Tk,), np.float32)
    tm[-3:] = 0.0

    want = x
    for b in blocks:
        want = _attn_block(b["self"], want, jnp.asarray(lm)[None], heads)
        want = _attn_block(b["cross"], want, jnp.asarray(lm)[None],
                           heads, kv=text, kv_mask=jnp.asarray(tm)[None])
    got = estimator_blocks_pallas(
        x[0], text[0], jnp.asarray(lm), jnp.asarray(tm), blocks, heads,
        interpret=True)
    g = np.asarray(got)
    w = np.asarray(want)[0]
    # bf16 MXU dots vs f32 oracle
    np.testing.assert_allclose(g, w, rtol=3e-2, atol=3e-2 * np.abs(w).max())
    corr = np.corrcoef(g.reshape(-1), w.reshape(-1))[0, 1]
    assert corr > 0.999, corr


def test_masked_tail_does_not_leak():
    """Latent-mask zeros on the tail must not change valid rows vs a
    shorter unpadded run of the same data (self-attention masking)."""
    rng = np.random.default_rng(1)
    d, ffn, heads = 256, 512, 4
    blocks = _blocks(jax.random.PRNGKey(2), 1, d, ffn)
    T, Tv, Tk = 32, 24, 16
    x = rng.standard_normal((T, d)).astype(np.float32) * 0.3
    x[Tv:] = 0.0
    text = jnp.asarray(rng.standard_normal((Tk, d)) * 0.3, jnp.float32)
    tm = jnp.ones((Tk,), jnp.float32)
    lm_full = np.zeros((T,), np.float32)
    lm_full[:Tv] = 1.0
    a = estimator_blocks_pallas(jnp.asarray(x), text,
                                jnp.asarray(lm_full), tm, blocks, heads,
                                interpret=True)
    b = estimator_blocks_pallas(jnp.asarray(x[:Tv]), text,
                                jnp.ones((Tv,), jnp.float32), tm, blocks,
                                heads, interpret=True)
    np.testing.assert_allclose(np.asarray(a)[:Tv], np.asarray(b),
                               rtol=1e-5, atol=1e-5)
