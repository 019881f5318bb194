"""Low-frame-rate stacking (parity: /root/reference/src/features/lfr.rs:14-54).

[T, D] → [ceil(T/n), D*m]: output row i stacks frames i*n-pad .. i*n-pad+m-1
(pad = (m-1)//2) with indices clamped to [0, T-1]. One gather on device.
"""

from __future__ import annotations

import numpy as np


def lfr_stack(x, m: int = 7, n: int = 6, n_valid=None):
    """n_valid (traced scalar): clamp stacking at the last VALID frame, so a
    padded buffer produces identical rows to an exact-length one
    (runtime/bucketing.py path)."""
    import jax.numpy as jnp

    t, d = x.shape
    if t == 0:
        return jnp.zeros((0, d * m), x.dtype)
    t_lfr = -(-t // n)
    pad = (m - 1) // 2
    idx = np.arange(t_lfr)[:, None] * n + np.arange(m)[None, :] - pad
    idx = np.clip(idx, 0, t - 1)  # static: shapes known at trace time
    if n_valid is not None:
        idx = jnp.minimum(jnp.asarray(idx), jnp.maximum(n_valid - 1, 0))
    return jnp.reshape(jnp.asarray(x)[idx], (t_lfr, d * m))
