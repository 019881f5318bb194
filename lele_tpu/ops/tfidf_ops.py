"""TfIdfVectorizer (opset 9) — n-gram counting over int or string tokens.

Int mode runs fully traced: for each (gram-length n, skip s) the input is
sliced into strided windows and compared against the whole pool section in
one broadcast equality — [N, windows, n] vs [G, n] → counts [N, G]. That
vectorizes to a handful of VPU comparisons per section instead of the
reference-free scalar scan ORT does. String mode maps tokens to pool ids
at trace time (strings are fold-only on TPU — see string_ops) and reuses
the same counting core.

Spec semantics pinned here: section j of the pool holds grams of length
j+1 (ngram_counts gives section starts); only lengths within
[min_gram_length, max_gram_length] are counted; skips apply to n≥2 only
(a skipped unigram is the same unigram); each skip in 0..max_skip_count
contributes counts independently; mode TF = counts, IDF = weights·1[count>0],
TFIDF = weights·counts (weights default 1).
"""

from __future__ import annotations

import numpy as np

from .registry import OpContext, op


def _count_section(xp, x, grams, stride):
    """x [N, C] ints, grams [G, n] host ints → counts [N, G]."""
    n = grams.shape[1]
    c = x.shape[1]
    span = (n - 1) * stride + 1
    if span > c:
        return xp.zeros((x.shape[0], grams.shape[0]), np.int32)
    w = c - span + 1
    idx = np.arange(w)[:, None] + np.arange(n)[None, :] * stride
    win = x[:, idx]  # [N, W, n]
    eq = (win[:, :, None, :] == xp.asarray(grams)[None, None, :, :])
    return eq.all(-1).sum(1).astype(np.int32)  # [N, G]


@op("TfIdfVectorizer")  # foldable: string inputs MUST fold (host-only)
def tfidf_vectorizer(ctx: OpContext, x):
    import jax.numpy as jnp

    mode = ctx.attr("mode", "TF")
    if isinstance(mode, bytes):
        mode = mode.decode()
    min_n = int(ctx.attr("min_gram_length", 1))
    max_n = int(ctx.attr("max_gram_length", 1))
    max_skip = int(ctx.attr("max_skip_count", 0))
    counts_starts = list(ctx.attr_ints("ngram_counts", []))
    out_idx = list(ctx.attr_ints("ngram_indexes", []))
    pool_i = ctx.attr("pool_int64s")
    pool_s = ctx.attr("pool_strings")
    weights = ctx.attr("weights")

    is_string = pool_s is not None and pool_i is None
    one_d = False
    if is_string:
        if ctx.xp is not np:
            raise NotImplementedError(
                "TfIdfVectorizer(pool_strings) needs trace-time string "
                "input (strings are fold-only on TPU)"
            )
        pool_s = [p.decode() if isinstance(p, bytes) else p for p in pool_s]
        vocab = {}
        pool_ids = []
        for s in pool_s:
            pool_ids.append(vocab.setdefault(s, len(vocab)))
        pool = np.asarray(pool_ids, dtype=np.int64)
        xa = np.asarray(x, dtype=object)
        one_d = xa.ndim == 1
        if one_d:
            xa = xa[None, :]
        xi = np.asarray(
            [[vocab.get(str(t), -1) for t in row] for row in xa],
            dtype=np.int64,
        ).reshape(xa.shape[0], xa.shape[1] if xa.ndim == 2 else 0)
        xp = np
        x = xi
    else:
        pool = np.asarray(list(pool_i), dtype=np.int64)
        xp = ctx.xp
        one_d = x.ndim == 1
        if one_d:
            x = x[None, :] if ctx.is_fold else jnp.expand_dims(x, 0)
        x = x.astype(np.int64) if ctx.is_fold else x.astype(jnp.int32)

    n_cols = (max(out_idx) + 1) if out_idx else 0
    n_batch = x.shape[0]
    counts = xp.zeros((n_batch, n_cols), np.float32)
    n_sections = len(counts_starts)
    for sec in range(n_sections):
        n = sec + 1
        start = counts_starts[sec]
        end = counts_starts[sec + 1] if sec + 1 < n_sections else len(pool)
        n_grams = (end - start) // n
        if n_grams <= 0 or not (min_n <= n <= max_n):
            continue
        grams = pool[start:end].reshape(n_grams, n)  # string mode: pool ids
        sec_counts = xp.zeros((n_batch, n_grams), np.int32)
        skips = range(1) if n == 1 else range(max_skip + 1)
        for s in skips:
            sec_counts = sec_counts + _count_section(xp, x, grams, s + 1)
        # ngram_indexes is per-POOL-GRAM, in pool order: compute this
        # section's slice of it
        gram_pos0 = sum(
            (
                (counts_starts[j + 1] if j + 1 < n_sections else len(pool))
                - counts_starts[j]
            ) // (j + 1)
            for j in range(sec)
        )
        cols = np.asarray(
            out_idx[gram_pos0: gram_pos0 + n_grams], dtype=np.int64
        )
        if ctx.is_fold:
            np.add.at(counts, (slice(None), cols), sec_counts.astype(np.float32))
        else:
            counts = counts.at[:, cols].add(sec_counts.astype(jnp.float32))
    if weights is not None:
        wvec = xp.zeros((n_cols,), np.float32)
        cols_all = np.asarray(out_idx, dtype=np.int64)
        wsrc = np.asarray(list(weights), dtype=np.float32)
        if ctx.is_fold:
            wvec[cols_all] = wsrc
        else:
            wvec = wvec.at[cols_all].set(xp.asarray(wsrc))
    else:
        wvec = None
    if mode == "TF":
        out = counts
    elif mode == "IDF":
        present = (counts > 0).astype(np.float32)
        out = present * wvec if wvec is not None else present
    elif mode == "TFIDF":
        out = counts * wvec if wvec is not None else counts
    else:
        raise ValueError(f"TfIdfVectorizer: unknown mode {mode!r}")
    return out[0] if one_d else out
