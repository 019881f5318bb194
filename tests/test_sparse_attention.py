"""com.microsoft::SparseAttention (Phi-3-small block-sparse decode
attention) vs a literal numpy oracle: CSR block layouts, per-head layout
assignment, rotary, packed QKV, decode + chunked prefill, refusals."""

import numpy as np
import pytest

from optest import run_op
from test_genai_ops import make_caches, merge_heads, np_rotary, np_sdpa, \
    split_heads


def dense_layouts_to_csr(dense):
    """dense [num_layout, nb, nb] bool → (row_indices [L, nb+1],
    col_indices [L, max_nnz] padded -1), the ORT CSR form."""
    L, nb, _ = dense.shape
    rows = np.zeros((L, nb + 1), np.int32)
    cols_l = []
    for lay in range(L):
        cols = []
        for r in range(nb):
            idx = np.nonzero(dense[lay, r])[0]
            cols.extend(idx.tolist())
            rows[lay, r + 1] = len(cols)
        cols_l.append(cols)
    max_nnz = max(len(c) for c in cols_l)
    col_arr = np.full((L, max_nnz), -1, np.int32)
    for lay, c in enumerate(cols_l):
        col_arr[lay, : len(c)] = c
    return rows, col_arr


def make_layouts(num_layout, nb, seed=0, density=0.6):
    """Random block layouts that always include the diagonal (so every
    query block can at least see itself — ORT layouts do too)."""
    rng = np.random.default_rng(seed)
    dense = rng.uniform(size=(num_layout, nb, nb)) < density
    for lay in range(num_layout):
        np.fill_diagonal(dense[lay], True)
    # lower-triangular is what matters under causality; keep full matrix
    return dense


def sparse_oracle(q3, k3, v3, pk, pv, past_len, qh, kvh, block, dense_lay,
                  *, rot=None, scale=None):
    b, s, _ = q3.shape
    q = split_heads(q3, qh).astype(np.float64)
    k = split_heads(k3, kvh).astype(np.float64)
    v = split_heads(v3, kvh).astype(np.float64)
    if rot is not None:
        cos_c, sin_c, inter = rot
        pos = past_len[:, None] + np.arange(s)[None, :]
        q = np_rotary(q, pos, cos_c, sin_c, inter)
        k = np_rotary(k, pos, cos_c, sin_c, inter)
    pk = pk.astype(np.float64).copy()
    pv = pv.astype(np.float64).copy()
    for i in range(b):
        p = past_len[i]
        pk[i, :, p: p + s] = k[i]
        pv[i, :, p: p + s] = v[i]
    L = pk.shape[2]
    rep = qh // kvh
    kf = np.repeat(pk, rep, axis=1)
    vf = np.repeat(pv, rep, axis=1)
    pglob = past_len[:, None] + np.arange(s)[None, :]
    j = np.arange(L)
    causal = j[None, None, :] <= pglob[:, :, None]  # [B,S,L]
    num_layout = dense_lay.shape[0]
    valid = np.zeros((b, qh, s, L), bool)
    for h in range(qh):
        lay = dense_lay[h % num_layout]
        blk = lay[pglob // block][:, :, j // block]  # [B,S,L]
        valid[:, h] = causal & blk
    out = np_sdpa(q, kf, vf, valid, scale=scale)
    return merge_heads(out), pk, pv


def _case(seed, s, past_len, qh=4, kvh=2, head=8, L=16, block=4,
          num_layout=2):
    rng = np.random.default_rng(seed)
    b = len(past_len)
    past_len = np.asarray(past_len, np.int64)
    q3 = rng.standard_normal((b, s, qh * head)).astype(np.float32)
    k3 = rng.standard_normal((b, s, kvh * head)).astype(np.float32)
    v3 = rng.standard_normal((b, s, kvh * head)).astype(np.float32)
    pk = rng.standard_normal((b, kvh, L, head)).astype(np.float32)
    pv = rng.standard_normal((b, kvh, L, head)).astype(np.float32)
    totals = (past_len + s).astype(np.int32)
    tot = np.asarray([int(totals.max())], np.int32)
    dense = make_layouts(num_layout, L // block, seed=seed + 100)
    rows, cols = dense_layouts_to_csr(dense)
    return q3, k3, v3, pk, pv, rows, cols, totals, tot, past_len, dense


def test_sparse_decode_step():
    (q3, k3, v3, pk, pv, rows, cols, totals, tot, past_len,
     dense) = _case(0, 1, [5, 9])
    outs = run_op(
        "SparseAttention",
        {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "rows": rows,
         "cols": cols, "tot": tot, "ktl": totals},
        n_outputs=3, domain="com.microsoft", num_heads=4, kv_num_heads=2,
        sparse_block_size=4,
    )
    want, wpk, wpv = sparse_oracle(q3, k3, v3, pk, pv, past_len, 4, 2, 4,
                                   dense)
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[1], wpk, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[2], wpv, rtol=1e-5, atol=1e-6)


def test_sparse_chunked_prefill_gqa_heads():
    # multi-row append, head expansion, 3 layouts over 6 heads
    (q3, k3, v3, pk, pv, rows, cols, totals, tot, past_len,
     dense) = _case(1, 4, [6, 0, 2], qh=6, kvh=2, head=4, L=12,
                    num_layout=3)
    outs = run_op(
        "SparseAttention",
        {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "rows": rows,
         "cols": cols, "tot": tot, "ktl": totals},
        n_outputs=3, domain="com.microsoft", num_heads=6, kv_num_heads=2,
        sparse_block_size=4,
    )
    want, wpk, _ = sparse_oracle(q3, k3, v3, pk, pv, past_len, 6, 2, 4,
                                 dense)
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[1], wpk, rtol=1e-5, atol=1e-6)


def test_sparse_actually_masks():
    # a layout with ONLY the diagonal blocks differs from dense attention
    (q3, k3, v3, pk, pv, _, _, totals, tot, past_len,
     dense) = _case(2, 2, [6, 6])
    diag = np.zeros_like(dense[:1])
    idx = np.arange(diag.shape[1])
    diag[0, idx, idx] = True
    rows, cols = dense_layouts_to_csr(diag)
    outs = run_op(
        "SparseAttention",
        {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "rows": rows,
         "cols": cols, "tot": tot, "ktl": totals},
        n_outputs=1, domain="com.microsoft", num_heads=4, kv_num_heads=2,
        sparse_block_size=4,
    )
    want, _, _ = sparse_oracle(q3, k3, v3, pk, pv, past_len, 4, 2, 4, diag)
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    dense_want, _, _ = sparse_oracle(q3, k3, v3, pk, pv, past_len, 4, 2, 4,
                                     np.ones_like(diag))
    assert np.abs(want - dense_want).max() > 1e-3


def test_sparse_rotary_packed_qkv():
    rng = np.random.default_rng(3)
    b, s, qh, kvh, head, L, block = 2, 3, 4, 2, 8, 16, 4
    past_len = np.asarray([5, 0], np.int64)
    packed = rng.standard_normal(
        (b, s, (qh + 2 * kvh) * head)).astype(np.float32)
    q3 = packed[..., : qh * head]
    k3 = packed[..., qh * head: (qh + kvh) * head]
    v3 = packed[..., (qh + kvh) * head:]
    pk = rng.standard_normal((b, kvh, L, head)).astype(np.float32)
    pv = rng.standard_normal((b, kvh, L, head)).astype(np.float32)
    totals = (past_len + s).astype(np.int32)
    tot = np.asarray([int(totals.max())], np.int32)
    dense = make_layouts(2, L // block, seed=33)
    rows, cols = dense_layouts_to_csr(dense)
    cos_c, sin_c = make_caches(32, 4)
    outs = run_op(
        "SparseAttention",
        {"q": packed, "pk": pk, "pv": pv, "rows": rows, "cols": cols,
         "tot": tot, "ktl": totals, "cos": cos_c, "sin": sin_c},
        input_names=["q", "", "", "pk", "pv", "rows", "cols", "tot",
                     "ktl", "cos", "sin"],
        n_outputs=1, domain="com.microsoft", num_heads=4, kv_num_heads=2,
        sparse_block_size=4, do_rotary=1,
    )
    want, _, _ = sparse_oracle(q3, k3, v3, pk, pv, past_len, 4, 2, 4,
                               dense, rot=(cos_c, sin_c, False))
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)


def test_sparse_refusals():
    (q3, k3, v3, pk, pv, rows, cols, totals, tot, _, _) = _case(4, 1, [5])
    with pytest.raises(Exception, match="sparse_block_size"):
        run_op(
            "SparseAttention",
            {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "rows": rows,
             "cols": cols, "tot": tot, "ktl": totals},
            n_outputs=1, domain="com.microsoft", num_heads=4,
            kv_num_heads=2,
        )
    with pytest.raises(Exception, match="not divisible"):
        run_op(
            "SparseAttention",
            {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "rows": rows,
             "cols": cols, "tot": tot, "ktl": totals},
            n_outputs=1, domain="com.microsoft", num_heads=5,
            kv_num_heads=2, sparse_block_size=4,
        )
