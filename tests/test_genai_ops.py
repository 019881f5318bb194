"""ORT-GenAI decoder op family vs independent numpy oracles:
GroupQueryAttention (static KV buffer, fused rotary, window/softcap/smooth
softmax), MultiHeadAttention (all four input forms, past concat), contrib
Attention past-KV, MatMulNBits bits=8 and g_idx."""

import numpy as np

from optest import run_op

# ---------------------------------------------------------------- oracles


def np_softmax(s, axis=-1):
    s = s - s.max(axis=axis, keepdims=True)
    e = np.exp(s)
    return e / e.sum(axis=axis, keepdims=True)


def np_sdpa(q, k, v, valid=None, scale=None, smooth=False, softcap=0.0,
            add_bias=None):
    """q [B,H,S,D], k/v [B,H,L,D], valid bool broadcastable [B,H,S,L]."""
    q, k, v = (t.astype(np.float64) for t in (q, k, v))
    scale = scale if scale else 1.0 / np.sqrt(q.shape[-1])
    s = np.einsum("bhsd,bhld->bhsl", q, k) * scale
    if softcap > 0.0:
        s = softcap * np.tanh(s / softcap)
    if add_bias is not None:
        s = s + add_bias
    if valid is not None:
        s = np.where(valid, s, -1e9)
    if smooth:
        m = np.maximum(s.max(-1, keepdims=True), 0.0)
        e = np.exp(s - m)
        w = e / (e.sum(-1, keepdims=True) + np.exp(-m))
    else:
        w = np_softmax(s)
    return np.einsum("bhsl,bhld->bhsd", w, v)


def np_rotary(x, pos, cos_cache, sin_cache, interleaved=False):
    """x [B,H,S,D], pos [B,S] int; caches [max_pos, r/2]."""
    r = cos_cache.shape[-1] * 2
    cos = cos_cache[pos][:, None]  # [B,1,S,r/2]
    sin = sin_cache[pos][:, None]
    xr, rest = x[..., :r], x[..., r:]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
    else:
        x1, x2 = xr[..., : r // 2], xr[..., r // 2:]
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    if interleaved:
        rot = np.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        rot = np.concatenate([o1, o2], axis=-1)
    return np.concatenate([rot, rest], axis=-1) if r < x.shape[-1] else rot


def make_caches(max_pos, half, seed=0):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(-np.pi, np.pi, (max_pos, half))
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def split_heads(x, h):
    b, s, hd = x.shape
    return x.reshape(b, s, h, hd // h).transpose(0, 2, 1, 3)


def merge_heads(y):
    b, h, s, d = y.shape
    return y.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def gqa_oracle(q3, k3, v3, past_k, past_v, past_len, qh, kvh, *,
               rot=None, window=-1, softcap=0.0, smooth=False, scale=None):
    """Independent GQA semantics: returns (out [B,S,qh*D], pk, pv buffers
    after the append)."""
    b, s, _ = q3.shape
    q = split_heads(q3, qh).astype(np.float64)
    k = split_heads(k3, kvh).astype(np.float64)
    v = split_heads(v3, kvh).astype(np.float64)
    if rot is not None:
        cos_c, sin_c, inter = rot
        pos = past_len[:, None] + np.arange(s)[None, :]
        q = np_rotary(q, pos, cos_c, sin_c, inter)
        k = np_rotary(k, pos, cos_c, sin_c, inter)
    pk = past_k.astype(np.float64).copy()
    pv = past_v.astype(np.float64).copy()
    for i in range(b):
        p = past_len[i]
        pk[i, :, p: p + s] = k[i]
        pv[i, :, p: p + s] = v[i]
    L = pk.shape[2]
    rep = qh // kvh
    kf = np.repeat(pk, rep, axis=1)
    vf = np.repeat(pv, rep, axis=1)
    pglob = past_len[:, None] + np.arange(s)[None, :]  # [B,S]
    j = np.arange(L)
    valid = j[None, None, :] <= pglob[:, :, None]
    if window > 0:
        valid &= j[None, None, :] > pglob[:, :, None] - window
    out = np_sdpa(q, kf, vf, valid[:, None], scale=scale, smooth=smooth,
                  softcap=softcap)
    return merge_heads(out), pk, pv


# ------------------------------------------------- GroupQueryAttention


def _gqa_case(seed, s, past_len, qh=4, kvh=2, head=8, L=16, **kw):
    rng = np.random.default_rng(seed)
    b = len(past_len)
    past_len = np.asarray(past_len, np.int64)
    q3 = rng.standard_normal((b, s, qh * head)).astype(np.float32)
    k3 = rng.standard_normal((b, s, kvh * head)).astype(np.float32)
    v3 = rng.standard_normal((b, s, kvh * head)).astype(np.float32)
    pk = rng.standard_normal((b, kvh, L, head)).astype(np.float32)
    pv = rng.standard_normal((b, kvh, L, head)).astype(np.float32)
    seqlens_k = (past_len + s - 1).astype(np.int32)
    total = np.asarray([int(past_len.max() + s)], np.int32)
    return q3, k3, v3, pk, pv, seqlens_k, total, past_len


def test_gqa_decode_step():
    q3, k3, v3, pk, pv, slk, tot, past_len = _gqa_case(0, 1, [5, 3])
    outs = run_op(
        "GroupQueryAttention",
        {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "slk": slk,
         "tot": tot},
        n_outputs=3, domain="com.microsoft", num_heads=4, kv_num_heads=2,
    )
    want, wpk, wpv = gqa_oracle(q3, k3, v3, pk, pv, past_len, 4, 2)
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[1], wpk, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[2], wpv, rtol=1e-5, atol=1e-6)


def test_gqa_chunked_prefill_continuation():
    # S=4 appended after different past lengths, with GQA head expansion
    q3, k3, v3, pk, pv, slk, tot, past_len = _gqa_case(
        1, 4, [6, 0, 2], qh=6, kvh=2, head=4, L=12)
    outs = run_op(
        "GroupQueryAttention",
        {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "slk": slk,
         "tot": tot},
        n_outputs=3, domain="com.microsoft", num_heads=6, kv_num_heads=2,
    )
    want, wpk, wpv = gqa_oracle(q3, k3, v3, pk, pv, past_len, 6, 2)
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[1], wpk, rtol=1e-5, atol=1e-6)


def test_gqa_rotary_window_softcap_smooth():
    q3, k3, v3, pk, pv, slk, tot, past_len = _gqa_case(2, 2, [7, 4])
    cos_c, sin_c = make_caches(32, 4)  # head=8 → r/2=4, full-head rotary
    outs = run_op(
        "GroupQueryAttention",
        {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "slk": slk,
         "tot": tot, "cos": cos_c, "sin": sin_c},
        n_outputs=3, domain="com.microsoft", num_heads=4, kv_num_heads=2,
        do_rotary=1, local_window_size=4, softcap=30.0, smooth_softmax=1,
    )
    want, wpk, wpv = gqa_oracle(
        q3, k3, v3, pk, pv, past_len, 4, 2,
        rot=(cos_c, sin_c, False), window=4, softcap=30.0, smooth=True)
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[1], wpk, rtol=1e-4, atol=1e-5)


def test_gqa_rotary_interleaved_partial_dim():
    # rotary dim 4 < head 8, interleaved pairing
    q3, k3, v3, pk, pv, slk, tot, past_len = _gqa_case(3, 3, [0, 5])
    cos_c, sin_c = make_caches(32, 2, seed=9)  # r=4 < head=8
    outs = run_op(
        "GroupQueryAttention",
        {"q": q3, "k": k3, "v": v3, "pk": pk, "pv": pv, "slk": slk,
         "tot": tot, "cos": cos_c, "sin": sin_c},
        n_outputs=1, domain="com.microsoft", num_heads=4, kv_num_heads=2,
        do_rotary=1, rotary_interleaved=1,
    )
    want, _, _ = gqa_oracle(q3, k3, v3, pk, pv, past_len, 4, 2,
                            rot=(cos_c, sin_c, True))
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)


def test_gqa_packed_qkv_prefill_no_past():
    rng = np.random.default_rng(4)
    b, s, qh, kvh, head = 2, 5, 4, 2, 8
    packed = rng.standard_normal(
        (b, s, (qh + 2 * kvh) * head)).astype(np.float32)
    slk = np.full((b,), s - 1, np.int32)
    tot = np.asarray([s], np.int32)
    out = run_op(
        "GroupQueryAttention", {"q": packed, "slk": slk, "tot": tot},
        input_names=["q", "", "", "", "", "slk", "tot"],
        n_outputs=1, domain="com.microsoft", num_heads=qh, kv_num_heads=kvh,
    )[0]
    q3 = packed[..., : qh * head]
    k3 = packed[..., qh * head: (qh + kvh) * head]
    v3 = packed[..., (qh + kvh) * head:]
    # no past buffer: oracle over a zero-length-past buffer of size s
    zpk = np.zeros((b, kvh, s, head), np.float32)
    want, _, _ = gqa_oracle(q3, k3, v3, zpk, zpk, np.zeros(b, np.int64),
                            qh, kvh)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------- MultiHeadAttention


def test_mha_3d_bias_key_lengths():
    rng = np.random.default_rng(5)
    b, sq, skv, h, d = 2, 3, 6, 4, 8
    q = rng.standard_normal((b, sq, h * d)).astype(np.float32)
    k = rng.standard_normal((b, skv, h * d)).astype(np.float32)
    v = rng.standard_normal((b, skv, h * d)).astype(np.float32)
    bias = rng.standard_normal(3 * h * d).astype(np.float32)
    lens = np.asarray([4, 6], np.int32)
    out = run_op(
        "MultiHeadAttention", {"q": q, "k": k, "v": v, "bias": bias,
                               "kpm": lens},
        n_outputs=1, domain="com.microsoft", num_heads=h,
    )[0]
    qb = split_heads(q + bias[: h * d], h)
    kb = split_heads(k + bias[h * d: 2 * h * d], h)
    vb = split_heads(v + bias[2 * h * d:], h)
    valid = (np.arange(skv)[None, :] < lens[:, None])[:, None, None, :]
    # ORT adds mask_filter_value (-1e4) instead of replacing: reproduce
    s = np.einsum("bhqd,bhkd->bhqk", qb.astype(np.float64),
                  kb.astype(np.float64)) / np.sqrt(d)
    s = np.where(valid, s, s - 10000.0)
    want = merge_heads(np.einsum("bhqk,bhkd->bhqd", np_softmax(s),
                                 vb.astype(np.float64)))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_mha_packed_qkv():
    rng = np.random.default_rng(6)
    b, s, h, d = 2, 4, 3, 8
    packed = rng.standard_normal((b, s, h, 3, d)).astype(np.float32)
    out = run_op(
        "MultiHeadAttention", {"q": packed},
        n_outputs=1, domain="com.microsoft", num_heads=h,
    )[0]
    q = packed[:, :, :, 0].transpose(0, 2, 1, 3)
    k = packed[:, :, :, 1].transpose(0, 2, 1, 3)
    v = packed[:, :, :, 2].transpose(0, 2, 1, 3)
    want = merge_heads(np_sdpa(q, k, v))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_mha_packed_kv_and_cached_4d_kv():
    rng = np.random.default_rng(7)
    b, sq, skv, h, d = 1, 2, 5, 2, 4
    q = rng.standard_normal((b, sq, h * d)).astype(np.float32)
    kv = rng.standard_normal((b, skv, h, 2, d)).astype(np.float32)
    out = run_op(
        "MultiHeadAttention", {"q": q, "kv": kv},
        n_outputs=1, domain="com.microsoft", num_heads=h,
    )[0]
    k4 = kv[:, :, :, 0].transpose(0, 2, 1, 3)
    v4 = kv[:, :, :, 1].transpose(0, 2, 1, 3)
    want = merge_heads(np_sdpa(split_heads(q, h), k4, v4))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
    # same numbers through the pre-transposed cross-attention form
    out2 = run_op(
        "MultiHeadAttention",
        {"q": q, "k": np.ascontiguousarray(k4),
         "v": np.ascontiguousarray(v4)},
        n_outputs=1, domain="com.microsoft", num_heads=h,
    )[0]
    np.testing.assert_allclose(out2, want, rtol=1e-4, atol=1e-5)


def test_mha_past_kv_unidirectional():
    rng = np.random.default_rng(8)
    b, sq, p, h, d = 2, 3, 4, 2, 8
    q = rng.standard_normal((b, sq, h * d)).astype(np.float32)
    k = rng.standard_normal((b, sq, h * d)).astype(np.float32)
    v = rng.standard_normal((b, sq, h * d)).astype(np.float32)
    pk = rng.standard_normal((b, h, p, d)).astype(np.float32)
    pv = rng.standard_normal((b, h, p, d)).astype(np.float32)
    outs = run_op(
        "MultiHeadAttention",
        {"q": q, "k": k, "v": v, "pk": pk, "pv": pv},
        input_names=["q", "k", "v", "", "", "", "pk", "pv"],
        n_outputs=3, domain="com.microsoft", num_heads=h, unidirectional=1,
    )
    kf = np.concatenate([pk, split_heads(k, h)], axis=2)
    vf = np.concatenate([pv, split_heads(v, h)], axis=2)
    t = p + sq
    causal = (np.arange(t)[None, :]
              <= (p + np.arange(sq))[:, None])[None, None]
    s = np.einsum("bhqd,bhkd->bhqk", split_heads(q, h).astype(np.float64),
                  kf.astype(np.float64)) / np.sqrt(d)
    s = np.where(causal, s, s - 10000.0)
    want = merge_heads(np.einsum("bhqk,bhkd->bhqd", np_softmax(s),
                                 vf.astype(np.float64)))
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[1], kf, rtol=1e-6)
    np.testing.assert_allclose(outs[2], vf, rtol=1e-6)


# --------------------------------------- contrib Attention with past KV


def test_ms_attention_past_kv_present():
    rng = np.random.default_rng(9)
    b, s, p, h, d = 2, 2, 3, 2, 4
    x = rng.standard_normal((b, s, h * d)).astype(np.float32)
    w = rng.standard_normal((h * d, 3 * h * d)).astype(np.float32)
    past = rng.standard_normal((2, b, h, p, d)).astype(np.float32)
    outs = run_op(
        "Attention", {"x": x, "past": past},
        initializers={"w": w},
        input_names=["x", "w", "", "", "past"],
        n_outputs=2, domain="com.microsoft", num_heads=h, unidirectional=1,
    )
    qkv = x @ w
    q3, k3, v3 = np.split(qkv, 3, axis=-1)
    kf = np.concatenate([past[0], split_heads(k3, h)], axis=2)
    vf = np.concatenate([past[1], split_heads(v3, h)], axis=2)
    t = p + s
    causal = (np.arange(t)[None, :]
              <= (p + np.arange(s))[:, None])[None, None]
    want = merge_heads(np_sdpa(split_heads(q3, h), kf, vf, valid=causal))
    np.testing.assert_allclose(outs[0], want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        outs[1], np.stack([kf, vf]), rtol=1e-4, atol=1e-5)


# ------------------------------------------- MatMulNBits bits=8 / g_idx


def test_matmul_nbits_8bit():
    rng = np.random.default_rng(10)
    K, N, BLK = 16, 5, 8
    kb = K // BLK
    w = rng.standard_normal((N, K)).astype(np.float32)
    wg = w.reshape(N, kb, BLK)
    scale = (np.abs(wg).max(-1) / 127.0 + 1e-8).astype(np.float32)
    zp = rng.integers(100, 156, (N, kb)).astype(np.uint8)
    q = np.clip(np.round(wg / scale[:, :, None]) + zp[:, :, None].astype(
        np.int64), 0, 255).astype(np.uint8)
    wdq = ((q.astype(np.float32) - zp[:, :, None]) * scale[:, :, None]
           ).reshape(N, K)
    a = rng.standard_normal((3, K)).astype(np.float32)
    got = run_op(
        "MatMulNBits", {"a": a},
        initializers={"b": q, "sc": scale, "zp": zp},
        input_names=["a", "b", "sc", "zp"],
        domain="com.microsoft", K=K, N=N, bits=8, block_size=BLK,
    )[0]
    np.testing.assert_allclose(got, a @ wdq.T, rtol=1e-4, atol=1e-4)


def test_matmul_nbits_8bit_default_zp():
    rng = np.random.default_rng(11)
    K, N, BLK = 8, 3, 4
    kb = K // BLK
    q = rng.integers(0, 256, (N, kb, BLK)).astype(np.uint8)
    scale = rng.uniform(0.01, 0.1, (N, kb)).astype(np.float32)
    wdq = ((q.astype(np.float32) - 128.0) * scale[:, :, None]).reshape(N, K)
    a = rng.standard_normal((2, K)).astype(np.float32)
    got = run_op(
        "MatMulNBits", {"a": a},
        initializers={"b": q, "sc": scale},
        input_names=["a", "b", "sc"],
        domain="com.microsoft", K=K, N=N, bits=8, block_size=BLK,
    )[0]
    np.testing.assert_allclose(got, a @ wdq.T, rtol=1e-4, atol=1e-4)


def _pack_nibbles(vals):
    v = np.asarray(vals, np.uint8)
    return (v[..., 0::2] | (v[..., 1::2] << 4)).astype(np.uint8)


def test_matmul_nbits_g_idx_act_order():
    # GPTQ desc_act: columns map to groups via g_idx, NOT contiguously
    rng = np.random.default_rng(12)
    K, N, BLK = 16, 4, 8
    kb = K // BLK
    g_idx = rng.integers(0, kb, K).astype(np.int32)
    q = rng.integers(0, 16, (N, K)).astype(np.uint8)
    scale = rng.uniform(0.05, 0.2, (N, kb)).astype(np.float32)
    zp = rng.integers(4, 12, (N, kb)).astype(np.uint8)
    wdq = ((q.astype(np.float32) - zp[:, g_idx])
           * scale[:, g_idx])  # per-column gather
    a = rng.standard_normal((3, K)).astype(np.float32)
    got = run_op(
        "MatMulNBits", {"a": a},
        initializers={
            "b": _pack_nibbles(q).reshape(N, kb, BLK // 2),
            "sc": scale, "zp": zp.astype(np.uint8).reshape(N, kb),
            "g": g_idx,
        },
        input_names=["a", "b", "sc", "zp", "g"],
        domain="com.microsoft", K=K, N=N, bits=4, block_size=BLK,
    )[0]
    np.testing.assert_allclose(got, a @ wdq.T, rtol=1e-4, atol=1e-4)


def test_matmul_nbits_g_idx_default_zp():
    rng = np.random.default_rng(13)
    K, N, BLK = 12, 3, 4
    kb = K // BLK
    g_idx = np.asarray([0, 0, 1, 2, 1, 1, 2, 0, 2, 2, 0, 1], np.int32)
    q = rng.integers(0, 16, (N, K)).astype(np.uint8)
    scale = rng.uniform(0.05, 0.2, (N, kb)).astype(np.float32)
    wdq = (q.astype(np.float32) - 8.0) * scale[:, g_idx]
    a = rng.standard_normal((2, K)).astype(np.float32)
    got = run_op(
        "MatMulNBits", {"a": a},
        initializers={"b": _pack_nibbles(q).reshape(N, kb, BLK // 2),
                      "sc": scale, "g": g_idx},
        input_names=["a", "b", "sc", "", "g"],
        domain="com.microsoft", K=K, N=N, bits=4, block_size=BLK,
    )[0]
    np.testing.assert_allclose(got, a @ wdq.T, rtol=1e-4, atol=1e-4)
