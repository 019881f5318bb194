"""com.microsoft attention ops from ORT-GenAI decoder exports.

Every published int4 LLM ONNX release (Phi-3, Llama, Qwen ONNX builds on
the hub) is produced by the onnxruntime-genai model builder, which emits a
fixed decoder vocabulary: MatMulNBits projections, GroupQueryAttention
with fused rotary + a static KV-cache buffer, SimplifiedLayerNormalization
and SkipLayerNormalization between blocks, and (for encoder-decoder or
non-GQA models) MultiHeadAttention. The reference can run none of these —
its product is running published exports end-to-end
(/root/reference/crates/lele-build/src/lib.rs:72-135), so this family is
the load-bearing one for real checkpoints.

TPU-first shape discipline: every tensor here is STATIC-shaped. The KV
cache is the caller-allocated max-length buffer the export already carries
(past_key/past_value inputs); the per-batch valid lengths ride in
`seqlens_k` as data, not shape. The cache append lowers to a vmapped
`lax.dynamic_update_slice` (donation-friendly — XLA updates the buffer in
place when the caller donates it), and causal/window/length masking is
broadcasted-iota arithmetic fused into the score matmul's epilogue. That
is exactly the bucketed static-shape decode the rest of the runtime uses
(runtime/bucketing.py); nothing here forces a recompile per step.
"""

from __future__ import annotations

import numpy as np

from .math_ops import _prec
from .registry import OpContext, op


def _bhsd(x, n_heads):
    """[B, S, H*D] → [B, H, S, D]."""
    b, s, hd = x.shape
    return x.reshape(b, s, n_heads, hd // n_heads).transpose(0, 2, 1, 3)


def _cache_append(past, new, start):
    """Write `new` [B,H,S,D] into buffer `past` [B,H,L,D] at per-batch
    sequence offsets `start` [B] (static shapes; in-place under donation)."""
    import jax
    import jax.numpy as jnp

    def upd(cache_b, new_b, s0):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, s0, 0))

    return jax.vmap(upd)(past, new, start.astype(jnp.int32))


def _masked_softmax(scores, valid, smooth=False, filter_value=None):
    """Softmax over the last axis in f32 with a bool validity mask.

    filter_value=None masks by replacement with a large negative (the GQA
    rule); a float masks by ADDITION of mask_filter_value (the MHA rule —
    ORT adds the filter to masked scores rather than replacing them).
    smooth=True appends a virtual always-zero logit to the denominator
    (ORT's smooth_softmax: heads may attend to nothing).
    """
    import jax.numpy as jnp

    f32 = jnp.promote_types(scores.dtype, jnp.float32)
    s = scores.astype(f32)
    if valid is not None:
        if filter_value is None:
            s = jnp.where(valid, s, jnp.asarray(-1e9, f32))
        else:
            s = jnp.where(valid, s, s + jnp.asarray(filter_value, f32))
    m = jnp.max(s, axis=-1, keepdims=True)
    if smooth:
        m = jnp.maximum(m, 0.0)  # the virtual zero logit joins the max
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    if smooth:
        denom = denom + jnp.exp(-m)
    return e / denom


@op("GroupQueryAttention", foldable=False, domain="com.microsoft")
def group_query_attention(ctx: OpContext, query, key=None, value=None,
                          past_key=None, past_value=None, seqlens_k=None,
                          total_sequence_length=None, cos_cache=None,
                          sin_cache=None, position_ids=None,
                          attention_bias=None, head_sink=None):
    """com.microsoft::GroupQueryAttention — the attention node in every
    ORT-GenAI decoder export.

    query [B,S,qh*D] (or packed [B,S,(qh+2*kvh)*D] when key/value absent);
    past_key/past_value are the static max-length cache buffers
    [B,kvh,L,D]; seqlens_k [B] int32 carries total_length-1 per sequence
    (the ORT convention), so past_len = seqlens_k+1-S; new KV is written
    at [past_len, past_len+S) and attention is always causal over global
    positions. do_rotary applies the cos/sin caches to q and the new k at
    those global positions. local_window_size>0 is the Mistral sliding
    window; softcap is the Gemma tanh cap; smooth_softmax adds a virtual
    zero logit. `total_sequence_length` only disambiguates buffer capacity
    in ORT's dynamic world — here capacity is the static buffer shape, so
    it is accepted and unused.
    """
    import jax.numpy as jnp

    from .attention_ops import apply_rotary

    if head_sink is not None:
        raise NotImplementedError(
            "GroupQueryAttention: head_sink (attention-sink logits) is not "
            "supported"
        )
    qh = int(ctx.attr("num_heads", 0))
    kvh = int(ctx.attr("kv_num_heads", 0))
    if not qh or not kvh:
        raise ValueError(
            "GroupQueryAttention requires num_heads and kv_num_heads"
        )
    if qh % kvh:
        raise ValueError(
            f"GroupQueryAttention: num_heads {qh} not divisible by "
            f"kv_num_heads {kvh}"
        )
    b, s, hidden = query.shape
    if key is None or value is None:
        if key is not None or value is not None:
            raise ValueError(
                "GroupQueryAttention: packed QKV requires BOTH key and "
                "value absent"
            )
        head = hidden // (qh + 2 * kvh)
        q = query[..., : qh * head]
        k = query[..., qh * head: (qh + kvh) * head]
        v = query[..., (qh + kvh) * head:]
    else:
        head = hidden // qh
        q, k, v = query, key, value
    q = _bhsd(q, qh)
    k = _bhsd(k, kvh)
    v = _bhsd(v, kvh)

    if seqlens_k is None:
        # pure-prefill graphs without the length input: full new sequence
        past_len = jnp.zeros((b,), jnp.int32)
        total = jnp.full((b,), s, jnp.int32)
    else:
        total = seqlens_k.reshape(b).astype(jnp.int32) + 1
        past_len = total - s

    if bool(ctx.attr("do_rotary", 0)):
        if cos_cache is None or sin_cache is None:
            raise ValueError(
                "GroupQueryAttention: do_rotary=1 requires cos_cache and "
                "sin_cache"
            )
        interleaved = bool(ctx.attr("rotary_interleaved", 0))
        r = int(cos_cache.shape[-1]) * 2
        if position_ids is not None:
            pid = position_ids.astype(jnp.int32)
            pos = (
                jnp.broadcast_to(
                    pid.reshape(()) + jnp.arange(s, dtype=jnp.int32),
                    (b, s),
                )
                if pid.size == 1
                else pid.reshape(b, s)
            )
        else:
            pos = past_len[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        cos = cos_cache[pos][:, None, :, : r // 2]  # [B,1,S,r/2]
        sin = sin_cache[pos][:, None, :, : r // 2]
        q = apply_rotary(q, cos, sin, r, interleaved)
        k = apply_rotary(k, cos, sin, r, interleaved)

    if past_key is not None:
        k_all = _cache_append(past_key, k.astype(past_key.dtype), past_len)
        v_all = _cache_append(past_value, v.astype(past_value.dtype),
                              past_len)
    else:
        k_all, v_all = k, v
    present_key, present_value = k_all, v_all
    L = k_all.shape[2]

    rep = qh // kvh
    if rep > 1:
        k_all = jnp.repeat(k_all, rep, axis=1)
        v_all = jnp.repeat(v_all, rep, axis=1)

    scale = ctx.attr("scale")
    scale = float(scale) if scale else 1.0 / float(np.sqrt(head))
    scores = jnp.einsum(
        "bhsd,bhld->bhsl", q, k_all.astype(q.dtype),
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
        precision=_prec(),
    ) * scale
    softcap = float(ctx.attr("softcap", 0.0))
    if softcap > 0.0:
        scores = softcap * jnp.tanh(scores / softcap)
    if attention_bias is not None:
        scores = scores + attention_bias.astype(scores.dtype)

    # causal over GLOBAL positions: query row i sits at p = past_len+i and
    # sees keys j <= p (which also hides the buffer's stale tail j >= total)
    p = (past_len[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :])
    j = jnp.arange(L, dtype=jnp.int32)
    valid = j[None, None, :] <= p[:, :, None]  # [B,S,L]
    window = int(ctx.attr("local_window_size", -1))
    if window > 0:
        valid = valid & (j[None, None, :] > p[:, :, None] - window)
    w = _masked_softmax(scores, valid[:, None, :, :],
                        smooth=bool(ctx.attr("smooth_softmax", 0)))
    y = jnp.einsum("bhsl,bhld->bhsd", w.astype(v_all.dtype), v_all,
                   precision=_prec())
    y = y.transpose(0, 2, 1, 3).reshape(b, s, qh * head)
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1:
        return y
    return (y, present_key, present_value)[:n_out]


def _csr_block_mask(block_row_indices, block_col_indices, nblocks):
    """Dense [num_layout, nblocks, nblocks] bool from the CSR block layout
    (block_row_indices [L, max_blocks+1] row pointers, block_col_indices
    [L, max_nnz] column ids padded with -1). Pure broadcast arithmetic —
    the layouts are tiny (≤ heads × (seq/block)² entries) and constant in
    every published export, so XLA folds this whole product at compile
    time."""
    import jax.numpy as jnp

    rp = block_row_indices.astype(jnp.int32)
    cols = block_col_indices.astype(jnp.int32)
    nnz = cols.shape[-1]
    i = jnp.arange(nnz, dtype=jnp.int32)
    # in_row[l, r, n]: nnz slot n belongs to row r of layout l
    in_row = (i[None, None, :] >= rp[:, :nblocks, None]) & (
        i[None, None, :] < rp[:, 1: nblocks + 1, None])
    match = cols[:, None, :, None] == jnp.arange(
        nblocks, dtype=jnp.int32)[None, None, None, :]
    return jnp.any(in_row[:, :, :, None] & match, axis=2)


@op("SparseAttention", foldable=False, domain="com.microsoft")
def sparse_attention(ctx: OpContext, query, key=None, value=None,
                     past_key=None, past_value=None,
                     block_row_indices=None, block_col_indices=None,
                     total_sequence_length=None,
                     key_total_sequence_lengths=None, cos_cache=None,
                     sin_cache=None):
    """com.microsoft::SparseAttention — block-sparse attention with the
    shared static KV buffer; the attention node in the published
    Phi-3-small ONNX releases (block-sparse "vertical-slash" layouts).

    Same cache/rotary/length conventions as GroupQueryAttention except the
    per-batch totals arrive directly in `key_total_sequence_lengths` [B]
    (past_len = total − S) and the causal mask is further intersected with
    a per-head block layout: query block qb may attend key block kb only
    if the CSR layout (block_row_indices/block_col_indices, one row set
    per layout; head h uses layout h % num_layout) contains (qb, kb).
    Blocks are `sparse_block_size` positions. `total_sequence_length`
    only sizes ORT's dynamic buffers — here capacity is the static buffer
    shape, so it is accepted and unused.
    """
    import jax.numpy as jnp

    from .attention_ops import apply_rotary

    qh = int(ctx.attr("num_heads", 0))
    kvh = int(ctx.attr("kv_num_heads", 0))
    bs_blk = int(ctx.attr("sparse_block_size", 0))
    if not qh or not kvh or not bs_blk:
        raise ValueError(
            "SparseAttention requires num_heads, kv_num_heads and "
            "sparse_block_size"
        )
    if qh % kvh:
        raise ValueError(
            f"SparseAttention: num_heads {qh} not divisible by "
            f"kv_num_heads {kvh}"
        )
    if past_key is None or past_value is None:
        raise NotImplementedError(
            "SparseAttention: the shared past_key/past_value buffers are "
            "required (every published export carries them)"
        )
    if block_row_indices is None or block_col_indices is None:
        raise ValueError(
            "SparseAttention requires block_row_indices/block_col_indices")
    if key_total_sequence_lengths is None:
        raise ValueError(
            "SparseAttention requires key_total_sequence_lengths")

    b, s, hidden = query.shape
    if key is None or value is None:
        if key is not None or value is not None:
            raise ValueError(
                "SparseAttention: packed QKV requires BOTH key and value "
                "absent"
            )
        head = hidden // (qh + 2 * kvh)
        q = query[..., : qh * head]
        k = query[..., qh * head: (qh + kvh) * head]
        v = query[..., (qh + kvh) * head:]
    else:
        head = hidden // qh
        q, k, v = query, key, value
    q = _bhsd(q, qh)
    k = _bhsd(k, kvh)
    v = _bhsd(v, kvh)

    total = key_total_sequence_lengths.reshape(b).astype(jnp.int32)
    past_len = total - s

    if bool(ctx.attr("do_rotary", 0)):
        if cos_cache is None or sin_cache is None:
            raise ValueError(
                "SparseAttention: do_rotary=1 requires cos_cache and "
                "sin_cache"
            )
        interleaved = bool(ctx.attr("rotary_interleaved", 0))
        r = int(cos_cache.shape[-1]) * 2
        pos = past_len[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        cos = cos_cache[pos][:, None, :, : r // 2]
        sin = sin_cache[pos][:, None, :, : r // 2]
        q = apply_rotary(q, cos, sin, r, interleaved)
        k = apply_rotary(k, cos, sin, r, interleaved)

    k_all = _cache_append(past_key, k.astype(past_key.dtype), past_len)
    v_all = _cache_append(past_value, v.astype(past_value.dtype), past_len)
    present_key, present_value = k_all, v_all
    L = k_all.shape[2]
    if L % bs_blk:
        raise ValueError(
            f"SparseAttention: cache length {L} is not a multiple of "
            f"sparse_block_size {bs_blk}"
        )

    rep = qh // kvh
    if rep > 1:
        k_all = jnp.repeat(k_all, rep, axis=1)
        v_all = jnp.repeat(v_all, rep, axis=1)

    scale = ctx.attr("scale")
    scale = float(scale) if scale else 1.0 / float(np.sqrt(head))
    scores = jnp.einsum(
        "bhsd,bhld->bhsl", q, k_all.astype(q.dtype),
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
        precision=_prec(),
    ) * scale

    # causal over GLOBAL positions (also hides the buffer's stale tail),
    # intersected with the per-head block layout
    p = past_len[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]  # [B,S]
    j = jnp.arange(L, dtype=jnp.int32)
    causal = j[None, None, :] <= p[:, :, None]  # [B,S,L]
    nblocks = L // bs_blk
    allowed = _csr_block_mask(block_row_indices, block_col_indices,
                              nblocks)  # [num_layout, nb, nb]
    num_layout = allowed.shape[0]
    lay = jnp.arange(qh, dtype=jnp.int32) % num_layout
    per_head = allowed[lay]                      # [H, nb, nb]
    qb = p // bs_blk                             # [B,S]
    kb = j // bs_blk                             # [L]
    blk = per_head[:, qb, :][:, :, :, kb]        # [H,B,S,L]
    valid = blk.transpose(1, 0, 2, 3) & causal[:, None, :, :]  # [B,H,S,L]
    w = _masked_softmax(scores, valid)
    y = jnp.einsum("bhsl,bhld->bhsd", w.astype(v_all.dtype), v_all,
                   precision=_prec())
    y = y.transpose(0, 2, 1, 3).reshape(b, s, qh * head)
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1:
        return y
    return (y, present_key, present_value)[:n_out]


@op("MultiHeadAttention", foldable=False, domain="com.microsoft")
def multi_head_attention(ctx: OpContext, query, key=None, value=None,
                         bias=None, key_padding_mask=None,
                         attention_bias=None, past_key=None,
                         past_value=None):
    """com.microsoft::MultiHeadAttention — attention over already-projected
    q/k/v (the ORT optimizer's form for cross-attention and non-GQA
    self-attention, e.g. Whisper decoder exports).

    Accepted input forms (the ORT schema's enumeration):
    - query [B,Sq,H*D], key [B,Skv,H*D], value [B,Skv,H*Dv]
    - packed QKV: query [B,S,H,3,D], key/value absent
    - packed KV: key [B,Skv,H,2,D], value absent
    - cached cross-attention: key/value already [B,H,Skv,D]
    bias is the fused [q|k|v] projection bias; key_padding_mask is [B]
    right-side key lengths or a [B,total_kv] binary mask (masked scores
    get mask_filter_value ADDED, the ORT rule); attention_bias is
    additive [B|1,H|1,Sq,total_kv]; past_key/past_value [B,H,P,D] are
    concatenated (the non-share-buffer export form) and re-emitted as
    present_key/present_value.
    """
    import jax.numpy as jnp

    heads = int(ctx.attr("num_heads", 0))
    if not heads:
        raise ValueError("MultiHeadAttention requires num_heads")
    b = query.shape[0]

    if query.ndim == 5:  # packed qkv [B,S,H,3,D]
        if key is not None or value is not None:
            raise ValueError(
                "MultiHeadAttention: packed QKV query forbids key/value"
            )
        if bias is not None:
            raise NotImplementedError(
                "MultiHeadAttention: bias with packed QKV not supported"
            )
        q = query[:, :, :, 0].transpose(0, 2, 1, 3)
        k = query[:, :, :, 1].transpose(0, 2, 1, 3)
        v = query[:, :, :, 2].transpose(0, 2, 1, 3)
    else:
        if key is None:
            raise ValueError(
                "MultiHeadAttention: 3D query requires key (packed forms "
                "use a 5D query)"
            )
        if bias is not None:
            dq = query.shape[-1]
            if key.ndim == 3 and value is not None and value.ndim == 3:
                dk, dv = key.shape[-1], value.shape[-1]
                query = query + bias[:dq]
                key = key + bias[dq: dq + dk]
                value = value + bias[dq + dk: dq + dk + dv]
            else:
                raise NotImplementedError(
                    "MultiHeadAttention: bias is only supported with 3D "
                    "key/value (ORT forbids it for cached/packed KV too)"
                )
        q = _bhsd(query, heads)
        if key.ndim == 5:  # packed kv [B,Skv,H,2,D]
            if value is not None:
                raise ValueError(
                    "MultiHeadAttention: packed KV key forbids value"
                )
            k = key[:, :, :, 0].transpose(0, 2, 1, 3)
            v = key[:, :, :, 1].transpose(0, 2, 1, 3)
        elif key.ndim == 4:  # already [B,H,Skv,D]
            k, v = key, value
        else:
            k = _bhsd(key, heads)
            v = _bhsd(value, heads)

    if past_key is not None:
        k = jnp.concatenate([past_key, k], axis=2)
    if past_value is not None:
        v = jnp.concatenate([past_value, v], axis=2)
    present_key, present_value = k, v

    sq, skv = q.shape[2], k.shape[2]
    head = q.shape[-1]
    scale = ctx.attr("scale")
    scale = float(scale) if scale else 1.0 / float(np.sqrt(head))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k.astype(q.dtype),
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
        precision=_prec(),
    ) * scale
    if attention_bias is not None:
        scores = scores + attention_bias.astype(scores.dtype)

    valid = None
    if key_padding_mask is not None:
        kpm = key_padding_mask
        if kpm.ndim == 1 and kpm.shape[0] == b:
            valid = (jnp.arange(skv)[None, :]
                     < kpm.astype(jnp.int32)[:, None])[:, None, None, :]
        elif kpm.ndim == 2 and kpm.shape == (b, skv):
            valid = kpm.astype(bool)[:, None, None, :]
        else:
            raise NotImplementedError(
                "MultiHeadAttention: key_padding_mask must be [batch] "
                "right-side lengths or [batch, total_kv], got shape "
                f"{tuple(kpm.shape)}"
            )
    if bool(ctx.attr("unidirectional", 0)):
        # query row i is at global position (skv - sq) + i
        offs = skv - sq
        causal = (jnp.arange(skv)[None, :]
                  <= (offs + jnp.arange(sq))[:, None])[None, None]
        valid = causal if valid is None else (valid & causal)

    w = _masked_softmax(scores, valid,
                        filter_value=float(ctx.attr("mask_filter_value",
                                                    -10000.0)))
    y = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                   precision=_prec())
    y = y.transpose(0, 2, 1, 3).reshape(b, sq, heads * v.shape[-1])
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1:
        return y
    return (y, present_key, present_value)[:n_out]


# ---------------------------------------------------------------------------
# DecoderMasked* — ORT's static-buffer decode attention (the form its GPU
# generative exports carry EXPLICITLY, and the semantics the search ops
# inject into mask-less subgraphs). past_present_share_buffer: the past IS
# the max-length buffer; the new kv rows land at `past_sequence_length`
# (data, not shape), and validity is global causality j <= pseq + i — the
# buffer's unwritten tail is masked by construction. This is exactly the
# TPU-native bucketed decode the rest of the runtime uses.


def _dm_core(ctx, q, k, v, past_k, past_v, pseq, mask_index, rel_bias,
             share_expected: str):
    """Shared DecoderMasked math: q/k/v [B,H,S,dh]; past [B,H,L,dh] buffers
    or None (cross mode: attend k/v directly, no causality)."""
    import jax
    import jax.numpy as jnp

    b, h, s, dh = q.shape
    scale = ctx.attr("scale")
    scale = float(scale) if scale else 1.0 / float(np.sqrt(dh))
    if past_k is not None:
        if pseq is None:
            raise ValueError(
                f"{share_expected}: past_present_share_buffer form needs "
                "the past_sequence_length input"
            )
        p0 = jnp.reshape(pseq, ()).astype(jnp.int32)
        k_all = jax.lax.dynamic_update_slice(
            past_k, k.astype(past_k.dtype), (0, 0, p0, 0))
        v_all = jax.lax.dynamic_update_slice(
            past_v, v.astype(past_v.dtype), (0, 0, p0, 0))
        length = k_all.shape[2]
        j = jnp.arange(length, dtype=jnp.int32)
        pos = p0 + jnp.arange(s, dtype=jnp.int32)  # global query positions
        valid = j[None, None, None, :] <= pos[None, None, :, None]
    else:
        k_all, v_all, valid = k, v, None
        length = k_all.shape[2]
    scores = jnp.einsum(
        "bhsd,bhld->bhsl", q, k_all.astype(q.dtype),
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
        precision=_prec(),
    ) * scale
    if rel_bias is not None:
        scores = scores + rel_bias.astype(scores.dtype)
    if mask_index is not None:
        mi = mask_index
        if mi.ndim == 2 and mi.shape == (b, length):
            pad_ok = mi.astype(bool)[:, None, None, :]
            valid = pad_ok if valid is None else (valid & pad_ok)
        else:
            raise NotImplementedError(
                f"{share_expected}: mask_index must be [batch, "
                f"max_sequence_length] binary, got {tuple(mi.shape)}"
            )
    w = _masked_softmax(
        scores, valid,
        filter_value=float(ctx.attr("mask_filter_value", -10000.0)))
    y = jnp.einsum("bhsl,bhld->bhsd", w.astype(v_all.dtype), v_all,
                   precision=_prec())
    y = y.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    return y, k_all, v_all


def _dm_guards(ctx, what, cache_indirection):
    if cache_indirection is not None:
        raise NotImplementedError(
            f"{what}: cache_indirection (in-kernel beam reordering) is not "
            "supported — the search ops reorder beams by physical gather"
        )
    if bool(ctx.attr("do_rotary", 0)):
        raise NotImplementedError(
            f"{what}: do_rotary is not supported — published exports apply "
            "com.microsoft::RotaryEmbedding as a separate node"
        )
    if bool(ctx.attr("output_qk", 0)):
        raise NotImplementedError(f"{what}: output_qk is not supported")


@op("DecoderMaskedSelfAttention", foldable=False, domain="com.microsoft")
def decoder_masked_self_attention(ctx: OpContext, x, weights, bias=None,
                                  mask_index=None, past=None,
                                  relative_position_bias=None,
                                  past_sequence_length=None,
                                  beam_width=None, cache_indirection=None):
    """com.microsoft::DecoderMaskedSelfAttention — fused-projection decode
    self-attention over the shared max-length buffer (stacked past
    [2,B,H,L,dh]); beam_width is accepted and unused (beams are physically
    gathered upstream)."""
    import jax.numpy as jnp

    _dm_guards(ctx, "DecoderMaskedSelfAttention", cache_indirection)
    heads = int(ctx.attr("num_heads", 0))
    if not heads:
        raise ValueError("DecoderMaskedSelfAttention requires num_heads")
    if past is not None and not int(
            ctx.attr("past_present_share_buffer", 0)):
        raise NotImplementedError(
            "DecoderMaskedSelfAttention: only the "
            "past_present_share_buffer=1 form exists in ORT exports"
        )
    b, s, _ = x.shape
    qkv = jnp.matmul(x, weights, precision=_prec())
    if bias is not None:
        qkv = qkv + bias
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_bhsd(t, heads) for t in (q, k, v))
    y, k_all, v_all = _dm_core(
        ctx, q, k, v,
        past[0] if past is not None else None,
        past[1] if past is not None else None,
        past_sequence_length, mask_index, relative_position_bias,
        "DecoderMaskedSelfAttention",
    )
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1:
        return y
    return (y, jnp.stack([k_all, v_all], axis=0))[:n_out]


@op("DecoderMaskedMultiHeadAttention", foldable=False,
    domain="com.microsoft")
def decoder_masked_mha(ctx: OpContext, query, key=None, value=None,
                       mask_index=None, attention_bias=None, past_key=None,
                       past_value=None, past_sequence_length=None,
                       beam_width=None, cache_indirection=None, bias=None):
    """com.microsoft::DecoderMaskedMultiHeadAttention — pre-projected
    decode attention. Self mode: 3D q/k/v + split share buffers
    [B,H,L,dh] + past_sequence_length. Cross mode: 4D key/value (the
    constant encoder KV), no past — single-row queries attend everything
    (masked only by mask_index/attention_bias)."""
    import jax.numpy as jnp

    _dm_guards(ctx, "DecoderMaskedMultiHeadAttention", cache_indirection)
    heads = int(ctx.attr("num_heads", 0))
    if not heads:
        raise ValueError(
            "DecoderMaskedMultiHeadAttention requires num_heads")
    if past_key is not None and not int(
            ctx.attr("past_present_share_buffer", 0)):
        raise NotImplementedError(
            "DecoderMaskedMultiHeadAttention: only the "
            "past_present_share_buffer=1 form exists in ORT exports"
        )
    b = query.shape[0]
    if bias is not None:
        dq = query.shape[-1]
        query = query + bias[:dq]
        if key is not None and key.ndim == 3:
            dk = key.shape[-1]
            key = key + bias[dq:dq + dk]
            value = value + bias[dq + dk:]
    q = _bhsd(query, heads)
    if key is None or value is None:
        raise ValueError(
            "DecoderMaskedMultiHeadAttention requires key and value")
    if key.ndim == 4:  # cross mode: already [B,H,T,dh]
        k, v = key, value
    else:
        k, v = _bhsd(key, heads), _bhsd(value, heads)
    y, k_all, v_all = _dm_core(
        ctx, q, k, v, past_key, past_value, past_sequence_length,
        mask_index, attention_bias, "DecoderMaskedMultiHeadAttention",
    )
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1:
        return y
    return (y, k_all, v_all)[:n_out]
