"""com.microsoft varlen ("effective transformer") ops: RemovePadding,
RestorePadding, PackedAttention, PackedMultiHeadAttention.

ORT's GPU transformer optimizer rewrites padded BERT batches into a
packed token stream: RemovePadding compacts [B, S, H] to the valid
tokens, the Packed* attentions run over the compacted stream using
cumulative sequence lengths, and RestorePadding scatters back. In ORT
the packed length is a DYNAMIC dimension (total real tokens); a static
XLA program cannot do that, so the TPU-native reinterpretation keeps the
bucketed worst case: the packed dimension is B·S, the compaction is a
stable argsort permutation (valid tokens first, in row-major order —
exactly ORT's token_offset contents), and "how many are real" rides as
data (cumulated_seq_len), not shape. Downstream semantics are identical:
RestorePadding zero-fills padding positions, and the packed attentions
mask by per-sequence lengths, so the dead tail rows never influence a
real output. Compute cost equals the padded batch — which is what the
dense TPU program would pay anyway; the ops exist here for graph
compatibility, not memory savings.

Reference analog: none (the reference has no contrib domain at all); the
product justification is running published ORT-optimized exports
end-to-end (/root/reference/crates/lele-build/src/lib.rs:72-135).
"""

from __future__ import annotations

import numpy as np

from .math_ops import _prec
from .registry import OpContext, op


def _token_order(seq_lens, b, s):
    """Stable permutation of [0, B·S): valid (row-major) tokens first —
    ORT's token_offset. seq_lens [B] int."""
    import jax.numpy as jnp

    valid = (jnp.arange(s, dtype=jnp.int32)[None, :]
             < seq_lens.reshape(b, 1).astype(jnp.int32))  # [B,S]
    # argsort of (is_padding, flat_index): stable compaction
    return jnp.argsort(jnp.where(valid, 0, 1).reshape(-1),
                       stable=True).astype(jnp.int32)


@op("RemovePadding", foldable=False, domain="com.microsoft")
def remove_padding(ctx: OpContext, x, sequence_token_count):
    """com.microsoft::RemovePadding — [B,S,H] + per-batch lengths →
    (packed [B·S, H] with valid tokens compacted to the front,
    token_offset [B,S], cumulated_seq_len [B+1], max_seq_len [1])."""
    import jax.numpy as jnp

    b, s, h = x.shape
    lens = sequence_token_count.reshape(b).astype(jnp.int32)
    order = _token_order(lens, b, s)
    packed = x.reshape(b * s, h)[order]
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(lens)])
    outs = (packed, order.reshape(b, s), cum.astype(jnp.int32),
            jnp.max(lens, keepdims=True))
    n_out = len(ctx.node.output) if ctx.node is not None else 4
    return outs[:n_out] if n_out > 1 else outs[0]


@op("RestorePadding", foldable=False, domain="com.microsoft")
def restore_padding(ctx: OpContext, x, token_offset):
    """com.microsoft::RestorePadding — packed [B·S, H] + token_offset →
    [B, S, H] with padding positions ZERO (the ORT contract).

    In ORT the real-token count is the packed input's dynamic shape; here
    the packed dim is the static B·S bucket, so the count is recovered
    from token_offset's structure: the real prefix is strictly ascending
    (row-major compaction) and the first DESCENT marks where the padding
    ranks begin. Disclosed deviation: when every padding position sits in
    the tail of the LAST batch row, token_offset is the identity
    permutation (indistinguishable from the no-padding case) and those
    positions pass through instead of zeroing — downstream consumers of
    these exports mask by sequence length regardless."""
    import jax.numpy as jnp

    b, s = token_offset.shape
    n = b * s
    h = x.shape[-1]
    off = token_offset.reshape(n).astype(jnp.int32)
    descent = off[1:] < off[:-1]
    first = jnp.argmax(descent)  # 0 when no descent
    total = jnp.where(jnp.any(descent), first + 1, n)
    real = jnp.arange(n) < total
    vals = jnp.where(real[:, None], x.reshape(n, h), 0)
    out = jnp.zeros((n, h), x.dtype).at[off].set(vals.astype(x.dtype))
    return out.reshape(b, s, h)


def _packed_mha_core(ctx, q, k, v, token_offset, cum_seq, attention_bias,
                     heads):
    """Shared packed-attention core: q/k/v [B·S, H, dh] (already split),
    token_offset [B,S], cum_seq [B+1] → packed output [B·S, H*dh]."""
    import jax.numpy as jnp

    b, s = token_offset.shape
    n = b * s
    off = token_offset.reshape(n).astype(jnp.int32)
    inv = jnp.zeros((n,), jnp.int32).at[off].set(
        jnp.arange(n, dtype=jnp.int32))
    lens = (cum_seq[1:] - cum_seq[:-1]).astype(jnp.int32)  # [B]
    valid = (jnp.arange(s, dtype=jnp.int32)[None, :]
             < lens[:, None])  # [B,S]

    def unpack(t):  # [B·S, H, dh] → [B, H, S, dh]
        return t[inv].reshape(b, s, *t.shape[1:]).transpose(0, 2, 1, 3)

    qp, kp, vp = unpack(q), unpack(k), unpack(v)
    dh = qp.shape[-1]
    scale = ctx.attr("scale")
    scale = float(scale) if scale else 1.0 / float(np.sqrt(dh))
    att = jnp.einsum(
        "bhqd,bhkd->bhqk", qp, kp,
        preferred_element_type=jnp.promote_types(qp.dtype, jnp.float32),
        precision=_prec(),
    ) * scale
    if attention_bias is not None:
        att = att + attention_bias.astype(att.dtype)
    att = jnp.where(valid[:, None, None, :], att,
                    jnp.asarray(-1e9, att.dtype))
    import jax

    w = jax.nn.softmax(
        att.astype(jnp.promote_types(att.dtype, jnp.float32)), axis=-1)
    y = jnp.einsum("bhqk,bhkd->bhqd", w.astype(vp.dtype), vp,
                   precision=_prec())
    y = y.transpose(0, 2, 1, 3).reshape(n, heads * dh)
    return y[off]  # re-pack


@op("PackedMultiHeadAttention", foldable=False, domain="com.microsoft")
def packed_mha(ctx: OpContext, query, key=None, value=None, bias=None,
               token_offset=None, cumulative_sequence_length=None,
               attention_bias=None):
    """com.microsoft::PackedMultiHeadAttention — MHA over the compacted
    token stream. query [total, H*dh] with key/value alike, or packed
    QKV [total, H, 3, dh] with key/value absent; bias is the fused
    [q|k|v] projection bias."""
    import jax.numpy as jnp

    heads = int(ctx.attr("num_heads", 0))
    if not heads:
        raise ValueError("PackedMultiHeadAttention requires num_heads")
    if token_offset is None or cumulative_sequence_length is None:
        raise ValueError(
            "PackedMultiHeadAttention requires token_offset and "
            "cumulative_sequence_length")
    if query.ndim == 4:  # packed [total, H, 3, dh]
        if key is not None or value is not None:
            raise ValueError(
                "PackedMultiHeadAttention: packed QKV forbids key/value")
        if bias is not None:
            raise NotImplementedError(
                "PackedMultiHeadAttention: bias with packed QKV is not "
                "supported")
        q = query[:, :, 0]
        k = query[:, :, 1]
        v = query[:, :, 2]
    else:
        if key is None or value is None:
            raise ValueError(
                "PackedMultiHeadAttention: 3-input form needs key/value")
        if bias is not None:
            d = query.shape[-1]
            query = query + bias[:d]
            key = key + bias[d: 2 * d]
            value = value + bias[2 * d:]
        n = query.shape[0]
        q = query.reshape(n, heads, -1)
        k = key.reshape(n, heads, -1)
        v = value.reshape(n, heads, -1)
    out = _packed_mha_core(ctx, q, k, v, token_offset,
                           cumulative_sequence_length, attention_bias,
                           heads)
    return out.astype(query.dtype)


@op("PackedAttention", foldable=False, domain="com.microsoft")
def packed_attention(ctx: OpContext, x, weights, bias=None,
                     token_offset=None, cumulative_sequence_length=None,
                     attention_bias=None):
    """com.microsoft::PackedAttention — the fused-projection twin
    (input [total, D] @ weights [D, 3*H*dh] + bias, then the packed MHA
    core). Asymmetric qkv_hidden_sizes refused like contrib Attention."""
    import jax.numpy as jnp

    heads = int(ctx.attr("num_heads", 0))
    if not heads:
        raise ValueError("PackedAttention requires num_heads")
    sizes = ctx.attr_ints("qkv_hidden_sizes")
    if sizes and len(set(sizes)) != 1:
        raise NotImplementedError(
            "PackedAttention: asymmetric qkv_hidden_sizes not supported")
    if token_offset is None or cumulative_sequence_length is None:
        raise ValueError(
            "PackedAttention requires token_offset and "
            "cumulative_sequence_length")
    qkv = jnp.matmul(x, weights, precision=_prec())
    if bias is not None:
        qkv = qkv + bias
    n = qkv.shape[0]
    dh = qkv.shape[-1] // 3 // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _packed_mha_core(
        ctx, q.reshape(n, heads, dh), k.reshape(n, heads, dh),
        v.reshape(n, heads, dh), token_offset,
        cumulative_sequence_length, attention_bias, heads)
    return out.astype(x.dtype)
