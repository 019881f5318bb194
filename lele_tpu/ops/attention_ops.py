"""Opset-23/24 attention-family ops: Attention, RotaryEmbedding, Swish,
TensorScatter, AffineGrid.

These are the ops modern LLM/vision exporters emit (torch 2.9+ dynamo
exports target opset 18+; transformer exports increasingly use the fused
Attention-23 instead of spelled-out MatMul/Softmax chains). The reference
predates opset 23 and has none of them (its emitter tables stop at the
classic op set — SURVEY.md §2.1); implementing them keeps arbitrary fresh
exports compiling here.

TPU notes: Attention lowers to two einsums + softmax — XLA fuses the
mask/scale/softcap elementwise work into the MXU matmuls, so a dedicated
Pallas kernel is unnecessary at the sizes ONNX graphs carry (the native
SAN-M family has one where it pays: kernels/sanm_block.py). RotaryEmbedding
is pure VPU elementwise on [B,H,S,D/2] lanes. TensorScatter's linear mode
is a batched dynamic_update_slice (the KV-cache idiom XLA turns into an
in-place donation-friendly update).
"""

from __future__ import annotations

import numpy as np

from .math_ops import _prec
from .registry import OpContext, op


def _split_heads(x, n_heads):
    """[B, S, H*D] → [B, H, S, D]."""
    b, s, hd = x.shape
    return x.reshape(b, s, n_heads, hd // n_heads).transpose(0, 2, 1, 3)


def _flash_attention_maybe(ctx, q, k, v, attn_mask, is_causal, scale,
                           softcap, n_out, mode):
    """Route eligible Attention nodes through the Pallas TPU
    flash-attention kernel (O(L) memory, fused online softmax — the
    speed-of-light path for long sequences where the XLA einsum form
    materializes the [B,H,Lq,Lk] score tensor in HBM).

    Eligible: running on TPU, LELE_FLASH_ATTENTION not "0", no softcap, no
    qk tap requested, float mask (rides the kernel's additive-bias input;
    bool masks converted), block-aligned seq lens (128) and head size
    (8-lane multiple). Anything else falls back to the XLA path — same
    numerics contract as every other Pallas kernel here
    (PERF.md "Kernel honesty")."""
    import os

    if os.environ.get("LELE_FLASH_ATTENTION", "1") == "0":
        return None
    if softcap or n_out >= 4 or mode:
        return None
    import jax
    import jax.numpy as jnp

    try:
        if jax.devices()[0].platform != "tpu":
            return None
    except Exception:
        return None
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if lq % 128 or lk % 128 or d % 8 or d < 16:
        return None
    if is_causal and lq != lk:
        # the kernel's causal rule is top-left over equal lengths; our
        # spec rule for lq != lk is handled by the XLA path
        return None
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )
    except ImportError:
        return None
    ab = None
    if attn_mask is not None:
        if not scale:  # ab pre-division below needs a nonzero scale
            return None
        if attn_mask.dtype == jnp.bool_:
            # -1e9, not f32.min: the pre-division below would push f32.min
            # past -inf and the kernel's online softmax NaNs on -inf rows
            ab = jnp.where(attn_mask, 0.0, jnp.float32(-1e9))
        else:
            ab = attn_mask.astype(jnp.float32)
        # the kernel computes (qk + ab) * sm_scale — the ONNX mask adds
        # AFTER scaling, so pre-divide (verified against the kernel source:
        # pallas/ops/tpu/flash_attention.py applies `s += ab` then
        # `s *= sm_scale`)
        ab = jnp.broadcast_to(ab / float(scale), (b, h, lq, lk))
    blk_q = min(512, lq)
    blk_k = min(512, lk)
    if lq % blk_q or lk % blk_k:
        blk_q, blk_k = 128, 128
    bs = BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
        block_k_dkv=blk_k, block_q_dkv=blk_q,
        block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk_q,
    )
    f32 = jnp.float32
    try:
        out = flash_attention(
            q.astype(f32), k.astype(f32), v.astype(f32), ab=ab,
            causal=bool(is_causal), sm_scale=float(scale), block_sizes=bs,
        )
    except Exception as e:
        # kernel-side shape/config rejection → XLA path; say so once, so a
        # fallback never silently masquerades as a kernel win
        global _FLASH_BAILED
        if not _FLASH_BAILED:
            _FLASH_BAILED = True
            import sys

            print(
                f"[lele] flash-attention bailed to XLA path: {e!r:.200}",
                file=sys.stderr,
            )
        return None
    return out.astype(q.dtype)


_FLASH_BAILED = False


@op("Attention", foldable=False)
def attention(ctx: OpContext, q, k, v, attn_mask=None, past_key=None,
              past_value=None):
    """ONNX Attention (opset 23): scaled dot-product attention with
    optional GQA (q_num_heads > kv_num_heads), bool/float masks, top-left-
    aligned causal masking (the torch sdpa alignment the spec adopts),
    softcap, KV cache (past_*/present_*), and the qk_matmul_output taps.

    Capture order follows the spec's mode enumeration: scaled QK (0) →
    +mask (1) → softcap (2) → softmax (3).
    """
    import jax
    import jax.numpy as jnp

    three_d = q.ndim == 3
    if three_d:
        qh = int(ctx.attr("q_num_heads", 0))
        kvh = int(ctx.attr("kv_num_heads", 0))
        if not qh or not kvh:
            raise ValueError(
                "Attention with 3D inputs requires q_num_heads and "
                "kv_num_heads attributes (ONNX opset 23)"
            )
        q = _split_heads(q, qh)
        k = _split_heads(k, kvh)
        v = _split_heads(v, kvh)
    qh, kvh = q.shape[1], k.shape[1]
    head = q.shape[-1]
    scale = ctx.attr("scale")
    scale = (1.0 / float(np.sqrt(head))) if scale is None else float(scale)
    softcap = float(ctx.attr("softcap", 0.0))
    is_causal = bool(ctx.attr("is_causal", 0))
    mode = int(ctx.attr("qk_matmul_output_mode", 0))

    if past_key is not None:
        k = jnp.concatenate([past_key, k], axis=2)
    if past_value is not None:
        v = jnp.concatenate([past_value, v], axis=2)
    present_key, present_value = k, v

    if qh != kvh:
        if qh % kvh:
            raise ValueError(
                f"Attention: q_num_heads {qh} not divisible by "
                f"kv_num_heads {kvh}"
            )
        rep = qh // kvh
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    Lq, Lk = q.shape[2], k.shape[2]

    flash = _flash_attention_maybe(
        ctx, q, k, v, attn_mask, is_causal, scale, softcap,
        n_out=len(ctx.node.output) if ctx.node is not None else 1,
        mode=mode,
    )
    if flash is not None:
        y = flash
        if three_d:
            b, h, s, d = y.shape
            y = y.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        n_out = len(ctx.node.output) if ctx.node is not None else 1
        if n_out <= 1:
            return y
        return (y, present_key, present_value)[:n_out]

    cdt = jnp.promote_types(q.dtype, jnp.float32) if softcap else q.dtype
    qk = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
        precision=_prec(),
    ).astype(cdt) * scale
    taps = {0: qk}
    neg = jnp.asarray(jnp.finfo(cdt).min, cdt)
    if is_causal:
        # top-left alignment (tril diagonal 0) — the torch sdpa rule the
        # spec text adopts verbatim
        causal = jnp.tril(jnp.ones((Lq, Lk), bool))
        qk = jnp.where(causal, qk, neg)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            qk = jnp.where(attn_mask, qk, neg)
        else:
            qk = qk + attn_mask.astype(cdt)
    taps[1] = qk
    if softcap > 0.0:
        qk = softcap * jnp.tanh(qk / softcap)
    taps[2] = qk
    sp = ctx.attr("softmax_precision")
    if sp is not None:
        from ..onnx.loader import DTYPE_MAP
        from .tensor_ops import canonical_dtype

        sdt = canonical_dtype(DTYPE_MAP[int(sp)], device=True)
        w = jax.nn.softmax(qk.astype(sdt), axis=-1)
    else:
        w = jax.nn.softmax(qk.astype(jnp.promote_types(qk.dtype, jnp.float32)),
                           axis=-1)
    taps[3] = w
    y = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                   precision=_prec())
    if three_d:
        b, h, s, d = y.shape
        y = y.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out <= 1:
        return y
    return (y, present_key, present_value,
            taps[mode].astype(q.dtype))[:n_out]


@op("RotaryEmbedding", foldable=False)
def rotary_embedding(ctx: OpContext, x, cos_cache, sin_cache,
                     position_ids=None):
    """ONNX RotaryEmbedding (opset 23). X is [B,H,S,D] or [B,S,H*D]
    (num_heads attr). Caches are [max_pos, r/2] indexed by position_ids
    [B,S], or pre-gathered [B,S,r/2] when position_ids is absent.
    rotary_embedding_dim (default 0 = full head dim) rotates only the
    leading slice of each head; interleaved=1 pairs (even, odd) lanes."""
    import jax.numpy as jnp

    three_d = x.ndim == 3
    if three_d:
        nh = int(ctx.attr("num_heads", 0))
        if not nh:
            raise ValueError(
                "RotaryEmbedding with 3D input requires num_heads (opset 23)"
            )
        orig = x.shape
        x = _split_heads(x, nh)
    d = x.shape[-1]
    r = int(ctx.attr("rotary_embedding_dim", 0)) or d
    interleaved = bool(ctx.attr("interleaved", 0))
    if position_ids is not None:
        cos = cos_cache[position_ids]  # [B,S,r/2]
        sin = sin_cache[position_ids]
    else:
        cos, sin = cos_cache, sin_cache
    cos = cos[:, None, :, : r // 2]  # [B,1,S,r/2]
    sin = sin[:, None, :, : r // 2]
    out = apply_rotary(x, cos, sin, r, interleaved)
    if three_d:
        out = out.transpose(0, 2, 1, 3).reshape(orig)
    return out


def apply_rotary(x, cos, sin, r, interleaved):
    """Rotate the leading `r` lanes of each head of x [B,H,S,D] by
    cos/sin [B|1, 1, S, r/2]. Shared by ai.onnx-23 RotaryEmbedding,
    com.microsoft::RotaryEmbedding, and GroupQueryAttention's fused
    rotary path."""
    import jax.numpy as jnp

    d = x.shape[-1]
    xr, rest = x[..., :r], x[..., r:]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
    else:
        x1, x2 = xr[..., : r // 2], xr[..., r // 2:]
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    if interleaved:
        rot = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        rot = jnp.concatenate([o1, o2], axis=-1)
    out = jnp.concatenate([rot, rest], axis=-1) if r < d else rot
    return out.astype(x.dtype)


@op("Swish", foldable=False)
def swish(ctx: OpContext, x):
    """Swish (opset 22): x·sigmoid(alpha·x)."""
    import jax

    alpha = float(ctx.attr("alpha", 1.0))
    return x * jax.nn.sigmoid(alpha * x)


@op("TensorScatter", foldable=False)
def tensor_scatter(ctx: OpContext, past_cache, update, write_indices=None):
    """ONNX TensorScatter (opset 24): write `update` into `past_cache`
    along `axis` starting at per-batch `write_indices` (default 0) —
    the KV-cache append. mode="linear" assumes in-bounds; "circular"
    wraps indices mod max_seq. Lowers to a vmapped dynamic_update_slice
    (linear) / mod-indexed scatter (circular), both donation-friendly."""
    import jax
    import jax.numpy as jnp

    axis = int(ctx.attr("axis", -2))
    mode = ctx.attr("mode", "linear")
    nd = past_cache.ndim
    axis = axis % nd
    if axis == 0:
        raise ValueError(
            "TensorScatter: axis 0 is the batch dimension write_indices "
            "indexes over; the sequence axis must be ≥1"
        )
    b = past_cache.shape[0]
    max_seq = past_cache.shape[axis]
    s = update.shape[axis]
    if write_indices is None:
        write_indices = jnp.zeros((b,), jnp.int32)
    write_indices = jnp.asarray(write_indices).astype(jnp.int32)

    if mode == "circular":
        pos = (write_indices[:, None] + jnp.arange(s)[None, :]) % max_seq
        idx = pos  # [B, S]

        def upd(cache_b, upd_b, idx_b):
            # move axis to front (per-batch tensors have axis-1)
            a = axis - 1
            c = jnp.moveaxis(cache_b, a, 0)
            u = jnp.moveaxis(upd_b, a, 0)
            c = c.at[idx_b].set(u)
            return jnp.moveaxis(c, 0, a)

        return jax.vmap(upd)(past_cache, update, idx)

    def upd_lin(cache_b, upd_b, w):
        starts = [0] * (nd - 1)
        starts[axis - 1] = w
        return jax.lax.dynamic_update_slice(cache_b, upd_b, tuple(starts))

    return jax.vmap(upd_lin)(past_cache, update, write_indices)


@op("AffineGrid", foldable=False, static_args=(1,))
def affine_grid(ctx: OpContext, theta, size):
    """ONNX AffineGrid (opset 20): sampling grid from batched affine
    matrices (theta [N,2,3] / [N,3,4]), for GridSample. `size` is static
    (N,C,H,W) or (N,C,D,H,W); align_corners follows the torch rule."""
    import jax.numpy as jnp

    size = [int(v) for v in np.asarray(size).reshape(-1)]
    align = bool(ctx.attr("align_corners", 0))
    spatial = size[2:]

    def axis_coords(n):
        if align:
            return jnp.linspace(-1.0, 1.0, n) if n > 1 else jnp.zeros((1,))
        # pixel centers of an n-cell grid over [-1, 1]
        step = 2.0 / n
        return -1.0 + step / 2 + step * jnp.arange(n)

    # grid coordinates ordered (x, y[, z]) per spec = reversed spatial dims
    axes = [axis_coords(n) for n in spatial]
    mesh = jnp.meshgrid(*axes, indexing="ij")  # each [*spatial]
    ones = jnp.ones_like(mesh[0])
    # homogeneous coords (x, y[, z], 1): x varies along the LAST spatial dim
    coords = jnp.stack(list(reversed(mesh)) + [ones], axis=-1)  # [*sp, d+1]
    # theta [N, d, d+1] @ coords^T → [N, *spatial, d]
    out = jnp.einsum("...i,ndi->n...d", coords.astype(theta.dtype), theta)
    return out
