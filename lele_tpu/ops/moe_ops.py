"""com.microsoft Mixture-of-Experts ops: MoE and QMoE.

The published MoE LLM ONNX releases (Phi-3.5-MoE-instruct-onnx, Mixtral
GenAI builds) carry their expert MLPs as single fused nodes:
``com.microsoft::MoE`` (float experts) / ``QMoE`` (4/8-bit quantized
experts with per-column scales). ORT executes them with hand-written CUDA
dispatch kernels; the reference has no analog (its product is running
published exports end-to-end, /root/reference/crates/lele-build/src/
lib.rs:72-135 — these nodes are what that product needs on TPU for the
MoE checkpoints).

TPU-first design, two static-shape lowerings chosen by the row count:

- **decode path** (rows·k ≤ experts): gather the k selected experts'
  weights per row (`jnp.take` over the expert axis) and run one batched
  matmul — k FFNs per row instead of all E. For QMoE the gather happens
  on the PACKED bytes + scales and only the gathered rows are
  dequantized (the GatherBlockQuantized discipline: never materialize
  the full dequantized expert stack).
- **prefill path**: a statically-unrolled loop over experts; each expert
  computes its FFN over all rows and is accumulated under its routing
  weight (`where`-masked). Same FLOPs as the one-hot dispatch einsum but
  keeps each expert's weights a single MXU operand; XLA overlaps the
  E-way sequence.

Both paths are numerically identical (tests drive both). Routing follows
ORT: `router_probs` is the LOGITS tensor (the name is historical);
standard mode takes softmax → top-k (optionally re-normalized over the
selected k); `use_sparse_mixer=1` implements the SparseMixer-v2
inference rule used by Phi-3.5-MoE (top-1 over a relative-margin-masked
softmax, then the same for the runner-up with the winner scattered to
−inf; fixed margin 2·0.01).
"""

from __future__ import annotations

from .math_ops import _prec
from .registry import OpContext, op

_SPARSE_MIXER_EPS = 0.01  # fixed in ORT's kernel and HF PhiMoE inference


def _softmax(x, axis=-1):
    import jax.numpy as jnp

    f32 = jnp.promote_types(x.dtype, jnp.float32)
    x = x.astype(f32)
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def _sparse_mixer_round(logits, masked):
    """One SparseMixer selection round over `masked` (logits with already-
    selected experts at -inf): pick argmax, softmax over the entries whose
    relative margin to the max is within 2·eps, return (weight, index)."""
    import jax.numpy as jnp

    thr = jnp.max(masked, axis=-1, keepdims=True)
    ind = jnp.argmax(masked, axis=-1)
    factor = jnp.maximum(jnp.abs(logits), thr)
    drop = (thr - masked) / factor > 2 * _SPARSE_MIXER_EPS
    gates = _softmax(jnp.where(drop, -jnp.inf, masked))
    w = jnp.take_along_axis(gates, ind[:, None], axis=-1)[:, 0]
    return w, ind.astype(jnp.int32)


def route_topk(logits, k, use_sparse_mixer=False, normalize=False):
    """The MoE routing rule over [rows, E] logits → (weights [rows,k]
    f32, experts [rows,k] i32). Shared by the op emitters and the
    compile-time qmoe_w4 pattern."""
    import jax.numpy as jnp

    n_experts = logits.shape[-1]
    if use_sparse_mixer:
        if k != 2:
            raise NotImplementedError(
                f"MoE: use_sparse_mixer requires k=2 (got k={k}) — the "
                "SparseMixer rule is defined for top-2 routing"
            )
        f32 = jnp.promote_types(logits.dtype, jnp.float32)
        lg = logits.astype(f32)
        w1, e1 = _sparse_mixer_round(lg, lg)
        masked = jnp.where(
            jnp.arange(n_experts)[None, :] == e1[:, None], -jnp.inf, lg)
        w2, e2 = _sparse_mixer_round(lg, masked)
        return (jnp.stack([w1, w2], axis=-1),
                jnp.stack([e1, e2], axis=-1))
    probs = _softmax(logits)
    w, e = jax_top_k(probs, k)
    if normalize:
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w, e.astype(jnp.int32)


def _route(ctx, logits, n_experts):
    return route_topk(logits, int(ctx.attr("k", 1)),
                      bool(int(ctx.attr("use_sparse_mixer", 0))),
                      bool(int(ctx.attr("normalize_routing_weights", 0))))


def jax_top_k(x, k):
    import jax

    return jax.lax.top_k(x, k)


def apply_activation(act, h):
    import jax

    if act == "relu":
        return jax.numpy.maximum(h, 0)
    if act == "gelu":
        return jax.nn.gelu(h, approximate=False)
    if act == "silu":
        return jax.nn.silu(h)
    if act == "identity":
        return h
    raise NotImplementedError(
        f"MoE: activation_type={act!r} is not supported (relu/gelu/silu/"
        "identity; gated exports carry the gate as fc3_experts_weights)"
    )


def _activation(ctx, h):
    act = ctx.attr("activation_type", "relu")
    if isinstance(act, bytes):
        act = act.decode()
    return apply_activation(act, h)


def _ffn(ctx, x, w1, b1, w2, b2, w3, b3, contract):
    """One expert-FFN application. `contract` is the einsum spec binding
    x's rows to the weight stack ('rh,rhi->ri' for the per-row gathered
    stack, 'rh,hi->ri' for a single expert); the fc2 matmul uses the same
    spec with the intermediate dim contracted ([*, inter, hidden])."""
    import jax.numpy as jnp

    h = jnp.einsum(contract, x, w1, precision=_prec(),
                   preferred_element_type=jnp.float32)
    if b1 is not None:
        h = h + b1
    h = _activation(ctx, h)
    if w3 is not None:
        g = jnp.einsum(contract, x, w3, precision=_prec(),
                       preferred_element_type=jnp.float32)
        if b3 is not None:
            g = g + b3
        h = h * g
    y = jnp.einsum(contract, h.astype(x.dtype), w2, precision=_prec(),
                   preferred_element_type=jnp.float32)
    if b2 is not None:
        y = y + b2
    return y


def _moe_core(ctx, x, logits, experts_w, dequant):
    """Shared MoE/QMoE body. experts_w = (w1,b1,w2,b2,w3,b3) with the
    weight stacks still in storage form; `dequant(stack, which)` maps a
    (possibly gathered) storage stack to float [..., in, out]."""
    import jax.numpy as jnp

    orig_shape = x.shape
    hidden = orig_shape[-1]
    x2 = x.reshape(-1, hidden)
    rows = x2.shape[0]
    w1s, b1, w2s, b2, w3s, b3 = experts_w
    n_experts = w1s.shape[0]
    weights, experts = _route(ctx, logits.reshape(rows, n_experts),
                              n_experts)
    k = weights.shape[-1]

    if rows * k <= n_experts:
        # decode path: gather the selected experts' weights per (row, k)
        flat = experts.reshape(-1)  # [rows*k]
        xk = jnp.repeat(x2, k, axis=0)  # [rows*k, hidden]
        w1 = dequant(jnp.take(w1s, flat, axis=0), 0)
        w2 = dequant(jnp.take(w2s, flat, axis=0), 1)
        w3 = None if w3s is None else dequant(jnp.take(w3s, flat, axis=0),
                                              2)
        g1 = None if b1 is None else jnp.take(b1, flat, axis=0)
        g2 = None if b2 is None else jnp.take(b2, flat, axis=0)
        g3 = None if b3 is None else jnp.take(b3, flat, axis=0)
        y = _ffn(ctx, xk, w1, g1, w2, g2, w3, g3, "rh,rhi->ri")
        y = y.reshape(rows, k, hidden) * weights[..., None].astype(y.dtype)
        out = jnp.sum(y, axis=1)
    else:
        # prefill path: statically-unrolled expert loop, masked accumulate
        out = jnp.zeros((rows, hidden), jnp.float32)
        for e in range(n_experts):
            w1 = dequant(w1s[e], 0)
            w2 = dequant(w2s[e], 1)
            w3 = None if w3s is None else dequant(w3s[e], 2)
            y = _ffn(ctx, x2, w1,
                     None if b1 is None else b1[e],
                     w2, None if b2 is None else b2[e],
                     w3, None if b3 is None else b3[e], "rh,hi->ri")
            gate = jnp.sum(
                jnp.where(experts == e, weights, 0.0), axis=-1)
            out = out + y * gate[:, None].astype(y.dtype)
    return out.astype(x.dtype).reshape(orig_shape)


@op("MoE", foldable=False, domain="com.microsoft")
def moe(ctx: OpContext, x, router_probs, fc1_w, fc1_b=None, fc2_w=None,
        fc2_b=None, fc3_w=None, fc3_b=None):
    """com.microsoft::MoE — float mixture-of-experts MLP.

    x [rows, hidden] or [B, S, hidden]; router_probs [rows, num_experts]
    (logits); fc1_experts_weights [E, hidden, inter] (+ optional bias
    [E, inter]); fc2_experts_weights [E, inter, hidden]; optional
    fc3_experts_weights [E, hidden, inter] is the gate branch multiplied
    into the activated fc1 output (the Mixtral/PhiMoE w1/w3 form).
    """
    if fc2_w is None:
        raise ValueError("MoE requires fc2_experts_weights")
    return _moe_core(ctx, x, router_probs,
                     (fc1_w, fc1_b, fc2_w, fc2_b, fc3_w, fc3_b),
                     lambda w, which: w)


@op("QMoE", foldable=False, domain="com.microsoft")
def qmoe(ctx: OpContext, x, router_probs, fc1_w, fc1_scales, fc1_b=None,
         fc2_w=None, fc2_scales=None, fc2_b=None, fc3_w=None,
         fc3_scales=None, fc3_b=None):
    """com.microsoft::QMoE — MoE with 4/8-bit symmetric-quantized experts
    (the Phi-3.5-MoE-instruct ONNX release's node).

    Weight stacks are uint8 storage: `expert_weight_bits=8` stores one
    value per byte, zero point 128; `=4` packs two per byte along the
    trailing (output) axis, low nibble first, zero point 8. Scales are
    per expert × per output column ([E, inter] / [E, hidden]). Dequant
    happens AFTER expert gather on the decode path — only selected
    experts' bytes are expanded.
    """
    if fc2_w is None or fc2_scales is None:
        raise ValueError("QMoE requires fc2_experts_weights and fc2_scales")
    if fc3_w is not None and fc3_scales is None:
        raise ValueError("QMoE: fc3_experts_weights requires fc3_scales")
    bits = int(ctx.attr("expert_weight_bits", 4))
    if bits not in (4, 8):
        raise NotImplementedError(
            f"QMoE: expert_weight_bits={bits} (must be 4 or 8)")
    zp = 1 << (bits - 1)
    return _qmoe_core(ctx, x, router_probs, bits, zp,
                      (fc1_w, fc1_scales, fc1_b),
                      (fc2_w, fc2_scales, fc2_b),
                      None if fc3_w is None else (fc3_w, fc3_scales,
                                                  fc3_b))


def _q_mm(x, wq, s, bits, zp, contract):
    """Quantized matmul keeping the packed bytes as the HBM operand.

    4-bit: the nibble interleave (`stack([lo,hi],-1).reshape`) on the
    WEIGHT is the known XLA fusion-killer (the MatMulNBits r4 finding —
    it forces a materialized f32 weight). QMoE packs along the OUTPUT
    axis, so the repair is plane-split matmuls: output columns 2j come
    from the lo-nibble plane and 2j+1 from the hi plane — run one matmul
    per plane (dequant fuses into the operand read as a pure elementwise
    chain) and interleave the SMALL activation output instead.
    """
    import jax.numpy as jnp

    def col(t, sl):  # scale columns broadcast over the input axis
        return jnp.expand_dims(t[..., sl], axis=-2).astype(jnp.float32)

    if bits == 8:
        w = (wq.astype(jnp.float32) - zp) * col(s, slice(None))
        return jnp.einsum(contract, x, w, precision=_prec(),
                          preferred_element_type=jnp.float32)
    lo = ((wq & 0xF).astype(jnp.float32) - zp) * col(s, slice(0, None, 2))
    hi = ((wq >> 4).astype(jnp.float32) - zp) * col(s, slice(1, None, 2))
    h_lo = jnp.einsum(contract, x, lo, precision=_prec(),
                      preferred_element_type=jnp.float32)
    h_hi = jnp.einsum(contract, x, hi, precision=_prec(),
                      preferred_element_type=jnp.float32)
    return jnp.stack([h_lo, h_hi], axis=-1).reshape(
        *h_lo.shape[:-1], h_lo.shape[-1] * 2)


def _q_ffn(ctx, x, fc1, fc2, fc3, bits, zp, contract):
    """The QMoE expert FFN over packed stacks: fcN = (bytes, scales,
    bias) already gathered/sliced to match `contract`."""
    h = _q_mm(x, fc1[0], fc1[1], bits, zp, contract)
    if fc1[2] is not None:
        h = h + fc1[2]
    h = _activation(ctx, h)
    if fc3 is not None:
        g = _q_mm(x, fc3[0], fc3[1], bits, zp, contract)
        if fc3[2] is not None:
            g = g + fc3[2]
        h = h * g
    y = _q_mm(h.astype(x.dtype), fc2[0], fc2[1], bits, zp, contract)
    if fc2[2] is not None:
        y = y + fc2[2]
    return y


def _qmoe_core(ctx, x, logits, bits, zp, fc1, fc2, fc3):
    import jax.numpy as jnp

    orig_shape = x.shape
    hidden = orig_shape[-1]
    x2 = x.reshape(-1, hidden)
    rows = x2.shape[0]
    n_experts = fc1[0].shape[0]
    weights, experts = _route(ctx, logits.reshape(rows, n_experts),
                              n_experts)
    k = weights.shape[-1]

    def pick(fc, flat):
        w, s, b = fc
        return (jnp.take(w, flat, axis=0), jnp.take(s, flat, axis=0),
                None if b is None else jnp.take(b, flat, axis=0))

    if rows * k <= n_experts:
        flat = experts.reshape(-1)
        xk = jnp.repeat(x2, k, axis=0)
        y = _q_ffn(ctx, xk, pick(fc1, flat), pick(fc2, flat),
                   None if fc3 is None else pick(fc3, flat), bits, zp,
                   "rh,rhi->ri")
        y = y.reshape(rows, k, hidden) * weights[..., None].astype(y.dtype)
        out = jnp.sum(y, axis=1)
    else:
        def sl(fc, e):
            w, s, b = fc
            return (w[e], s[e], None if b is None else b[e])

        out = jnp.zeros((rows, hidden), jnp.float32)
        for e in range(n_experts):
            y = _q_ffn(ctx, x2, sl(fc1, e), sl(fc2, e),
                       None if fc3 is None else sl(fc3, e), bits, zp,
                       "rh,hi->ri")
            gate = jnp.sum(jnp.where(experts == e, weights, 0.0), axis=-1)
            out = out + y * gate[:, None].astype(y.dtype)
    return out.astype(x.dtype).reshape(orig_shape)
