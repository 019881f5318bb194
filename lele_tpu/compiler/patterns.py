"""Multi-node pattern rewrites (peephole fusion hooks).

The reference needs ten hand-written fusion patterns (patterns.rs:4 —
LayerNorm, quantized Linear±ReLU, Conv+SiLU chains, …) because its codegen
emits one kernel call per node. Under XLA most of those fusions are
automatic, so the default pattern list is intentionally small (SURVEY.md §7:
"keep explicit rewrites only where they change numerics/layout"):

- ``dql_matmul_dataflow``: DynamicQuantizeLinear → MatMulInteger (+ the
  Cast/Mul dequant epilogue) regrouped by CONSUMER-GRAPH SEARCH, not node
  adjacency — real int8 exports interleave chain nodes, which is why the
  reference dedicates a reorder pass to chain grouping
  (/root/reference/src/compiler/mod.rs:865-990). Matching follows dataflow
  edges anywhere later in the node list, weights pre-shift to i8 with
  zero-point col-sums at trace time (the PreparedWeights concept,
  neon/quantization.rs:24), and the dot runs fused (Pallas on TPU via the
  guarded kernels/quant_matmul.fused_dq_matmul).

A pattern is ``fn(tracer, state, nodes, i, env, scope) -> None | (consumed,
{output_name: value})``. Returning None means "no match"; the tracer then
falls through to override/builtin dispatch (generate.rs:818-831 precedence).
``consumed`` is either an int (advance that many nodes) or a collection of
absolute node indices to skip (dataflow patterns consume non-contiguous
nodes). Every bound value must equal what normal tracing would produce —
patterns are optimizations, never semantic changes. User patterns prepend
via ``Compiler.with_pattern`` in the build API.
"""

from __future__ import annotations

import numpy as np


def _node_attr(node, name, default=None):
    from ..ops.registry import parse_attr

    for a in node.attribute:
        if a.name == name:
            return parse_attr(a)
    return default


def _is_static(v) -> bool:
    return v is None or isinstance(v, (np.ndarray, np.generic))


def _dataflow_index(tracer, nodes):
    """(consumers, producers) for a node list: name → consumer indices /
    producing index. Built ONCE per graph walk and cached on the tracer —
    the tracer materializes `list(graph.node)` once and passes the same
    object to every pattern call, so O(N) scans per pattern attempt become
    O(1) lookups. The cache holds the node list itself (identity-checked):
    keying on id() alone could collide when a freed subgraph list's id is
    reused by a sibling branch."""
    cache = getattr(tracer, "_dataflow_index_cache", None)
    if cache is None:
        cache = tracer._dataflow_index_cache = []
    for entry in cache:  # small identity-keyed LRU: nested If/Loop subgraph
        if entry[0] is nodes:  # walks must not evict the outer graph's index
            return entry[1], entry[2], entry[3]
    cons: dict[str, list[int]] = {}
    prod: dict[str, int] = {}
    captured: set[str] = set()
    for j, n in enumerate(nodes):
        for name in n.input:
            if name:
                lst = cons.setdefault(name, [])
                if not lst or lst[-1] != j:  # one entry per node
                    lst.append(j)
        for name in n.output:
            if name:
                prod[name] = j
        # If/Loop/Scan bodies capture OUTER values implicitly (never listed
        # in node.input); anything a body references must count as escaping
        # so no fusion pattern claims it as chain-internal
        for a in n.attribute:
            if a.type == 5:  # single GraphProto attr
                _collect_subgraph_refs(a.g, captured)
            elif a.type == 10:  # repeated GraphProto attr
                for g in a.graphs:
                    _collect_subgraph_refs(g, captured)
    cache.insert(0, (nodes, cons, prod, captured))
    del cache[4:]
    return cons, prod, captured


def _collect_subgraph_refs(g, out: set) -> None:
    """Names a subgraph reads that it does not itself produce (recursive)."""
    local = {vi.name for vi in g.input} | {t.name for t in g.initializer}
    for n in g.node:
        for name in n.input:
            if name and name not in local:
                out.add(name)
        for name in n.output:
            if name:
                local.add(name)
        for a in n.attribute:
            if a.type == 5:
                _collect_subgraph_refs(a.g, out)
            elif a.type == 10:
                for gg in a.graphs:
                    _collect_subgraph_refs(gg, out)


def dql_matmul_dataflow(tracer, state, nodes, i, env, scope):
    """Fuse DynamicQuantizeLinear-rooted int8 matmul chains via dataflow.

    At a DQL node, every MatMulInteger consuming its quantized output —
    anywhere later, interleaved or not — is fused: the activation quantizes
    once, weights/zero-points pre-pack at trace time, and when the standard
    Cast→Mul(scale) dequant epilogue is found it folds into the fused
    f32 GEMM (kernels/quant_matmul.fused_dq_matmul: Pallas on TPU).
    Consumers the epilogue search can't claim still get the int8-dot int32
    result with hoisted col-sums. DQL outputs (q/scale/zp) are always bound,
    so unrelated consumers keep exact ONNX semantics and XLA DCEs what's
    unused.
    """
    node = nodes[i]
    if node.op_type != "DynamicQuantizeLinear":
        return None
    a = env[node.input[0]]
    if _is_static(a):
        return None  # fully static — normal folding handles it
    q_name, scale_name, zp_name = (list(node.output) + ["", ""])[:3]

    cons_map, prod_map, captured = _dataflow_index(tracer, nodes)
    escapes = state.graph_outputs | captured

    # every MatMulInteger fed by our quantized activation, with static
    # weight/zero-points and our zp (or ONNX's default 0) as the
    # activation zero point
    matches = []
    for j in cons_map.get(q_name, []):
        if j <= i:
            continue
        mmi = nodes[j]
        if mmi.op_type != "MatMulInteger" or mmi.input[0] != q_name:
            continue
        b = env.get(mmi.input[1])
        azp_n = mmi.input[2] if len(mmi.input) > 2 else ""
        bzp_n = mmi.input[3] if len(mmi.input) > 3 else ""
        bzp = env.get(bzp_n) if bzp_n else None
        if b is None or not _is_static(b) or np.ndim(b) != 2:
            continue
        if azp_n and azp_n != zp_name:
            continue
        if bzp_n and not _is_static(bzp):
            continue
        matches.append((j, mmi, b, bzp, bool(azp_n)))
    if not matches:
        return None

    import jax.numpy as jnp

    from ..kernels.quant_matmul import dynamic_quantize_u8, fused_dq_matmul

    q_f, a_scale, a_zp_f = dynamic_quantize_u8(a)
    results = {q_name: q_f.astype(jnp.uint8)}
    if scale_name:
        results[scale_name] = a_scale
    if zp_name:
        results[zp_name] = a_zp_f.astype(jnp.uint8)
    consumed = {i}
    ai = (q_f - 128.0).astype(jnp.int8)  # u8→i8 domain shift (XLA CSEs)
    a_zp_i = (a_zp_f - 128.0).astype(jnp.int32)

    for j, mmi, b, bzp, azp_present in matches:
        mm_out = mmi.output[0]
        # prepared weights at trace time: i8 shift + zero-point col-sums
        b_np = np.asarray(b)
        if b_np.dtype == np.uint8:
            bi_np = (b_np.astype(np.int32) - 128).astype(np.int8)
            bzp_i = (np.asarray(bzp).astype(np.int32) - 128) if bzp is not None \
                else np.int32(-128)
        else:
            bi_np = b_np.astype(np.int8)
            bzp_i = np.asarray(bzp).astype(np.int32) if bzp is not None \
                else np.int32(0)
        colsum_np = bi_np.astype(np.int32).sum(axis=-2)
        bi_dev = state.to_device(scope + mmi.input[1] + "::i8", bi_np)
        colsum_dev = state.to_device(scope + mmi.input[1] + "::colsum", colsum_np)
        clean_bzp = bool(np.all(bzp_i == 0))

        # the fused-dequant epilogue assumes the zero-point-CORRECTED dot;
        # an MMI with azp omitted computes the uncorrected q·w (ONNX
        # default azp=0), so it takes the int32 path below instead
        epi = _match_dequant_epilogue(
            nodes, j, mm_out, env, scale_name, escapes,
            cons_map, prod_map,
        ) if (clean_bzp and azp_present) else None

        if epi is not None:
            jc, jm, jp, mul_out, combined_out, b_scale = epi
            lead = a.shape[:-1]
            out2 = fused_dq_matmul(
                a.reshape(-1, a.shape[-1]).astype(jnp.float32),
                bi_dev, colsum_dev, a_scale, a_zp_f,
                jnp.asarray(np.float32(b_scale)),
            )
            results[mul_out] = out2.reshape(*lead, bi_np.shape[-1])
            consumed.update({j, jc, jm})
            if jp is not None:
                # scalar a_scale×b_scale node: bind (others may read it)
                results[combined_out] = a_scale * jnp.float32(b_scale)
                consumed.add(jp)
            state.pattern_hits["dql_fused_epilogue"] = (
                state.pattern_hits.get("dql_fused_epilogue", 0) + 1
            )
        else:
            # int32-level fusion: exact MatMulInteger semantics with the
            # col-sums precomputed at trace time instead of per forward.
            # azp omitted → ONNX default 0 in u8 domain = -128 in the
            # shifted i8 domain (q·w = (ai+128)·w), NOT the DQL zp
            azp_i = a_zp_i if azp_present else jnp.int32(-128)
            c = jnp.matmul(ai, bi_dev, preferred_element_type=jnp.int32)
            c = c - azp_i * colsum_dev.reshape(
                (1,) * (c.ndim - 1) + (-1,)
            )
            if not clean_bzp:
                k = a.shape[-1]
                rowsum = jnp.sum(ai.astype(jnp.int32), axis=-1, keepdims=True)
                bzp_t = jnp.asarray(bzp_i).reshape(1, -1) if np.ndim(bzp_i) \
                    else jnp.int32(bzp_i)
                c = c - bzp_t * rowsum + k * azp_i * bzp_t
            results[mm_out] = c
            consumed.add(j)
            state.pattern_hits["dql_fused_int32"] = (
                state.pattern_hits.get("dql_fused_int32", 0) + 1
            )

    return consumed, results


def _match_dequant_epilogue(nodes, j, mm_out, env, scale_name, graph_outputs,
                            cons_map, prod_map):
    """Find the standard dequant epilogue of a MatMulInteger by dataflow:
    Cast(int32→f32) → Mul(·, b_scale or Mul(a_scale, b_scale)). Returns
    (cast_idx, mul_idx, combined_idx|None, mul_out, combined_out, b_scale)
    or None. Only claims nodes whose intermediates have no consumers outside
    the chain and aren't graph outputs (we don't materialize them)."""
    if mm_out in graph_outputs:
        return None
    cons = [x for x in cons_map.get(mm_out, []) if x > j]
    if len(cons) != 1 or nodes[cons[0]].op_type != "Cast":
        return None
    jc = cons[0]
    cast = nodes[jc]
    if cast.input[0] != mm_out or _node_attr(cast, "to", 1) != 1:
        return None
    cast_out = cast.output[0]
    if cast_out in graph_outputs:
        return None
    cons = [x for x in cons_map.get(cast_out, []) if x > j]
    if len(cons) != 1 or nodes[cons[0]].op_type != "Mul":
        return None
    jm = cons[0]
    mul = nodes[jm]
    other = mul.input[1] if mul.input[0] == cast_out else mul.input[0]

    # the scale operand must be Mul(a_scale, static b_scale): the DQL
    # activation scale is dynamic by construction, so a STATIC scalar here
    # cannot be the complete dequant scale — fusing it would multiply by a
    # spurious extra a_scale. (Such graphs take the int32 path instead.)
    jp = prod_map.get(other)
    if jp is None or nodes[jp].op_type != "Mul":
        return None
    smul = nodes[jp]
    if scale_name not in smul.input:
        return None
    const_n = smul.input[1] if smul.input[0] == scale_name else smul.input[0]
    cv = env.get(const_n)
    if cv is None or not _is_static(cv) or np.asarray(cv).size != 1:
        return None
    return jc, jm, jp, mul.output[0], smul.output[0], float(np.asarray(cv))


DEFAULT_PATTERNS: list = [dql_matmul_dataflow]

# Whole-layer SAN-M fusion (compiler/sanm_fuse.py) must run BEFORE the
# per-linear DQL pattern so it can claim entire transformer layers; the
# DQL pattern then handles whatever the layer matcher declined. (Import at
# the bottom: sanm_fuse uses this module's helpers.)
from .sanm_fuse import sanm_stack_dataflow  # noqa: E402

DEFAULT_PATTERNS.insert(0, sanm_stack_dataflow)
