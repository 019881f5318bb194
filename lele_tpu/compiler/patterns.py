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


def matmul_nbits_w4(tracer, state, nodes, i, env, scope):
    """Route com.microsoft::MatMulNBits (bits=4, no g_idx) through the
    native w4a16 Pallas kernel (kernels/w4_matmul.py) on TPU.

    Why a pattern and not the emitter: XLA:TPU *can* fuse the nibble
    dequant into the dot (the emitter's deinterleaved form measures
    temp=0), but the fused dequant runs on the VPU inside the dot's
    operand read and measures SLOWER than streaming dense f32 weights
    (137 µs vs 94 µs at M8/K4096/N4096 — the 0.5 byte/weight bandwidth
    win is eaten 2.3× over by convert/scale VPU work in XLA's schedule).
    The Pallas kernel performs the in-register dequant explicitly with
    MXU dots overlapping the weight stream, the layout the kernel was
    built for. Patterns are the repo's mechanism for trace-time weight
    preparation (the PreparedWeights concept — see dql_matmul_dataflow),
    which this needs: the ORT blob layout [N, kb, block/2] with
    K-adjacent nibble pairs re-packs ON THE HOST, once at compile, into
    the kernel's [K/2, N] low/high-plane layout — still 0.5 byte/weight
    on the device.

    Activations run bf16 by default (the kernel's group-accumulator
    fast form: ~roofline weight stream, 13× dense-f32 at decode shapes —
    kernels/w4_matmul.py header). bf16 is the TPU-native a16: the
    published int4 checkpoints this op family exists for are fp16-
    activation models, so a16 precision is what their own ORT-CUDA
    kernels compute in. `LELE_NBITS_F32=1` keeps activations f32
    (numerics-exact w4a32 form, ~8× slower) for graphs that genuinely
    carry f32 semantics. Accumulation and the zero-point residual stay
    f32 either way.

    The ORT asymmetric zero point folds algebraically instead of costing
    kernel VPU ops: with q∈[0,15], (q−zp)·s = (q−8)·s + (8−zp)·s, where
    q−8 fits the kernel's signed int4 plane, and the residual
    Σₖ x[m,k]·(8−zp[n,g(k)])·s[n,g(k)] is a [M,KB]·[KB,N] dot over
    block-sums of x — KB = K/block rows, ~block× smaller than the main
    dot, and skipped entirely for the RTN default zp=8.

    Eligibility: TPU (LELE_NBITS_PALLAS=1 forces for CPU tests — the
    kernel's guarded entry falls to identical-math jnp off-TPU; =0
    disables), float activation, static weights/scales/zp, bits=4, no
    g_idx, K a multiple of 2·block so the planes align to scale groups,
    block ≤ 512 so a kernel tile exists. Anything else keeps the
    emitter's fused-XLA form (ops/contrib_ops.py).
    """
    node = nodes[i]
    if node.op_type != "MatMulNBits":
        return None
    from ..ops.registry import canon_domain

    if canon_domain(node.domain) != "com.microsoft":
        return None
    import os

    flag = os.environ.get("LELE_NBITS_PALLAS", "")
    if flag == "0":
        return None
    if flag != "1":
        import jax

        if jax.devices()[0].platform != "tpu":
            return None
    if int(_node_attr(node, "bits", 4)) != 4:
        return None
    K = int(_node_attr(node, "K"))
    N = int(_node_attr(node, "N"))
    block = int(_node_attr(node, "block_size"))
    if block < 2 or block % 2 or block > 512 or K % (2 * block):
        return None
    ins = list(node.input) + [""] * (6 - len(node.input))
    a = env.get(ins[0])
    b = env.get(ins[1])
    sc = env.get(ins[2])
    zp = env.get(ins[3]) if ins[3] else None
    gidx = env.get(ins[4]) if ins[4] else None
    bias = env.get(ins[5]) if ins[5] else None
    if gidx is not None:
        return None
    if a is None or _is_static(a):
        return None  # static activation: fold/eager path handles it
    if not (_is_static(b) and _is_static(sc)):
        return None
    if zp is not None and not _is_static(zp):
        return None
    adt = a.dtype
    if not np.issubdtype(np.dtype(adt), np.floating):
        return None
    KB = K // block
    b_np = np.asarray(b)
    if b_np.size != N * K // 2 or b_np.dtype != np.uint8:
        return None
    # host repack: ORT K-adjacent nibble pairs → kernel low/high K-halves
    bq = b_np.reshape(N, KB, block // 2)
    q = np.stack([bq & 0x0F, bq >> 4], axis=-1).reshape(N, K)
    q = (q.astype(np.int8) - 8).T  # recentered signed int4, [K, N]
    half = K // 2
    packed = ((q[:half] & 0x0F) | (q[half:] << 4)).astype(np.int8)
    sc_np = np.asarray(sc).astype(np.float32).reshape(N, KB)
    s_t = np.ascontiguousarray(sc_np.T)  # [K/block, N], kernel layout

    from ..ops.contrib_ops import _nbits_zp

    zp2 = _nbits_zp(np, zp, 4, N, KB)
    c_np = (np.float32(8.0) - zp2) * sc_np  # recentering residual

    import jax.numpy as jnp

    from ..kernels.w4_matmul import w4_matmul

    packed_dev = state.to_device(scope + ins[1] + "::w4pk", packed)
    s_dev = state.to_device(scope + ins[1] + "::w4s", s_t)
    lead = a.shape[:-1]
    x2 = a.reshape(-1, K)
    if os.environ.get("LELE_NBITS_F32", "") == "1":
        xk = x2.astype(jnp.float32)
    else:
        xk = x2.astype(jnp.bfloat16)
    out = w4_matmul(xk, packed_dev, s_dev, group=block)
    if np.ndim(c_np) and np.any(c_np):
        c_dev = state.to_device(
            scope + ins[1] + "::w4zc",
            np.ascontiguousarray(c_np.T.astype(np.float32)))
        xs = x2.astype(jnp.float32).reshape(x2.shape[0], KB, block).sum(-1)
        out = out + jnp.matmul(xs, c_dev,
                               preferred_element_type=jnp.float32)
    out = out.reshape(*lead, N).astype(adt)
    if bias is not None:
        if _is_static(bias):
            bias = state.to_device(scope + ins[5] + "::w4b",
                                   np.asarray(bias))
        out = out + bias
    state.pattern_hits["matmul_nbits_w4"] = (
        state.pattern_hits.get("matmul_nbits_w4", 0) + 1
    )
    return 1, {node.output[0]: out}


def _qmoe_repack(wq):
    """QMoE expert stack [E, K, N/2] u8 (nibbles adjacent along the OUT
    axis, low first, zp 8) → the w4 kernel's [E, K/2, N] i8 low/high
    K-plane layout (recentered signed int4)."""
    E, K, half_n = wq.shape
    N = half_n * 2
    q = np.empty((E, K, N), np.int8)
    q[..., 0::2] = (wq & 0x0F).astype(np.int8) - 8
    q[..., 1::2] = (wq >> 4).astype(np.int8) - 8
    half = K // 2
    packed = ((q[:, :half] & 0x0F)
              | (q[:, half:].astype(np.uint8) << 4)).astype(np.int8)
    return packed


def _qmoe_group(K):
    """Largest kernel-friendly scale group dividing K/2 (QMoE scales are
    per-output-column — constant along K — so ANY group tiling works)."""
    half = K // 2
    for g in (128, 64, 32, 16, 8, 4, 2, 1):
        if half % g == 0:
            return g
    return 1


def qmoe_w4(tracer, state, nodes, i, env, scope):
    """Route com.microsoft::QMoE's DECODE path (rows·k ≤ experts) through
    the w4a16 Pallas kernel.

    Same rationale as matmul_nbits_w4: XLA fuses the plane-split dequant
    (ops/moe_ops.py) but runs it on the VPU inside the dot's operand
    read — measured 251 µs/step at scaled Phi-3.5-MoE decode geometry
    where the selected experts' packed bytes stream in ~25 µs of HBM
    time. Here the expert stacks repack ON THE HOST at compile time into
    the kernel's [K/2, N] plane layout ([E, ...] stacked, still 0.5
    byte/weight on device); at run time the routed expert indices pick
    slices by `dynamic_index_in_dim` (a dynamic-slice of the packed
    bytes — the GatherBlockQuantized discipline) and each (row, slot)
    runs the kernel's bf16 group-accumulator form. QMoE is symmetric
    (zp = 8), so the recentering leaves NO zero-point residual.

    Eligibility: TPU (LELE_QMOE_PALLAS=1 forces the route for CPU parity
    tests via the kernel's guarded jnp fallback; =0 disables), bits=4,
    no expert biases, static weight/scale stacks, dynamic float input,
    rows·k ≤ E (prefill keeps the emitter's unrolled masked-accumulate).
    LELE_NBITS_F32=1 keeps activations f32 (exact w4a32).
    """
    node = nodes[i]
    if node.op_type != "QMoE":
        return None
    from ..ops.registry import canon_domain

    if canon_domain(node.domain) != "com.microsoft":
        return None
    import os

    flag = os.environ.get("LELE_QMOE_PALLAS", "")
    if flag == "0":
        return None
    if flag != "1":
        import jax

        if jax.devices()[0].platform != "tpu":
            return None
    if int(_node_attr(node, "expert_weight_bits", 4)) != 4:
        return None
    k = int(_node_attr(node, "k", 1))
    act = _node_attr(node, "activation_type", "relu")
    if isinstance(act, bytes):
        act = act.decode()
    ins = list(node.input) + [""] * (11 - len(node.input))
    x = env.get(ins[0])
    logits = env.get(ins[1])
    if x is None or logits is None or _is_static(x):
        return None
    if ins[4] or ins[7] or ins[10]:
        return None  # expert biases: keep the emitter path
    stacks = []
    for wi, si in ((2, 3), (5, 6), (8, 9)):
        if not ins[wi]:
            stacks.append(None)
            continue
        w = env.get(ins[wi])
        s = env.get(ins[si]) if ins[si] else None
        if w is None or s is None or not (_is_static(w) and _is_static(s)):
            return None
        stacks.append((np.asarray(w), np.asarray(s)))
    if stacks[0] is None or stacks[1] is None:
        return None
    if not np.issubdtype(np.dtype(x.dtype), np.floating):
        return None
    E = stacks[0][0].shape[0]
    hidden = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= int(d)
    if rows * k > E or any(
            st is not None and (st[0].dtype != np.uint8 or st[0].ndim != 3)
            for st in stacks):
        return None

    import jax
    import jax.numpy as jnp

    from ..kernels.w4_matmul import w4_matmul
    from ..ops.moe_ops import apply_activation, route_topk

    devs = []
    for idx, st in enumerate(stacks):
        if st is None:
            devs.append(None)
            continue
        w, s = st
        K = w.shape[1]
        g = _qmoe_group(K)
        packed = _qmoe_repack(w)
        sc = np.broadcast_to(
            s.astype(np.float32)[:, None, :],
            (E, K // g, s.shape[-1])).copy()
        devs.append((
            state.to_device(scope + ins[(2, 5, 8)[idx]] + "::qw4", packed),
            state.to_device(scope + ins[(2, 5, 8)[idx]] + "::qw4s", sc),
            g,
        ))

    weights, experts = route_topk(
        logits.reshape(rows, E).astype(jnp.float32), k,
        bool(int(_node_attr(node, "use_sparse_mixer", 0))),
        bool(int(_node_attr(node, "normalize_routing_weights", 0))))
    x2 = x.reshape(rows, hidden)
    xk = (x2.astype(jnp.float32)
          if os.environ.get("LELE_NBITS_F32", "") == "1"
          else x2.astype(jnp.bfloat16))

    def mm(h, dev, e):
        pk = jax.lax.dynamic_index_in_dim(dev[0], e, 0, keepdims=False)
        sc = jax.lax.dynamic_index_in_dim(dev[1], e, 0, keepdims=False)
        return w4_matmul(h, pk, sc, group=dev[2])

    row_outs = []
    for r in range(rows):
        acc = jnp.zeros((hidden,), jnp.float32)
        xr = xk[r: r + 1]
        for s_ in range(k):
            e = experts[r, s_]
            h = apply_activation(act, mm(xr, devs[0], e))
            if devs[2] is not None:
                h = h * mm(xr, devs[2], e)
            y = mm(h.astype(xk.dtype), devs[1], e)
            acc = acc + weights[r, s_].astype(jnp.float32) * y[0]
        row_outs.append(acc)
    out = jnp.stack(row_outs).reshape(x.shape).astype(x.dtype)
    state.pattern_hits["qmoe_w4"] = (
        state.pattern_hits.get("qmoe_w4", 0) + 1)
    return 1, {node.output[0]: out}


DEFAULT_PATTERNS: list = [dql_matmul_dataflow, matmul_nbits_w4, qmoe_w4]

# Whole-layer SAN-M fusion (compiler/sanm_fuse.py) must run BEFORE the
# per-linear DQL pattern so it can claim entire transformer layers; the
# DQL pattern then handles whatever the layer matcher declined. (Import at
# the bottom: sanm_fuse uses this module's helpers.)
from .sanm_fuse import sanm_stack_dataflow  # noqa: E402

DEFAULT_PATTERNS.insert(0, sanm_stack_dataflow)
