"""Multi-node pattern rewrites (peephole fusion hooks).

The reference needs ten hand-written fusion patterns (patterns.rs:4 —
LayerNorm, quantized Linear±ReLU, Conv+SiLU chains, …) because its codegen
emits one kernel call per node. Under XLA most of those fusions are
automatic, so the default pattern list is intentionally small (SURVEY.md §7:
"keep explicit rewrites only where they change numerics/layout"):

- ``dql_matmul_chain``: DynamicQuantizeLinear → (MatMulInteger, Mul-by-scale
  [, Add bias][, Relu]) regrouped so the int8 dot runs through the fused
  Pallas/XLA path with float epilogue — the analog of patterns.rs:122
  "Quantized Linear + ReLU" and the DQL chain grouping in mod.rs:865-990.

A pattern is ``fn(tracer, state, nodes, i, env, scope) -> None | (consumed,
{output_name: value})``. Returning None means "no match"; the tracer then
falls through to override/builtin dispatch (generate.rs:818-831 precedence).
User patterns prepend via ``Compiler.with_pattern`` in the build API.
"""

from __future__ import annotations

import numpy as np


def _node_attr(node, name, default=None):
    from ..ops.registry import parse_attr

    for a in node.attribute:
        if a.name == name:
            return parse_attr(a)
    return default


def dql_matmul_chain(tracer, state, nodes, i, env, scope):
    """Fuse DynamicQuantizeLinear + MatMulInteger + scale/bias/relu epilogue.

    Matches the reference's quantized-linear chains (patterns.rs:122,:279;
    node regrouping mod.rs:865-990). The fused emitter quantizes the
    activation, runs the int8×int8→int32 dot with zero-point col-sum
    correction, and applies the float epilogue — one XLA fusion group, no
    u8 round-trip through HBM.
    """
    node = nodes[i]
    if node.op_type != "DynamicQuantizeLinear":
        return None
    a_name = node.input[0]
    q_name, scale_name, zp_name = (list(node.output) + ["", ""])[:3]
    # find the MatMulInteger consuming our quantized output
    if i + 1 >= len(nodes):
        return None
    mmi = nodes[i + 1]
    if mmi.op_type != "MatMulInteger" or mmi.input[0] != q_name:
        return None
    b_name = mmi.input[1]
    b_zp_name = mmi.input[3] if len(mmi.input) > 3 else ""
    b = env.get(b_name)
    if b is None:
        return None
    # scale multiply follows (a_scale * b_scale or combined)
    j = i + 2
    consumed_outputs = {}
    mm_out = mmi.output[0]
    # optional Cast(int32→float) before the Mul
    cast_out = mm_out
    if j < len(nodes) and nodes[j].op_type == "Cast" and nodes[j].input[0] == mm_out:
        cast_out = nodes[j].output[0]
        j += 1
    if j >= len(nodes) or nodes[j].op_type != "Mul":
        return None
    mul = nodes[j]
    if cast_out not in mul.input:
        return None
    other = mul.input[1] if mul.input[0] == cast_out else mul.input[0]
    j += 1

    from ..kernels.quant_matmul import fused_dynamic_quant_matmul

    a = env[a_name]
    if isinstance(a, (np.ndarray, np.generic)):
        return None  # fully static — let normal folding handle it
    b_dev = state.to_device(scope + b_name, np.asarray(b))
    bzp = env.get(b_zp_name) if b_zp_name else None
    bzp_dev = None
    if bzp is not None:
        bzp_dev = (
            state.to_device(scope + b_zp_name, np.asarray(bzp))
            if isinstance(bzp, (np.ndarray, np.generic))
            else bzp
        )
    # the Mul's other operand: either b_scale const or a dynamic combined scale
    scale_other = env.get(other)
    if scale_other is None:
        return None
    if isinstance(scale_other, (np.ndarray, np.generic)):
        scale_other_v = state.to_device(scope + other, np.asarray(scale_other))
    else:
        # dynamic scale operand must be exactly a_scale (then b folded to 1)
        scale_other_v = scale_other
    out, a_scale, a_zp = fused_dynamic_quant_matmul(a, b_dev, bzp_dev, scale_other_v)
    consumed_outputs[mm_out] = None
    results = {
        q_name: None,  # not materialized; consumers beyond the chain re-trigger
        scale_name: a_scale,
        mul.output[0]: out,
    }
    if zp_name:
        results[zp_name] = a_zp
    # only commit if intermediate q/mm outputs have no other consumers
    later = nodes[j:]
    used_later = {n for nd in later for n in nd.input}
    if q_name in used_later or mm_out in used_later or cast_out in used_later:
        return None
    results.pop(q_name)
    return j - i, results


DEFAULT_PATTERNS: list = [dql_matmul_chain]
