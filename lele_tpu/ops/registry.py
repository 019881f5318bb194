"""Op registry + emitter context for the ONNX→JAX tracer.

Design (replaces the reference's codegen dispatch, generate.rs:802-997):
the reference emits Rust source per node; we instead *execute* an emitter per
node while tracing under `jax.jit`, so the "generated program" is the traced
XLA computation. Emitters are written once against ``ctx.xp`` — numpy when the
tracer constant-folds a node whose inputs are all static (the analog of
fold_constants, compiler/mod.rs:375), jax.numpy when the node is dynamic.

Dispatch precedence mirrors generate.rs:802: pattern rewrite → user override
→ builtin emitter → fallback (warn + zeros, or raise in strict mode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from ..onnx import schema, tensor_to_array
from ..onnx.schema import Proto

OPS: dict[str, "OpDef"] = {}  # default-domain (ai.onnx) emitters, by op_type

# Non-default-domain emitters, keyed (domain, op_type). Domain dispatch is
# STRUCTURAL (VERDICT r4): a contrib node only ever reaches (a) its own
# domain's entry or (b) a default-domain emitter the alias table explicitly
# declares schema-identical. It can never fall into a same-named ai.onnx
# emitter with a different schema (the com.microsoft::RotaryEmbedding /
# ai.onnx-23 RotaryEmbedding input-order collision).
CONTRIB_OPS: dict[tuple[str, str], "OpDef"] = {}

# (domain, op_type) -> default-domain op_type whose schema genuinely
# coincides (inputs, attrs, semantics). Curated, not inferred.
CONTRIB_ALIASES: dict[tuple[str, str], str] = {
    ("com.microsoft", "Gelu"): "Gelu",
    ("com.microsoft", "Trilu"): "Trilu",
    ("com.microsoft", "Range"): "Range",
}

_DEFAULT_DOMAINS = ("", "ai.onnx")


def canon_domain(domain: str | None) -> str:
    """'' and 'ai.onnx' both name the default operator set."""
    return "" if (domain or "") in _DEFAULT_DOMAINS else domain


@dataclass
class OpDef:
    name: str
    fn: Callable
    foldable: bool  # safe to evaluate with numpy at trace time
    # input positions that must stay host-static (shape/axes/k arguments);
    # the tracer never converts these to device values
    static_args: tuple = ()
    domain: str = ""
    # ops that trace attribute subgraphs themselves (BeamSearch/GreedySearch
    # …) — the tracer must route them through the dynamic path with state +
    # scope in the ctx, never the eager all-static fold (whose param
    # stand-ins would poison a discovery-mode fold)
    subgraph: bool = False


def op(name: str, foldable: bool = True, static_args: tuple = (),
       domain: str = "", subgraph: bool = False):
    d = canon_domain(domain)

    def deco(fn):
        od = OpDef(name, fn, foldable, static_args, d, subgraph)
        if d:
            CONTRIB_OPS[(d, name)] = od
        else:
            OPS[name] = od
        return fn

    return deco


def lookup_op(domain: str | None, op_type: str) -> "OpDef | None":
    """The one domain-aware dispatch point (analog surface:
    generate.rs:802-997). Default-domain nodes hit OPS; contrib nodes hit
    their (domain, op_type) entry or a declared alias — never a bare-name
    fallback."""
    d = canon_domain(domain)
    if not d:
        return OPS.get(op_type)
    od = CONTRIB_OPS.get((d, op_type))
    if od is not None:
        return od
    alias = CONTRIB_ALIASES.get((d, op_type))
    if alias is not None:
        return OPS.get(alias)
    return None


def parse_attr(a: Proto) -> Any:
    t = a.type
    if t == schema.ATTR_INT:
        return int(a.i)
    if t == schema.ATTR_FLOAT:
        return float(a.f)
    if t == schema.ATTR_STRING:
        s = a.s
        if isinstance(s, memoryview):  # wire's >256B zero-copy fast path
            s = bytes(s)
        return s.decode() if isinstance(s, bytes) else s
    if t == schema.ATTR_INTS:
        return [int(v) for v in a.ints]
    if t == schema.ATTR_FLOATS:
        return [float(v) for v in a.floats]
    if t == schema.ATTR_TENSOR:
        return tensor_to_array(a.t)
    if t == schema.ATTR_GRAPH:
        return a.g
    if t == schema.ATTR_STRINGS:
        return [
            v.decode() if isinstance(v, (bytes, memoryview)) else v for v in a.strings
        ]
    if t == schema.ATTR_TENSORS:
        return [tensor_to_array(v) for v in a.tensors]
    if t == schema.ATTR_GRAPHS:
        return list(a.graphs)
    # untyped attribute (some exporters omit type): best effort
    if a.has("i"):
        return int(a.i)
    if a.has("f"):
        return float(a.f)
    if a.has("ints"):
        return [int(v) for v in a.ints]
    return None


@dataclass
class OpContext:
    """Per-node emitter context.

    xp      numpy (folding) or jax.numpy (tracing)
    attrs   parsed node attributes
    opset   model's ai.onnx opset version (semantics switch per opset)
    tracer  the GraphTracer, for subgraph ops (If) and value lookup
    node    the NodeProto wrapper
    """

    xp: Any
    attrs: dict[str, Any]
    opset: int
    node: Proto | None = None
    tracer: Any = None
    # subgraph-tracing ops need the walk state + value scope to call
    # tracer._walk_graph on their attribute graphs (BeamSearch's decoder)
    state: Any = None
    scope: str = ""

    @property
    def is_fold(self) -> bool:
        return self.xp is np

    def attr(self, name: str, default: Any = None) -> Any:
        return self.attrs.get(name, default)

    def attr_ints(self, name: str, default=None) -> list[int] | None:
        v = self.attrs.get(name)
        if v is None:
            return default
        return [int(x) for x in v] if isinstance(v, (list, tuple)) else [int(v)]


def make_ctx(xp, node: Proto, opset: int, tracer=None, state=None,
             scope: str = "") -> OpContext:
    attrs = {a.name: parse_attr(a) for a in node.attribute}
    return OpContext(xp=xp, attrs=attrs, opset=opset, node=node,
                     tracer=tracer, state=state, scope=scope)


def static_ints(v, what: str = "value") -> list[int]:
    """Require a trace-time-static integer vector (shapes, axes, k, ...)."""
    if v is None:
        raise ValueError(f"{what}: missing")
    if isinstance(v, np.ndarray):
        return [int(x) for x in np.atleast_1d(v)]
    try:
        arr = np.asarray(v)
        if arr.dtype == object or not np.issubdtype(arr.dtype, np.number):
            raise ValueError(f"{what}: not numeric")
        return [int(x) for x in np.atleast_1d(arr)]
    except ValueError:
        raise
    except Exception as e:  # a traced value reached a shape position
        raise ValueError(
            f"{what} must be trace-time static, got a traced value (a "
            "runtime graph input); constant folding should have resolved "
            "it. Hint: shape-determining scalars fed at session.run time "
            "(BeamSearch max_length/num_beams in published exports) must "
            "be bound to constants first — lele_tpu.onnx.bind_inputs "
            "(dynamic shapes are otherwise bucketed/padded upstream)"
        ) from e
