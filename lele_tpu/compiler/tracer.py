"""ONNX→JAX tracer: walk a GraphProto, emit one fused XLA program.

This replaces the reference's ONNX→Rust code generator (/root/reference/src/
compiler/mod.rs:766 `compile`, generate.rs:802 `generate_nodes`) with a
trace-time interpreter:

- **Constant folding** (mod.rs:375 `fold_constants`) falls out of the walk:
  every value is either *static* (a numpy array, evaluated host-side with
  full 64-bit precision) or *dynamic* (a JAX tracer). A node whose inputs are
  all static evaluates immediately with numpy; shape-carrying chains
  (Shape→Gather→Concat→Reshape) therefore resolve to Python ints before XLA
  ever sees them.
- **Weight collection** (mod.rs:1381 `collect_weights`) becomes *param
  hoisting*: any static value larger than a threshold that feeds a dynamic op
  is lifted to a runtime parameter instead of being burned into the program
  as a literal. Because folding runs before hoisting, weight-only
  computation (transposes, casts, zero-point pre-packs) happens once at
  compile time — the TPU analog of the reference's "prepared weights"
  (neon/quantization.rs:24).
- **Buffer allocation** (mod.rs:148 `solve_allocation`) is XLA's job; the
  streaming-state reuse story is `jax.jit` donation in the runtime engine.
- Dispatch precedence matches generate.rs:802: pattern → override → builtin
  → fallback (stderr warning + empty tensor, generate.rs:987; strict mode
  raises instead).

Two walks share one code path: a `jax.eval_shape` discovery walk records
which params exist (no FLOPs), then the real walk runs under `jax.jit` with
those params as arguments. Param keys are env value names, which are stable
across walks.
"""

from __future__ import annotations

import sys
from collections import ChainMap
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import numpy as np

from ..config import config
from ..onnx import loader
from ..onnx.loader import OnnxModel, tensor_to_array
from ..onnx.schema import Proto
from ..ops import OPS, make_ctx
from ..ops.registry import canon_domain, lookup_op
from ..ops.tensor_ops import canonical_dtype

# static values with at least this many elements become runtime params
# (reference inlines ≤100-element constants; ops/tensor.rs:481)
PARAM_THRESHOLD = 256


def _canon_np(v: np.ndarray, strict: bool = False) -> np.ndarray:
    """Canonicalize a host value for device use (i64→i32 etc.).

    Integer narrowing CLAMPS instead of wrapping: ONNX graphs use INT64_MAX/
    INT64_MIN as "to the end" sentinels (Slice ends and similar), and a
    wrapped sentinel (-1) silently flips its meaning. Clamping preserves
    sentinel and comparison semantics. Genuine out-of-range *data* (not the
    exact sentinels) raises in strict mode — the x64-off deployment can't
    represent it."""
    dt = canonical_dtype(v.dtype, device=True)
    if dt == v.dtype:
        return v
    if np.issubdtype(v.dtype, np.integer) and np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        oob = (v < info.min) | (v > info.max)
        if oob.any():
            if strict:
                src = np.iinfo(v.dtype)
                sentinel = np.isin(v[oob], (src.min, src.max))
                if not sentinel.all():
                    bad = np.asarray(v[oob])[~sentinel][:4]
                    raise OverflowError(
                        f"i64 value(s) {bad.tolist()} exceed int32 range; "
                        "x64 is off on device (strict mode flags non-"
                        "sentinel overflow instead of clamping)"
                    )
            return np.clip(v, info.min, info.max).astype(dt)
    return v.astype(dt)


def _is_static(v) -> bool:
    return v is None or isinstance(v, (np.ndarray, np.generic))


def _reject_optionals(where: str, values) -> None:
    """Optionals are trace-time wrappers (ops/extra_ops.OptionalVal); they
    cannot flow through lax.cond branches or while_loop carries. Raise the
    actionable error instead of an opaque JAX pytree failure (ADVICE r3)."""
    from ..ops.extra_ops import OptionalVal

    if any(isinstance(v, OptionalVal) for v in values):
        raise NotImplementedError(
            f"{where} carry an ONNX optional: optional values must be "
            "resolved statically (OptionalHasElement folds at trace time); "
            "dynamic branches/loops cannot carry optionals. Hint: hoist the "
            "Optional construction out of the subgraph or make its "
            "condition static."
        )


@dataclass
class TraceState:
    mode: str  # "discover" | "final"
    strict: bool = False
    params: dict[str, np.ndarray] = field(default_factory=dict)
    param_vals: dict[str, Any] = field(default_factory=dict)
    warned: set = field(default_factory=set)
    n_nodes: int = 0
    n_folded: int = 0
    # per-pattern fusion hit counts (observable via CompiledModel.stats)
    pattern_hits: dict[str, int] = field(default_factory=dict)
    # output names of the graph currently being walked (patterns must not
    # consume nodes whose outputs the graph re-exports)
    graph_outputs: frozenset = frozenset()

    def to_device(self, name: str, v: np.ndarray):
        import jax.numpy as jnp

        cv = _canon_np(np.asarray(v), strict=self.strict)
        if cv.size >= PARAM_THRESHOLD:
            if self.mode == "discover":
                self.params[name] = cv
                # abstract stand-in: no host→device transfer during discovery
                return jnp.zeros(cv.shape, cv.dtype)
            return self.param_vals[name]
        return jnp.asarray(cv)


class GraphTracer:
    def __init__(
        self,
        model: OnnxModel,
        overrides: dict[str, Callable] | None = None,
        patterns: Sequence | None = None,
        strict: bool | None = None,
    ):
        self.model = model
        self.opset = model.opset
        self.overrides = overrides or {}
        from .patterns import DEFAULT_PATTERNS

        self.patterns = list(patterns) if patterns is not None else list(
            DEFAULT_PATTERNS
        )
        self.strict = config.strict if strict is None else strict

    # -- node execution ------------------------------------------------------

    def _emit(self, state: TraceState, node: Proto, env, scope: str, tag: str = ""):
        import jax.numpy as jnp

        op_type = node.op_type
        dom = canon_domain(node.domain)
        if not dom:
            # control-flow special cases belong to the default operator set
            if op_type == "If":
                return self._emit_if(state, node, env, scope, tag)
            if op_type == "Loop":
                return self._emit_loop(state, node, env, scope, tag)
            if op_type == "Scan":
                return self._emit_scan(state, node, env, scope, tag)
            if op_type == "SequenceMap":
                return self._emit_sequence_map(state, node, env, scope, tag)

        ins = [env[n] if n else None for n in node.input]
        # overrides are domain-scoped too: bare names bind the default
        # domain, "domain::Name" binds a contrib domain explicitly
        emitter = self.overrides.get(
            f"{dom}::{op_type}" if dom else op_type
        )
        opdef = lookup_op(dom, op_type)
        if emitter is None and opdef is not None:
            emitter = opdef.fn
        if emitter is None:
            label = f"{dom}::{op_type}" if dom else op_type
            if dom and op_type in OPS:
                hint = (
                    f" (a default-domain ai.onnx emitter named {op_type!r}"
                    " exists but the contrib schema differs — add a"
                    " CONTRIB_OPS entry or a CONTRIB_ALIASES row if the"
                    " schemas genuinely coincide)"
                )
            else:
                hint = (
                    " (custom-domain op with no matching model-local"
                    " function — functions are inlined before tracing)"
                    if dom else ""
                )
            if self.strict:
                raise NotImplementedError(
                    f"unsupported op {label} ({node.name}){hint}"
                )
            if label not in state.warned:
                state.warned.add(label)
                print(
                    f"Warning: unsupported op {label}; emitting empty tensor",
                    file=sys.stderr,
                )
            outs = tuple(np.zeros((0,), np.float32) for _ in node.output)
            return outs if len(node.output) > 1 else outs[0]

        from ..ops.extra_ops import TensorSeq

        # (TensorSeq inputs are never static: _is_static rejects list values)
        all_static = all(_is_static(v) for v in ins)
        if opdef is not None and opdef.subgraph:
            # subgraph-tracing ops (BeamSearch/GreedySearch/Sampling) walk
            # their attribute graphs themselves — they must see the trace
            # state (param hoisting for the embedded weights) and can never
            # take the eager all-static fold, whose discovery-mode param
            # stand-ins would bake garbage into a folded result
            all_static = False
        foldable = opdef.foldable if opdef is not None else False
        state.n_nodes += 1
        if all_static and (foldable or ins):
            # zero-input NON-foldables (RNG generators) trace, not fold;
            # zero-input foldables (Constant) do fold and count
            state.n_folded += 1
        if all_static and foldable:
            ctx = make_ctx(np, node, self.opset, tracer=self)
            out = emitter(ctx, *ins)
            return _np_ify(out)
        if all_static and not foldable and ins:
            # eager jax evaluation of a constant subcomputation (e.g. Conv on
            # consts). In discovery mode this would execute real FLOPs, so
            # materialize via concrete eager call only once; results are
            # host numpy afterwards. Zero-INPUT non-foldables (generator-style
            # RandomNormal/RandomUniform, SequenceEmpty) are excluded: they
            # must trace into the program (the dynamic path below), not
            # materialize at trace time.
            import jax

            ctx = make_ctx(jnp, node, self.opset, tracer=self)
            # this walk runs INSIDE an eval_shape/jit trace, where jax
            # primitives stage (produce tracers) even on concrete operands —
            # ensure_compile_time_eval forces genuine eager evaluation so
            # the constant subcomputation materializes to host numpy
            # (found by tests/test_graph_fuzz_families.py: any non-foldable
            # op on all-initializer inputs used to crash the compile)
            with jax.ensure_compile_time_eval():
                conv_ins = [
                    jnp.asarray(_canon_np(np.asarray(v), strict=self.strict))
                    if v is not None else None
                    for v in ins
                ]
                out = emitter(ctx, *conv_ins)
                from ..ops.extra_ops import OptionalVal

                if isinstance(out, (TensorSeq, OptionalVal)):
                    return out  # sequence/optional values stay host-level
                return _np_ify(out)
        # dynamic: convert static inputs, hoisting large ones to params;
        # shape-position args (static_args) stay host-static for the emitter
        static_pos = set(opdef.static_args) if opdef is not None else set()
        ctx = make_ctx(jnp, node, self.opset, tracer=self, state=state,
                       scope=scope)
        dyn_ins = []
        for i, v in enumerate(ins):
            if v is None or not _is_static(v) or i in static_pos:
                dyn_ins.append(v)
            else:
                name = node.input[i]
                dyn_ins.append(state.to_device(scope + name, np.asarray(v)))
        return emitter(ctx, *dyn_ins)

    def _emit_sequence_map(self, state: TraceState, node: Proto, env,
                           scope: str, tag: str):
        """ONNX SequenceMap: run `body` once per sequence element. Our
        sequences are host lists (TensorSeq) with trace-time-static length
        — the elements may be dynamic jax values of DIFFERENT shapes,
        which is exactly why this unrolls instead of lax.scan (the op
        exists to map over ragged sequences the spec forbids stacking)."""
        from ..ops.extra_ops import TensorSeq

        body = next(a for a in node.attribute if a.name == "body").g
        ins = [env[n] for n in node.input if n]
        seq_lens = {len(v) for v in ins if isinstance(v, TensorSeq)}
        if not seq_lens:
            raise ValueError(
                "SequenceMap requires at least one sequence input"
            )
        if len(seq_lens) > 1:
            raise ValueError(
                f"SequenceMap sequence inputs disagree on length: "
                f"{sorted(seq_lens)}"
            )
        length = seq_lens.pop()
        n_out = len(node.output)
        accs = [TensorSeq() for _ in range(n_out)]
        map_scope = scope + (node.name or f"SeqMap_{tag}")
        for i in range(length):
            benv = ChainMap({}, env)
            for vi, val in zip(body.input, ins):
                benv[vi.name] = val[i] if isinstance(val, TensorSeq) else val
            sub = self._walk_graph(state, body, benv, f"{map_scope}/{i}/")
            if len(sub) != n_out:
                raise ValueError(
                    f"SequenceMap body yields {len(sub)} outputs, node "
                    f"declares {n_out}"
                )
            for acc, o in zip(accs, sub):
                acc.append(o)
        return tuple(accs) if n_out > 1 else accs[0]

    def _emit_if(self, state: TraceState, node: Proto, env, scope: str, tag: str):
        import jax
        import jax.numpy as jnp

        cond = env[node.input[0]]
        attrs = {a.name: a for a in node.attribute}
        then_g = attrs["then_branch"].g
        else_g = attrs["else_branch"].g
        n_out = len(node.output)
        if_scope = scope + (node.name or f"If_{tag}")
        if _is_static(cond):
            # trace-time resolution (covers Silero's sr checks — SURVEY §7.3)
            branch = then_g if bool(np.asarray(cond).reshape(-1)[0]) else else_g
            sub = self._walk_graph(state, branch, ChainMap({}, env), if_scope + "/")
            return tuple(sub) if n_out > 1 else sub[0]

        def make_branch(g: Proto, btag: str):
            def fn(_):
                outs = self._walk_graph(
                    state, g, ChainMap({}, env), if_scope + f"/{btag}/"
                )
                _reject_optionals("If branch outputs", outs)
                return tuple(
                    jnp.asarray(_canon_np(np.asarray(o), strict=self.strict))
                if _is_static(o) else o
                    for o in outs
                )

            return fn

        cond_b = jnp.reshape(jnp.asarray(cond).astype(bool), ())
        outs = jax.lax.cond(cond_b, make_branch(then_g, "then"), make_branch(else_g, "else"), None)
        return outs if n_out > 1 else outs[0]

    def _emit_loop(self, state: TraceState, node: Proto, env, scope: str, tag: str):
        """ONNX Loop → lax.while_loop / lax.scan.

        Carried-only loops lower to lax.while_loop (trip-count M static or
        dynamic, dynamic condition, shape-invariant bodies). Loops WITH scan
        outputs lower to lax.scan over a static trip bound; data-dependent
        exits use the padded-scan design (see _emit_loop_scan) and only a
        missing/dynamic M falls back to the unknown-op behavior. (The
        reference has NO Loop emitter at all — compiler/mod.rs:111-123
        visits the body only for allocation; SURVEY §2.1 "control flow".)
        """
        import jax
        import jax.numpy as jnp

        attrs = {a.name: a for a in node.attribute}
        body = attrs["body"].g
        n_carried = len(node.input) - 2
        n_scan = len(node.output) - n_carried
        if n_scan > 0:
            out = self._emit_loop_scan(state, node, body, env, scope, tag,
                                       n_carried, n_scan)
            if out is not None:
                return out
            if self.strict:
                raise NotImplementedError(
                    "Loop scan-outputs need a static trip-count bound M "
                    "(dynamic exits are fine: outputs are zero-padded to M)"
                )
            if "Loop-scan" not in state.warned:
                state.warned.add("Loop-scan")
                print(
                    "Warning: Loop scan outputs without a static trip-count "
                    "bound unsupported; emitting empty",
                    file=sys.stderr,
                )
            outs = tuple(np.zeros((0,), np.float32) for _ in node.output)
            return outs if len(node.output) > 1 else outs[0]

        m_in = env[node.input[0]] if node.input[0] else None
        cond_in = env[node.input[1]] if len(node.input) > 1 and node.input[1] else None
        v_init = [env[n] for n in node.input[2:]]
        _reject_optionals("Loop carried inputs", v_init)

        max_iter = (
            # clamp, don't cast: exporters encode while-loops as
            # M = INT64_MAX, which a raw np.int32() WRAPS to -1 and the
            # loop would silently never run
            jnp.asarray(np.int32(min(int(np.asarray(m_in)), 2**31 - 1)))
            if m_in is not None and _is_static(m_in)
            else (m_in.astype(jnp.int32) if m_in is not None else jnp.int32(2**31 - 1))
        )
        cond0 = (
            jnp.asarray(bool(np.asarray(cond_in).reshape(-1)[0]))
            if cond_in is None or _is_static(cond_in)
            else jnp.reshape(cond_in.astype(bool), ())
        ) if cond_in is not None else jnp.asarray(True)

        body_in_names = [vi.name for vi in body.input]
        loop_scope = scope + (node.name or f"Loop_{tag}") + "/"

        def run_body(i, vs):
            benv = ChainMap({}, env)
            benv[body_in_names[0]] = i.astype(jnp.int32)
            benv[body_in_names[1]] = jnp.reshape(jnp.asarray(True), ())
            for name, v in zip(body_in_names[2:], vs):
                benv[name] = v
            outs = self._walk_graph(state, body, benv, loop_scope)
            _reject_optionals("Loop body outputs", outs)
            conv = [
                jnp.asarray(_canon_np(np.asarray(o), strict=self.strict))
                if _is_static(o) else o
                for o in outs
            ]
            new_cond = jnp.reshape(conv[0].astype(bool), ())
            return new_cond, tuple(conv[1 : 1 + n_carried])

        vs0 = tuple(
            state.to_device(scope + n, np.asarray(v)) if _is_static(v) else v
            for n, v in zip(node.input[2:], v_init)
        )

        def cond_fun(carry):
            i, c, _ = carry
            return jnp.logical_and(i < max_iter, c)

        def body_fun(carry):
            i, _, vs = carry
            new_cond, new_vs = run_body(i, vs)
            return (i + 1, new_cond, new_vs)

        _, _, vs_final = jax.lax.while_loop(
            cond_fun, body_fun, (jnp.int32(0), cond0, vs0)
        )
        return vs_final if n_carried > 1 else vs_final[0]

    def _emit_scan(self, state: TraceState, node: Proto, env, scope: str, tag: str):
        """ONNX Scan → lax.scan (state vars + sliced scan inputs/outputs,
        per-tensor axes and directions). Another op class the reference
        leaves unimplemented."""
        import jax
        import jax.numpy as jnp

        attrs = {a.name: a for a in node.attribute}
        body = attrs["body"].g
        from ..ops.registry import parse_attr

        get = lambda k, d: (parse_attr(attrs[k]) if k in attrs else d)
        m = int(get("num_scan_inputs", 1))
        n_state = len(node.input) - m
        in_axes = get("scan_input_axes", [0] * m)
        in_dirs = get("scan_input_directions", [0] * m)
        n_scan_out = len(node.output) - n_state
        out_axes = get("scan_output_axes", [0] * n_scan_out)
        out_dirs = get("scan_output_directions", [0] * n_scan_out)

        def dev(name, v):
            return (
                state.to_device(scope + name, np.asarray(v)) if _is_static(v) else v
            )

        states0 = tuple(
            dev(n, env[n]) for n in node.input[:n_state]
        )
        xs = []
        for i, name in enumerate(node.input[n_state:]):
            x = dev(name, env[name])
            ax = int(in_axes[i]) if i < len(in_axes) else 0
            x = jnp.moveaxis(x, ax, 0)
            if i < len(in_dirs) and in_dirs[i]:
                x = jnp.flip(x, 0)
            xs.append(x)
        body_in_names = [vi.name for vi in body.input]
        scan_scope = scope + (node.name or f"Scan_{tag}") + "/"

        def body_fn(carry, slices):
            benv = ChainMap({}, env)
            for name, v in zip(body_in_names[:n_state], carry):
                benv[name] = v
            for name, v in zip(body_in_names[n_state:], slices):
                benv[name] = v
            outs = self._walk_graph(state, body, benv, scan_scope)
            conv = [
                jnp.asarray(_canon_np(np.asarray(o), strict=self.strict))
                if _is_static(o) else o
                for o in outs
            ]
            return tuple(conv[:n_state]), tuple(conv[n_state:])

        final_state, stacked = jax.lax.scan(body_fn, states0, tuple(xs))
        outs = list(final_state)
        for i, y in enumerate(stacked):
            if i < len(out_dirs) and out_dirs[i]:
                y = jnp.flip(y, 0)
            ax = int(out_axes[i]) if i < len(out_axes) else 0
            outs.append(jnp.moveaxis(y, 0, ax))
        return tuple(outs) if len(outs) > 1 else outs[0]

    @staticmethod
    def _body_is_pure_for(body: Proto) -> bool:
        """True when cond_out is Constant(true) or Identity of cond_in —
        i.e., the loop can never exit early (a counted for-loop)."""
        cond_out_name = body.output[0].name
        cond_in_name = body.input[1].name if len(body.input) > 1 else ""
        name = cond_out_name
        # follow a short Identity chain
        for _ in range(4):
            if name == cond_in_name:
                return True
            producer = next(
                (n for n in body.node if name in n.output), None
            )
            if producer is None:
                return False
            if producer.op_type == "Identity":
                name = producer.input[0]
                continue
            if producer.op_type == "Constant":
                from ..ops.registry import parse_attr

                for a in producer.attribute:
                    if a.name.startswith("value"):
                        v = parse_attr(a)
                        return bool(np.asarray(v).reshape(-1)[0])
            return False
        return False

    def _emit_loop_scan(self, state, node, body, env, scope, tag, n_carried,
                        n_scan):
        """Loop with scan outputs → lax.scan over a static trip bound M.

        Pure for-loops (cond provably always-true) scan exactly M steps.
        Loops with a data-dependent exit run the padded-scan design: all M
        iterations execute under an `active` carry flag — once the body's
        cond output goes false, carried values freeze and scan-output rows
        write zeros, so outputs are zero-padded to the static bound M (the
        XLA-native stand-in for ONNX's dynamic [n_iter, ...] shape).
        Returns None when M is absent/dynamic (no static bound exists).
        """
        import jax
        import jax.numpy as jnp

        m_in = env[node.input[0]] if node.input[0] else None
        if m_in is None or not _is_static(m_in):
            return None
        if int(np.asarray(m_in)) >= 2**31 - 1:
            # M = INT64_MAX is the exporter sentinel for "no bound" (a pure
            # while-loop) — there is no real static trip count to scan over
            return None
        cond_in = (
            env[node.input[1]] if len(node.input) > 1 and node.input[1] else None
        )
        if cond_in is not None and _is_static(cond_in) and not bool(
            np.asarray(cond_in).reshape(-1)[0]
        ):
            cond_in = False  # statically never runs
        pure_for = self._body_is_pure_for(body) and (
            cond_in is None
            or (not isinstance(cond_in, bool) and _is_static(cond_in))
        )
        M = int(np.asarray(m_in))
        if cond_in is False:
            # statically never runs: a zero-length scan traces the body once
            # for output shapes but executes nothing — exact ONNX semantics
            # ([0, ...] scan outputs, carried values = inits)
            M, pure_for = 0, True
        body_in_names = [vi.name for vi in body.input]
        loop_scope = scope + (node.name or f"Loop_{tag}") + "/"
        v_init = [env[n] for n in node.input[2:]]
        vs0 = tuple(
            state.to_device(scope + n, np.asarray(v)) if _is_static(v) else v
            for n, v in zip(node.input[2:], v_init)
        )

        def run_body(vs, i):
            benv = ChainMap({}, env)
            benv[body_in_names[0]] = i.astype(jnp.int32)
            benv[body_in_names[1]] = jnp.reshape(jnp.asarray(True), ())
            for name, v in zip(body_in_names[2:], vs):
                benv[name] = v
            outs = self._walk_graph(state, body, benv, loop_scope)
            _reject_optionals("Loop body outputs", outs)
            conv = [
                jnp.asarray(_canon_np(np.asarray(o), strict=self.strict))
                if _is_static(o) else o
                for o in outs
            ]
            new_cond = jnp.reshape(conv[0].astype(bool), ())
            return new_cond, tuple(conv[1 : 1 + n_carried]), tuple(
                conv[1 + n_carried :]
            )

        if pure_for:
            def scan_body(vs, i):
                _, new_vs, scans = run_body(vs, i)
                return new_vs, scans

            vs_final, scan_stacked = jax.lax.scan(
                scan_body, vs0, jnp.arange(M, dtype=jnp.int32)
            )
            outs = tuple(vs_final) + tuple(scan_stacked)
            return outs if len(outs) > 1 else outs[0]

        if cond_in is False:
            active0 = jnp.asarray(False)
        elif cond_in is None or _is_static(cond_in):
            active0 = jnp.asarray(True)
        else:
            active0 = jnp.reshape(jnp.asarray(cond_in).astype(bool), ())

        def scan_body(carry, i):
            active, vs = carry
            new_cond, new_vs, scans = run_body(vs, i)
            kept = tuple(
                jnp.where(active, nv.astype(v.dtype), v)
                for nv, v in zip(new_vs, vs)
            )
            scans = tuple(jnp.where(active, s, jnp.zeros_like(s)) for s in scans)
            return (jnp.logical_and(active, new_cond), kept), scans

        vs0 = tuple(jnp.asarray(v) for v in vs0)
        (_, vs_final), scan_stacked = jax.lax.scan(
            scan_body, (active0, vs0), jnp.arange(M, dtype=jnp.int32)
        )
        outs = tuple(vs_final) + tuple(scan_stacked)
        return outs if len(outs) > 1 else outs[0]

    # -- graph walk ----------------------------------------------------------

    def _walk_graph(self, state: TraceState, graph: Proto, env, scope: str):
        base_dir = getattr(self.model, "base_dir", None)
        for t in graph.initializer:
            env[t.name] = tensor_to_array(t, base_dir)
        nodes = list(graph.node)
        prev_outputs = state.graph_outputs
        state.graph_outputs = frozenset(vi.name for vi in graph.output)
        try:
            return self._walk_nodes(state, nodes, env, scope, graph)
        finally:
            state.graph_outputs = prev_outputs

    def _walk_nodes(self, state: TraceState, nodes, env, scope: str, graph):
        i = 0
        skipped: set[int] = set()  # nodes consumed by dataflow patterns
        while i < len(nodes):
            if i in skipped:
                i += 1
                continue
            consumed = 0
            for pattern in self.patterns:
                res = pattern(self, state, nodes, i, env, scope)
                if res is not None:
                    consumed, results = res
                    for out_name, val in results.items():
                        env[out_name] = val
                    name = getattr(pattern, "__name__", "pattern")
                    state.pattern_hits[name] = state.pattern_hits.get(name, 0) + 1
                    break
            if consumed:
                if isinstance(consumed, int):
                    i += consumed
                else:  # absolute indices, possibly non-contiguous
                    skipped.update(consumed)
                    skipped.add(i)
                continue
            node = nodes[i]
            try:
                out = self._emit(state, node, env, scope, tag=str(i))
            except Exception as e:
                # attach graph context once (innermost node wins)
                if not getattr(e, "_lele_node", None):
                    e._lele_node = True
                    e.add_note(
                        f"  while compiling node #{i} {node.op_type!r} "
                        f"(name={node.name!r}, inputs={list(node.input)}, "
                        f"outputs={list(node.output)})"
                    )
                raise
            outs = out if isinstance(out, tuple) else (out,)
            for name, val in zip(node.output, outs):
                if name:
                    env[name] = val
            i += 1
        return [env[vi.name] for vi in graph.output]

    # -- public API ----------------------------------------------------------

    def build(self, input_specs: dict[str, tuple[tuple, np.dtype]]):
        """Build (fn, params) for the model at the given input signature.

        input_specs: name → (shape, np_dtype) with all dims static.
        Returns (walk_fn(params_dict, inputs_dict) -> list[outputs], params).
        """
        import jax

        graph = self.model.graph
        in_names = self.model.input_names()
        for n in in_names:
            if n not in input_specs:
                raise ValueError(f"missing input spec for {n!r}")

        def run(state: TraceState, inputs: dict):
            env: dict[str, Any] = {"": None}
            for n in in_names:
                env[n] = inputs[n]
            # scope covers jit-time re-walks too, so Constant-attribute and
            # matcher static lookups can resolve external-data tensors
            with loader.base_dir_scope(getattr(self.model, "base_dir", None)):
                outs = self._walk_graph(state, graph, env, "")
            import jax.numpy as jnp

            for o in outs:
                if _is_static(o) and o is not None \
                        and np.asarray(o).dtype == object:
                    raise NotImplementedError(
                        "a STRING tensor is a graph output: strings have "
                        "no device representation on TPU. Consume them "
                        "inside the graph (RegexFullMatch, StringSplit "
                        "lengths, TfIdfVectorizer) so outputs are numeric."
                    )
            return [
                jnp.asarray(_canon_np(np.asarray(o), strict=self.strict))
                if _is_static(o) else o
                for o in outs
            ]

        # discovery walk: abstract, records params
        discover = TraceState(mode="discover", strict=self.strict)
        specs = {
            n: jax.ShapeDtypeStruct(
                tuple(input_specs[n][0]),
                canonical_dtype(np.dtype(input_specs[n][1]), device=True),
            )
            for n in in_names
        }
        jax.eval_shape(lambda ins: run(discover, ins), specs)
        params = dict(discover.params)
        self.stats = {
            "n_nodes": discover.n_nodes,
            "n_folded": discover.n_folded,
            "n_params": len(params),
            "param_bytes": int(sum(v.nbytes for v in params.values())),
            "pattern_hits": dict(discover.pattern_hits),
        }

        def final_fn(params_dict, inputs: dict):
            state = TraceState(mode="final", strict=self.strict,
                               param_vals=params_dict)
            return run(state, inputs)

        return final_fn, params


def _np_ify(out):
    if isinstance(out, tuple):
        return tuple(np.asarray(v) for v in out)
    return np.asarray(out)
