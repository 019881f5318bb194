"""Compiler front door: ONNX model → CompiledModel.

Builder-style API mirroring the reference's
`Compiler::new().with_name().with_default_optimizations()` surface
(/root/reference/src/compiler/mod.rs:297-373) with the extension points
`with_override(op, fn)` (mod.rs:323) and `with_pattern(fn)` (mod.rs:332).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np

from ..onnx.loader import DTYPE_MAP, OnnxModel
from ..runtime.engine import CompiledModel
from .tracer import GraphTracer


class Compiler:
    def __init__(self):
        self._overrides: dict[str, Callable] = {}
        self._patterns: list | None = None
        self._strict: bool | None = None
        self._name = "Model"
        self._custom_methods: dict[str, Callable] = {}

    def with_name(self, name: str) -> "Compiler":
        self._name = name
        return self

    def with_default_optimizations(self) -> "Compiler":
        """API parity with the reference builder (mod.rs:297): folding,
        param hoisting, and the default pattern set are always on in the
        tracer, so this is a fluent no-op kept for drop-in familiarity."""
        return self

    def with_constant_folding(self, enabled: bool = True) -> "Compiler":
        """API parity (mod.rs: with_constant_folding). Folding is integral
        to the trace (shape chains must resolve); disabling is not
        supported — a False argument raises to avoid silent surprises."""
        if not enabled:
            raise ValueError(
                "constant folding cannot be disabled: trace-time folding is "
                "how shape-carrying chains become static (see ARCHITECTURE.md)"
            )
        return self

    def with_override(self, op_type: str, fn: Callable) -> "Compiler":
        self._overrides[op_type] = fn
        return self

    def with_pattern(self, fn: Callable) -> "Compiler":
        from .patterns import DEFAULT_PATTERNS

        if self._patterns is None:
            self._patterns = list(DEFAULT_PATTERNS)
        self._patterns.insert(0, fn)
        return self

    def with_strict(self, strict: bool = True) -> "Compiler":
        self._strict = strict
        return self

    def with_custom_method(self, name: str, fn: Callable) -> "Compiler":
        """Attach a host-side method to the compiled model
        (`Compiler::with_custom_method`, mod.rs:352 — the reference injects
        Rust source; here the callable binds onto the CompiledModel with
        itself as first argument)."""
        self._custom_methods[name] = fn
        return self

    def compile(
        self,
        model: OnnxModel | str | Path,
        input_shapes: dict[str, Sequence[int]] | None = None,
        dim_values: dict[str, int] | None = None,
        donate: Sequence[str] = (),
        mesh=None,
        batch_axis: int | None = None,
        seq_axis: int | None = None,
        param_rules=None,
        pack_image_stem: bool = False,
        precision: str | None = None,
        compute: str | None = None,
    ) -> CompiledModel:
        if isinstance(model, (bytes, bytearray, memoryview)):
            model = OnnxModel.from_bytes(bytes(model))
        elif not isinstance(model, OnnxModel):
            model = OnnxModel.load(model)
        if model.model.functions:
            # torch.onnx module-as-function exports: flatten local
            # functions before tracing (onnx/functions.py; the reference
            # cannot load these at all — its schema skips field 25)
            from ..onnx.functions import inline_functions
            from ..onnx.schema import Proto

            flat = inline_functions(model.model.raw())
            model = OnnxModel(
                Proto(flat, "ModelProto"),
                path=model.path,
                base_dir=model.base_dir,
            )
        specs = resolve_input_specs(model, input_shapes, dim_values)
        packers = None
        patterns = self._patterns
        if pack_image_stem:
            # whole-chain packed conv domain (conv_domain.py) — supersedes
            # the single-conv stem rewrite (a 1-conv chain ≡ old behavior)
            from .conv_domain import build_conv_domain

            rw = build_conv_domain(model, specs)
            if rw is not None:
                specs, stem_pattern, packers = rw
                # per-compile pattern: do NOT install on self (it closes
                # over THIS model's stem weights)
                if patterns is None:
                    from .patterns import DEFAULT_PATTERNS

                    patterns = list(DEFAULT_PATTERNS)
                patterns = [stem_pattern] + list(patterns)
        tracer = GraphTracer(
            model,
            overrides=self._overrides,
            patterns=patterns,
            strict=self._strict,
        )
        walk_fn, params = tracer.build(specs)
        stats = getattr(tracer, "stats", {})
        if precision or compute:
            # per-model numerics policy (VERDICT r2 #2): `precision` pins
            # jax matmul/conv precision for THIS program's trace (the
            # global default stays "highest" for ORT parity);
            # `compute="bfloat16"` additionally runs the graph in bf16 —
            # the engine stores f32 weights as bf16 and this wrapper casts
            # live f32 inputs to match, then returns f32 outputs. Together
            # they give compiled-ONNX graphs the same TPU dtype story as
            # the native families (models/yolo26.py CFG.dtype).
            from ..config import config as _cfg

            inner_walk = walk_fn

            def walk_fn(params_d, inputs):  # noqa: F811 (deliberate rewrap)
                import jax.numpy as jnp

                old = _cfg.matmul_precision
                if precision:
                    _cfg.matmul_precision = precision
                try:
                    if compute:
                        cdt = jnp.dtype(compute)

                        def cin(v):
                            return (v.astype(cdt)
                                    if getattr(v, "dtype", None) == jnp.float32
                                    else v)

                        inputs = {k: cin(v) for k, v in inputs.items()}
                    outs = inner_walk(params_d, inputs)
                    if compute:
                        outs = [o.astype(jnp.float32)
                                if getattr(o, "dtype", None) == cdt else o
                                for o in outs]
                    return outs
                finally:
                    _cfg.matmul_precision = old
        cm = CompiledModel(
            walk_fn,
            params,
            specs,
            input_order=model.input_names(),
            output_names=model.output_names(),
            donate=donate,
            mesh=mesh,
            batch_axis=batch_axis,
            seq_axis=seq_axis,
            param_rules=param_rules,
            input_packers=packers,
            compute_dtype=compute,
        )
        import types

        cm.stats = stats
        cm.params_host = params  # numpy originals (artifact writing avoids
        #                           a device→host round trip of the weights)
        for mname, fn in self._custom_methods.items():
            setattr(cm, mname, types.MethodType(fn, cm))
        return cm


def resolve_input_specs(
    model: OnnxModel,
    input_shapes: dict[str, Sequence[int]] | None = None,
    dim_values: dict[str, int] | None = None,
) -> dict[str, tuple[tuple, Any]]:
    """Static input signature from graph metadata + user overrides.

    Dynamic dims (dim_param or 0/-1) must be pinned via input_shapes
    (per input) or dim_values (per named dim) — the static-shape
    specialization strategy from SURVEY.md §7 "Hard parts".
    """
    input_shapes = input_shapes or {}
    dim_values = dim_values or {}
    specs: dict[str, tuple[tuple, Any]] = {}
    for name, onnx_dt, dims in model.input_info():
        np_dt = DTYPE_MAP.get(onnx_dt, np.dtype(np.float32))
        if name in input_shapes:
            shape = tuple(int(d) for d in input_shapes[name])
        else:
            shape = []
            for d in dims:
                if isinstance(d, str):
                    if d not in dim_values:
                        raise ValueError(
                            f"input {name!r} has dynamic dim {d!r}; pass "
                            f"input_shapes={{{name!r}: (...)}} or "
                            f"dim_values={{{d!r}: N}}"
                        )
                    shape.append(int(dim_values[d]))
                elif d <= 0:
                    raise ValueError(
                        f"input {name!r} has unknown dim; pass input_shapes"
                    )
                else:
                    shape.append(int(d))
            shape = tuple(shape)
        specs[name] = (shape, np_dt)
    return specs


def compile_model(
    model: OnnxModel | str | Path,
    input_shapes: dict[str, Sequence[int]] | None = None,
    dim_values: dict[str, int] | None = None,
    donate: Sequence[str] = (),
    overrides: dict[str, Callable] | None = None,
    strict: bool | None = None,
    mesh=None,
    batch_axis: int | None = None,
    seq_axis: int | None = None,
    param_rules=None,
    pack_image_stem: bool = False,
    precision: str | None = None,
    compute: str | None = None,
) -> CompiledModel:
    c = Compiler()
    if overrides:
        for k, v in overrides.items():
            c.with_override(k, v)
    if strict is not None:
        c.with_strict(strict)
    return c.compile(model, input_shapes, dim_values, donate, mesh, batch_axis,
                     seq_axis, param_rules, pack_image_stem=pack_image_stem,
                     precision=precision, compute=compute)
