"""CompiledModel: the runtime wrapper around one traced XLA program.

The analog of the reference's generated model struct (`Model::new(&weights)`
+ `forward`/`forward_with_workspace`, compiler/mod.rs:1042-1352):
- the flat weights blob → a device-resident params dict (uploaded once)
- the Vec<f32> workspace pool → XLA buffer assignment
- `forward_with_workspace` steady-state reuse → `jax.jit` donation of
  declared streaming-state inputs (SURVEY.md §3.3: Silero state recirculation)
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np


class CompiledModel:
    def __init__(
        self,
        walk_fn,
        params: dict[str, np.ndarray],
        input_specs: dict[str, tuple[tuple, Any]],
        input_order: Sequence[str],
        output_names: Sequence[str],
        donate: Sequence[str] = (),
        mesh=None,
        batch_axis: int | None = None,
        seq_axis: int | None = None,
        param_rules=None,
        input_packers=None,
        compute_dtype: str | None = None,
    ):
        """mesh + batch_axis: data-parallel inference — params replicate
        across the mesh's "data" axis and every input/output shards on
        `batch_axis`; XLA inserts the ICI collectives. (No reference
        counterpart — lele is single-core; SURVEY.md §2.6.)

        seq_axis: sequence parallelism for compiled graphs — inputs whose
        `seq_axis` dim divides the mesh's "seq" axis shard along it, so
        activations stay time-sharded and GSPMD inserts the attention
        all-gathers (the scaling-book recipe applied to an ONNX program).

        param_rules: optional callable (param_name, shape) → PartitionSpec
        for tensor-parallel placement of the hoisted ONNX weights (e.g.
        shard every [K, N] linear weight column-wise over "model").

        compute_dtype: "bfloat16" stores every f32 weight in bf16 on
        device (half the HBM stream per forward — the dominant cost of a
        small conv net) and the compile-time walk wrapper casts f32 live
        inputs to match. The native families already run this policy
        (models/yolo26.py:36 dtype="bfloat16"); this brings compiled-ONNX
        graphs to the same TPU-first dtype story. Opt-in: the default
        keeps ONNX f32 for ORT-parity numerics."""
        import jax
        import jax.numpy as jnp

        from ..ops.tensor_ops import canonical_dtype

        self.input_specs = input_specs
        # name → (original_shape, host_fn): layout rewrites (e.g. the s2d
        # image-stem pass) accept the ORIGINAL ONNX layout at the API and
        # repack on the host in _prep — run_np stays drop-in
        self.input_packers = input_packers or {}
        self.input_order = list(input_order)
        self.output_names = list(output_names)
        self.donate = [d for d in donate if d in input_order]
        self.mesh = mesh
        self._canon = {
            n: canonical_dtype(np.dtype(input_specs[n][1]), device=True)
            for n in input_order
        }
        self._in_shard = None
        param_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = 0 if batch_axis is None else batch_axis

            def spec_for(name):
                shape = input_specs[name][0]
                rank = len(shape)
                parts = [None] * rank
                if ("data" in mesh.shape and rank > ax
                        and shape[ax] % mesh.shape["data"] == 0):
                    parts[ax] = "data"
                if (seq_axis is not None and "seq" in mesh.shape
                        and rank > seq_axis and seq_axis != ax
                        and shape[seq_axis] % mesh.shape["seq"] == 0):
                    parts[seq_axis] = "seq"
                return NamedSharding(mesh, P(*parts))

            self._in_shard = {n: spec_for(n) for n in self.input_order}
            param_sharding = NamedSharding(mesh, P())
        if compute_dtype:
            # host-side cast: halves the one-time transfer as well as the
            # steady-state HBM weight stream
            import ml_dtypes

            _target = {"bfloat16": ml_dtypes.bfloat16,
                       "float16": np.float16}[compute_dtype]
            params = {
                k: (np.asarray(v).astype(_target)
                    if np.asarray(v).dtype == np.float32 else v)
                for k, v in params.items()
            }
        if param_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def place(name, v):
                sh = param_sharding
                if param_rules is not None:
                    spec = param_rules(name, v.shape)
                    if spec is not None:
                        # replicate when the spec doesn't divide the shape
                        ok = all(
                            s is None or v.shape[i] % mesh.shape[s] == 0
                            for i, s in enumerate(spec)
                        )
                        sh = NamedSharding(mesh, spec if ok else P())
                return jax.device_put(jnp.asarray(v), sh)

            self.params = {k: place(k, v) for k, v in params.items()}
        else:
            self.params = {k: jnp.asarray(v) for k, v in params.items()}

        rest_names = [n for n in self.input_order if n not in self.donate]
        donate_names = list(self.donate)

        def fn(params_d, donated: tuple, rest: tuple):
            inputs = dict(zip(donate_names, donated)) | dict(zip(rest_names, rest))
            return walk_fn(params_d, inputs)

        self._rest_names = rest_names
        self._donate_names = donate_names
        self._walk_fn = walk_fn  # kept for compose_models / re-jitting
        self._jit = jax.jit(fn, donate_argnums=(1,) if donate_names else ())

    def _prep(self, name: str, v) -> Any:
        import jax

        arr = np.asarray(v) if isinstance(v, (np.ndarray, list, float, int)) else v
        if name in self.input_packers:
            orig_shape, packer = self.input_packers[name]
            if isinstance(arr, np.ndarray) and arr.shape == orig_shape:
                arr = packer(arr)
            elif (not isinstance(arr, np.ndarray)
                  and tuple(getattr(arr, "shape", ())) == orig_shape):
                raise ValueError(
                    f"input {name!r} uses a layout-rewritten (packed) spec "
                    f"{self.input_specs[name][0]}; pass a numpy array in the "
                    f"original layout {orig_shape} (packed on host) or a "
                    f"pre-packed device array")
        if isinstance(arr, np.ndarray):
            dt = self._canon[name]
            if arr.dtype != dt:
                arr = arr.astype(dt)
            if self._in_shard is not None:
                return jax.device_put(arr, self._in_shard[name])
            # hand numpy straight to jit: the transfer rides the dispatch
            # instead of a separate eager round trip (measurably faster on
            # remote/tunneled devices)
            return arr
        return arr  # already a device array; jit will cast/complain as needed

    def __call__(self, *args, **kwargs) -> list:
        if args:
            kwargs.update(dict(zip(self.input_order, args)))
        missing = [n for n in self.input_order if n not in kwargs]
        if missing:
            raise TypeError(
                f"missing model inputs {missing}; expected "
                f"{self.input_order} (got {sorted(kwargs)})"
            )
        donated = tuple(self._prep(n, kwargs[n]) for n in self._donate_names)
        rest = tuple(self._prep(n, kwargs[n]) for n in self._rest_names)
        return self._jit(self.params, donated, rest)

    def run_np(self, *args, **kwargs) -> list[np.ndarray]:
        return [np.asarray(o) for o in self(*args, **kwargs)]

    def lower(self):
        """AOT-lower for cold-start caching / serialization."""
        import jax

        donated = tuple(
            jax.ShapeDtypeStruct(tuple(self.input_specs[n][0]), self._canon[n])
            for n in self._donate_names
        )
        rest = tuple(
            jax.ShapeDtypeStruct(tuple(self.input_specs[n][0]), self._canon[n])
            for n in self._rest_names
        )
        return self._jit.lower(self.params, donated, rest)

    def compile(self):
        return self.lower().compile()

    def save_aot(self, path_prefix) -> None:
        """Write <prefix>.xc/.xc.tree (pickled XLA executable) — the
        sub-second cold-start deployment artifact (runtime/artifact.py;
        pinned to jax version + device kind). Weights travel separately in
        the blob the CLI already writes."""
        from .artifact import save_aot_bundle

        save_aot_bundle(path_prefix, self.compile())

    def use_aot(self, path_prefix) -> None:
        """Swap this model's program for a saved executable: no retrace, no
        compile — calls go straight to the loaded binary. Raises if the
        bundle doesn't match this jax version / device kind / device count
        (callers may fall back to the normal jit path). A zero-input probe
        call validates the load — the loaded executable's reported
        shardings can claim single-device while execution still demands the
        full local device set (XLA AOT loader quirk), so only a real call
        proves compatibility."""
        from .artifact import load_aot_bundle

        comp, _ = load_aot_bundle(path_prefix, params=False)
        donated = tuple(
            np.zeros(tuple(self.input_specs[n][0]), self._canon[n])
            for n in self._donate_names
        )
        rest = tuple(
            np.zeros(tuple(self.input_specs[n][0]), self._canon[n])
            for n in self._rest_names
        )
        comp(self.params, donated, rest)  # raises on any mismatch
        self._jit = comp
