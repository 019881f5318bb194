"""Per-node profiling / debugging: eager node-by-node execution with
timings — the reference's op-class time breakdown (kernels/timing.rs:92-168)
as a dev tool. Not for production timing (eager dispatch overhead dwarfs
fused-program time; use jax.profiler for that) but ideal for finding the
node that produces NaNs or dominates a graph.
"""

from __future__ import annotations

import time
from collections import defaultdict

import numpy as np

from ..onnx.loader import OnnxModel, tensor_to_array
from .tracer import GraphTracer, TraceState, _canon_np, _is_static


def profile_nodes(
    model: OnnxModel,
    inputs: dict[str, np.ndarray],
    warmup: bool = True,
) -> list[dict]:
    """Run the graph eagerly, one node at a time. Returns
    [{index, op_type, name, ms, out_shapes, nonfinite}] per node."""
    import jax
    import jax.numpy as jnp

    tracer = GraphTracer(model)
    state = TraceState(mode="final")
    state.to_device = lambda name, v: jnp.asarray(_canon_np(np.asarray(v)))

    env: dict = {"": None}
    for n, v in inputs.items():
        env[n] = jnp.asarray(_canon_np(np.asarray(v)))
    graph = model.graph
    for t in graph.initializer:
        env[t.name] = tensor_to_array(t, getattr(model, "base_dir", None))

    from ..onnx import loader as _loader

    records = []
    base_dir = getattr(model, "base_dir", None)
    for i, node in enumerate(graph.node):
        runs = 2 if warmup else 1
        out = None
        t0 = None
        for r in range(runs):
            t0 = time.perf_counter()
            # scope so Constant-attribute tensors resolve external data
            with _loader.base_dir_scope(base_dir):
                out = tracer._emit(state, node, env, "", tag=str(i))
            jax.block_until_ready(
                [o for o in (out if isinstance(out, tuple) else (out,))
                 if o is not None and not _is_static(o)]
            )
        ms = (time.perf_counter() - t0) * 1000
        outs = out if isinstance(out, tuple) else (out,)
        nonfinite = False
        shapes = []
        for o in outs:
            if o is None:
                continue
            shapes.append(tuple(np.shape(o)))
            arr = np.asarray(o)
            if arr.size and np.issubdtype(arr.dtype, np.floating):
                nonfinite = nonfinite or not np.isfinite(arr).all()
        for name, val in zip(node.output, outs):
            if name:
                env[name] = val
        records.append(
            {
                "index": i,
                "op_type": node.op_type,
                "name": node.name,
                "ms": ms,
                "out_shapes": shapes,
                "nonfinite": nonfinite,
            }
        )
    return records


def reference_eval(
    model: OnnxModel, inputs: dict[str, np.ndarray]
) -> dict[str, np.ndarray]:
    """Eager node-by-node reference evaluation → {output_name: np.ndarray}.

    The in-tree stand-in for the reference's ORT-CPU oracle
    (tests/verify_kernels_with_ort.py pattern): no patterns, no fusion, no
    jit — each node runs through its op emitter eagerly, so a compiled
    program (tracer + patterns + XLA) can be gated against an execution
    path that shares only the per-op semantics (themselves anchored to
    ORT-printed constants in tests/test_kernel_accuracy.py)."""
    import jax.numpy as jnp

    tracer = GraphTracer(model, patterns=[])
    state = TraceState(mode="final")
    state.to_device = lambda name, v: jnp.asarray(_canon_np(np.asarray(v)))

    env: dict = {"": None}
    for n, v in inputs.items():
        env[n] = jnp.asarray(_canon_np(np.asarray(v)))
    graph = model.graph
    outs = tracer._walk_graph(state, graph, env, "")
    return {
        vi.name: np.asarray(o)
        for vi, o in zip(graph.output, outs)
    }


def print_breakdown(records: list[dict], top: int = 15) -> None:
    """Aggregate per op-class and print (timing.rs print() UX)."""
    by_op = defaultdict(lambda: [0.0, 0])
    for r in records:
        by_op[r["op_type"]][0] += r["ms"]
        by_op[r["op_type"]][1] += 1
    total = sum(v[0] for v in by_op.values())
    print(f"{'op':24s} {'count':>5s} {'total ms':>9s} {'%':>6s}")
    for op, (ms, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{op:24s} {cnt:5d} {ms:9.3f} {100 * ms / total if total else 0:6.1f}")
    bad = [r for r in records if r["nonfinite"]]
    for r in bad:
        print(f"NONFINITE output at node #{r['index']} {r['op_type']} {r['name']!r}")
