"""Random-DAG fuzz: arbitrary wiring of elementwise/shape ops through the
tracer vs direct numpy evaluation — dispatch/fold robustness."""

import numpy as np

from optest import run_graph
from lele_tpu.onnx import builder as ob


def _numpy_eval(kind, args):
    if kind == "Add":
        return args[0] + args[1]
    if kind == "Mul":
        return args[0] * args[1]
    if kind == "Sub":
        return args[0] - args[1]
    if kind == "Relu":
        return np.maximum(args[0], 0)
    if kind == "Neg":
        return -args[0]
    if kind == "Abs":
        return np.abs(args[0])
    if kind == "Transpose":
        return args[0].T
    if kind == "Concat0":
        return np.concatenate(args, axis=0)
    raise AssertionError(kind)


def test_random_dags_match_numpy():
    rng = np.random.default_rng(99)
    for trial in range(15):
        shape = (int(rng.integers(1, 5)), int(rng.integers(1, 5)))
        n_inputs = int(rng.integers(1, 3))
        values = {f"in{i}": rng.standard_normal(shape).astype(np.float32)
                  for i in range(n_inputs)}
        avail = list(values)  # all same shape → any wiring is valid
        host = dict(values)
        nodes = []
        for step in range(int(rng.integers(2, 8))):
            kind = rng.choice(["Add", "Mul", "Sub", "Relu", "Neg", "Abs"])
            n_args = 2 if kind in ("Add", "Mul", "Sub") else 1
            srcs = [str(rng.choice(avail)) for _ in range(n_args)]
            out = f"v{trial}_{step}"
            nodes.append(ob.node(kind, srcs, [out]))
            host[out] = _numpy_eval(kind, [host[s] for s in srcs])
            avail.append(out)
        final = avail[-1]
        (got,) = run_graph(nodes, values, [final])
        np.testing.assert_allclose(got, host[final], atol=1e-5,
                                   err_msg=f"trial {trial}")


def test_random_dags_broadcast_and_mixed_static():
    """Harder fuzz: broadcastable operand shapes ((a,b) × (1,b)/(a,1)/(b,)
    variants), reductions back into the variant family, and a random
    SUBSET of inputs burned in as initializers — every static/dynamic
    mixing at a node is a fold-vs-trace decision, which is where tracer
    bugs hide (the reference's −1-sentinel machinery, mod.rs:401-429)."""
    rng = np.random.default_rng(2024)
    for trial in range(20):
        a, b = int(rng.integers(2, 5)), int(rng.integers(2, 5))
        full = (a, b)
        variants = [full, (1, b), (a, 1), (1, 1), (b,)]

        def rand_val(shape):
            return rng.standard_normal(shape).astype(np.float32)

        n_inputs = int(rng.integers(2, 4))
        values = {}
        for i in range(n_inputs):
            shape = full if i == 0 else variants[rng.integers(len(variants))]
            values[f"in{i}"] = rand_val(shape)
        # burn a random subset (never all) in as initializers
        names = list(values)
        n_static = int(rng.integers(0, n_inputs))
        static = {n: values[n] for n in names[:n_static]}
        dynamic = {n: values[n] for n in names[n_static:]}

        host = dict(values)
        pool_full = [n for n in names if host[n].shape == full]
        pool_any = list(names)
        nodes = []
        for step in range(int(rng.integers(3, 10))):
            out = f"t{trial}_s{step}"
            kind = rng.choice(
                ["Add", "Mul", "Sub", "Max", "Min", "Relu", "Neg", "Abs",
                 "Sqrt", "ReduceSum", "ReduceMean"])
            if kind in ("Add", "Mul", "Sub", "Max", "Min"):
                x = str(rng.choice(pool_full)) if pool_full else \
                    str(rng.choice(pool_any))
                y = str(rng.choice(pool_any))
                nodes.append(ob.node(kind, [x, y], [out]))
                f = {"Add": np.add, "Mul": np.multiply, "Sub": np.subtract,
                     "Max": np.maximum, "Min": np.minimum}[kind]
                host[out] = f(host[x], host[y]).astype(np.float32)
            elif kind in ("Relu", "Neg", "Abs", "Sqrt"):
                x = str(rng.choice(pool_any))
                if kind == "Sqrt":  # domain: route through Abs first
                    mid = out + "_abs"
                    nodes.append(ob.node("Abs", [x], [mid]))
                    nodes.append(ob.node("Sqrt", [mid], [out]))
                    host[out] = np.sqrt(np.abs(host[x])).astype(np.float32)
                else:
                    nodes.append(ob.node(kind, [x], [out]))
                    f = {"Relu": lambda v: np.maximum(v, 0),
                         "Neg": np.negative, "Abs": np.abs}[kind]
                    host[out] = f(host[x]).astype(np.float32)
            else:  # ReduceSum / ReduceMean over axis 0, keepdims → variant
                cands = [n for n in pool_any if host[n].ndim == 2]
                if not cands:
                    continue
                x = str(rng.choice(cands))
                nodes.append(ob.node(kind, [x], [out], keepdims=1, axes=[0]))
                f = np.sum if kind == "ReduceSum" else np.mean
                host[out] = f(host[x], axis=0, keepdims=True).astype(np.float32)
            pool_any.append(out)
            if host[out].shape == full:
                pool_full.append(out)
        final = pool_any[-1]
        if final in values:  # degenerate trial (every step continue'd)
            continue
        (got,) = run_graph(nodes, dynamic, [final], initializers=static)
        np.testing.assert_allclose(
            got, host[final], atol=1e-4, rtol=1e-4,
            err_msg=f"trial {trial} (static={list(static)})")


def test_random_dag_with_static_inputs_folds():
    """Same DAG with every input an initializer must fully fold (output is
    computed at trace time) and still match."""
    rng = np.random.default_rng(7)
    shape = (3, 4)
    consts = {f"c{i}": rng.standard_normal(shape).astype(np.float32)
              for i in range(2)}
    nodes = [
        ob.node("Add", ["c0", "c1"], ["s"]),
        ob.node("Relu", ["s"], ["r"]),
        ob.node("Mul", ["r", "c0"], ["m"]),
    ]
    # one dynamic passthrough input so the model has a runtime signature
    nodes.append(ob.node("Add", ["m", "x"], ["y"]))
    x = np.zeros(shape, np.float32)
    (y,) = run_graph(nodes, {"x": x}, ["y"], initializers=consts)
    want = np.maximum(consts["c0"] + consts["c1"], 0) * consts["c0"]
    np.testing.assert_allclose(y, want, atol=1e-6)
