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
