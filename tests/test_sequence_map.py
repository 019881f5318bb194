"""SequenceMap: body subgraph mapped over host-list sequences (trace-time
unroll — the op exists for ragged sequences, which cannot stack)."""

import numpy as np

from lele_tpu.onnx import builder as ob
from optest import run_graph


def test_sequence_map_scale_and_concat():
    """SplitToSequence → SequenceMap(x2 per element) → ConcatFromSequence."""
    body = ob.graph(
        [ob.node("Mul", ["e", "e"], ["sq"])],
        "body",
        [ob.value_info("e", 1, [2])],
        [ob.value_info("sq", 1, [2])],
    )
    nodes = [
        ob.node("SplitToSequence", ["x"], ["seq"], axis=0, keepdims=0),
        ob.node("SequenceMap", ["seq"], ["mapped"], body=body),
        ob.node("ConcatFromSequence", ["mapped"], ["y"], axis=0, new_axis=1),
    ]
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    got = run_graph(nodes, {"x": x}, ["y"])[0]
    np.testing.assert_allclose(got, x * x, rtol=1e-6)


def test_sequence_map_extra_tensor_input():
    """A non-sequence extra input broadcasts to every element; two outputs."""
    body = ob.graph(
        [
            ob.node("Add", ["e", "c"], ["a"]),
            ob.node("ReduceSum", ["e"], ["s"], keepdims=0),
        ],
        "body",
        [ob.value_info("e", 1, [2]), ob.value_info("c", 1, [2])],
        [ob.value_info("a", 1, [2]), ob.value_info("s", 1, [])],
    )
    nodes = [
        ob.node("SplitToSequence", ["x"], ["seq"], axis=0, keepdims=0),
        ob.node("SequenceMap", ["seq", "c"], ["added", "sums"], body=body),
        ob.node("ConcatFromSequence", ["added"], ["y"], axis=0, new_axis=1),
        ob.node("ConcatFromSequence", ["sums"], ["z"], axis=0, new_axis=1),
    ]
    x = np.arange(8, dtype=np.float32).reshape(4, 2)
    c = np.array([10.0, 20.0], dtype=np.float32)
    y, z = run_graph(nodes, {"x": x, "c": c}, ["y", "z"])
    np.testing.assert_allclose(y, x + c, rtol=1e-6)
    np.testing.assert_allclose(z, x.sum(1), rtol=1e-6)


def test_sequence_map_ragged_elements():
    """The raison d'être: elements of DIFFERENT shapes map fine."""
    body = ob.graph(
        [ob.node("ReduceSum", ["e"], ["s"], keepdims=1)],
        "body",
        [ob.value_info("e", 1, ["n"])],
        [ob.value_info("s", 1, [1])],
    )
    nodes = [
        # split 5 elements into lengths [2, 3]
        ob.node("SplitToSequence", ["x", "lens"], ["seq"], axis=0),
        ob.node("SequenceMap", ["seq"], ["sums"], body=body),
        ob.node("ConcatFromSequence", ["sums"], ["y"], axis=0),
    ]
    x = np.arange(5, dtype=np.float32)
    got = run_graph(
        nodes, {"x": x}, ["y"],
        initializers={"lens": np.array([2, 3], dtype=np.int64)},
    )[0]
    np.testing.assert_allclose(got, [x[:2].sum(), x[2:].sum()], rtol=1e-6)
