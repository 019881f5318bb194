"""ONNX substrate tests: builder→bytes→loader round-trip.

Mirrors the reference's prost round-trip suite
(/root/reference/tests/verify_onnx.rs:5-35) plus dtype coverage beyond it.
"""

import numpy as np

from lele_tpu.onnx import OnnxModel, builder as ob, tensor_to_array


def _simple_model_bytes():
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    nodes = [
        ob.node("MatMul", ["x", "w"], ["mm"]),
        ob.node("Relu", ["mm"], ["y"]),
    ]
    return ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [4, 2])],
        outputs=[ob.value_info("y", 1, [4, 3])],
        initializers=[ob.tensor_from_array(w, "w")],
    )


def test_roundtrip_structure():
    m = OnnxModel.from_bytes(_simple_model_bytes())
    g = m.graph
    assert [n.op_type for n in g.node] == ["MatMul", "Relu"]
    assert g.node[0].input == ["x", "w"]
    assert g.node[1].output == ["y"]
    assert m.input_names() == ["x"]
    assert m.output_names() == ["y"]
    assert m.opset == 17


def test_roundtrip_initializer_values():
    m = OnnxModel.from_bytes(_simple_model_bytes())
    w = m.initializer_array("w")
    np.testing.assert_array_equal(w, np.arange(6, dtype=np.float32).reshape(2, 3))
    assert w.dtype == np.float32


def test_all_dtypes_roundtrip():
    dtypes = [
        np.float32, np.float16, np.float64, np.int8, np.uint8,
        np.int16, np.int32, np.int64, np.uint16, np.uint32, np.uint64, np.bool_,
    ]
    inits, names = [], []
    rng = np.random.default_rng(0)
    arrays = {}
    for i, dt in enumerate(dtypes):
        if dt is np.bool_:
            a = rng.integers(0, 2, size=(3, 2)).astype(bool)
        elif np.issubdtype(dt, np.floating):
            a = rng.standard_normal((3, 2)).astype(dt)
        else:
            a = rng.integers(0, 100, size=(3, 2)).astype(dt)
        name = f"t{i}"
        inits.append(ob.tensor_from_array(a, name))
        names.append(name)
        arrays[name] = a
    bs = ob.build_model_bytes(
        [ob.node("Identity", ["x"], ["y"])],
        inputs=[ob.value_info("x", 1, [1])],
        outputs=[ob.value_info("y", 1, [1])],
        initializers=inits,
    )
    m = OnnxModel.from_bytes(bs)
    for name in names:
        got = m.initializer_array(name)
        np.testing.assert_array_equal(got, arrays[name])
        assert got.dtype == arrays[name].dtype


def test_attributes_roundtrip():
    n = ob.node(
        "Conv", ["x", "w"], ["y"],
        strides=[2, 2], pads=[1, 1, 1, 1], group=4,
        alpha=0.5, auto_pad="NOTSET", scales=[1.0, 2.0],
    )
    bs = ob.build_model_bytes(
        [n],
        inputs=[ob.value_info("x", 1, [1, 3, 8, 8])],
        outputs=[ob.value_info("y", 1, [1, 3, 4, 4])],
    )
    m = OnnxModel.from_bytes(bs)
    attrs = {a.name: a for a in m.graph.node[0].attribute}
    assert attrs["strides"].ints == [2, 2]
    assert attrs["group"].i == 4
    assert abs(attrs["alpha"].f - 0.5) < 1e-7
    assert attrs["auto_pad"].s == b"NOTSET"
    assert attrs["scales"].floats == [1.0, 2.0]


def test_constant_node_tensor_lookup():
    c = np.float32([[3.0, 4.0]])
    nodes = [
        ob.node("Constant", [], ["c"], value=c),
        ob.node("Add", ["x", "c"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [1, 2])],
        outputs=[ob.value_info("y", 1, [1, 2])],
    )
    m = OnnxModel.from_bytes(bs)
    t = m.find_constant_node_tensor("c")
    assert t is not None
    np.testing.assert_array_equal(tensor_to_array(t), c)


def test_negative_ints_and_subgraph():
    sub = ob.graph(
        [ob.node("Identity", ["si"], ["so"])],
        name="then",
        outputs=[ob.value_info("so", 1, [1])],
    )
    n = ob.node("If", ["cond"], ["y"], then_branch=sub, else_branch=sub, axis=-1)
    bs = ob.build_model_bytes(
        [n],
        inputs=[ob.value_info("cond", 9, [])],
        outputs=[ob.value_info("y", 1, [1])],
    )
    m = OnnxModel.from_bytes(bs)
    attrs = {a.name: a for a in m.graph.node[0].attribute}
    assert attrs["axis"].i == -1
    assert attrs["then_branch"].g.node[0].op_type == "Identity"


def test_dynamic_dims():
    bs = ob.build_model_bytes(
        [ob.node("Identity", ["x"], ["y"])],
        inputs=[ob.value_info("x", 1, ["batch", 512])],
        outputs=[ob.value_info("y", 1, ["batch", 512])],
    )
    m = OnnxModel.from_bytes(bs)
    (name, dt, dims), = m.input_info()
    assert name == "x" and dt == 1
    assert dims == ["batch", 512]


def test_wire_decoder_fuzz_no_crashes():
    """Random mutations of a valid model must either decode or raise
    ValueError — never crash with anything else (loader robustness)."""
    import random

    base = bytearray(_simple_model_bytes())
    rnd = random.Random(0)
    crashes = 0
    for trial in range(200):
        data = bytearray(base)
        for _ in range(rnd.randint(1, 8)):
            pos = rnd.randrange(len(data))
            data[pos] = rnd.randrange(256)
        try:
            OnnxModel.from_bytes(bytes(data))
        except (ValueError, OverflowError, UnicodeDecodeError, KeyError):
            pass
        except MemoryError:
            pass  # absurd length prefix; allocation guarded by available RAM
        except Exception as e:  # pragma: no cover
            crashes += 1
    assert crashes == 0
