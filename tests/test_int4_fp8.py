"""4-bit (uint4/int4, opset 21) and float8 tensor dtypes — the storage
types 4-bit-quantized LLM exports and fp8 deployments use. The reference's
dtype table stops at the classic types (model.rs:37)."""

import numpy as np
import pytest

from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel, builder as ob
from lele_tpu.onnx.loader import tensor_to_array
from lele_tpu.onnx.schema import Proto


def test_int4_roundtrip_odd_count():
    vals = np.array([[-8, 7, 3], [-1, 0, 5], [2, -4, 6]], dtype=np.int64)
    t = Proto(ob.tensor_int4(vals, "w"), "TensorProto")
    got = tensor_to_array(t)
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, vals.astype(np.int8))


def test_uint4_roundtrip():
    vals = np.array([0, 15, 7, 8, 1], dtype=np.int64)  # odd count
    t = Proto(ob.tensor_int4(vals, "w", signed=False), "TensorProto")
    got = tensor_to_array(t)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, vals.astype(np.uint8))


def test_int4_external_side_file(tmp_path):
    vals = np.array([3, -2, 7, -8, 1, 0, 5], dtype=np.int64)
    td = ob.tensor_int4(vals, "w")
    packed = td.pop("raw_data")
    (tmp_path / "w4.bin").write_bytes(packed)
    td["data_location"] = 1
    td["external_data"] = [
        {"key": "location", "value": "w4.bin"},
        {"key": "offset", "value": "0"},
        {"key": "length", "value": str(len(packed))},
    ]
    got = tensor_to_array(Proto(td, "TensorProto"), tmp_path)
    np.testing.assert_array_equal(got, vals.astype(np.int8))


def test_int4_truncated_raises():
    vals = np.arange(6, dtype=np.int64) - 3
    td = ob.tensor_int4(vals, "w")
    td["raw_data"] = td["raw_data"][:2]  # 6 elements need 3 bytes
    with pytest.raises(ValueError, match="raw_data"):
        tensor_to_array(Proto(td, "TensorProto"))


def test_int4_dequantize_linear_compiles():
    """The 4-bit weight-only layout: DequantizeLinear(int4 W, scale) →
    MatMul, through the full compile pipeline."""
    rng = np.random.default_rng(0)
    wq = rng.integers(-8, 8, (4, 3)).astype(np.int64)
    scale = np.float32(0.25)
    nodes = [
        ob.node("DequantizeLinear", ["wq", "sc"], ["w"]),
        ob.node("MatMul", ["x", "w"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [2, 4])],
        outputs=[ob.value_info("y", 1, [2, 3])],
        initializers=[
            ob.tensor_int4(wq, "wq"),
            ob.tensor_from_array(scale.reshape(()), "sc"),
        ],
        opset=21,
    )
    x = rng.standard_normal((2, 4)).astype(np.float32)
    got = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    want = x @ (wq.astype(np.float32) * 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_int4_blockwise_dequantize():
    """Opset-21 blocked DequantizeLinear: int4 weights with groupwise
    scales (block_size) — the 4-bit LLM checkpoint layout."""
    rng = np.random.default_rng(1)
    K, N, BLK = 8, 3, 4
    wq = rng.integers(-8, 8, (K, N)).astype(np.int64)
    scales = (rng.random((K // BLK, N)) * 0.3 + 0.05).astype(np.float32)
    zps = ob.tensor_int4(rng.integers(-4, 4, (K // BLK, N)), "zp")
    nodes = [
        ob.node("DequantizeLinear", ["wq", "sc", "zp"], ["w"],
                axis=0, block_size=BLK),
        ob.node("MatMul", ["x", "w"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [2, K])],
        outputs=[ob.value_info("y", 1, [2, N])],
        initializers=[
            ob.tensor_int4(wq, "wq"),
            ob.tensor_from_array(scales, "sc"),
            zps,
        ],
        opset=21,
    )
    x = rng.standard_normal((2, K)).astype(np.float32)
    got = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    zv = tensor_to_array(Proto(zps, "TensorProto")).astype(np.float32)
    w = (wq.astype(np.float32) - np.repeat(zv, BLK, 0)) \
        * np.repeat(scales, BLK, 0)
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)


def test_blockwise_qdq_roundtrip():
    """Blocked QuantizeLinear → DequantizeLinear round trip stays within
    half a quantization step everywhere."""
    rng = np.random.default_rng(2)
    K, N, BLK = 8, 4, 4
    x = rng.standard_normal((K, N)).astype(np.float32)
    sc = np.full((K // BLK, N), 0.02, np.float32)
    zp = np.zeros((K // BLK, N), np.int8)
    nodes = [
        ob.node("QuantizeLinear", ["x", "sc", "zp"], ["q"],
                axis=0, block_size=BLK),
        ob.node("DequantizeLinear", ["q", "sc", "zp"], ["y"],
                axis=0, block_size=BLK),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [K, N])],
        outputs=[ob.value_info("y", 1, [K, N])],
        initializers=[ob.tensor_from_array(sc, "sc"),
                      ob.tensor_from_array(zp, "zp")],
        opset=21,
    )
    got = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    # int8 saturation clips |x| > 127*0.02; compare on the linear region
    lin = np.abs(x) < 2.5
    assert np.abs(got - x)[lin].max() <= 0.011


def test_fp8_tensor_decodes_and_runs():
    ml_dtypes = pytest.importorskip("ml_dtypes")
    w8 = np.array([1.0, -2.0, 0.5, 4.0],
                  dtype=ml_dtypes.float8_e4m3fn)
    td = {
        "name": "w",
        "dims": [4],
        "data_type": 17,  # FLOAT8E4M3FN
        "raw_data": w8.tobytes(),
    }
    got = tensor_to_array(Proto(td, "TensorProto"))
    assert got.dtype == np.dtype(ml_dtypes.float8_e4m3fn)
    np.testing.assert_array_equal(got.astype(np.float32),
                                  w8.astype(np.float32))
    # through the pipeline: Cast(fp8→f32) then Add
    nodes = [
        ob.node("Cast", ["w"], ["wf"], to=1),
        ob.node("Add", ["x", "wf"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [4])],
        outputs=[ob.value_info("y", 1, [4])],
        initializers=[td],
        opset=21,
    )
    x = np.ones(4, np.float32)
    out = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    np.testing.assert_allclose(out, x + w8.astype(np.float32), rtol=1e-6)
