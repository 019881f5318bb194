"""Regression tests for the round-4 advisor findings (ADVICE.md r4):

1. QuantizeLinear with an int4/uint4 zero point must clip at the 4-bit
   value range [-8,7]/[0,15], not the widened int8/uint8 storage range.
2. SimplifiedLayerNormalization reduces over [axis, rank) like
   LayerNormalization, not over the single `axis` dim.
3. quantize_static rewires EVERY input of a target node through the
   dequantized alias — a MatMul whose second input is a dynamic
   activation (attention scores) must read the fake-quant view too.
"""

import numpy as np

from optest import run_op
from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel, builder as ob
from lele_tpu.onnx import schema


def _quantize_model(zp_tensor, opset=21, **attrs):
    nodes = [ob.node("QuantizeLinear", ["x", "sc", "zp"] if zp_tensor
             else ["x", "sc"], ["y"], **attrs)]
    inits = [ob.tensor_from_array(np.float32(1.0).reshape(()), "sc")]
    if zp_tensor:
        inits.append(zp_tensor)
    return ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [6])],
        outputs=[ob.value_info("y", 1, [6])],
        initializers=inits,
        opset=opset,
    )


def test_quantize_linear_int4_zp_clips_4bit():
    """int4 zp storage widens to int8 but the clip range stays [-8,7]."""
    bs = _quantize_model(ob.tensor_int4(np.array(0), "zp"))
    x = np.array([-100.0, -9.0, -8.0, 3.0, 7.4, 100.0], np.float32)
    got = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, [-8, -8, -8, 3, 7, 7])


def test_quantize_linear_uint4_zp_clips_4bit():
    bs = _quantize_model(ob.tensor_int4(np.array(8), "zp", signed=False))
    x = np.array([-100.0, -3.0, 0.0, 5.0, 7.4, 100.0], np.float32)
    got = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, [0, 5, 8, 13, 15, 15])


def test_quantize_linear_output_dtype_int4():
    """Opset-21 `output_dtype` wins when no zp is given: 22 (int4) maps to
    int8 storage with the narrow [-8,7] bounds."""
    bs = _quantize_model(None, output_dtype=22)
    x = np.array([-100.0, -8.4, 0.0, 6.5, 7.6, 100.0], np.float32)
    got = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, [-8, -8, 0, 6, 7, 7])


def test_quantize_linear_output_dtype_int8():
    """output_dtype=3 (int8) without a zp: full int8 range, not uint8."""
    bs = _quantize_model(None, output_dtype=3)
    x = np.array([-300.0, -128.4, -1.0, 6.5, 127.6, 300.0], np.float32)
    got = compile_model(OnnxModel.from_bytes(bs)).run_np(x=x)[0]
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, [-128, -128, -1, 6, 127, 127])


def test_simplified_layer_norm_axis1_reduces_trailing_dims():
    """ORT schema: mean-square over [axis, rank), like LayerNormalization.
    axis=1 on a rank-3 input reduces BOTH trailing dims."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    w = rng.standard_normal((3, 4)).astype(np.float32)
    got = run_op("SimplifiedLayerNormalization", {"x": x, "w": w},
                 axis=1, epsilon=1e-5)[0]
    ms = (x.astype(np.float64) ** 2).mean((1, 2), keepdims=True)
    want = x / np.sqrt(ms + 1e-5) * w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_static_quant_rewires_second_dynamic_input():
    """A target MatMul over two dynamic activations (attention-score form:
    no static weight) must read the dequantized alias on BOTH inputs."""
    from lele_tpu.onnx.quantize import quantize_static

    rng = np.random.default_rng(11)
    w = rng.standard_normal((4, 4)).astype(np.float32)
    nodes = [
        ob.node("Relu", ["x"], ["a"]),
        ob.node("Transpose", ["a"], ["at"], perm=[1, 0]),
        ob.node("MatMul", ["a", "at"], ["y"]),  # both inputs dynamic
        ob.node("MatMul", ["y", "w"], ["z"]),   # classic weight target
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [4, 4])],
        outputs=[ob.value_info("z", 1, [4, 4])],
        initializers=[ob.tensor_from_array(w, "w")],
        opset=17,
    )
    batches = [{"x": rng.standard_normal((4, 4)).astype(np.float32)}
               for _ in range(3)]
    qdata = quantize_static(bs, batches)
    m = schema.decode_model(qdata)
    mm = [n for n in m.graph.node
          if n.op_type == "MatMul" and len(n.input) == 2]
    score = next(n for n in mm if "at" in n.input[1] or
                 n.input[1].startswith("at"))
    # both inputs of the dynamic-dynamic MatMul carry the _dq alias
    assert "_dq" in score.input[0], score.input
    assert "_dq" in score.input[1], score.input
    # and the quantized model still runs + approximates the float one
    ref = compile_model(OnnxModel.from_bytes(bs)).run_np(x=batches[0]["x"])[0]
    got = compile_model(OnnxModel.from_bytes(qdata)).run_np(
        x=batches[0]["x"])[0]
    assert np.abs(got - ref).max() < np.abs(ref).max() * 0.2 + 0.5
