"""ONNX local-function (FunctionProto) inlining through the compile path.

torch.onnx's `export_modules_as_functions` (and dynamo-exporter module
packaging) emit these; the reference cannot load them at all — its prost
schema (src/onnx_proto_gen.rs) does not decode ModelProto field 25. We
inline before tracing (lele_tpu/onnx/functions.py) so the tracer sees one
flat graph.

Covers: basic call, repeated calls (name-collision isolation), nested
function-calls-function, attribute forwarding via ref_attr_name (call-site
value, function default, absent→op-default), function call inside an If
branch subgraph, subgraph inside a function body capturing function-local
names, builtin-shadowing precedence (a function named like a standard op in
the default domain must NOT shadow the kernel), and recursion rejection.
"""

import numpy as np
import pytest

from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel, builder as ob
from lele_tpu.onnx import schema


def _compile_np(m_dict, **inputs):
    bs = ob.serialize(m_dict)
    cm = compile_model(OnnxModel.from_bytes(bs))
    return cm.run_np(**inputs)


def _mk_model(nodes, inputs, outputs, functions, inits=()):
    g = ob.graph(nodes, "g", inputs, outputs, inits)
    return ob.model(g, functions=functions)


def test_basic_call_and_repeat():
    """Two calls to one function — internal names must not collide."""
    sq = ob.function(
        "Square", ["a"], ["b"],
        [ob.node("Mul", ["a", "a"], ["tmp"]), ob.node("Identity", ["tmp"], ["b"])],
    )
    nodes = [
        ob.node("Square", ["x"], ["h"], domain="local"),
        ob.node("Square", ["h"], ["y"], domain="local"),
    ]
    m = _mk_model(
        nodes,
        [ob.value_info("x", 1, [3])],
        [ob.value_info("y", 1, [3])],
        [sq],
    )
    x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, x ** 4, rtol=1e-6)


def test_nested_functions():
    inner = ob.function(
        "Twice", ["a"], ["b"], [ob.node("Add", ["a", "a"], ["b"])]
    )
    outer = ob.function(
        "Quad", ["a"], ["b"],
        [
            ob.node("Twice", ["a"], ["t"], domain="local"),
            ob.node("Twice", ["t"], ["b"], domain="local"),
        ],
    )
    m = _mk_model(
        [ob.node("Quad", ["x"], ["y"], domain="local")],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [inner, outer],
    )
    x = np.array([1.5, -2.0], dtype=np.float32)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, 4 * x, rtol=1e-6)


def test_ref_attr_forwarding_and_default():
    """LeakyRelu alpha forwarded from the call site; second call relies on
    the function's declared default."""
    body = [
        ob.node("LeakyRelu", ["a"], ["b"]),
    ]
    body[0]["attribute"] = [ob.ref_attr("alpha", "slope", schema.ATTR_FLOAT)]
    f = ob.function(
        "MyLeaky", ["a"], ["b"], body,
        attributes=["slope"], attribute_defaults={"slope": 0.5},
    )
    call1 = ob.node("MyLeaky", ["x"], ["h"], domain="local", slope=0.25)
    call2 = ob.node("MyLeaky", ["h"], ["y"], domain="local")  # default 0.5
    m = _mk_model(
        [call1, call2],
        [ob.value_info("x", 1, [4])],
        [ob.value_info("y", 1, [4])],
        [f],
    )
    x = np.array([-4.0, -1.0, 0.0, 2.0], dtype=np.float32)
    h = np.where(x < 0, 0.25 * x, x)
    want = np.where(h < 0, 0.5 * h, h)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ref_attr_absent_uses_op_default():
    """No call-site attr, no function default → the op's own default
    (LeakyRelu alpha=0.01)."""
    body = [ob.node("LeakyRelu", ["a"], ["b"])]
    body[0]["attribute"] = [ob.ref_attr("alpha", "slope", schema.ATTR_FLOAT)]
    f = ob.function("MyLeaky", ["a"], ["b"], body, attributes=["slope"])
    m = _mk_model(
        [ob.node("MyLeaky", ["x"], ["y"], domain="local")],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [f],
    )
    x = np.array([-1.0, 1.0], dtype=np.float32)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, np.where(x < 0, 0.01 * x, x), rtol=1e-5)


def test_call_inside_if_branch():
    """Function call nested in an If-branch subgraph (static cond folds)."""
    dbl = ob.function(
        "Dbl", ["a"], ["b"], [ob.node("Add", ["a", "a"], ["b"])]
    )
    then_g = ob.graph(
        [ob.node("Dbl", ["x"], ["tb"], domain="local")],
        "then", [], [ob.value_info("tb", 1, [2])],
    )
    else_g = ob.graph(
        [ob.node("Neg", ["x"], ["eb"])],
        "else", [], [ob.value_info("eb", 1, [2])],
    )
    nodes = [ob.node("If", ["cond"], ["y"], then_branch=then_g, else_branch=else_g)]
    m = _mk_model(
        nodes,
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [dbl],
        inits=[ob.tensor_from_array(np.array(True), "cond")],
    )
    x = np.array([3.0, -1.0], dtype=np.float32)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, 2 * x, rtol=1e-6)


def test_subgraph_in_body_captures_local():
    """An If inside the function body whose branches capture a
    function-LOCAL tensor — the per-call rename must reach inside."""
    then_g = ob.graph(
        [ob.node("Identity", ["loc"], ["tb"])],
        "then", [], [ob.value_info("tb", 1, [2])],
    )
    else_g = ob.graph(
        [ob.node("Neg", ["loc"], ["eb"])],
        "else", [], [ob.value_info("eb", 1, [2])],
    )
    body = [
        ob.node("Add", ["a", "a"], ["loc"]),
        ob.node("If", ["flag"], ["b"], then_branch=then_g, else_branch=else_g),
    ]
    f = ob.function("CapIf", ["a", "flag"], ["b"], body)
    m = _mk_model(
        [
            ob.node("CapIf", ["x", "t"], ["p"], domain="local"),
            ob.node("CapIf", ["x", "f"], ["q"], domain="local"),
            ob.node("Sub", ["p", "q"], ["y"]),
        ],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [f],
        inits=[
            ob.tensor_from_array(np.array(True), "t"),
            ob.tensor_from_array(np.array(False), "f"),
        ],
    )
    x = np.array([1.0, 4.0], dtype=np.float32)
    # p = 2x (then), q = -2x (else) → y = 4x
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, 4 * x, rtol=1e-6)


def test_ref_attr_inside_body_subgraph():
    """ref_attr_name at depth: a LeakyRelu INSIDE an If branch of the
    function body still resolves the caller's attribute."""
    leaky = ob.node("LeakyRelu", ["a"], ["tb"])
    leaky["attribute"] = [ob.ref_attr("alpha", "slope", schema.ATTR_FLOAT)]
    then_g = ob.graph([leaky], "then", [], [ob.value_info("tb", 1, [2])])
    else_g = ob.graph(
        [ob.node("Neg", ["a"], ["eb"])],
        "else", [], [ob.value_info("eb", 1, [2])],
    )
    body = [ob.node("If", ["flag"], ["b"],
                    then_branch=then_g, else_branch=else_g)]
    f = ob.function("DeepLeaky", ["a", "flag"], ["b"], body,
                    attributes=["slope"])
    m = _mk_model(
        [ob.node("DeepLeaky", ["x", "t"], ["y"], domain="local", slope=0.125)],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [f],
        inits=[ob.tensor_from_array(np.array(True), "t")],
    )
    x = np.array([-8.0, 2.0], dtype=np.float32)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, np.where(x < 0, 0.125 * x, x), rtol=1e-6)


def test_default_domain_function_does_not_shadow_builtin():
    """A function named `Relu` in the DEFAULT domain must not shadow the
    native kernel (onnxruntime precedence)."""
    evil = ob.function(
        "Relu", ["a"], ["b"], [ob.node("Neg", ["a"], ["b"])], domain=""
    )
    m = _mk_model(
        [ob.node("Relu", ["x"], ["y"])],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [evil],
    )
    x = np.array([-1.0, 2.0], dtype=np.float32)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, np.maximum(x, 0.0))


def test_default_domain_function_without_kernel_inlines():
    """A default-domain function whose name matches NO registered kernel
    must inline (onnx.inliner behavior) — precedence only shields real
    kernels."""
    f = ob.function(
        "MyBlock", ["a"], ["b"],
        [ob.node("Add", ["a", "a"], ["b"])], domain="",
    )
    m = _mk_model(
        [ob.node("MyBlock", ["x"], ["y"])],  # default-domain call
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [f],
    )
    x = np.array([1.0, -2.0], dtype=np.float32)
    got = _compile_np(m, x=x)[0]
    np.testing.assert_allclose(got, 2 * x, rtol=1e-6)


def test_function_opset_mismatch_rejected():
    """A function pinning a DIFFERENT ai.onnx opset than the model would be
    silently re-interpreted after inlining — must refuse instead."""
    f = ob.function(
        "Old", ["a"], ["b"], [ob.node("Add", ["a", "a"], ["b"])],
        opset=12,
    )
    m = _mk_model(
        [ob.node("Old", ["x"], ["y"], domain="local")],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [f],
    )  # model opset 17 vs function opset 12
    with pytest.raises(NotImplementedError, match="opset"):
        _compile_np(m, x=np.zeros(2, dtype=np.float32))


def test_recursive_function_rejected():
    f = ob.function(
        "Loopy", ["a"], ["b"],
        [ob.node("Loopy", ["a"], ["b"], domain="local")],
    )
    m = _mk_model(
        [ob.node("Loopy", ["x"], ["y"], domain="local")],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [f],
    )
    with pytest.raises(ValueError, match="recursive"):
        _compile_np(m, x=np.zeros(2, dtype=np.float32))


def test_wire_roundtrip_preserves_functions():
    """FunctionProto survives encode→decode through our wire codec."""
    f = ob.function(
        "Sq", ["a"], ["b"], [ob.node("Mul", ["a", "a"], ["b"])],
        attributes=["k"], attribute_defaults={"k": 2},
    )
    m = _mk_model(
        [ob.node("Sq", ["x"], ["y"], domain="local")],
        [ob.value_info("x", 1, [2])],
        [ob.value_info("y", 1, [2])],
        [f],
    )
    dec = schema.decode_model(ob.serialize(m))
    fns = dec.functions
    assert len(fns) == 1
    assert fns[0].name == "Sq" and fns[0].domain == "local"
    assert list(fns[0].input) == ["a"] and list(fns[0].output) == ["b"]
    assert [a.name for a in fns[0].attribute_proto] == ["k"]
    assert fns[0].node[0].op_type == "Mul"
