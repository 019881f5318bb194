"""Dataflow-based DQL chain fusion (VERDICT r1 #3): interleaved
DynamicQuantizeLinear → MatMulInteger → Cast/Mul chains must hit the fused
path — real int8 exports interleave chain nodes, which is why the reference
dedicates a reorder pass to chain grouping (mod.rs:865-990). Each test
asserts BOTH the numeric oracle and the pattern-hit counter."""

import numpy as np

from optest import assert_close
from lele_tpu.compiler import Compiler
from lele_tpu.onnx import OnnxModel, builder as ob

rng = np.random.default_rng(17)


def _compile(nodes, inputs, outputs, initializers):
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.vi_from_array(k, v) for k, v in inputs.items()],
        outputs=[ob.value_info(o, 1, []) for o in outputs],
        initializers=[ob.tensor_from_array(v, k) for k, v in initializers.items()],
    )
    return Compiler().compile(OnnxModel.from_bytes(bs))


def _dql_oracle(x, w_u8, wzp, wscale):
    scale = (max(x.max(), 0) - min(x.min(), 0)) / 255.0
    zp = np.round(np.clip(-min(x.min(), 0) / scale, 0, 255))
    q = np.clip(np.round(x / scale) + zp, 0, 255).astype(np.int64)
    mm = (q - int(zp)) @ (w_u8.astype(np.int64) - int(wzp))
    return mm.astype(np.float32) * (scale * wscale), mm


def test_interleaved_chain_hits_fused_epilogue():
    """Chain nodes separated by unrelated arithmetic still fuse."""
    x = rng.standard_normal((5, 192)).astype(np.float32)
    w = rng.integers(0, 255, (192, 64)).astype(np.uint8)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("Relu", ["x"], ["side1"]),            # interleaved
        ob.node("MatMulInteger", ["q", "w", "azp", "wzp"], ["mm"]),
        ob.node("Neg", ["side1"], ["side2"]),         # interleaved
        ob.node("Mul", ["ascale", "wscale"], ["scale2"]),
        ob.node("Abs", ["side2"], ["side3"]),         # interleaved
        ob.node("Cast", ["mm"], ["mmf"], to=1),
        ob.node("ReduceMax", ["side3"], ["side4"], keepdims=0),  # interleaved
        ob.node("Mul", ["mmf", "scale2"], ["y0"]),
        ob.node("Add", ["y0", "side4"], ["y"]),
    ]
    # wzp = 128 so the i8 shift lands on zero (the clean fused case)
    cm = _compile(nodes, {"x": x}, ["y"],
                  {"w": w, "wzp": np.uint8(128), "wscale": np.float32(0.017)})
    assert cm.stats["pattern_hits"].get("dql_fused_epilogue") == 1
    (y,) = cm.run_np(x=x)
    want_mm, _ = _dql_oracle(x, w, 128, 0.017)
    want = want_mm + np.abs(-np.maximum(x, 0)).max()
    assert_close(y, want, tol=np.abs(want).max() * 1e-5 + 1e-5)


def test_shared_quantized_activation_fuses_every_consumer():
    """One DQL feeding several MatMulIntegers (the real qkv export shape):
    every consumer fuses."""
    x = rng.standard_normal((3, 128)).astype(np.float32)
    w1 = rng.integers(0, 255, (128, 32)).astype(np.uint8)
    w2 = rng.integers(0, 255, (128, 48)).astype(np.uint8)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w1", "azp", "z128"], ["mm1"]),
        ob.node("MatMulInteger", ["q", "w2", "azp", "z128"], ["mm2"]),
        ob.node("Cast", ["mm1"], ["mf1"], to=1),
        ob.node("Cast", ["mm2"], ["mf2"], to=1),
        ob.node("Mul", ["ascale", "s1"], ["c1"]),
        ob.node("Mul", ["ascale", "s2"], ["c2"]),
        ob.node("Mul", ["mf1", "c1"], ["y1"]),
        ob.node("Mul", ["mf2", "c2"], ["y2"]),
    ]
    cm = _compile(nodes, {"x": x}, ["y1", "y2"],
                  {"w1": w1, "w2": w2, "z128": np.uint8(128),
                   "s1": np.float32(0.02), "s2": np.float32(0.05)})
    assert cm.stats["pattern_hits"].get("dql_fused_epilogue") == 2
    y1, y2 = cm.run_np(x=x)
    want1, _ = _dql_oracle(x, w1, 128, 0.02)
    want2, _ = _dql_oracle(x, w2, 128, 0.05)
    assert_close(y1, want1, tol=np.abs(want1).max() * 1e-5 + 1e-5)
    assert_close(y2, want2, tol=np.abs(want2).max() * 1e-5 + 1e-5)


def test_graph_output_mm_keeps_int32_semantics():
    """When the MatMulInteger result is itself a graph output, the epilogue
    must not swallow it — int32-level fusion binds the exact value."""
    x = rng.standard_normal((4, 96)).astype(np.float32)
    w = rng.integers(0, 255, (96, 24)).astype(np.uint8)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w", "azp", "z"], ["mm"]),
        ob.node("Cast", ["mm"], ["mmf"], to=1),
        ob.node("Mul", ["ascale", "ws"], ["c"]),
        ob.node("Mul", ["mmf", "c"], ["y"]),
    ]
    cm = _compile(nodes, {"x": x}, ["y", "mm"],
                  {"w": w, "z": np.uint8(128), "ws": np.float32(0.03)})
    hits = cm.stats["pattern_hits"]
    assert hits.get("dql_fused_int32") == 1 and "dql_fused_epilogue" not in hits
    y, mm = cm.run_np(x=x)
    want_y, want_mm = _dql_oracle(x, w, 128, 0.03)
    np.testing.assert_array_equal(mm.astype(np.int64), want_mm)
    assert_close(y, want_y, tol=np.abs(want_y).max() * 1e-5 + 1e-5)


def test_nonzero_weight_zp_takes_int32_path():
    """wzp ≠ 128 (i8-shift non-zero) needs the rowsum correction — the
    int32 fusion carries it; numerics stay exact."""
    x = rng.standard_normal((6, 80)).astype(np.float32)
    w = rng.integers(0, 255, (80, 16)).astype(np.uint8)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w", "azp", "z"], ["mm"]),
        ob.node("Cast", ["mm"], ["mmf"], to=1),
        ob.node("Mul", ["ascale", "ws"], ["c"]),
        ob.node("Mul", ["mmf", "c"], ["y"]),
    ]
    cm = _compile(nodes, {"x": x}, ["y"],
                  {"w": w, "z": np.uint8(140), "ws": np.float32(0.011)})
    assert cm.stats["pattern_hits"].get("dql_fused_int32") == 1
    (y,) = cm.run_np(x=x)
    want, _ = _dql_oracle(x, w, 140, 0.011)
    assert_close(y, want, tol=np.abs(want).max() * 1e-5 + 1e-5)


def test_quantized_output_with_external_consumer_stays_bound():
    """q also read by a non-matmul consumer: fusion proceeds and q keeps its
    exact u8 value for the other consumer."""
    x = rng.standard_normal((2, 64)).astype(np.float32)
    w = rng.integers(0, 255, (64, 8)).astype(np.uint8)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w", "azp", "z"], ["mm"]),
        ob.node("Cast", ["q"], ["qf"], to=1),  # external consumer of q
        ob.node("Cast", ["mm"], ["mmf"], to=1),
        ob.node("Mul", ["ascale", "ws"], ["c"]),
        ob.node("Mul", ["mmf", "c"], ["y"]),
        ob.node("ReduceSum", ["qf"], ["qsum"], keepdims=0),
    ]
    cm = _compile(nodes, {"x": x}, ["y", "qsum"],
                  {"w": w, "z": np.uint8(128), "ws": np.float32(0.04)})
    assert cm.stats["pattern_hits"].get("dql_fused_epilogue") == 1
    y, qsum = cm.run_np(x=x)
    want, _ = _dql_oracle(x, w, 128, 0.04)
    scale = (max(x.max(), 0) - min(x.min(), 0)) / 255.0
    zp = np.round(np.clip(-min(x.min(), 0) / scale, 0, 255))
    q = np.clip(np.round(x / scale) + zp, 0, 255)
    assert_close(y, want, tol=np.abs(want).max() * 1e-5 + 1e-5)
    assert abs(float(qsum) - q.sum()) < 1e-3


def test_mmi_omitted_azp_uses_onnx_default_zero():
    """MatMulInteger with NO a_zero_point input: ONNX default is 0, NOT the
    DQL-produced zp — the int32 fusion must compute raw q·(w−wzp)."""
    x = rng.standard_normal((3, 48)).astype(np.float32)
    w = rng.integers(0, 255, (48, 8)).astype(np.uint8)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w"], ["mm"]),   # azp + wzp omitted
        ob.node("Cast", ["mm"], ["y"], to=1),
    ]
    cm = _compile(nodes, {"x": x}, ["y"], {"w": w})
    assert cm.stats["pattern_hits"].get("dql_fused_int32") == 1
    (y,) = cm.run_np(x=x)
    scale = (max(x.max(), 0) - min(x.min(), 0)) / 255.0
    zp = np.round(np.clip(-min(x.min(), 0) / scale, 0, 255))
    q = np.clip(np.round(x / scale) + zp, 0, 255).astype(np.int64)
    want = (q @ w.astype(np.int64)).astype(np.float32)  # azp = 0: raw q·w
    assert_close(y, want, tol=np.abs(want).max() * 1e-6 + 1e-5)


def test_partial_dequant_static_scalar_not_misfused():
    """float(mm) * static_const is NOT the full dequant (a_scale is dynamic
    by construction) — fusing it as one used to multiply by a spurious
    a_scale. Must take the int32 path and stay exact."""
    x = rng.standard_normal((2, 32)).astype(np.float32)
    w = rng.integers(0, 255, (32, 4)).astype(np.uint8)
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w", "azp", "z"], ["mm"]),
        ob.node("Cast", ["mm"], ["mmf"], to=1),
        ob.node("Mul", ["mmf", "k"], ["y"]),   # k static: partial dequant
    ]
    cm = _compile(nodes, {"x": x}, ["y"],
                  {"w": w, "z": np.uint8(128), "k": np.float32(0.25)})
    assert cm.stats["pattern_hits"].get("dql_fused_epilogue") is None
    assert cm.stats["pattern_hits"].get("dql_fused_int32") == 1
    (y,) = cm.run_np(x=x)
    _, mm = _dql_oracle(x, w, 128, 1.0)
    want = mm.astype(np.float32) * 0.25
    assert_close(y, want, tol=np.abs(want).max() * 1e-6 + 1e-5)


def test_chain_intermediate_read_by_subgraph_not_claimed():
    """An If body implicitly captures the Cast output of a DQL chain: the
    epilogue must NOT claim it (the body needs the value bound)."""
    x = rng.standard_normal((2, 32)).astype(np.float32)
    w = rng.integers(0, 255, (32, 4)).astype(np.uint8)
    then_g = ob.graph(
        [ob.node("ReduceSum", ["mmf"], ["t_out"], keepdims=0)],
        name="then", inputs=[], outputs=[ob.value_info("t_out", 1, [])],
    )
    else_g = ob.graph(
        [ob.node("ReduceMax", ["mmf"], ["e_out"], keepdims=0)],
        name="else", inputs=[], outputs=[ob.value_info("e_out", 1, [])],
    )
    nodes = [
        ob.node("DynamicQuantizeLinear", ["x"], ["q", "ascale", "azp"]),
        ob.node("MatMulInteger", ["q", "w", "azp", "z"], ["mm"]),
        ob.node("Cast", ["mm"], ["mmf"], to=1),
        ob.node("Mul", ["ascale", "ws"], ["c"]),
        ob.node("Mul", ["mmf", "c"], ["y"]),
        ob.node("If", ["flag"], ["s"], then_branch=then_g, else_branch=else_g),
        ob.node("Add", ["y", "s"], ["out"]),
    ]
    cm = _compile(nodes, {"x": x}, ["out"],
                  {"w": w, "z": np.uint8(128), "ws": np.float32(0.02),
                   "flag": np.array(True)})
    (out,) = cm.run_np(x=x)
    want_y, mm = _dql_oracle(x, w, 128, 0.02)
    want = want_y + mm.astype(np.float32).sum()
    assert_close(out, want, tol=np.abs(want).max() * 1e-5 + 1e-4)
