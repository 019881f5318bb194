"""Compiler extension points: with_custom_method / with_override /
with_pattern (the builder surface of compiler/mod.rs:297-373)."""

import numpy as np

from lele_tpu.compiler import Compiler
from lele_tpu.onnx import OnnxModel, builder as ob

rng = np.random.default_rng(12)


def _toy():
    w = rng.standard_normal((4, 6)).astype(np.float32)
    bs = ob.build_model_bytes(
        [ob.node("MatMul", ["x", "w"], ["y"])],
        inputs=[ob.value_info("x", 1, [2, 4])],
        outputs=[ob.value_info("y", 1, [2, 6])],
        initializers=[ob.tensor_from_array(w, "w")],
    )
    return OnnxModel.from_bytes(bs), w


def test_with_custom_method():
    model, w = _toy()

    def top_activation(self, x):
        (y,) = self.run_np(x)
        return int(np.argmax(y.sum(axis=0)))

    cm = Compiler().with_custom_method("top_activation", top_activation).compile(model)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    assert cm.top_activation(x) == int((x @ w).sum(axis=0).argmax())


def test_with_override_replaces_builtin():
    model, w = _toy()

    def matmul_times_two(ctx, a, b):
        import jax
        import jax.numpy as jnp

        return 2.0 * jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    cm = Compiler().with_override("MatMul", matmul_times_two).compile(model)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    (y,) = cm.run_np(x)
    np.testing.assert_allclose(y, 2 * (x @ w), atol=1e-4)


def test_with_pattern_takes_precedence():
    model, w = _toy()

    def const_pattern(tracer, state, nodes, i, env, scope):
        if nodes[i].op_type != "MatMul":
            return None
        return 1, {nodes[i].output[0]: np.full((2, 6), 7.0, np.float32)}

    cm = Compiler().with_pattern(const_pattern).compile(model)
    (y,) = cm.run_np(np.zeros((2, 4), np.float32))
    np.testing.assert_array_equal(y, np.full((2, 6), 7.0, np.float32))


def test_profile_nodes_breakdown(capsys):
    from lele_tpu.compiler.debug import print_breakdown, profile_nodes

    model, w = _toy()
    recs = profile_nodes(model, {"x": rng.standard_normal((2, 4)).astype(np.float32)})
    assert [r["op_type"] for r in recs] == ["MatMul"]
    assert recs[0]["out_shapes"] == [(2, 6)]
    assert not recs[0]["nonfinite"]
    print_breakdown(recs)
    out = capsys.readouterr().out
    assert "MatMul" in out


def test_profile_nodes_flags_nonfinite():
    from lele_tpu.compiler.debug import profile_nodes
    from lele_tpu.onnx import OnnxModel, builder as ob

    nodes = [ob.node("Log", ["x"], ["y"])]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [3])],
        outputs=[ob.value_info("y", 1, [3])],
    )
    recs = profile_nodes(
        OnnxModel.from_bytes(bs), {"x": np.array([-1.0, 0.0, 1.0], np.float32)}
    )
    assert recs[0]["nonfinite"]
