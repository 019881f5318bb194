"""Multi-model composition: N compiled ONNX graphs → one device program
(replacing the reference's host-copy chaining, SURVEY.md §3.4)."""

import numpy as np

import jax
import jax.numpy as jnp

from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel, builder as ob
from lele_tpu.runtime.compose import compose_models

rng = np.random.default_rng(41)


def _linear_model(d_in, d_out, seed, name="x"):
    w = rng.standard_normal((d_in, d_out)).astype(np.float32)
    bs = ob.build_model_bytes(
        [ob.node("MatMul", [name, "w"], ["mm"]), ob.node("Tanh", ["mm"], ["y"])],
        inputs=[ob.value_info(name, 1, [2, d_in])],
        outputs=[ob.value_info("y", 1, [2, d_out])],
        initializers=[ob.tensor_from_array(w, "w")],
    )
    return compile_model(OnnxModel.from_bytes(bs)), w


def test_two_model_chain_single_program():
    enc, w1 = _linear_model(8, 16, 0)
    dec, w2 = _linear_model(16, 4, 1)

    pipe = compose_models(
        {"enc": enc, "dec": dec},
        lambda call, x: call("dec", x=call("enc", x=x)[0])[0],
    )
    x = rng.standard_normal((2, 8)).astype(np.float32)
    out = np.asarray(pipe(x))
    want = np.tanh(np.tanh(x @ w1) @ w2)
    np.testing.assert_allclose(out, want, atol=1e-4)  # TPU tanh ulps


def test_flow_matching_style_loop_on_device():
    """Iterated sub-model (the 5-step VectorEstimator pattern) as one
    fori_loop in the composed program."""
    est, w = _linear_model(8, 8, 2)

    def pipeline(call, x0):
        def step(i, x):
            v = call("est", x=x)[0]
            return x + 0.2 * v

        return jax.lax.fori_loop(0, 5, step, x0)

    pipe = compose_models({"est": est}, pipeline)
    x0 = rng.standard_normal((2, 8)).astype(np.float32)
    out = np.asarray(pipe(x0))
    want = x0.copy()
    for _ in range(5):
        want = want + 0.2 * np.tanh(want @ w)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_compose_missing_input_errors():
    enc, _ = _linear_model(8, 16, 3)
    pipe = compose_models({"enc": enc}, lambda call, x: call("enc")[0])
    try:
        pipe(np.zeros((2, 8), np.float32))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "missing inputs" in str(e)
