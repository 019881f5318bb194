"""AOT export/reload round trip (compiler/aot.py): the artifact-persistence
analog of the reference's generated-code + weights blob (SURVEY.md §5
checkpoint/resume)."""

import numpy as np

from lele_tpu.compiler import compile_model
from lele_tpu.compiler.aot import export_model, load_exported
from lele_tpu.onnx import OnnxModel, builder as ob

rng = np.random.default_rng(21)


def _model():
    w = rng.standard_normal((8, 300)).astype(np.float32)
    b = rng.standard_normal((300,)).astype(np.float32)
    bs = ob.build_model_bytes(
        [
            ob.node("MatMul", ["x", "w"], ["mm"]),
            ob.node("Add", ["mm", "b"], ["ab"]),
            ob.node("Relu", ["ab"], ["y"]),
        ],
        inputs=[ob.value_info("x", 1, [3, 8])],
        outputs=[ob.value_info("y", 1, [3, 300])],
        initializers=[ob.tensor_from_array(w, "w"), ob.tensor_from_array(b, "b")],
    )
    return OnnxModel.from_bytes(bs), w, b


def test_aot_roundtrip(tmp_path):
    model, w, b = _model()
    cm = compile_model(model)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    (want,) = cm.run_np(x)

    path = tmp_path / "m.shlo"
    export_model(cm, path)
    assert path.stat().st_size > 0

    call = load_exported(path)
    import jax.numpy as jnp

    outs = call(cm.params, (), (jnp.asarray(x),))
    got = np.asarray(outs[0])
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got, np.maximum(x @ w + b, 0), atol=1e-4)
