"""Packed conv-domain chain pass (compiler/conv_domain.py, VERDICT r2 #2).

The torch-exported YOLO fixture (5 stride-2 Conv+BN+SiLU stages + 1×1
head) must run its whole backbone in the packed domain with EXACT parity
vs the plain per-op compile; the analytic weight transform is also checked
directly against lax convs on random shapes (stride 1 and 2, asymmetric
pads).
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).resolve().parents[1] / "fixtures"


def _need(*names):
    missing = [n for n in names if not (FIXTURES / n).exists()]
    if missing:
        pytest.skip(f"fixtures not present: {missing}")


@pytest.mark.parametrize("block", [None, 2])
@pytest.mark.parametrize("stride,k,pads,C,O,H", [
    (2, 3, (1, 1), 3, 8, 32),      # torch-style symmetric pads
    (2, 3, (0, 1), 4, 16, 32),     # XLA SAME-style lo0/hi1
    (1, 3, (1, 1), 8, 8, 16),
    (1, 1, (0, 0), 16, 12, 16),    # pointwise
    (2, 6, (2, 2), 3, 8, 32),      # even kernel
    (1, 5, (2, 2), 4, 8, 16),
])
def test_packed_conv_weight_exact(stride, k, pads, C, O, H, block):
    """Analytic packed weight ≡ original conv (boundaries included).

    block=None → the stem form (input host-packed at S=2·stride, conv
    stride 1). block=2 → the CHAIN form (input is the running s2d2
    tensor; a stride-2 conv becomes a window-stride-2 packed conv — the
    r3 repack-free formulation)."""
    import jax
    import jax.numpy as jnp

    from lele_tpu.compiler.conv_domain import packed_conv_weight
    from lele_tpu.models.s2d import s2d, s2d_undo

    rng = np.random.default_rng(0)
    w = rng.standard_normal((O, C, k, k)).astype(np.float32)
    x = rng.standard_normal((1, C, H, H)).astype(np.float32)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (stride, stride),
        [(pads[0], pads[1]), (pads[0], pads[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out_h = (H + 2 * pads[0] + (pads[1] - pads[0]) - k) // stride + 1
    if stride == 2 and out_h * 2 != H:
        pytest.skip("shape combo leaves the s2d2 closure (not packable)")
    if stride == 1 and out_h != H:
        pytest.skip("not size-preserving (not packable)")
    S = 2 * stride if block is None else block
    Wp, (ph_lo, ph_hi), (pw_lo, pw_hi), cs = packed_conv_weight(
        w, stride, pads[0], pads[0], block=S)
    assert cs == 2 * stride // S
    xp = s2d(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), S)
    got_p = jax.lax.conv_general_dilated(
        xp, jnp.asarray(Wp), (cs, cs),
        [(ph_lo, ph_hi), (pw_lo, pw_hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = jnp.transpose(s2d_undo(got_p, 2), (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_yolo_fixture_full_chain_parity():
    """The whole fixture backbone routes through the packed domain
    (conv/BN/SiLU steps counted) with parity vs the plain compile."""
    _need("yolo26.onnx", "yolo26_input.npy")
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx.loader import OnnxModel

    x = np.load(FIXTURES / "yolo26_input.npy")
    size = x.shape[-1]
    model = OnnxModel.load(str(FIXTURES / "yolo26.onnx"))
    name = model.input_names()[0]
    plain = compile_model(model, input_shapes={name: (1, 3, size, size)})
    model2 = OnnxModel.load(str(FIXTURES / "yolo26.onnx"))
    packed = compile_model(model2, input_shapes={name: (1, 3, size, size)},
                           pack_image_stem=True)
    assert packed.stats["pattern_hits"].get("s2d_stem") == 1
    # torch export folds BN into the convs: 5 × (conv + SiLU) stages + the
    # 1×1 head conv = 11 chain steps — the ENTIRE backbone stays packed
    assert packed.stats["pattern_hits"].get("s2d_chain_ops") == 11, \
        packed.stats["pattern_hits"]
    want = [np.asarray(o) for o in plain.run_np(x)]
    got = [np.asarray(o) for o in packed.run_np(x)]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-4, rtol=1e-3)


def test_chain_stops_at_fanout_and_stays_correct():
    """A residual Add forces an early unpack; results stay exact."""
    import jax  # noqa: F401  (jax presence gates the compile)

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import builder as ob
    from lele_tpu.onnx.loader import OnnxModel

    rng = np.random.default_rng(1)
    w1 = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((8, 8, 3, 3)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((8, 8, 3, 3)).astype(np.float32) * 0.2
    nodes = [
        ob.node("Conv", ["img", "w1"], ["c1"], strides=[2, 2],
                pads=[1, 1, 1, 1]),
        ob.node("Relu", ["c1"], ["r1"]),
        # r1 fans out: conv branch + residual Add → chain must stop at r1
        ob.node("Conv", ["r1", "w2"], ["c2"], strides=[1, 1],
                pads=[1, 1, 1, 1]),
        ob.node("Add", ["c2", "r1"], ["a1"]),
        ob.node("Conv", ["a1", "w3"], ["out"], strides=[1, 1],
                pads=[1, 1, 1, 1]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("img", 1, [1, 3, 32, 32])],
        outputs=[ob.value_info("out", 1, [1, 8, 16, 16])],
        initializers=[ob.tensor_from_array(v, k)
                      for k, v in [("w1", w1), ("w2", w2), ("w3", w3)]],
        name="fanout",
    )
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    plain = compile_model(OnnxModel.from_bytes(bs))
    packed = compile_model(OnnxModel.from_bytes(bs), pack_image_stem=True)
    # only conv1 + relu packed (2 steps), the rest per-op
    assert packed.stats["pattern_hits"].get("s2d_chain_ops") == 2
    np.testing.assert_allclose(
        np.asarray(packed.run_np(x)[0]), np.asarray(plain.run_np(x)[0]),
        atol=1e-4, rtol=1e-4)
