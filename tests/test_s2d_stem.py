"""Compiler s2d image-stem rewrite (compiler/s2d_stem.py): compiled ONNX
graphs with a C≤4 stride-2 stem get the packed-input fast path with exact
output parity and a drop-in NCHW API."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lele_tpu.compiler import compile_model  # noqa: E402


@pytest.fixture(scope="module")
def yolo_pair():
    plain = compile_model("fixtures/yolo26.onnx")
    packed = compile_model("fixtures/yolo26.onnx", pack_image_stem=True)
    return plain, packed


def test_stem_rewrite_fires(yolo_pair):
    plain, packed = yolo_pair
    assert packed.stats["pattern_hits"].get("s2d_stem") == 1
    assert plain.stats["pattern_hits"].get("s2d_stem") is None
    assert packed.input_packers  # input repacking registered
    name = packed.input_order[0]
    shape = packed.input_specs[name][0]
    assert shape[-1] == 48  # [B, H/4, W/4, 16*3]


def test_stem_rewrite_output_parity(yolo_pair):
    plain, packed = yolo_pair
    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 640, 640)).astype(np.float32)
    want = plain.run_np(x)
    got = packed.run_np(x)  # same NCHW API — packs on host
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)


def test_no_rewrite_when_input_shared():
    """A graph whose image input feeds two nodes compiles unchanged."""
    from lele_tpu.onnx import builder as B

    rng = np.random.default_rng(1)
    bs = B.build_model_bytes(
        [
            B.node("Conv", ["x", "w"], ["c"], strides=[2, 2],
                   pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
            B.node("ReduceMean", ["x"], ["m"], keepdims=0),
        ],
        inputs=[B.value_info("x", 1, [1, 3, 16, 16])],
        outputs=[B.value_info("c", 1, [1, 4, 8, 8]),
                 B.value_info("m", 1, [])],
        initializers=[B.tensor_from_array(
            rng.standard_normal((4, 3, 3, 3)).astype(np.float32), "w")],
    )
    cm = compile_model(bs, pack_image_stem=True)
    assert not cm.input_packers
    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    outs = cm.run_np(x)
    assert outs[0].shape == (1, 4, 8, 8)


def test_rewrite_on_synthetic_stem_exact():
    """Synthetic 2-node graph: rewritten output matches to float tolerance
    (with bias and explicit pads)."""
    from lele_tpu.onnx import builder as B

    rng = np.random.default_rng(2)
    bs = B.build_model_bytes(
        [
            B.node("Conv", ["x", "w", "b"], ["c"], strides=[2, 2],
                   pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
            B.node("Relu", ["c"], ["y"]),
        ],
        inputs=[B.value_info("x", 1, [1, 3, 32, 32])],
        outputs=[B.value_info("y", 1, [1, 8, 16, 16])],
        initializers=[
            B.tensor_from_array(
                rng.standard_normal((8, 3, 3, 3)).astype(np.float32), "w"),
            B.tensor_from_array(
                rng.standard_normal((8,)).astype(np.float32), "b"),
        ],
    )
    plain = compile_model(bs)
    packed = compile_model(bs, pack_image_stem=True)
    assert packed.input_packers
    x = rng.random((1, 3, 32, 32)).astype(np.float32)
    np.testing.assert_allclose(
        packed.run_np(x)[0], plain.run_np(x)[0], rtol=1e-5, atol=1e-5)


def test_no_rewrite_when_output_not_half():
    """ONNX-default VALID pads (out 15 from 32) must compile unchanged,
    not crash the rewrite (review finding r2)."""
    from lele_tpu.onnx import builder as B

    rng = np.random.default_rng(3)
    bs = B.build_model_bytes(
        [B.node("Conv", ["x", "w"], ["y"], strides=[2, 2],
                kernel_shape=[3, 3])],  # no pads attr → VALID
        inputs=[B.value_info("x", 1, [1, 3, 32, 32])],
        outputs=[B.value_info("y", 1, [1, 4, 15, 15])],
        initializers=[B.tensor_from_array(
            rng.standard_normal((4, 3, 3, 3)).astype(np.float32), "w")],
    )
    plain = compile_model(bs)
    packed = compile_model(bs, pack_image_stem=True)
    assert not packed.input_packers
    x = rng.random((1, 3, 32, 32)).astype(np.float32)
    np.testing.assert_allclose(packed.run_np(x)[0], plain.run_np(x)[0],
                               rtol=1e-5, atol=1e-5)


def test_compiler_instance_not_mutated_by_stem_rewrite():
    from lele_tpu.compiler import Compiler

    c = Compiler()
    cm1 = c.compile("fixtures/yolo26.onnx", pack_image_stem=True)
    assert cm1.input_packers
    assert c._patterns is None  # per-compile pattern, no instance state
