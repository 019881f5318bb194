"""Data-dependent-shape ops: fold when the shape-driving input is static,
raise with a workaround hint when it is a runtime value.

The reference has no counterpart (its codegen emits empty tensors with a
stderr warning for ops it doesn't know, generate.rs:987-997); here the
static cases genuinely compile (NonZero/Unique over constant subgraphs,
Compress with a constant mask → plain gather) and only truly
inexpressible cases raise. MaxRoiPool and the Optional family complete
the long tail.
"""

import numpy as np
import pytest

from optest import run_graph, run_op
from lele_tpu.onnx import builder as ob


def test_nonzero_folds_on_static_input():
    x = np.array([[1, 0], [0, 3]], np.float32)
    (y,) = run_op("NonZero", {}, initializers={"x": x})
    np.testing.assert_array_equal(y, np.stack(np.nonzero(x)))
    # canonical dtype policy clamps i64 to device i32 (lele_tpu/config.py)
    assert np.issubdtype(y.dtype, np.integer)


def test_nonzero_dynamic_input_raises_with_hint():
    with pytest.raises(Exception, match="NonZero"):
        run_op("NonZero", {"x": np.ones((2, 2), np.float32)})


def test_unique_sorted_matches_onnx_spec_example():
    x = np.array([2.0, 1.0, 1.0, 3.0, 4.0, 3.0], np.float32)
    y, idx, inv, cnt = run_op("Unique", {}, initializers={"x": x},
                              n_outputs=4, sorted=1)
    np.testing.assert_array_equal(y, [1, 2, 3, 4])
    np.testing.assert_array_equal(idx, [1, 0, 3, 4])
    np.testing.assert_array_equal(inv, [1, 0, 0, 2, 3, 2])
    np.testing.assert_array_equal(cnt, [2, 1, 2, 1])


def test_unique_unsorted_preserves_first_occurrence_order():
    x = np.array([2.0, 1.0, 1.0, 3.0, 4.0, 3.0], np.float32)
    y, idx, inv, cnt = run_op("Unique", {}, initializers={"x": x},
                              n_outputs=4, sorted=0)
    np.testing.assert_array_equal(y, [2, 1, 3, 4])
    np.testing.assert_array_equal(idx, [0, 1, 3, 4])
    np.testing.assert_array_equal(inv, [0, 1, 1, 2, 3, 2])
    np.testing.assert_array_equal(cnt, [1, 2, 2, 1])


def test_unique_axis_rows():
    x = np.array([[1, 0, 0], [1, 0, 0], [2, 3, 4]], np.float32)
    y, idx, inv, cnt = run_op("Unique", {}, initializers={"x": x},
                              n_outputs=4, sorted=1, axis=0)
    np.testing.assert_array_equal(y, [[1, 0, 0], [2, 3, 4]])
    np.testing.assert_array_equal(idx, [0, 2])
    np.testing.assert_array_equal(inv, [0, 0, 1])
    np.testing.assert_array_equal(cnt, [2, 1])


def test_compress_static_condition_dynamic_data():
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    cond = np.array([False, True, True])
    (y,) = run_op("Compress", {"data": data},
                  initializers={"cond": cond}, axis=0)
    np.testing.assert_array_equal(y, np.compress(cond, data, axis=0))


def test_compress_flattened_and_short_condition():
    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    cond = np.array([True, False, True, True])  # shorter than data.size
    (y,) = run_op("Compress", {"data": data}, initializers={"cond": cond})
    np.testing.assert_array_equal(y, np.compress(cond, data))


def test_compress_dynamic_condition_raises():
    with pytest.raises(Exception, match="Compress"):
        run_op("Compress",
               {"data": np.ones((4,), np.float32),
                "cond": np.array([True, False, True, False])}, axis=0)


def _ref_max_roi_pool(x, rois, pooled, scale):
    ph, pw = pooled
    N, C, H, W = x.shape
    out = np.zeros((len(rois), C, ph, pw), np.float32)
    for r, roi in enumerate(rois):
        b = int(roi[0])
        # half-away-from-zero like onnxruntime's std::round — NOT Python
        # round() (half-to-even), which couldn't detect a half-to-even
        # deviation in the op under test (ADVICE r3)
        x1, y1, x2, y2 = [int(np.floor(v * scale + 0.5)) for v in roi[1:]]
        rh, rw = max(y2 - y1 + 1, 1), max(x2 - x1 + 1, 1)
        for i in range(ph):
            hs = max(min(int(np.floor(i * rh / ph)) + y1, H), 0)
            he = max(min(int(np.ceil((i + 1) * rh / ph)) + y1, H), 0)
            for j in range(pw):
                ws = max(min(int(np.floor(j * rw / pw)) + x1, W), 0)
                we = max(min(int(np.ceil((j + 1) * rw / pw)) + x1, W), 0)
                if he > hs and we > ws:
                    out[r, :, i, j] = x[b, :, hs:he, ws:we].max(axis=(1, 2))
    return out


def test_max_roi_pool_matches_naive_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    rois = np.array([[0, 1, 1, 9, 9],
                     [1, 0, 0, 15, 15],
                     [0, 4, 6, 6, 7]], np.float32)
    (y,) = run_op("MaxRoiPool", {"x": x, "rois": rois},
                  pooled_shape=[2, 3], spatial_scale=1.0)
    np.testing.assert_allclose(
        y, _ref_max_roi_pool(x, rois, (2, 3), 1.0), atol=1e-6)


def test_max_roi_pool_spatial_scale():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    rois = np.array([[0, 2, 2, 14, 14]], np.float32)
    (y,) = run_op("MaxRoiPool", {"x": x, "rois": rois},
                  pooled_shape=[2, 2], spatial_scale=0.5)
    np.testing.assert_allclose(
        y, _ref_max_roi_pool(x, rois, (2, 2), 0.5), atol=1e-6)


def test_max_roi_pool_half_away_from_zero_rounding():
    """spatial_scale=0.5 with odd coords puts coord*scale on exact .5:
    onnxruntime std::round goes away from zero (2.5→3), jnp.round would go
    to even (2.5→2) and shift the window a pixel (ADVICE r3)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    rois = np.array([[0, 5, 5, 13, 13]], np.float32)  # *0.5 → 2.5..6.5
    (y,) = run_op("MaxRoiPool", {"x": x, "rois": rois},
                  pooled_shape=[2, 2], spatial_scale=0.5)
    np.testing.assert_allclose(
        y, _ref_max_roi_pool(x, rois, (2, 2), 0.5), atol=1e-6)
    # the half-to-even answer must differ somewhere, or this test is vacuous
    x1, y1, x2, y2 = [int(round(v * 0.5)) for v in rois[0, 1:]]  # 2,2,6,6
    assert (x1, y1, x2, y2) != tuple(
        int(np.floor(v * 0.5 + 0.5)) for v in rois[0, 1:])


def test_max_roi_pool_many_rois_stays_small():
    """R=64 ROIs on a [1,32,32,32] map — the separable lax.map formulation
    must compile and agree with the oracle (the old full-plane mask product
    was O(R·C·ph·pw·H·W) if unfused; ADVICE r3)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 32, 32, 32)).astype(np.float32)
    rois = np.concatenate(
        [np.zeros((64, 1), np.float32),
         rng.integers(0, 16, (64, 2)).astype(np.float32),
         rng.integers(16, 32, (64, 2)).astype(np.float32)], axis=1)
    (y,) = run_op("MaxRoiPool", {"x": x, "rois": rois},
                  pooled_shape=[4, 4], spatial_scale=1.0)
    np.testing.assert_allclose(
        y, _ref_max_roi_pool(x, rois, (4, 4), 1.0), atol=1e-6)


def test_compress_condition_true_past_extent_raises():
    """A True past the compressed axis extent is an invalid model: both the
    fold path (numpy raises) and the trace path (explicit check) must
    reject it instead of silently duplicating the last element (ADVICE r3)."""
    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    cond = np.array([True, False, True])  # len 3 > axis-0 extent 2
    with pytest.raises(Exception, match="Compress|out of bounds|extent"):
        run_op("Compress", {"data": data},
               initializers={"cond": cond}, axis=0)


def test_optional_in_dynamic_loop_raises_clearly():
    """An Optional carried through a Loop body must raise the actionable
    NotImplementedError, not an opaque pytree error (ADVICE r3)."""
    body = ob.graph(
        nodes=[
            ob.node("Identity", ["c_in"], ["c_out"]),
            # the body CARRIES the optional itself — inexpressible
            ob.node("Optional", ["v_in"], ["v_opt"]),
        ],
        name="body",
        inputs=[ob.value_info("i", 7, []), ob.value_info("c_in", 9, []),
                ob.value_info("v_in", 1, [2])],
        outputs=[ob.value_info("c_out", 9, []),
                 ob.value_info("v_opt", 1, [2])],
    )
    nodes = [ob.node("Loop", ["m", "cond", "v0"], ["v_final"], body=body)]
    with pytest.raises(Exception, match="[Oo]ptional"):
        run_graph(nodes, {"v0": np.ones(2, np.float32),
                          "cond": np.array(True)},
                  ["v_final"],
                  initializers={"m": np.asarray(3, np.int64)})


def test_optional_roundtrip_and_has_element():
    x = np.arange(4, dtype=np.float32)
    nodes = [
        ob.node("Optional", ["x"], ["opt"]),
        ob.node("OptionalGetElement", ["opt"], ["y"]),
        ob.node("OptionalHasElement", ["opt"], ["has"]),
    ]
    y, has = run_graph(nodes, {"x": x}, ["y", "has"])
    np.testing.assert_array_equal(y, x)
    assert bool(has) is True


def test_empty_optional_has_no_element():
    nodes = [
        ob.node("Optional", [], ["opt"]),
        ob.node("OptionalHasElement", ["opt"], ["has"]),
    ]
    (has,) = run_graph(nodes, {"x": np.zeros((1,), np.float32)}, ["has"])
    assert bool(has) is False
