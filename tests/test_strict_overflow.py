"""i64→i32 canonicalization semantics (tracer._canon_np).

x64 is off on device, so host i64 narrows to i32. Narrowing must CLAMP
(ONNX uses INT64_MAX/MIN as "to the end" sentinels — a wrapped sentinel
silently flips meaning), and strict mode must flag genuine out-of-range
data instead of clamping it.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

import lele_tpu.onnx.builder as ob  # noqa: E402
from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.compiler.tracer import _canon_np  # noqa: E402
from lele_tpu.onnx.loader import OnnxModel  # noqa: E402

I64MAX = np.iinfo(np.int64).max
I64MIN = np.iinfo(np.int64).min
I32MAX = np.iinfo(np.int32).max
I32MIN = np.iinfo(np.int32).min


def test_canon_clamps_not_wraps():
    v = np.asarray([0, 7, I64MAX, I64MIN], np.int64)
    out = _canon_np(v)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [0, 7, I32MAX, I32MIN])


def test_canon_strict_allows_sentinels():
    v = np.asarray([I64MAX, I64MIN, 3], np.int64)
    out = _canon_np(v, strict=True)
    np.testing.assert_array_equal(out, [I32MAX, I32MIN, 3])


def test_canon_strict_raises_on_real_overflow():
    v = np.asarray([2**40, 1], np.int64)
    with pytest.raises(OverflowError, match="int32 range"):
        _canon_np(v, strict=True)
    # non-strict clamps with a defined value
    np.testing.assert_array_equal(_canon_np(v), [I32MAX, 1])


def _slice_model(ends_val: int):
    bs = ob.build_model_bytes(
        nodes=[ob.node("Slice", ["x", "starts", "ends", "axes"], ["y"])],
        inputs=[ob.value_info("x", 1, (2, 8))],
        outputs=[ob.value_info("y", 1, (2, "n"))],
        initializers=[
            ob.tensor_from_array(np.asarray([2], np.int64), "starts"),
            ob.tensor_from_array(np.asarray([ends_val], np.int64), "ends"),
            ob.tensor_from_array(np.asarray([1], np.int64), "axes"),
        ],
    )
    return OnnxModel.from_bytes(bs)


def test_slice_int64max_sentinel_end_to_end():
    """The classic: Slice end = INT64_MAX means "to the end". A wrap to -1
    would instead DROP the last element."""
    cm = compile_model(_slice_model(I64MAX))
    x = np.arange(16, dtype=np.float32).reshape(2, 8)
    (y,) = cm(x)
    np.testing.assert_array_equal(np.asarray(y), x[:, 2:])


def test_slice_int64max_sentinel_strict_mode():
    cm = compile_model(_slice_model(I64MAX), strict=True)
    x = np.arange(16, dtype=np.float32).reshape(2, 8)
    (y,) = cm(x)
    np.testing.assert_array_equal(np.asarray(y), x[:, 2:])
