"""Space-to-depth conv domain (models/s2d.py): exact weight-transform
parity against the plain XLA conv path, plus the YOLO fast-path gate."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lele_tpu.models import s2d as S  # noqa: E402


def _conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


E01 = [(0, 1), (0, 1)]


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)), jnp.float32)
    for b in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(S.s2d_undo(S.s2d(x, b), b)), np.asarray(x))


def test_stem_transform_exact():
    """k3 s2 conv on [H,W,3] == k2 conv on s2d4 input, s2d2-form output."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    w = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    want = _conv(x, jnp.asarray(w), 2, "SAME")          # [1,16,16,8]
    got2 = _conv(S.s2d(x, 4), jnp.asarray(S.w_stem_s2d4(w)), 1, E01)
    got = S.s2d_undo(got2, 2)                            # [1,16,16,8]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_down_transform_exact():
    """k3 s2 conv, s2d2 in → s2d2-form out."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)), jnp.float32)
    w = rng.standard_normal((3, 3, 6, 10)).astype(np.float32)
    want = _conv(x, jnp.asarray(w), 2, "SAME")          # [1,16,16,10]
    got2 = _conv(S.s2d(x, 2), jnp.asarray(S.w_down_s2d2(w)), 2, E01)
    got = S.s2d_undo(got2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv1_transform_exact():
    """k3 s1 conv, s2d2 in → s2d2-form out."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 6)), jnp.float32)
    w = rng.standard_normal((3, 3, 6, 10)).astype(np.float32)
    want = _conv(x, jnp.asarray(w), 1, "SAME")
    got2 = _conv(S.s2d(x, 2), jnp.asarray(S.w_conv1_s2d2(w)), 1, "SAME")
    got = S.s2d_undo(got2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_exit_transform_exact():
    """k3 s2 conv, s2d2 in → ORIGINAL-form out (domain exit)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)), jnp.float32)
    w = rng.standard_normal((3, 3, 6, 10)).astype(np.float32)
    want = _conv(x, jnp.asarray(w), 2, "SAME")
    got = _conv(S.s2d(x, 2), jnp.asarray(S.w_exit_s2d2(w)), 1, E01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seg", [False, True])
def test_yolo_s2d_path_matches_plain(seg):
    from lele_tpu.models import Yolo26Config, Yolo26Model
    from lele_tpu.models.yolo26 import prepare_s2d_params

    cfg = Yolo26Config(img_size=128, dtype="float32", segmentation=seg)
    m = Yolo26Model(cfg)
    m.init(0)
    assert "s2d" in m.params  # init prepares the fast path
    plain = {k: v for k, v in m.params.items() if k != "s2d"}
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    fwd = m.forward_fn()
    ref = fwd(plain, img)
    got = fwd(m.params, img)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_host_pack_matches_device_s2d():
    from lele_tpu.utils.image import preprocess_s2d

    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (200, 320, 3)).astype(np.uint8)
    packed = preprocess_s2d(img, 128)  # [1, 32, 32, 48]
    from lele_tpu.utils.image import nearest_resize
    nhwc = jnp.asarray(nearest_resize(img, 128)[None])
    np.testing.assert_array_equal(packed, np.asarray(S.s2d(nhwc, 4)))


def test_yolo_packed_input_matches_nhwc():
    from lele_tpu.models import Yolo26Config, Yolo26Model

    cfg = Yolo26Config(img_size=128, dtype="float32")
    m = Yolo26Model(cfg)
    m.init(0)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    fwd = m.forward_fn()
    ref = fwd(m.params, img)
    got = fwd(m.params, S.s2d(img, 4))
    chw = fwd(m.params, jnp.transpose(img, (0, 3, 1, 2)))
    for r, g, c in zip(jax.tree.leaves(ref), jax.tree.leaves(got),
                       jax.tree.leaves(chw)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_yolo_s2d_falls_back_on_odd_size():
    """s2d params present but H/W not %4: must take the plain path, not
    crash in reshape (review finding r2)."""
    from lele_tpu.models import Yolo26Config, Yolo26Model

    cfg = Yolo26Config(img_size=128, dtype="float32")
    m = Yolo26Model(cfg)
    m.init(0)
    assert "s2d" in m.params
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.random((1, 126, 126, 3)), jnp.float32)
    out = m.forward_fn()(m.params, img)
    assert np.isfinite(np.asarray(jax.tree.leaves(out)[0])).all()
