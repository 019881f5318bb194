"""DeformConv vs a literal-loop numpy oracle written directly from the
ONNX spec formula (torchvision is absent in this env, so the oracle is
independent code, not a library call)."""

import numpy as np
import pytest

from optest import run_op


def _oracle(x, w, offset, b=None, mask=None, group=1, og=1,
            strides=(1, 1), pads=(0, 0, 0, 0), dil=(1, 1)):
    n, c, h, w_in = x.shape
    oc, cpg, kh, kw = w.shape
    oh, ow = offset.shape[-2:]
    out = np.zeros((n, oc, oh, ow), np.float64)
    off = offset.reshape(n, og, kh, kw, 2, oh, ow)
    msk = None if mask is None else mask.reshape(n, og, kh, kw, oh, ow)

    def bilin(img, y, x_):
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        v = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                    wy = (y - y0) if dy else (1 - (y - y0))
                    wx = (x_ - x0) if dx else (1 - (x_ - x0))
                    v += wy * wx * img[yy, xx]
        return v

    for ni in range(n):
        for o in range(oc):
            g = o // (oc // group)
            for oy in range(oh):
                for ox in range(ow):
                    acc = 0.0
                    for ci in range(cpg):
                        cin = g * cpg + ci
                        go = cin // (c // og)
                        for ky in range(kh):
                            for kx in range(kw):
                                y = (oy * strides[0] - pads[0] + ky * dil[0]
                                     + off[ni, go, ky, kx, 0, oy, ox])
                                x_ = (ox * strides[1] - pads[1] + kx * dil[1]
                                      + off[ni, go, ky, kx, 1, oy, ox])
                                s = bilin(x[ni, cin], y, x_)
                                if msk is not None:
                                    s *= msk[ni, go, ky, kx, oy, ox]
                                acc += s * w[o, ci, ky, kx]
                    out[ni, o, oy, ox] = acc + (b[o] if b is not None else 0)
    return out.astype(np.float32)


def _mk(rng, n=1, c=4, h=6, w_in=6, oc=4, kh=3, kw=3, group=1, og=1,
        strides=(1, 1), pads=(1, 1, 1, 1), dil=(1, 1)):
    oh = (h + pads[0] + pads[2] - dil[0] * (kh - 1) - 1) // strides[0] + 1
    ow = (w_in + pads[1] + pads[3] - dil[1] * (kw - 1) - 1) // strides[1] + 1
    x = rng.standard_normal((n, c, h, w_in)).astype(np.float32)
    w = rng.standard_normal((oc, c // group, kh, kw)).astype(np.float32)
    offset = (rng.standard_normal((n, og * 2 * kh * kw, oh, ow)) * 1.5
              ).astype(np.float32)
    return x, w, offset


def test_deform_conv_basic():
    rng = np.random.default_rng(0)
    x, w, offset = _mk(rng)
    got = run_op("DeformConv", {"x": x, "w": w, "offset": offset},
                 pads=[1, 1, 1, 1])[0]
    want = _oracle(x, w, offset, pads=(1, 1, 1, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deform_conv_zero_offset_equals_conv():
    """Zero offsets reduce DeformConv to a plain convolution."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x, w, offset = _mk(rng, c=3, oc=5)
    offset = np.zeros_like(offset)
    got = run_op("DeformConv", {"x": x, "w": w, "offset": offset},
                 pads=[1, 1, 1, 1])[0]
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    padding=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deform_conv_groups_mask_bias_stride():
    rng = np.random.default_rng(2)
    group, og = 2, 2
    x, w, offset = _mk(rng, c=4, oc=6, group=group, og=og,
                       strides=(2, 2), pads=(0, 0, 0, 0))
    oh, ow = offset.shape[-2:]
    mask = rng.random((1, og * 9, oh, ow)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    got = run_op(
        "DeformConv",
        {"x": x, "w": w, "offset": offset, "b": b, "mask": mask},
        group=group, offset_group=og, strides=[2, 2],
    )[0]
    want = _oracle(x, w, offset, b=b, mask=mask, group=group, og=og,
                   strides=(2, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deform_conv_dilation():
    rng = np.random.default_rng(3)
    x, w, offset = _mk(rng, h=8, w_in=8, dil=(2, 2), pads=(2, 2, 2, 2))
    got = run_op("DeformConv", {"x": x, "w": w, "offset": offset},
                 dilations=[2, 2], pads=[2, 2, 2, 2])[0]
    want = _oracle(x, w, offset, dil=(2, 2), pads=(2, 2, 2, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
