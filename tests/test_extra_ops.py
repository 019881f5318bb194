"""Long-tail op coverage (ops/extra_ops.py) — everything here EXCEEDS the
reference's op surface (SURVEY.md §2.1 lists ~70 ops; these complete the
practical ai.onnx opset). Oracles: numpy/scipy formulas and torch-CPU
functional ops (the repo's stand-in for the reference's ORT oracle,
docs/PARITY.md "Cross-runtime oracle")."""

import numpy as np
import pytest

from optest import assert_close, run_op
from lele_tpu.onnx import builder as ob

rng = np.random.default_rng(23)


# -- elementwise ---------------------------------------------------------------


def test_inverse_hyperbolics():
    x = rng.uniform(1.1, 3.0, 16).astype(np.float32)
    (y,) = run_op("Acosh", {"x": x})
    assert_close(y, np.arccosh(x), tol=2e-4)
    x = rng.standard_normal(16).astype(np.float32)
    (y,) = run_op("Asinh", {"x": x})
    assert_close(y, np.arcsinh(x), tol=2e-4)
    x = rng.uniform(-0.9, 0.9, 16).astype(np.float32)
    (y,) = run_op("Atanh", {"x": x})
    assert_close(y, np.arctanh(x), tol=2e-4)


def test_bit_ops():
    x = rng.integers(0, 64, 12).astype(np.int32)
    s = rng.integers(0, 4, 12).astype(np.int32)
    (y,) = run_op("BitShift", {"x": x, "y": s}, direction="LEFT")
    assert (y == np.left_shift(x, s)).all()
    (y,) = run_op("BitShift", {"x": x, "y": s}, direction="RIGHT")
    assert (y == np.right_shift(x, s)).all()
    a = rng.integers(0, 255, 12).astype(np.int32)
    b = rng.integers(0, 255, 12).astype(np.int32)
    for name, fn in [("BitwiseAnd", np.bitwise_and), ("BitwiseOr", np.bitwise_or),
                     ("BitwiseXor", np.bitwise_xor)]:
        (y,) = run_op(name, {"a": a, "b": b})
        assert (y == fn(a, b)).all(), name
    (y,) = run_op("BitwiseNot", {"a": a})
    assert (y == np.invert(a)).all()


def test_shrink_hardmax_eyelike_det():
    x = rng.standard_normal(20).astype(np.float32) * 2
    (y,) = run_op("Shrink", {"x": x}, lambd=0.5, bias=0.1)
    want = np.where(x < -0.5, x + 0.1, np.where(x > 0.5, x - 0.1, 0.0))
    assert_close(y, want, tol=1e-6)

    x = rng.standard_normal((3, 5)).astype(np.float32)
    (y,) = run_op("Hardmax", {"x": x})
    want = np.zeros_like(x)
    want[np.arange(3), x.argmax(1)] = 1
    assert_close(y, want)

    x = np.zeros((3, 4), np.float32)
    (y,) = run_op("EyeLike", {"x": x}, k=1)
    assert_close(y, np.eye(3, 4, k=1, dtype=np.float32))

    x = rng.standard_normal((2, 3, 3)).astype(np.float32)
    (y,) = run_op("Det", {"x": x})
    assert_close(y, np.linalg.det(x), tol=1e-4)


def test_reduce_log_sum():
    x = rng.uniform(0.5, 2.0, (3, 4)).astype(np.float32)
    (y,) = run_op("ReduceLogSum", {"x": x},
                  initializers={"axes": np.array([1], np.int64)})
    assert_close(y, np.log(x.sum(1, keepdims=True)), tol=2e-4)


def test_mean_variance_normalization():
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    (y,) = run_op("MeanVarianceNormalization", {"x": x})
    m = x.mean(axis=(0, 2, 3), keepdims=True)
    s = x.std(axis=(0, 2, 3), keepdims=True)
    assert_close(y, (x - m) / (s + 1e-9), tol=1e-5)


# -- normalization / pooling (torch oracle) -------------------------------------


def test_lrn_vs_torch():
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    (y,) = run_op("LRN", {"x": x}, size=3, alpha=2e-4, beta=0.7, bias=1.5)
    want = F.local_response_norm(torch.from_numpy(x), 3, alpha=2e-4,
                                 beta=0.7, k=1.5).numpy()
    assert_close(y, want, tol=1e-5)


def test_lp_pools_vs_torch():
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    (y,) = run_op("LpPool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2], p=2)
    want = F.lp_pool2d(torch.from_numpy(x), 2, 2, 2).numpy()
    assert_close(y, want, tol=1e-4)
    (y,) = run_op("GlobalLpPool", {"x": x}, p=2)
    want = np.sqrt((x ** 2).sum(axis=(2, 3), keepdims=True))
    assert_close(y, want, tol=1e-4)


def test_maxpool_indices_and_unpool_vs_torch():
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 3, 6, 6)).astype(np.float32)
    vals, idx = run_op("MaxPool", {"x": x}, n_outputs=2,
                       kernel_shape=[2, 2], strides=[2, 2])
    tv, ti = F.max_pool2d(torch.from_numpy(x), 2, 2, return_indices=True)
    assert_close(vals, tv.numpy(), tol=1e-6)
    # torch indices are per-(N,C) plane; ONNX are global — convert
    plane = x.shape[2] * x.shape[3]
    nc = (np.arange(2)[:, None, None, None] * 3
          + np.arange(3)[None, :, None, None])
    assert (idx == ti.numpy() + nc * plane).all()

    (y,) = run_op("MaxUnpool", {"xp": vals, "i": idx.astype(np.int64)},
                  kernel_shape=[2, 2], strides=[2, 2])
    want = F.max_unpool2d(tv, ti, 2, 2).numpy()
    assert_close(y, want, tol=1e-6)


def test_maxpool_indices_padded_window():
    """Padding must not shift the reported argmax coordinates."""
    x = rng.standard_normal((1, 1, 5, 5)).astype(np.float32)
    vals, idx = run_op("MaxPool", {"x": x}, n_outputs=2,
                       kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1])
    # verify each reported flat index holds the reported max value
    flat = x.reshape(-1)
    assert_close(vals.reshape(-1), flat[idx.reshape(-1)], tol=0)


def test_col2im_vs_torch_fold():
    import torch
    import torch.nn.functional as F

    N, C, K, L = 2, 3, 4, 4  # 2x2 blocks over a 4x4 image, stride 2
    cols = rng.standard_normal((N, C * K, L)).astype(np.float32)
    (y,) = run_op(
        "Col2Im", {"c": cols},
        initializers={"im": np.array([4, 4], np.int64),
                      "bl": np.array([2, 2], np.int64)},
        strides=[2, 2],
    )
    want = F.fold(torch.from_numpy(cols), (4, 4), (2, 2), stride=2).numpy()
    assert_close(y, want, tol=1e-6)


# -- spectral ------------------------------------------------------------------


def test_cosine_windows():
    for name, a0, a1, a2 in [("HannWindow", 0.5, 0.5, 0.0),
                             ("HammingWindow", 25 / 46, 21 / 46, 0.0),
                             ("BlackmanWindow", 0.42, 0.5, 0.08)]:
        (y,) = run_op(name, {}, initializers={"size": np.array(16, np.int64)})
        i = np.arange(16)
        want = a0 - a1 * np.cos(2 * np.pi * i / 16) + a2 * np.cos(4 * np.pi * i / 16)
        assert_close(y, want.astype(np.float32), tol=1e-5)
        # symmetric (periodic=0) divides by N-1
        (y,) = run_op(name, {}, initializers={"size": np.array(16, np.int64)},
                      periodic=0)
        want = a0 - a1 * np.cos(2 * np.pi * i / 15) + a2 * np.cos(4 * np.pi * i / 15)
        assert_close(y, want.astype(np.float32), tol=1e-5)


def test_mel_weight_matrix():
    """Oracle: direct loop transcription of the onnx reference algorithm."""
    nm, nfft, sr, flo, fhi = 8, 64, 8000, 20.0, 3800.0
    (y,) = run_op(
        "MelWeightMatrix", {},
        initializers={"nm": np.array(nm, np.int64),
                      "nfft": np.array(nfft, np.int64),
                      "sr": np.array(sr, np.int64),
                      "flo": np.float32(flo), "fhi": np.float32(fhi)},
    )
    mel = lambda f: 2595 * np.log10(1 + f / 700)
    pts = np.arange(nm + 2) * (mel(fhi) - mel(flo)) / (nm + 2) + mel(flo)
    hz = 700 * (10 ** (pts / 2595) - 1)
    bins = (((nfft + 1) * hz) // sr).astype(int)
    want = np.zeros((nfft // 2 + 1, nm), np.float32)
    for i in range(nm):
        lo, c, hi = bins[i], bins[i + 1], bins[i + 2]
        for j in range(lo, c):
            if 0 <= j < want.shape[0] and c > lo:
                want[j, i] = (j - lo) / (c - lo)
        for j in range(c, hi):
            if 0 <= j < want.shape[0] and hi > c:
                want[j, i] = (hi - j) / (hi - c)
    assert y.shape == want.shape
    assert_close(y, want, tol=1e-5)


def test_dft_forward_inverse_onesided():
    x = rng.standard_normal((2, 16, 1)).astype(np.float32)
    (y,) = run_op("DFT", {"x": x})
    want = np.fft.fft(x[..., 0], axis=1)
    assert_close(y[..., 0], want.real, tol=1e-4)
    assert_close(y[..., 1], want.imag, tol=1e-4)
    # onesided
    (y,) = run_op("DFT", {"x": x}, onesided=1)
    assert y.shape == (2, 9, 2)
    assert_close(y[..., 0], want.real[:, :9], tol=1e-4)
    # inverse round-trip on complex input
    xc = np.stack([want.real, want.imag], -1).astype(np.float32)
    (y,) = run_op("DFT", {"x": xc}, inverse=1)
    assert_close(y[..., 0], x[..., 0], tol=1e-4)
    assert_close(y[..., 1], np.zeros_like(x[..., 0]), tol=1e-4)
    # negative axis counts from the FULL rank incl. the component dim:
    # axis=-2 on [2, 16, 1] is the signal dim (1)
    (y,) = run_op("DFT", {"x": x}, axis=-2)
    assert_close(y[..., 0], want.real, tol=1e-4)
    assert_close(y[..., 1], want.imag, tol=1e-4)


# -- random --------------------------------------------------------------------


def test_bernoulli_and_multinomial():
    p = np.concatenate([np.zeros(50), np.ones(50)]).astype(np.float32)
    (y,) = run_op("Bernoulli", {"p": p})
    assert (y[:50] == 0).all() and (y[50:] == 1).all()
    # spec: input is UNNORMALIZED LOG probabilities (logits)
    logits = np.array([[-1e9, 0.0, -1e9], [0.0, -1e9, -1e9]], np.float32)
    (y,) = run_op("Multinomial", {"p": logits}, sample_size=16)
    assert y.shape == (2, 16)
    assert (y[0] == 1).all() and (y[1] == 0).all()


# -- losses (torch oracle) -------------------------------------------------------


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_nll_loss_vs_torch(reduction):
    import torch
    import torch.nn.functional as F

    N, C = 6, 5
    logp = np.log(rng.dirichlet(np.ones(C), N)).astype(np.float32)
    tgt = rng.integers(0, C, N).astype(np.int64)
    w = rng.uniform(0.5, 1.5, C).astype(np.float32)
    (y,) = run_op("NegativeLogLikelihoodLoss", {"x": logp, "t": tgt},
                  initializers={"w": w}, reduction=reduction)
    want = F.nll_loss(torch.from_numpy(logp), torch.from_numpy(tgt),
                      torch.from_numpy(w), reduction=reduction).numpy()
    assert_close(y, want, tol=1e-5)


def test_softmax_cross_entropy_vs_torch():
    import torch
    import torch.nn.functional as F

    N, C = 4, 7
    scores = rng.standard_normal((N, C)).astype(np.float32)
    tgt = rng.integers(0, C, N).astype(np.int64)
    loss, logp = run_op("SoftmaxCrossEntropyLoss", {"x": scores, "t": tgt},
                        n_outputs=2, reduction="mean")
    want = F.cross_entropy(torch.from_numpy(scores), torch.from_numpy(tgt)).numpy()
    assert_close(loss, want, tol=2e-4)
    assert_close(logp, F.log_softmax(torch.from_numpy(scores), 1).numpy(), tol=2e-4)


def test_nll_ignore_index():
    N, C = 5, 4
    logp = np.log(rng.dirichlet(np.ones(C), N)).astype(np.float32)
    tgt = np.array([0, 1, -100, 2, -100], np.int64)
    (y,) = run_op("NegativeLogLikelihoodLoss", {"x": logp, "t": tgt},
                  reduction="mean", ignore_index=-100)
    valid = tgt != -100
    want = -logp[np.arange(N)[valid], tgt[valid]].mean()
    assert_close(y, want, tol=1e-5)


# -- shape surgery ---------------------------------------------------------------


def test_center_crop_pad():
    x = rng.standard_normal((4, 7)).astype(np.float32)
    (y,) = run_op("CenterCropPad", {"x": x},
                  initializers={"s": np.array([6, 3], np.int64)})
    assert y.shape == (6, 3)
    assert_close(y[1:5], x[:, 2:5])  # crop centered cols, pad rows 1 before
    assert_close(y[0], np.zeros(3)); assert_close(y[5], np.zeros(3))


def test_reverse_sequence():
    x = rng.standard_normal((5, 3, 2)).astype(np.float32)
    lens = np.array([5, 3, 1], np.int64)
    (y,) = run_op("ReverseSequence", {"x": x, "l": lens},
                  batch_axis=1, time_axis=0)
    want = x.copy()
    for b, L in enumerate(lens):
        want[:L, b] = x[:L, b][::-1]
    assert_close(y, want)


# -- spatial sampling -------------------------------------------------------------


@pytest.mark.parametrize("align", [0, 1])
@pytest.mark.parametrize("pad_mode", ["zeros", "border"])
def test_grid_sample_bilinear_vs_torch(align, pad_mode):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 3, 6, 7)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 4, 5, 2)).astype(np.float32)
    (y,) = run_op("GridSample", {"x": x, "g": grid}, mode="linear",
                  padding_mode=pad_mode, align_corners=align)
    want = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                         mode="bilinear", padding_mode=pad_mode,
                         align_corners=bool(align)).numpy()
    assert_close(y, want, tol=1e-4)


def test_grid_sample_nearest_vs_torch():
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    # keep away from .5 rounding ties where conventions differ
    grid = (rng.uniform(-0.95, 0.95, (1, 3, 3, 2)) ).astype(np.float32)
    (y,) = run_op("GridSample", {"x": x, "g": grid}, mode="nearest",
                  padding_mode="border", align_corners=1)
    want = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                         mode="nearest", padding_mode="border",
                         align_corners=True).numpy()
    assert_close(y, want, tol=1e-6)


def test_roi_align_linear_ramp():
    """Bilinear interpolation reproduces affine images exactly, and the avg
    over sample points equals the value at the bin's mean point — analytic
    oracle with no reference implementation needed."""
    H = W = 16
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (2.0 * xx + 3.0 * yy + 1.0)[None, None]  # [1,1,H,W] affine
    rois = np.array([[2.0, 4.0, 10.0, 12.0]], np.float32)  # x1,y1,x2,y2
    oh = ow = 4
    (y,) = run_op(
        "RoiAlign", {"x": img, "r": rois,
                     "b": np.array([0], np.int64)},
        output_height=oh, output_width=ow, sampling_ratio=2,
        spatial_scale=1.0, mode="avg",
        coordinate_transformation_mode="output_half_pixel",
    )
    bin_h, bin_w = (12.0 - 4.0) / oh, (10.0 - 2.0) / ow
    cy = 4.0 + (np.arange(oh) + 0.5) * bin_h
    cx = 2.0 + (np.arange(ow) + 0.5) * bin_w
    want = 2.0 * cx[None, :] + 3.0 * cy[:, None] + 1.0
    assert_close(y[0, 0], want, tol=1e-3)


# -- sequences --------------------------------------------------------------------


def test_sequence_ops_roundtrip():
    """SplitToSequence → insert/erase/at/length → ConcatFromSequence, as one
    compiled graph (sequence structure is trace-static)."""
    from optest import run_graph

    x = rng.standard_normal((6, 3)).astype(np.float32)
    extra = rng.standard_normal((2, 3)).astype(np.float32)
    nodes = [
        ob.node("SplitToSequence", ["x", "two"], ["seq"], axis=0),
        ob.node("SequenceInsert", ["seq", "extra", "pos0"], ["seq2"]),
        ob.node("SequenceErase", ["seq2", "poslast"], ["seq3"]),
        ob.node("SequenceLength", ["seq3"], ["n"]),
        ob.node("ConcatFromSequence", ["seq3"], ["y"], axis=0),
        ob.node("SequenceAt", ["seq3", "pos0"], ["first"]),
    ]
    inits = {"two": np.array(2, np.int64), "pos0": np.array(0, np.int64),
             "poslast": np.array(-1, np.int64)}
    y, n, first = run_graph(nodes, {"x": x, "extra": extra},
                            ["y", "n", "first"], initializers=inits)
    # split [2,2,2] → insert extra at 0 → erase last → [extra, x0:2, x2:4]
    want = np.concatenate([extra, x[0:2], x[2:4]], axis=0)
    assert int(n) == 3
    assert_close(y, want)
    assert_close(first, extra)


def test_sequence_construct_and_empty():
    from optest import run_graph

    a = rng.standard_normal((2, 2)).astype(np.float32)
    b = rng.standard_normal((3, 2)).astype(np.float32)
    nodes = [
        ob.node("SequenceConstruct", ["a", "b"], ["seq"]),
        ob.node("ConcatFromSequence", ["seq"], ["y"], axis=0),
        ob.node("SequenceEmpty", [], ["empty"]),
        ob.node("SequenceLength", ["empty"], ["n"]),
    ]
    y, n = run_graph(nodes, {"a": a, "b": b}, ["y", "n"])
    assert_close(y, np.concatenate([a, b], 0))
    assert int(n) == 0


def test_scatter_deprecated_alias():
    x = np.zeros((3, 3), np.float32)
    idx = np.array([[0, 1, 2]], np.int64)
    upd = np.array([[1.0, 2.0, 3.0]], np.float32)
    (y,) = run_op("Scatter", {"x": x, "i": idx, "u": upd}, axis=1, opset=10)
    want = x.copy(); want[0] = [1, 2, 3]
    assert_close(y, want)
