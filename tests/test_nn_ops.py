"""NN op regression suite: conv/pool/resize/norm/rnn vs naive numpy oracles.

Port of the reference's tests/regression_kernels.rs (45 tests, :76-977):
the `ref_conv2d` naive-loop oracle pattern (:23-69), pool shapes, pad modes,
STFT vs known signals, GRU variants, LSTM.
"""

import numpy as np
import pytest

from optest import assert_close, run_op

rng = np.random.default_rng(7)


# -- naive conv oracles (the ref_conv2d pattern, written from scratch) -------


def conv2d_oracle(x, w, b=None, stride=(1, 1), pad=(0, 0, 0, 0), dil=(1, 1), group=1):
    n, cin, h, wd = x.shape
    cout, cin_g, kh, kw = w.shape
    x = np.pad(x, ((0, 0), (0, 0), (pad[0], pad[2]), (pad[1], pad[3])))
    oh = (x.shape[2] - ((kh - 1) * dil[0] + 1)) // stride[0] + 1
    ow = (x.shape[3] - ((kw - 1) * dil[1] + 1)) // stride[1] + 1
    out = np.zeros((n, cout, oh, ow), np.float64)
    cpg_out = cout // group
    for ni in range(n):
        for co in range(cout):
            g = co // cpg_out
            for oy in range(oh):
                for ox in range(ow):
                    acc = 0.0
                    for ci in range(cin_g):
                        for ky in range(kh):
                            for kx in range(kw):
                                iy = oy * stride[0] + ky * dil[0]
                                ix = ox * stride[1] + kx * dil[1]
                                acc += (
                                    x[ni, g * cin_g + ci, iy, ix] * w[co, ci, ky, kx]
                                )
                    out[ni, co, oy, ox] = acc + (b[co] if b is not None else 0.0)
    return out


def conv1d_oracle(x, w, b=None, stride=1, pad=(0, 0), dil=1, group=1):
    x4 = x[:, :, None, :]
    w4 = w[:, :, None, :]
    out = conv2d_oracle(
        x4, w4, b, stride=(1, stride), pad=(0, pad[0], 0, pad[1]), dil=(1, dil),
        group=group,
    )
    return out[:, :, 0, :]


def test_conv2d_3x3_s1():
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    (y,) = run_op("Conv", {"x": x}, initializers={"w": w, "b": b}, pads=[1, 1, 1, 1])
    assert_close(y, conv2d_oracle(x, w, b, pad=(1, 1, 1, 1)), tol=1e-4)


def test_conv2d_stride2_dilation2():
    x = rng.standard_normal((2, 2, 11, 11)).astype(np.float32)
    w = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)
    (y,) = run_op(
        "Conv", {"x": x}, initializers={"w": w}, strides=[2, 2], dilations=[2, 2]
    )
    assert_close(y, conv2d_oracle(x, w, stride=(2, 2), dil=(2, 2)), tol=1e-4)


def test_conv2d_depthwise():
    # depthwise 3×3 (the reference's hottest conv special case,
    # conv2d.rs:535-567)
    c = 8
    x = rng.standard_normal((1, c, 10, 10)).astype(np.float32)
    w = rng.standard_normal((c, 1, 3, 3)).astype(np.float32)
    (y,) = run_op(
        "Conv", {"x": x}, initializers={"w": w}, group=c, pads=[1, 1, 1, 1]
    )
    assert_close(y, conv2d_oracle(x, w, pad=(1, 1, 1, 1), group=c), tol=1e-4)


def test_conv2d_1x1_pointwise():
    x = rng.standard_normal((1, 6, 5, 5)).astype(np.float32)
    w = rng.standard_normal((9, 6, 1, 1)).astype(np.float32)
    (y,) = run_op("Conv", {"x": x}, initializers={"w": w})
    assert_close(y, conv2d_oracle(x, w), tol=1e-4)


def test_conv2d_same_upper():
    x = rng.standard_normal((1, 2, 7, 7)).astype(np.float32)
    w = rng.standard_normal((2, 2, 3, 3)).astype(np.float32)
    (y,) = run_op("Conv", {"x": x}, initializers={"w": w}, auto_pad="SAME_UPPER")
    assert y.shape == (1, 2, 7, 7)
    assert_close(y, conv2d_oracle(x, w, pad=(1, 1, 1, 1)), tol=1e-4)


def test_conv1d_k3_and_k1():
    x = rng.standard_normal((1, 4, 20)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3)).astype(np.float32)
    (y,) = run_op("Conv", {"x": x}, initializers={"w": w}, pads=[1, 1])
    assert_close(y, conv1d_oracle(x, w, pad=(1, 1)), tol=1e-4)
    w1 = rng.standard_normal((6, 4, 1)).astype(np.float32)
    (y1,) = run_op("Conv", {"x": x}, initializers={"w": w1})
    assert_close(y1, conv1d_oracle(x, w1), tol=1e-4)


def test_conv_transpose_basic():
    x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
    w = rng.standard_normal((3, 4, 3, 3)).astype(np.float32)  # [Cin, Cout, k]
    (y,) = run_op(
        "ConvTranspose", {"x": x}, initializers={"w": w}, strides=[2, 2],
        pads=[1, 1, 1, 1],
    )
    # oracle: scatter-accumulate
    want = np.zeros((1, 4, 9, 9), np.float64)
    for co in range(4):
        for ci in range(3):
            for iy in range(5):
                for ix in range(5):
                    for ky in range(3):
                        for kx in range(3):
                            oy = iy * 2 + ky - 1
                            ox = ix * 2 + kx - 1
                            if 0 <= oy < 9 and 0 <= ox < 9:
                                want[0, co, oy, ox] += x[0, ci, iy, ix] * w[ci, co, ky, kx]
    assert_close(y, want, tol=1e-4)


def test_conv_transpose_1d_group():
    x = rng.standard_normal((1, 4, 7)).astype(np.float32)
    w = rng.standard_normal((4, 2, 4)).astype(np.float32)  # group=2: Cin=4, Cout/g=2
    (y,) = run_op(
        "ConvTranspose", {"x": x}, initializers={"w": w}, strides=[2], group=2
    )
    g, cin_g, cout_g = 2, 2, 2
    want = np.zeros((1, 4, (7 - 1) * 2 + 4), np.float64)
    for gi in range(g):
        for co in range(cout_g):
            for ci in range(cin_g):
                for ii in range(7):
                    for k in range(4):
                        want[0, gi * cout_g + co, ii * 2 + k] += (
                            x[0, gi * cin_g + ci, ii] * w[gi * cin_g + ci, co, k]
                        )
    assert_close(y, want, tol=1e-4)


# -- pooling -----------------------------------------------------------------


def maxpool_oracle(x, k, s, pad=(0, 0, 0, 0)):
    n, c, h, w = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad[0], pad[2]), (pad[1], pad[3])),
                constant_values=-np.inf)
    oh = (xp.shape[2] - k[0]) // s[0] + 1
    ow = (xp.shape[3] - k[1]) // s[1] + 1
    out = np.zeros((n, c, oh, ow), x.dtype)
    for oy in range(oh):
        for ox in range(ow):
            out[:, :, oy, ox] = xp[
                :, :, oy * s[0] : oy * s[0] + k[0], ox * s[1] : ox * s[1] + k[1]
            ].max(axis=(2, 3))
    return out


def test_maxpool_shapes_and_pads():
    x = rng.standard_normal((1, 3, 9, 9)).astype(np.float32)
    (y,) = run_op("MaxPool", {"x": x}, kernel_shape=[3, 3], strides=[2, 2])
    assert_close(y, maxpool_oracle(x, (3, 3), (2, 2)))
    (y,) = run_op(
        "MaxPool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2], pads=[1, 1, 0, 0]
    )
    assert_close(y, maxpool_oracle(x, (2, 2), (2, 2), pad=(1, 1, 0, 0)))


def test_maxpool_ceil_mode():
    x = rng.standard_normal((1, 1, 5, 5)).astype(np.float32)
    (y,) = run_op(
        "MaxPool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2], ceil_mode=1
    )
    assert y.shape == (1, 1, 3, 3)
    assert_close(y[0, 0, 2, 2], x[0, 0, 4, 4])


def test_average_pool():
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    (y,) = run_op("AveragePool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2])
    want = x.reshape(1, 2, 3, 2, 3, 2).mean(axis=(3, 5))
    assert_close(y, want, tol=1e-5)


def test_global_average_pool():
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    (y,) = run_op("GlobalAveragePool", {"x": x})
    assert_close(y, x.mean(axis=(2, 3), keepdims=True), tol=1e-5)


def test_adaptive_avg_pool_analog():
    # reference pooling.rs:1 adaptive_avg_pool1d → AveragePool with computed
    # kernel when sizes divide evenly
    x = rng.standard_normal((1, 4, 12)).astype(np.float32)
    (y,) = run_op("AveragePool", {"x": x}, kernel_shape=[3], strides=[3])
    assert_close(y, x.reshape(1, 4, 4, 3).mean(axis=3), tol=1e-5)


# -- resize ------------------------------------------------------------------


def test_resize_nearest_asymmetric_floor_2x():
    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    (y,) = run_op(
        "Resize",
        {"x": x},
        initializers={"roi": np.zeros(0, np.float32),
                      "scales": np.array([1, 1, 2, 2], np.float32)},
        coordinate_transformation_mode="asymmetric",
        nearest_mode="floor",
        mode="nearest",
    )
    want = x.repeat(2, axis=2).repeat(2, axis=3)
    assert_close(y, want)


def test_resize_linear_half_pixel():
    x = np.array([[[[0.0, 2.0], [4.0, 6.0]]]], dtype=np.float32)
    (y,) = run_op(
        "Resize",
        {"x": x},
        initializers={"roi": np.zeros(0, np.float32),
                      "scales": np.array([1, 1, 2, 2], np.float32)},
        mode="linear",
        coordinate_transformation_mode="half_pixel",
    )
    assert y.shape == (1, 1, 4, 4)
    # centers align: y[0,0,1:3,1:3] interpolates between corners
    assert_close(y[0, 0, 0, 0], 0.0)
    assert_close(y[0, 0, 3, 3], 6.0)
    assert_close(y[0, 0, 1, 1], (0 + 2 + 4 + 6) / 4 * 0.5 + 1.5 * 0.5, tol=1.0)


def test_resize_sizes_align_corners():
    x = np.array([[[0.0, 1.0, 2.0, 3.0]]], dtype=np.float32)  # [1,1,4]
    (y,) = run_op(
        "Resize",
        {"x": x},
        initializers={"roi": np.zeros(0, np.float32),
                      "scales": np.zeros(0, np.float32),
                      "sizes": np.array([1, 1, 7], np.int64)},
        mode="linear",
        coordinate_transformation_mode="align_corners",
    )
    assert_close(y[0, 0], np.linspace(0, 3, 7), tol=1e-5)


# -- normalization -----------------------------------------------------------


def test_layer_norm():
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    g = rng.standard_normal((16,)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    (y,) = run_op(
        "LayerNormalization", {"x": x}, initializers={"g": g, "b": b}, epsilon=1e-5
    )
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-5) * g + b
    assert_close(y, want, tol=1e-4)


def test_batch_norm():
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    scale = rng.standard_normal((3,)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    mean = rng.standard_normal((3,)).astype(np.float32)
    var = np.abs(rng.standard_normal((3,))).astype(np.float32) + 0.1
    (y,) = run_op(
        "BatchNormalization",
        {"x": x},
        initializers={"s": scale, "b": b, "m": mean, "v": var},
        epsilon=1e-5,
    )
    want = (x - mean[:, None, None]) / np.sqrt(var[:, None, None] + 1e-5) * scale[
        :, None, None
    ] + b[:, None, None]
    assert_close(y, want, tol=1e-4)


def test_instance_norm():
    x = rng.standard_normal((2, 3, 8)).astype(np.float32)
    s = np.ones(3, np.float32)
    b = np.zeros(3, np.float32)
    (y,) = run_op("InstanceNormalization", {"x": x}, initializers={"s": s, "b": b})
    mu = x.mean(-1, keepdims=True)
    want = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    assert_close(y, want, tol=1e-4)


# -- STFT (mirrors regression_kernels.rs:426-486 DC + sinusoid cases) --------


def test_stft_dc_signal():
    n_fft, step = 64, 32
    sig = np.ones((1, 256), np.float32)
    win = np.ones(n_fft, np.float32)
    (y,) = run_op(
        "STFT",
        {"sig": sig},
        initializers={"step": np.array(step, np.int64), "win": win},
    )
    frames = (256 - n_fft) // step + 1
    assert y.shape == (1, frames, n_fft // 2 + 1, 2)
    assert_close(y[0, :, 0, 0], np.full(frames, n_fft), tol=1e-3)  # DC bin
    assert_close(y[0, :, 1:, :], np.zeros((frames, n_fft // 2, 2)), tol=1e-3)


def test_stft_known_sinusoid():
    n_fft, step = 64, 64
    k = 5
    t = np.arange(256)
    sig = np.cos(2 * np.pi * k * t / n_fft).astype(np.float32)[None]
    win = np.ones(n_fft, np.float32)
    (y,) = run_op(
        "STFT",
        {"sig": sig},
        initializers={"step": np.array(step, np.int64), "win": win},
    )
    # energy concentrates at bin k with amplitude n_fft/2
    assert_close(y[0, :, k, 0], np.full(4, n_fft / 2), tol=1e-2)
    mask = np.ones(33, bool)
    mask[k] = False
    assert np.abs(y[0][:, mask, :]).max() < 1e-2


def test_stft_vs_scipy():
    from scipy.signal import stft as sp_stft

    n_fft, step = 128, 64
    sig = rng.standard_normal((1, 512)).astype(np.float32)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    (y,) = run_op(
        "STFT",
        {"sig": sig},
        initializers={"step": np.array(step, np.int64), "win": win.astype(np.float32)},
    )
    f, t, z = sp_stft(
        sig[0], window=win, nperseg=n_fft, noverlap=n_fft - step, boundary=None,
        padded=False, scaling="spectrum",
    )
    z = z * win.sum()  # undo scipy's window normalization
    got = y[0, :, :, 0] + 1j * y[0, :, :, 1]
    assert_close(np.abs(got), np.abs(z.T), tol=1e-2)


# -- recurrent ---------------------------------------------------------------


def lstm_oracle(x, w, r, b, h0, c0):
    S, B, I = x.shape
    H = r.shape[1]
    h, c = h0.copy(), c0.copy()
    ys = []
    wb = b[:4 * H] + b[4 * H:]
    for t in range(S):
        g = x[t] @ w.T + h @ r.T + wb
        i = 1 / (1 + np.exp(-g[:, :H]))
        o = 1 / (1 + np.exp(-g[:, H:2 * H]))
        f = 1 / (1 + np.exp(-g[:, 2 * H:3 * H]))
        ct = np.tanh(g[:, 3 * H:])
        c = f * c + i * ct
        h = o * np.tanh(c)
        ys.append(h.copy())
    return np.stack(ys), h, c


def test_lstm_forward():
    S, B, I, H = 6, 2, 4, 5
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 4 * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((1, 4 * H, H)).astype(np.float32) * 0.3
    b = rng.standard_normal((1, 8 * H)).astype(np.float32) * 0.1
    y, yh, yc = run_op(
        "LSTM", {"x": x}, n_outputs=3, initializers={"w": w, "r": r, "b": b},
        hidden_size=H,
    )
    ys, h, c = lstm_oracle(
        x.astype(np.float64), w[0].astype(np.float64), r[0].astype(np.float64),
        b[0].astype(np.float64), np.zeros((B, H)), np.zeros((B, H)),
    )
    assert y.shape == (S, 1, B, H)
    assert_close(y[:, 0], ys, tol=1e-4)
    assert_close(yh[0], h, tol=1e-4)
    assert_close(yc[0], c, tol=1e-4)


def test_lstm_with_initial_state_and_reverse():
    S, B, I, H = 4, 1, 3, 4
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 4 * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((1, 4 * H, H)).astype(np.float32) * 0.3
    b = np.zeros((1, 8 * H), np.float32)
    h0 = rng.standard_normal((1, B, H)).astype(np.float32)
    c0 = rng.standard_normal((1, B, H)).astype(np.float32)
    y, yh, yc = run_op(
        "LSTM",
        {"x": x},
        n_outputs=3,
        initializers={"w": w, "r": r, "b": b, "sl": np.array([S] * B, np.int32),
                      "h0": h0, "c0": c0},
        hidden_size=H,
        direction="reverse",
    )
    ys, h, c = lstm_oracle(
        x[::-1].astype(np.float64), w[0].astype(np.float64),
        r[0].astype(np.float64), b[0].astype(np.float64),
        h0[0].astype(np.float64), c0[0].astype(np.float64),
    )
    assert_close(y[:, 0], ys[::-1], tol=1e-4)
    assert_close(yh[0], h, tol=1e-4)


def test_lstm_peepholes():
    """ONNX LSTM with peephole weights P=[Pi,Po,Pf]: i/f gates see C_{t-1},
    o sees the fresh C_t (spec equations; the reference's rnn.rs has no
    peephole path either — this exceeds it)."""
    S, B, I, H = 5, 2, 3, 4
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 4 * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((1, 4 * H, H)).astype(np.float32) * 0.3
    b = rng.standard_normal((1, 8 * H)).astype(np.float32) * 0.1
    p = rng.standard_normal((1, 3 * H)).astype(np.float32) * 0.5
    y, yh, yc = run_op(
        "LSTM", {"x": x}, n_outputs=3,
        initializers={"w": w, "r": r, "b": b, "sl": np.array([S] * B, np.int32),
                      "h0": np.zeros((1, B, H), np.float32),
                      "c0": np.zeros((1, B, H), np.float32), "p": p},
        hidden_size=H,
    )
    # float64 oracle with peepholes
    xx, ww, rr_, bb, pp = (a.astype(np.float64) for a in (x, w[0], r[0], b[0], p[0]))
    pi, po, pf = pp[:H], pp[H:2 * H], pp[2 * H:]
    wb = bb[:4 * H] + bb[4 * H:]
    h = np.zeros((B, H)); c = np.zeros((B, H))
    sig = lambda v: 1 / (1 + np.exp(-v))
    ys = []
    for t in range(S):
        g = xx[t] @ ww.T + h @ rr_.T + wb
        i = sig(g[:, :H] + pi * c)
        f = sig(g[:, 2 * H:3 * H] + pf * c)
        ct = np.tanh(g[:, 3 * H:])
        c = f * c + i * ct
        o = sig(g[:, H:2 * H] + po * c)
        h = o * np.tanh(c)
        ys.append(h.copy())
    assert_close(y[:, 0], np.stack(ys), tol=1e-4)
    assert_close(yh[0], h, tol=1e-4)
    assert_close(yc[0], c, tol=1e-4)


def test_lstm_ragged_sequence_lens():
    """sequence_lens masking (ORT semantics): Y rows past each length are
    zero; Y_h/Y_c hold the last valid step's states. Checked per-batch
    against the full-length oracle truncated to that batch's length."""
    S, B, I, H = 6, 3, 4, 5
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 4 * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((1, 4 * H, H)).astype(np.float32) * 0.3
    b = rng.standard_normal((1, 8 * H)).astype(np.float32) * 0.1
    lens = np.array([6, 3, 1], np.int32)
    y, yh, yc = run_op(
        "LSTM", {"x": x}, n_outputs=3,
        initializers={"w": w, "r": r, "b": b, "sl": lens},
        hidden_size=H,
    )
    for bi, L in enumerate(lens):
        ys, h, c = lstm_oracle(
            x[:L, bi : bi + 1].astype(np.float64), w[0].astype(np.float64),
            r[0].astype(np.float64), b[0].astype(np.float64),
            np.zeros((1, H)), np.zeros((1, H)),
        )
        assert_close(y[:L, 0, bi], ys[:, 0], tol=1e-4)
        assert_close(y[L:, 0, bi], np.zeros((S - L, H)))
        assert_close(yh[0, bi], h[0], tol=1e-4)
        assert_close(yc[0, bi], c[0], tol=1e-4)


def test_lstm_ragged_reverse():
    """Reverse direction with ragged lengths reverses within each valid
    region (per-batch flip), not the padded window."""
    S, B, I, H = 5, 2, 3, 4
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 4 * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((1, 4 * H, H)).astype(np.float32) * 0.3
    b = np.zeros((1, 8 * H), np.float32)
    lens = np.array([5, 2], np.int32)
    y, yh, yc = run_op(
        "LSTM", {"x": x}, n_outputs=3,
        initializers={"w": w, "r": r, "b": b, "sl": lens},
        hidden_size=H, direction="reverse",
    )
    for bi, L in enumerate(lens):
        ys, h, c = lstm_oracle(
            x[:L, bi : bi + 1][::-1].astype(np.float64), w[0].astype(np.float64),
            r[0].astype(np.float64), b[0].astype(np.float64),
            np.zeros((1, H)), np.zeros((1, H)),
        )
        assert_close(y[:L, 0, bi], ys[::-1, 0], tol=1e-4)
        assert_close(y[L:, 0, bi], np.zeros((S - L, H)))
        assert_close(yh[0, bi], h[0], tol=1e-4)


def test_rnn_vanilla_bidirectional_ragged():
    """ONNX vanilla RNN (beyond the reference): tanh forward + relu reverse,
    bidirectional, with sequence_lens."""
    S, B, I, H = 4, 2, 3, 4
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((2, H, I)).astype(np.float32) * 0.4
    r = rng.standard_normal((2, H, H)).astype(np.float32) * 0.4
    b = rng.standard_normal((2, 2 * H)).astype(np.float32) * 0.1
    lens = np.array([4, 2], np.int32)
    y, yh = run_op(
        "RNN", {"x": x}, n_outputs=2,
        initializers={"w": w, "r": r, "b": b, "sl": lens},
        hidden_size=H, direction="bidirectional",
        activations=["Tanh", "Relu"],
    )
    assert y.shape == (S, 2, B, H)
    relu = lambda v: np.maximum(v, 0)
    for bi, L in enumerate(lens):
        xs = x[:L, bi].astype(np.float64)
        # forward tanh
        h = np.zeros(H)
        fw = []
        for t in range(L):
            h = np.tanh(xs[t] @ w[0].T.astype(np.float64) + h @ r[0].T + (b[0, :H] + b[0, H:]))
            fw.append(h.copy())
        assert_close(y[:L, 0, bi], np.stack(fw), tol=1e-4)
        assert_close(y[L:, 0, bi], np.zeros((S - L, H)))
        assert_close(yh[0, bi], fw[-1], tol=1e-4)
        # reverse relu
        h = np.zeros(H)
        bw = []
        for t in reversed(range(L)):
            h = relu(xs[t] @ w[1].T.astype(np.float64) + h @ r[1].T + (b[1, :H] + b[1, H:]))
            bw.append(h.copy())
        bw = bw[::-1]  # re-ordered to input time order
        assert_close(y[:L, 1, bi], np.stack(bw), tol=1e-4)
        assert_close(y[L:, 1, bi], np.zeros((S - L, H)))
        assert_close(yh[1, bi], bw[0], tol=1e-4)


def gru_oracle(x, w, r, b, h0, lbr):
    S, B, I = x.shape
    H = r.shape[1]
    h = h0.copy()
    wb, rb = b[:3 * H], b[3 * H:]
    ys = []
    sig = lambda v: 1 / (1 + np.exp(-v))
    for t in range(S):
        xz = x[t] @ w[:H].T + wb[:H]
        xr = x[t] @ w[H:2 * H].T + wb[H:2 * H]
        xh = x[t] @ w[2 * H:].T + wb[2 * H:]
        z = sig(xz + h @ r[:H].T + rb[:H])
        rr = sig(xr + h @ r[H:2 * H].T + rb[H:2 * H])
        if lbr:
            ht = np.tanh(xh + rr * (h @ r[2 * H:].T + rb[2 * H:]))
        else:
            ht = np.tanh(xh + (rr * h) @ r[2 * H:].T + rb[2 * H:])
        h = (1 - z) * ht + z * h
        ys.append(h.copy())
    return np.stack(ys), h


def test_gru_ragged_sequence_lens_dynamic_input():
    """GRU ragged masking with sequence_lens as a DYNAMIC graph input
    (traced, not folded)."""
    S, B, I, H = 5, 2, 3, 4
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 3 * H, I)).astype(np.float32) * 0.3
    r = rng.standard_normal((1, 3 * H, H)).astype(np.float32) * 0.3
    b = rng.standard_normal((1, 6 * H)).astype(np.float32) * 0.1
    lens = np.array([5, 2], np.int32)
    y, yh = run_op(
        "GRU", {"x": x, "sl": lens}, n_outputs=2,
        initializers={"w": w, "r": r, "b": b},
        input_names=["x", "w", "r", "b", "sl"],
        hidden_size=H,
    )
    for bi, L in enumerate(lens):
        ys, h = gru_oracle(
            x[:L, bi : bi + 1].astype(np.float64), w[0].astype(np.float64),
            r[0].astype(np.float64), b[0].astype(np.float64),
            np.zeros((1, H)), False,
        )
        assert_close(y[:L, 0, bi], ys[:, 0], tol=1e-4)
        assert_close(y[L:, 0, bi], np.zeros((S - L, H)))
        assert_close(yh[0, bi], h[0], tol=1e-4)


@pytest.mark.parametrize("lbr", [0, 1])
def test_gru_variants(lbr):
    S, B, I, H = 5, 2, 3, 4
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 3 * H, I)).astype(np.float32) * 0.4
    r = rng.standard_normal((1, 3 * H, H)).astype(np.float32) * 0.4
    b = rng.standard_normal((1, 6 * H)).astype(np.float32) * 0.1
    y, yh = run_op(
        "GRU", {"x": x}, n_outputs=2, initializers={"w": w, "r": r, "b": b},
        hidden_size=H, linear_before_reset=lbr,
    )
    ys, h = gru_oracle(
        x.astype(np.float64), w[0].astype(np.float64), r[0].astype(np.float64),
        b[0].astype(np.float64), np.zeros((B, H)), lbr,
    )
    assert_close(y[:, 0], ys, tol=1e-4)
    assert_close(yh[0], h, tol=1e-4)


def test_gru_no_bias_single_step():
    S, B, I, H = 1, 1, 2, 3
    x = rng.standard_normal((S, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 3 * H, I)).astype(np.float32)
    r = rng.standard_normal((1, 3 * H, H)).astype(np.float32)
    y, yh = run_op(
        "GRU", {"x": x}, n_outputs=2, initializers={"w": w, "r": r}, hidden_size=H
    )
    ys, h = gru_oracle(
        x.astype(np.float64), w[0].astype(np.float64), r[0].astype(np.float64),
        np.zeros(6 * H), np.zeros((B, H)), False,
    )
    assert_close(y[:, 0], ys, tol=1e-4)
