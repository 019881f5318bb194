"""Attention / RotaryEmbedding / Swish / TensorScatter / AffineGrid
(opset 23/24) vs torch + numpy oracles, driven through the full
build→load→trace pipeline (optest.run_op)."""

import numpy as np
import pytest

from optest import run_op

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

B, H, KVH, LQ, LK, D = 2, 4, 2, 5, 7, 8


def _qkv(rng, h=H, kvh=H, lq=LQ, lk=LK, d=D):
    q = rng.standard_normal((B, h, lq, d)).astype(np.float32)
    k = rng.standard_normal((B, kvh, lk, d)).astype(np.float32)
    v = rng.standard_normal((B, kvh, lk, d)).astype(np.float32)
    return q, k, v


def _sdpa(q, k, v, **kw):
    return F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), **kw
    ).numpy()


def test_attention_basic_4d():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    got = run_op("Attention", {"q": q, "k": k, "v": v})[0]
    np.testing.assert_allclose(got, _sdpa(q, k, v), rtol=2e-5, atol=2e-6)


def test_attention_causal():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng)
    got = run_op("Attention", {"q": q, "k": k, "v": v}, is_causal=1)[0]
    want = _sdpa(q, k, v, is_causal=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_attention_float_mask():
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng)
    mask = (rng.standard_normal((B, 1, LQ, LK)) * 2).astype(np.float32)
    got = run_op("Attention", {"q": q, "k": k, "v": v, "mask": mask},
                 input_names=["q", "k", "v", "mask"])[0]
    want = _sdpa(q, k, v, attn_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_attention_bool_mask():
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng)
    mask = rng.random((B, 1, LQ, LK)) > 0.3
    mask[..., 0] = True  # keep every row attendable
    got = run_op("Attention", {"q": q, "k": k, "v": v, "mask": mask},
                 input_names=["q", "k", "v", "mask"])[0]
    want = _sdpa(q, k, v, attn_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_attention_gqa():
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, kvh=KVH)
    got = run_op("Attention", {"q": q, "k": k, "v": v})[0]
    want = _sdpa(q, np.repeat(k, H // KVH, 1), np.repeat(v, H // KVH, 1))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_attention_scale_attr():
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng)
    got = run_op("Attention", {"q": q, "k": k, "v": v}, scale=0.05)[0]
    want = _sdpa(q, k, v, scale=0.05)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_attention_past_kv_and_present():
    rng = np.random.default_rng(6)
    q, k, v = _qkv(rng)
    pk = rng.standard_normal((B, H, 3, D)).astype(np.float32)
    pv = rng.standard_normal((B, H, 3, D)).astype(np.float32)
    outs = run_op(
        "Attention",
        {"q": q, "k": k, "v": v, "pk": pk, "pv": pv},
        input_names=["q", "k", "v", "", "pk", "pv"],  # no attn_mask
        n_outputs=3,
    )
    kk = np.concatenate([pk, k], 2)
    vv = np.concatenate([pv, v], 2)
    np.testing.assert_allclose(outs[0], _sdpa(q, kk, vv),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(outs[1], kk, rtol=1e-6)
    np.testing.assert_allclose(outs[2], vv, rtol=1e-6)


def test_attention_3d_form():
    rng = np.random.default_rng(7)
    q = rng.standard_normal((B, LQ, H * D)).astype(np.float32)
    k = rng.standard_normal((B, LK, KVH * D)).astype(np.float32)
    v = rng.standard_normal((B, LK, KVH * D)).astype(np.float32)
    got = run_op("Attention", {"q": q, "k": k, "v": v},
                 q_num_heads=H, kv_num_heads=KVH)[0]

    def split(x, h):
        b, s, hd = x.shape
        return x.reshape(b, s, h, hd // h).transpose(0, 2, 1, 3)

    want = _sdpa(split(q, H), np.repeat(split(k, KVH), H // KVH, 1),
                 np.repeat(split(v, KVH), H // KVH, 1))
    want = want.transpose(0, 2, 1, 3).reshape(B, LQ, H * D)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def _np_attention(q, k, v, scale, softcap=0.0, mode=3):
    qk = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    taps = {0: qk.copy(), 1: qk.copy()}
    if softcap > 0:
        qk = softcap * np.tanh(qk / softcap)
    taps[2] = qk.copy()
    e = np.exp(qk - qk.max(-1, keepdims=True))
    w = e / e.sum(-1, keepdims=True)
    taps[3] = w.copy()
    return np.einsum("bhqk,bhkd->bhqd", w, v), taps[mode]


def test_attention_softcap():
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng)
    got = run_op("Attention", {"q": q, "k": k, "v": v}, softcap=5.0)[0]
    want, _ = _np_attention(q, k, v, 1 / np.sqrt(D), softcap=5.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("mode", [0, 3])
def test_attention_qk_output_modes(mode):
    rng = np.random.default_rng(9)
    q, k, v = _qkv(rng)
    outs = run_op("Attention", {"q": q, "k": k, "v": v},
                  n_outputs=4, qk_matmul_output_mode=mode)
    want_y, want_tap = _np_attention(q, k, v, 1 / np.sqrt(D), mode=mode)
    np.testing.assert_allclose(outs[0], want_y, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(outs[3], want_tap, rtol=2e-5, atol=2e-6)


def test_attention_fp16_dtype_carried():
    """Half inputs: softmax runs in f32 internally, output returns f16."""
    rng = np.random.default_rng(21)
    q = rng.standard_normal((B, H, LQ, D)).astype(np.float16)
    k = rng.standard_normal((B, H, LK, D)).astype(np.float16)
    v = rng.standard_normal((B, H, LK, D)).astype(np.float16)
    got = run_op("Attention", {"q": q, "k": k, "v": v})[0]
    assert got.dtype == np.float16
    want = _sdpa(q.astype(np.float32), k.astype(np.float32),
                 v.astype(np.float32))
    np.testing.assert_allclose(got.astype(np.float32), want,
                               rtol=5e-3, atol=5e-3)


def test_flash_gate_declines_off_tpu():
    """The Pallas flash path must never engage off-TPU or when disabled;
    on-TPU engagement + parity + speed is scripts/flash_attention_tpu.py."""
    from lele_tpu.ops.attention_ops import _flash_attention_maybe

    rng = np.random.default_rng(20)
    q = rng.standard_normal((1, 2, 128, 64)).astype(np.float32)
    assert _flash_attention_maybe(
        None, q, q, q, None, False, 0.125, 0.0, n_out=1, mode=0
    ) is None  # CPU platform under conftest


def test_attention_error_paths():
    rng = np.random.default_rng(22)
    q, k, v = _qkv(rng)
    # 3D form without the required head attributes
    q3 = rng.standard_normal((B, LQ, H * D)).astype(np.float32)
    k3 = rng.standard_normal((B, LK, H * D)).astype(np.float32)
    with pytest.raises(Exception, match="q_num_heads"):
        run_op("Attention", {"q": q3, "k": k3, "v": k3})
    # GQA with non-divisible head counts
    kbad = rng.standard_normal((B, 3, LK, D)).astype(np.float32)
    with pytest.raises(Exception, match="divisible"):
        run_op("Attention", {"q": q, "k": kbad, "v": kbad})


def test_rotary_requires_num_heads_for_3d():
    rng = np.random.default_rng(23)
    x = rng.standard_normal((B, LQ, H * D)).astype(np.float32)
    cos = rng.standard_normal((B, LQ, D // 2)).astype(np.float32)
    with pytest.raises(Exception, match="num_heads"):
        run_op("RotaryEmbedding", {"x": x, "cos": cos, "sin": cos})


def test_tensor_scatter_rejects_batch_axis():
    rng = np.random.default_rng(24)
    cache = rng.standard_normal((B, H, 8, D)).astype(np.float32)
    upd = rng.standard_normal((B, H, 2, D)).astype(np.float32)
    with pytest.raises(Exception, match="axis"):
        run_op("TensorScatter", {"c": cache, "u": upd}, axis=0)


# --- RotaryEmbedding -------------------------------------------------------


def _np_rotary(x, cos, sin, interleaved=False, rdim=None):
    d = x.shape[-1]
    r = rdim or d
    xr, rest = x[..., :r], x[..., r:]
    c = cos[:, None, :, : r // 2]
    s = sin[:, None, :, : r // 2]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
    else:
        x1, x2 = xr[..., : r // 2], xr[..., r // 2:]
    o1, o2 = x1 * c - x2 * s, x1 * s + x2 * c
    if interleaved:
        rot = np.stack([o1, o2], -1).reshape(xr.shape)
    else:
        rot = np.concatenate([o1, o2], -1)
    return np.concatenate([rot, rest], -1) if r < d else rot


@pytest.mark.parametrize("interleaved", [0, 1])
def test_rotary_with_position_ids(interleaved):
    rng = np.random.default_rng(10)
    x = rng.standard_normal((B, H, LQ, D)).astype(np.float32)
    maxp = 16
    inv = 1.0 / 10000 ** (np.arange(D // 2) / (D // 2))
    t = np.arange(maxp)[:, None] * inv[None, :]
    cos, sin = np.cos(t).astype(np.float32), np.sin(t).astype(np.float32)
    pos = rng.integers(0, maxp, (B, LQ)).astype(np.int64)
    got = run_op(
        "RotaryEmbedding",
        {"x": x, "pos": pos},
        initializers={"cos": cos, "sin": sin},
        input_names=["x", "cos", "sin", "pos"],
        interleaved=interleaved,
    )[0]
    want = _np_rotary(x, cos[pos], sin[pos], bool(interleaved))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rotary_partial_dim_3d():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, LQ, H * D)).astype(np.float32)
    r = D // 2
    cos = rng.standard_normal((B, LQ, r // 2)).astype(np.float32)
    sin = rng.standard_normal((B, LQ, r // 2)).astype(np.float32)
    got = run_op(
        "RotaryEmbedding", {"x": x, "cos": cos, "sin": sin},
        num_heads=H, rotary_embedding_dim=r,
    )[0]
    x4 = x.reshape(B, LQ, H, D).transpose(0, 2, 1, 3)
    want = _np_rotary(x4, cos, sin, False, rdim=r)
    want = want.transpose(0, 2, 1, 3).reshape(B, LQ, H * D)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# --- Swish / TensorScatter / AffineGrid ------------------------------------


def test_swish():
    rng = np.random.default_rng(12)
    x = rng.standard_normal((4, 9)).astype(np.float32)
    got = run_op("Swish", {"x": x}, alpha=0.7)[0]
    want = x / (1 + np.exp(-0.7 * x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("mode", ["linear", "circular"])
def test_tensor_scatter(mode):
    rng = np.random.default_rng(13)
    maxs, s = 10, 4
    cache = rng.standard_normal((B, H, maxs, D)).astype(np.float32)
    upd = rng.standard_normal((B, H, s, D)).astype(np.float32)
    wi = np.array([2, 8], dtype=np.int64)  # 8+4 wraps in circular
    if mode == "linear":
        wi = np.array([2, 6], dtype=np.int64)  # in-bounds per spec
    got = run_op("TensorScatter", {"cache": cache, "upd": upd, "wi": wi},
                 mode=mode)[0]
    want = cache.copy()
    for b in range(B):
        for i in range(s):
            pos = wi[b] + i
            pos = pos % maxs if mode == "circular" else pos
            want[b, :, pos] = upd[b, :, i]
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("align", [0, 1])
def test_affine_grid_2d(align):
    rng = np.random.default_rng(14)
    n, c, h, w = 2, 3, 5, 7
    theta = rng.standard_normal((n, 2, 3)).astype(np.float32)
    size = np.array([n, c, h, w], dtype=np.int64)
    got = run_op("AffineGrid", {"theta": theta},
                 initializers={"size": size}, align_corners=align)[0]
    want = F.affine_grid(torch.from_numpy(theta), [n, c, h, w],
                         align_corners=bool(align)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("align", [0, 1])
def test_spatial_transformer_composition(align):
    """AffineGrid → GridSample chained (the spatial-transformer block) vs
    torch's affine_grid + grid_sample."""
    from optest import run_graph
    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(16)
    n, c, h, w = 2, 3, 6, 5
    x = rng.standard_normal((n, c, h, w)).astype(np.float32)
    theta = (np.tile(np.eye(2, 3, dtype=np.float32), (n, 1, 1))
             + rng.standard_normal((n, 2, 3)).astype(np.float32) * 0.1)
    nodes = [
        ob.node("AffineGrid", ["theta", "size"], ["grid"],
                align_corners=align),
        ob.node("GridSample", ["x", "grid"], ["y"], mode="linear",
                padding_mode="zeros", align_corners=align),
    ]
    got = run_graph(
        nodes, {"x": x, "theta": theta}, ["y"],
        initializers={"size": np.array([n, c, h, w], np.int64)},
        opset=20,
    )[0]
    tg = F.affine_grid(torch.from_numpy(theta), [n, c, h, w],
                       align_corners=bool(align))
    want = F.grid_sample(torch.from_numpy(x), tg, mode="bilinear",
                         padding_mode="zeros",
                         align_corners=bool(align)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align", [0, 1])
def test_affine_grid_3d(align):
    rng = np.random.default_rng(15)
    n, c, d, h, w = 2, 1, 3, 4, 5
    theta = rng.standard_normal((n, 3, 4)).astype(np.float32)
    size = np.array([n, c, d, h, w], dtype=np.int64)
    got = run_op("AffineGrid", {"theta": theta},
                 initializers={"size": size}, align_corners=align)[0]
    want = F.affine_grid(torch.from_numpy(theta), [n, c, d, h, w],
                         align_corners=bool(align)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
