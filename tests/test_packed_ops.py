"""com.microsoft varlen family (RemovePadding / RestorePadding /
PackedAttention / PackedMultiHeadAttention) vs literal numpy oracles.
The TPU-native reinterpretation keeps the packed dim static at B·S with
validity as data; these tests pin the ORT-visible contract: compaction
order (token_offset), cumulated lengths, zero-filled padding on restore,
and attention outputs equal to a padded-batch reference at every REAL
token."""

import numpy as np
import pytest

from optest import run_graph, run_op


def np_order(lens, b, s):
    flat = []
    for i in range(b):
        flat.extend(range(i * s, i * s + lens[i]))
    for i in range(b):
        flat.extend(range(i * s + lens[i], (i + 1) * s))
    return np.asarray(flat, np.int32)


def np_mha(q, k, v, lens, heads):
    """Padded-batch oracle: q/k/v [B,S,H*dh] → [B,S,H*dh], keys masked
    to lens."""
    b, s, hd = q.shape
    dh = hd // heads

    def split(t):
        return t.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)

    qs, ks, vs = split(q), split(k), split(v)
    att = np.einsum("bhqd,bhkd->bhqk", qs, ks) / np.sqrt(dh)
    for i in range(b):
        att[i, :, :, lens[i]:] = -1e9
    att = att - att.max(-1, keepdims=True)
    w = np.exp(att)
    w = w / w.sum(-1, keepdims=True)
    y = np.einsum("bhqk,bhkd->bhqd", w, vs)
    return y.transpose(0, 2, 1, 3).reshape(b, s, hd)


def test_remove_restore_roundtrip():
    rng = np.random.default_rng(0)
    b, s, h = 3, 5, 4
    lens = np.asarray([5, 2, 3], np.int32)
    x = rng.standard_normal((b, s, h)).astype(np.float32)
    packed, off, cum, mx = run_op(
        "RemovePadding", {"x": x, "lens": lens}, n_outputs=4,
        domain="com.microsoft")
    order = np_order(lens, b, s)
    np.testing.assert_array_equal(off.reshape(-1), order)
    np.testing.assert_array_equal(cum, [0, 5, 7, 10])
    np.testing.assert_array_equal(mx, [5])
    np.testing.assert_allclose(packed, x.reshape(-1, h)[order])

    restored = run_op("RestorePadding", {"p": packed, "off": off},
                      domain="com.microsoft")[0]
    want = x.copy()
    for i in range(b):
        want[i, lens[i]:] = 0.0  # ORT zero-fills padding
    np.testing.assert_allclose(restored, want, rtol=1e-6)


def test_packed_attention_vs_padded_oracle():
    rng = np.random.default_rng(1)
    b, s, heads, dh = 2, 6, 2, 4
    d = heads * dh
    lens = np.asarray([4, 6], np.int32)
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    for i in range(b):
        x[i, lens[i]:] = 0.0
    w = (rng.standard_normal((d, 3 * d)) / np.sqrt(d)).astype(np.float32)
    bias = rng.standard_normal(3 * d).astype(np.float32)

    order = np_order(lens, b, s)
    packed = x.reshape(-1, d)[order]
    off = order.reshape(b, s)
    cum = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    got = run_op(
        "PackedAttention",
        {"x": packed, "w": w, "bias": bias, "off": off, "cum": cum},
        domain="com.microsoft", num_heads=heads)[0]

    qkv = x @ w + bias
    q, k, v = np.split(qkv, 3, axis=-1)
    want_padded = np_mha(q, k, v, lens, heads)
    want = want_padded.reshape(-1, d)[order]
    total = int(lens.sum())
    np.testing.assert_allclose(got[:total], want[:total], rtol=1e-4,
                               atol=1e-5)


def test_packed_mha_three_input_and_packed_qkv():
    rng = np.random.default_rng(2)
    b, s, heads, dh = 2, 4, 3, 5
    d = heads * dh
    lens = np.asarray([3, 4], np.int32)
    order = np_order(lens, b, s)
    off = order.reshape(b, s)
    cum = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    n = b * s
    q = rng.standard_normal((n, d)).astype(np.float32)
    k = rng.standard_normal((n, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    got = run_op(
        "PackedMultiHeadAttention",
        {"q": q, "k": k, "v": v, "off": off, "cum": cum},
        input_names=["q", "k", "v", "", "off", "cum"],
        domain="com.microsoft", num_heads=heads)[0]

    inv = np.empty(n, np.int32)
    inv[order] = np.arange(n)
    qp = q[inv].reshape(b, s, d)
    kp = k[inv].reshape(b, s, d)
    vp = v[inv].reshape(b, s, d)
    want = np_mha(qp, kp, vp, lens, heads).reshape(-1, d)[order]
    total = int(lens.sum())
    np.testing.assert_allclose(got[:total], want[:total], rtol=1e-4,
                               atol=1e-5)

    # packed-QKV 4D form: [total, H, 3, dh]
    qkv4 = np.stack([q.reshape(n, heads, dh), k.reshape(n, heads, dh),
                     v.reshape(n, heads, dh)], axis=2)
    got2 = run_op(
        "PackedMultiHeadAttention",
        {"q": qkv4, "off": off, "cum": cum},
        input_names=["q", "", "", "", "off", "cum"],
        domain="com.microsoft", num_heads=heads)[0]
    np.testing.assert_allclose(got2[:total], want[:total], rtol=1e-4,
                               atol=1e-5)


def test_packed_pipeline_graph():
    """RemovePadding → PackedAttention → RestorePadding composed in one
    graph equals the padded reference with zeros at padding — the full
    ORT rewrite shape."""
    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(3)
    b, s, heads, dh = 2, 5, 2, 4
    d = heads * dh
    lens = np.asarray([2, 5], np.int32)
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    for i in range(b):
        x[i, lens[i]:] = 0.0
    w = (rng.standard_normal((d, 3 * d)) / np.sqrt(d)).astype(np.float32)
    nodes = [
        ob.node("RemovePadding", ["x", "lens"],
                ["packed", "off", "cum", "mx"], domain="com.microsoft"),
        ob.node("PackedAttention", ["packed", "w", "", "off", "cum"],
                ["att"], domain="com.microsoft", num_heads=heads),
        ob.node("RestorePadding", ["att", "off"], ["y"],
                domain="com.microsoft"),
    ]
    got = run_graph(nodes, {"x": x, "lens": lens}, ["y"],
                    initializers={"w": w})[0]
    qkv = x @ w
    q, k, v = np.split(qkv, 3, axis=-1)
    want = np_mha(q, k, v, lens, heads)
    for i in range(b):
        want[i, lens[i]:] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_packed_refusals():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    w = rng.standard_normal((8, 24)).astype(np.float32)
    off = np.arange(4, dtype=np.int32).reshape(2, 2)
    cum = np.asarray([0, 2, 4], np.int32)
    with pytest.raises(Exception, match="num_heads"):
        run_op("PackedAttention",
               {"x": x, "w": w, "bias": np.zeros(24, np.float32),
                "off": off, "cum": cum}, domain="com.microsoft")
    with pytest.raises(Exception, match="qkv_hidden_sizes"):
        run_op("PackedAttention",
               {"x": x, "w": w, "bias": np.zeros(24, np.float32),
                "off": off, "cum": cum}, domain="com.microsoft",
               num_heads=2, qkv_hidden_sizes=[8, 8, 4])
