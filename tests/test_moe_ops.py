"""com.microsoft::MoE / QMoE vs literal numpy oracles: top-k softmax
routing (± normalization), the SparseMixer-v2 rule (Phi-3.5-MoE), fc3
gating (Mixtral w1/w3 form), 4-bit and 8-bit quantized experts, and both
static lowerings (gather decode path vs unrolled prefill path)."""

import numpy as np
import pytest

from optest import run_op

EPS = 0.01


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_route(logits, k, normalize, sparse_mixer):
    rows, E = logits.shape
    if sparse_mixer:
        w_list, e_list = [], []
        lg = logits.astype(np.float64)
        masked = lg.copy()
        for _ in range(2):
            thr = masked.max(-1, keepdims=True)
            ind = masked.argmax(-1)
            factor = np.maximum(np.abs(lg), thr)
            drop = (thr - masked) / factor > 2 * EPS
            gates = np.where(drop, -np.inf, masked)
            gates = np_softmax(gates)
            w_list.append(gates[np.arange(rows), ind])
            e_list.append(ind)
            masked[np.arange(rows), ind] = -np.inf
        return np.stack(w_list, -1), np.stack(e_list, -1)
    probs = np_softmax(logits.astype(np.float64))
    idx = np.argsort(-probs, axis=-1, kind="stable")[:, :k]
    w = np.take_along_axis(probs, idx, axis=-1)
    if normalize:
        w = w / w.sum(-1, keepdims=True)
    return w, idx


def np_act(h, act):
    if act == "relu":
        return np.maximum(h, 0)
    if act == "gelu":
        import math
        return 0.5 * h * (1 + np.vectorize(math.erf)(h / np.sqrt(2.0)))
    if act == "silu":
        return h / (1 + np.exp(-h))
    if act == "identity":
        return h
    raise AssertionError(act)


def np_moe(x, logits, w1, b1, w2, b2, w3=None, b3=None, *, k=2, act="relu",
           normalize=0, sparse_mixer=0):
    shape = x.shape
    hidden = shape[-1]
    x2 = x.reshape(-1, hidden).astype(np.float64)
    rows = x2.shape[0]
    weights, experts = np_route(logits.reshape(rows, -1), k, normalize,
                                sparse_mixer)
    out = np.zeros_like(x2)
    for r in range(rows):
        for slot in range(weights.shape[-1]):
            e = experts[r, slot]
            h = x2[r] @ w1[e].astype(np.float64)
            if b1 is not None:
                h = h + b1[e]
            h = np_act(h, act)
            if w3 is not None:
                g = x2[r] @ w3[e].astype(np.float64)
                if b3 is not None:
                    g = g + b3[e]
                h = h * g
            y = h @ w2[e].astype(np.float64)
            if b2 is not None:
                y = y + b2[e]
            out[r] += weights[r, slot] * y
    return out.reshape(shape)


def _case(seed, rows, E=8, hidden=6, inter=10, bias=True, fc3=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((rows, hidden)).astype(np.float32)
    logits = rng.standard_normal((rows, E)).astype(np.float32)
    w1 = rng.standard_normal((E, hidden, inter)).astype(np.float32) * 0.3
    w2 = rng.standard_normal((E, inter, hidden)).astype(np.float32) * 0.3
    b1 = rng.standard_normal((E, inter)).astype(np.float32) if bias else None
    b2 = rng.standard_normal((E, hidden)).astype(np.float32) if bias \
        else None
    w3 = rng.standard_normal((E, hidden, inter)).astype(np.float32) * 0.3 \
        if fc3 else None
    b3 = rng.standard_normal((E, inter)).astype(np.float32) \
        if (fc3 and bias) else None
    return x, logits, w1, b1, w2, b2, w3, b3


def _run_moe(x, logits, w1, b1, w2, b2, w3=None, b3=None, **attrs):
    names = ["x", "logits", "w1", "b1", "w2", "b2", "w3", "b3"]
    vals = [x, logits, w1, b1, w2, b2, w3, b3]
    inputs, in_names = {}, []
    for n, v in zip(names, vals):
        if v is None:
            in_names.append("")
        else:
            in_names.append(n)
            inputs[n] = v
    while in_names and in_names[-1] == "":
        in_names.pop()
    return run_op("MoE", inputs, input_names=in_names,
                  domain="com.microsoft", **attrs)[0]


def test_moe_topk_decode_path():
    x, logits, w1, b1, w2, b2, _, _ = _case(0, rows=2)
    got = _run_moe(x, logits, w1, b1, w2, b2, k=2,
                   activation_type="relu")
    want = np_moe(x, logits, w1, b1, w2, b2, k=2, act="relu")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_topk_prefill_path_3d_normalized():
    # rows*k > E forces the unrolled path; 3D input; silu; normalization
    x, logits, w1, b1, w2, b2, _, _ = _case(1, rows=12, E=4)
    x3 = x.reshape(3, 4, -1)
    got = _run_moe(x3, logits, w1, b1, w2, b2, k=2,
                   activation_type="silu", normalize_routing_weights=1)
    want = np_moe(x3, logits, w1, b1, w2, b2, k=2, act="silu", normalize=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_paths_agree():
    # the same problem through both lowerings (rows=2 vs tiled rows=16)
    x, logits, w1, b1, w2, b2, _, _ = _case(2, rows=2, E=8)
    small = _run_moe(x, logits, w1, b1, w2, b2, k=2,
                     activation_type="gelu")
    xt = np.tile(x, (8, 1))
    lt = np.tile(logits, (8, 1))
    big = _run_moe(xt, lt, w1, b1, w2, b2, k=2, activation_type="gelu")
    np.testing.assert_allclose(big[:2], small, rtol=1e-4, atol=1e-5)


def test_moe_fc3_gated_no_bias():
    x, logits, w1, b1, w2, b2, w3, b3 = _case(3, rows=2, bias=False,
                                              fc3=True)
    got = _run_moe(x, logits, w1, None, w2, None, w3, None, k=2,
                   activation_type="silu", normalize_routing_weights=1)
    want = np_moe(x, logits, w1, None, w2, None, w3, None, k=2, act="silu",
                  normalize=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_sparse_mixer():
    x, logits, w1, b1, w2, b2, w3, b3 = _case(4, rows=3, fc3=True)
    got = _run_moe(x, logits, w1, b1, w2, b2, w3, b3, k=2,
                   activation_type="silu", use_sparse_mixer=1)
    want = np_moe(x, logits, w1, b1, w2, b2, w3, b3, k=2, act="silu",
                  sparse_mixer=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # the mixer's masked-softmax weights differ from plain top-2 softmax
    plain = np_moe(x, logits, w1, b1, w2, b2, w3, b3, k=2, act="silu")
    assert np.abs(want - plain).max() > 1e-4


def test_moe_refusals():
    x, logits, w1, b1, w2, b2, _, _ = _case(5, rows=2)
    with pytest.raises(Exception, match="activation_type"):
        _run_moe(x, logits, w1, b1, w2, b2, k=2,
                 activation_type="swiglu")
    with pytest.raises(Exception, match="k=2"):
        _run_moe(x, logits, w1, b1, w2, b2, k=1, use_sparse_mixer=1)


# ------------------------------------------------------------------ QMoE


def quantize_cols(w, bits):
    """Symmetric per-output-column quantization of [E, in, out] →
    (storage uint8, scales [E, out])."""
    zp = 1 << (bits - 1)
    qmax = zp - 1
    scales = np.abs(w).max(axis=1) / qmax  # [E, out]
    scales = np.maximum(scales, 1e-8)
    q = np.clip(np.round(w / scales[:, None, :]) + zp, 0,
                (1 << bits) - 1).astype(np.uint8)
    deq = (q.astype(np.float64) - zp) * scales[:, None, :]
    if bits == 4:
        packed = (q[..., 0::2] | (q[..., 1::2] << 4)).astype(np.uint8)
    else:
        packed = q
    return packed, scales.astype(np.float32), deq.astype(np.float32)


def _run_qmoe(x, logits, fc1, fc2, fc3=None, **attrs):
    names = ["x", "logits", "w1", "s1", "b1", "w2", "s2", "b2", "w3",
             "s3", "b3"]
    fc3 = fc3 or (None, None, None)
    vals = [x, logits, fc1[0], fc1[1], fc1[2], fc2[0], fc2[1], fc2[2],
            fc3[0], fc3[1], fc3[2]]
    inputs, in_names = {}, []
    for n, v in zip(names, vals):
        if v is None:
            in_names.append("")
        else:
            in_names.append(n)
            inputs[n] = v
    while in_names and in_names[-1] == "":
        in_names.pop()
    return run_op("QMoE", inputs, input_names=in_names,
                  domain="com.microsoft", **attrs)[0]


@pytest.mark.parametrize("bits", [4, 8])
def test_qmoe_decode_path(bits):
    x, logits, w1, b1, w2, b2, _, _ = _case(6, rows=2, inter=8)
    q1, s1, d1 = quantize_cols(w1, bits)
    q2, s2, d2 = quantize_cols(w2, bits)
    got = _run_qmoe(x, logits, (q1, s1, b1), (q2, s2, b2), k=2,
                    activation_type="relu", expert_weight_bits=bits)
    want = np_moe(x, logits, d1, b1, d2, b2, k=2, act="relu")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_qmoe_prefill_fc3_sparse_mixer():
    x, logits, w1, b1, w2, b2, w3, b3 = _case(7, rows=16, E=4, inter=8,
                                              fc3=True)
    q1, s1, d1 = quantize_cols(w1, 4)
    q2, s2, d2 = quantize_cols(w2, 4)
    q3, s3, d3 = quantize_cols(w3, 4)
    got = _run_qmoe(x, logits, (q1, s1, b1), (q2, s2, b2), (q3, s3, b3),
                    k=2, activation_type="silu", use_sparse_mixer=1,
                    expert_weight_bits=4)
    want = np_moe(x, logits, d1, b1, d2, b2, d3, b3, k=2, act="silu",
                  sparse_mixer=1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_qmoe_refusals():
    x, logits, w1, b1, w2, b2, _, _ = _case(8, rows=2, inter=8)
    q1, s1, _ = quantize_cols(w1, 4)
    q2, s2, _ = quantize_cols(w2, 4)
    with pytest.raises(Exception, match="expert_weight_bits"):
        _run_qmoe(x, logits, (q1, s1, None), (q2, s2, None), k=2,
                  expert_weight_bits=3)


# ------------------------------------------- qmoe_w4 pattern (Pallas route)


def test_qmoe_w4_pattern_parity_and_engagement(monkeypatch):
    """The compile-time qmoe_w4 pattern (decode path through the w4
    kernel's layout) forced on CPU via LELE_QMOE_PALLAS=1 +
    LELE_NBITS_F32=1 (exact math through the kernel's guarded jnp
    fallback): engaged, and output matches the emitter path."""
    x, logits, w1, b1, w2, b2, w3, b3 = _case(20, rows=2, E=8, hidden=8,
                                              inter=16, bias=False,
                                              fc3=True)
    q1, s1, d1 = quantize_cols(w1, 4)
    q2, s2, d2 = quantize_cols(w2, 4)
    q3, s3, d3 = quantize_cols(w3, 4)

    base = _run_qmoe(x, logits, (q1, s1, None), (q2, s2, None),
                     (q3, s3, None), k=2, activation_type="silu",
                     use_sparse_mixer=1, expert_weight_bits=4)

    monkeypatch.setenv("LELE_QMOE_PALLAS", "1")
    monkeypatch.setenv("LELE_NBITS_F32", "1")
    import optest as ot
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.onnx import builder as ob

    inits = {"w1": q1, "s1": s1, "w2": q2, "s2": s2, "w3": q3, "s3": s3}
    node = ob.node("QMoE",
                   ["x", "logits", "w1", "s1", "", "w2", "s2", "", "w3",
                    "s3"], ["y"], domain="com.microsoft", k=2,
                   activation_type="silu", use_sparse_mixer=1,
                   expert_weight_bits=4)
    bs = ob.build_model_bytes(
        [node],
        inputs=[ob.vi_from_array("x", x), ob.vi_from_array("logits",
                                                           logits)],
        outputs=[ob.value_info("y", 1, [])],
        initializers=[ob.tensor_from_array(v, k)
                      for k, v in inits.items()])
    cm = compile_model(OnnxModel.from_bytes(bs), strict=True)
    assert cm.stats.get("pattern_hits", {}).get("qmoe_w4")
    got = cm.run_np(x=x, logits=logits)[0]
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)
    # and vs the float oracle
    want = np_moe(x, logits, d1, None, d2, None, d3, None, k=2,
                  act="silu", sparse_mixer=1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_qmoe_w4_pattern_declines_prefill(monkeypatch):
    """rows·k > E keeps the emitter's unrolled path (no pattern hit)."""
    monkeypatch.setenv("LELE_QMOE_PALLAS", "1")
    x, logits, w1, b1, w2, b2, _, _ = _case(21, rows=16, E=4, hidden=8,
                                            inter=16, bias=False)
    q1, s1, d1 = quantize_cols(w1, 4)
    q2, s2, d2 = quantize_cols(w2, 4)
    got = _run_qmoe(x, logits, (q1, s1, None), (q2, s2, None), k=2,
                    activation_type="relu", expert_weight_bits=4)
    want = np_moe(x, logits, d1, None, d2, None, k=2, act="relu")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
