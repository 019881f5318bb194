"""com.microsoft DecoderMaskedSelfAttention / DecoderMaskedMultiHeadAttention
— ORT's explicit static-buffer decode attention (the form its GPU generative
exports carry): new KV rows land at the past_sequence_length INPUT, validity
is global causality over the shared max-length buffer. Oracles are literal
numpy; the e2e test proves a whisper-form BeamSearch whose decoder uses the
explicit DecoderMasked ops produces byte-identical output to the
MHA-with-injected-mask variant (same math, two export forms)."""

import numpy as np
import pytest

from optest import assert_close, run_op

B, H, DH, ML = 2, 2, 8, 10
D = H * DH


def np_softmax(s, axis=-1):
    s = s - s.max(axis=axis, keepdims=True)
    e = np.exp(s)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_dm(q, k, v, pk, pv, pseq, mask=None, bias=None, filt=-10000.0):
    """q/k/v [B,H,S,dh]; pk/pv [B,H,L,dh] buffers; write at pseq, attend
    j <= pseq+i (+ optional [B,L] binary mask ADDING filt)."""
    pk, pv = pk.copy(), pv.copy()
    s = q.shape[2]
    pk[:, :, pseq:pseq + s] = k
    pv[:, :, pseq:pseq + s] = v
    sc = np.einsum("bhsd,bhld->bhsl", q, pk) / np.sqrt(DH)
    if bias is not None:
        sc = sc + bias
    L = pk.shape[2]
    valid = (np.arange(L)[None, :]
             <= (pseq + np.arange(s))[:, None])[None, None]
    valid = np.broadcast_to(valid, sc.shape).copy()
    if mask is not None:
        valid = valid & mask.astype(bool)[:, None, None, :]
    sc = np.where(valid, sc, sc + filt)
    w = np_softmax(sc)
    y = np.einsum("bhsl,bhld->bhsd", w, pv)
    return y.transpose(0, 2, 1, 3).reshape(q.shape[0], s, D), pk, pv


def bhsd(x):
    b, s, _ = x.shape
    return x.reshape(b, s, H, DH).transpose(0, 2, 1, 3)


def test_dmsa_decode_step():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 1, D)).astype(np.float32)
    w = (rng.standard_normal((D, 3 * D)) / np.sqrt(D)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(3 * D)).astype(np.float32)
    past = rng.standard_normal((2, B, H, ML, DH)).astype(np.float32)
    pseq = 4
    out, present = run_op(
        "DecoderMaskedSelfAttention",
        {"x": x, "past": past,
         "pseq": np.asarray([pseq], np.int32)},
        n_outputs=2,
        initializers={"w": w, "b": bias},
        input_names=["x", "w", "b", "", "past", "", "pseq"],
        domain="com.microsoft", num_heads=H,
        past_present_share_buffer=1,
    )
    qkv = x @ w + bias
    q, k, v = np.split(qkv, 3, axis=-1)
    want, wk, wv = oracle_dm(bhsd(q), bhsd(k), bhsd(v),
                             past[0], past[1], pseq)
    assert_close(out, want, tol=1e-4)
    assert_close(present, np.stack([wk, wv]), tol=1e-5)


def test_dmsa_mask_and_bias():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, 1, D)).astype(np.float32)
    w = (rng.standard_normal((D, 3 * D)) / np.sqrt(D)).astype(np.float32)
    past = rng.standard_normal((2, B, H, ML, DH)).astype(np.float32)
    mask = np.ones((B, ML), np.int32)
    mask[0, :2] = 0  # padded prefix
    rel = rng.standard_normal((1, H, 1, ML)).astype(np.float32)
    pseq = 6
    (out,) = run_op(
        "DecoderMaskedSelfAttention",
        {"x": x, "past": past, "mask": mask, "rel": rel,
         "pseq": np.asarray([pseq], np.int32)},
        initializers={"w": w},
        input_names=["x", "w", "", "mask", "past", "rel", "pseq"],
        domain="com.microsoft", num_heads=H,
        past_present_share_buffer=1, mask_filter_value=-5000.0,
    )
    qkv = x @ w
    q, k, v = np.split(qkv, 3, axis=-1)
    want, _, _ = oracle_dm(bhsd(q), bhsd(k), bhsd(v), past[0], past[1],
                           pseq, mask=mask, bias=rel, filt=-5000.0)
    assert_close(out, want, tol=1e-4)


def test_dmmha_self_and_cross():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((B, 1, D)).astype(np.float32)
    k = rng.standard_normal((B, 1, D)).astype(np.float32)
    v = rng.standard_normal((B, 1, D)).astype(np.float32)
    pk = rng.standard_normal((B, H, ML, DH)).astype(np.float32)
    pv = rng.standard_normal((B, H, ML, DH)).astype(np.float32)
    pseq = 3
    out, ok_, ov_ = run_op(
        "DecoderMaskedMultiHeadAttention",
        {"q": q, "k": k, "v": v, "pk": pk, "pv": pv,
         "pseq": np.asarray([pseq], np.int32)},
        n_outputs=3,
        input_names=["q", "k", "v", "", "", "pk", "pv", "pseq"],
        domain="com.microsoft", num_heads=H,
        past_present_share_buffer=1,
    )
    want, wk, wv = oracle_dm(bhsd(q), bhsd(k), bhsd(v), pk, pv, pseq)
    assert_close(out, want, tol=1e-4)
    assert_close(ok_, wk, tol=1e-5)
    assert_close(ov_, wv, tol=1e-5)

    # cross mode: constant 4D encoder KV, no past, attends everything
    T = 5
    ck = rng.standard_normal((B, H, T, DH)).astype(np.float32)
    cv = rng.standard_normal((B, H, T, DH)).astype(np.float32)
    (out,) = run_op(
        "DecoderMaskedMultiHeadAttention",
        {"q": q, "ck": ck, "cv": cv},
        input_names=["q", "ck", "cv"],
        domain="com.microsoft", num_heads=H,
    )
    sc = np.einsum("bhsd,bhld->bhsl", bhsd(q), ck) / np.sqrt(DH)
    want = np.einsum("bhsl,bhld->bhsd", np_softmax(sc), cv)
    want = want.transpose(0, 2, 1, 3).reshape(B, 1, D)
    assert_close(out, want, tol=1e-4)


def test_dm_refusals():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((B, 1, D)).astype(np.float32)
    pk = rng.standard_normal((B, H, ML, DH)).astype(np.float32)
    ci = np.zeros((B, 2, ML), np.int32)
    with pytest.raises(Exception, match="cache_indirection"):
        run_op(
            "DecoderMaskedMultiHeadAttention",
            {"q": q, "k": q, "v": q, "pk": pk, "pv": pk,
             "pseq": np.asarray([1], np.int32), "ci": ci},
            input_names=["q", "k", "v", "", "", "pk", "pv", "pseq", "",
                         "ci"],
            domain="com.microsoft", num_heads=H,
            past_present_share_buffer=1,
        )
    with pytest.raises(Exception, match="share_buffer"):
        run_op(
            "DecoderMaskedMultiHeadAttention",
            {"q": q, "k": q, "v": q, "pk": pk, "pv": pk,
             "pseq": np.asarray([1], np.int32)},
            input_names=["q", "k", "v", "", "", "pk", "pv", "pseq"],
            domain="com.microsoft", num_heads=H,
        )


def test_masked_ops_beam_search_e2e():
    """The explicit-DecoderMasked whisper export form runs the SAME beam
    search byte-for-byte as the MHA-with-injected-mask form — two export
    styles, one math."""
    from test_search_ops import (
        WPAD,
        WF,
        WH,
        WL,
        WT,
        run_whisper_search,
        whisper_params,  # noqa: F401  (fixture)
    )

    import test_search_ops as tso
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.onnx.synth import (
        build_search_model,
        build_whisper_search_graphs,
    )

    p = None
    # rebuild the fixture params directly (no pytest fixture plumbing)
    import inspect

    rng = np.random.default_rng(21)

    def w(*s):
        return (rng.standard_normal(s) / np.sqrt(s[0])).astype(np.float32)

    def bvec(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    WD, WV = 32, 53
    p = {
        "We": w(WF, WD), "be": bvec(WD),
        "emb": (rng.standard_normal((WV, WD)) * 0.5).astype(np.float32),
        "pos": (rng.standard_normal((24, WD)) * 0.3).astype(np.float32),
        "lnf_g": (rng.standard_normal(WD) * 0.1 + 1).astype(np.float32),
        "lnf_b": bvec(WD),
    }
    for i in range(WL):
        for nm in ("ln1", "ln2", "ln3"):
            p[f"{nm}_g{i}"] = (
                rng.standard_normal(WD) * 0.1 + 1).astype(np.float32)
            p[f"{nm}_b{i}"] = bvec(WD)
        for nm in ("sq", "sk", "sv", "so", "cq", "cv", "co"):
            p[f"{nm}_w{i}"] = w(WD, WD)
            p[f"{nm}_b{i}"] = bvec(WD)
        p[f"ck_w{i}"] = w(WD, WD)
        p[f"f1_w{i}"], p[f"f1_b{i}"] = w(WD, 2 * WD), bvec(2 * WD)
        p[f"f2_w{i}"], p[f"f2_b{i}"] = w(2 * WD, WD), bvec(WD)
    p["emb_T"] = np.ascontiguousarray(p["emb"].T)

    feats = np.random.default_rng(40).standard_normal(
        (2, WF, WT)).astype(np.float32)
    start = np.asarray([[52], [52]], np.int32)
    search = {
        "max_length": np.asarray([9], np.int32),
        "num_beams": np.asarray([3], np.int32),
        "num_return_sequences": np.asarray([2], np.int32),
        "decoder_input_ids": start,
    }
    outs = {}
    for masked in (False, True):
        enc_g, dec_g = build_whisper_search_graphs(p, WL, WH, 1,
                                                   masked_ops=masked)
        bs = build_search_model(
            "WhisperBeamSearch" if masked else "BeamSearch", dec_g,
            feats.shape, search,
            dict(eos_token_id=50, pad_token_id=WPAD, model_type=2,
                 decoder_start_token_id=52, encoder=enc_g),
            n_outputs=2, input_dtype=1)
        cm = compile_model(OnnxModel.from_bytes(bs), strict=True)
        outs[masked] = cm.run_np(input_ids=feats)
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_allclose(outs[False][1], outs[True][1], atol=1e-5)
