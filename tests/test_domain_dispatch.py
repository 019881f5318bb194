"""Structural (domain, op_type) dispatch — VERDICT r4 weak #1.

`com.microsoft::RotaryEmbedding` and ai.onnx-23 `RotaryEmbedding` share a
name but not a schema (contrib: (input, position_ids, cos, sin); ai.onnx:
(X, cos, sin, position_ids)). Before the registry was domain-keyed, the
contrib node silently hit the ai.onnx emitter with transposed inputs.
These tests pin the structural fix: correct contrib math, loud refusal of
unknown contrib ops (naming the domain), declared aliases working, and
the default domain unaffected.
"""

import numpy as np
import pytest

from optest import run_op
from lele_tpu.ops.registry import (
    CONTRIB_ALIASES,
    CONTRIB_OPS,
    OPS,
    canon_domain,
    lookup_op,
)


def _rotary_oracle(x4, pos, cos_cache, sin_cache, interleaved=False):
    """Independent numpy RoPE on [B,H,S,D] with full-head rotation."""
    b, h, s, d = x4.shape
    cos = cos_cache[pos][:, None, :, :]  # [B,1,S,d/2]
    sin = sin_cache[pos][:, None, :, :]
    if interleaved:
        x1, x2 = x4[..., 0::2], x4[..., 1::2]
    else:
        x1, x2 = x4[..., : d // 2], x4[..., d // 2:]
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    if interleaved:
        out = np.stack([o1, o2], axis=-1).reshape(x4.shape)
    else:
        out = np.concatenate([o1, o2], axis=-1)
    return out.astype(np.float32)


def _caches(max_pos, half):
    inv = 1.0 / (10000.0 ** (np.arange(half) / half))
    ang = np.arange(max_pos)[:, None] * inv[None, :]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def test_contrib_rotary_embedding_input_order():
    """The collision case: contrib input order (x, position_ids, cos, sin)
    must reach the contrib emitter. Under the old bare-name dispatch this
    bound position_ids where the ai.onnx emitter expects cos_cache."""
    rng = np.random.default_rng(0)
    B, H, S, D = 2, 3, 5, 8
    x = rng.standard_normal((B, H, S, D)).astype(np.float32)
    cos_cache, sin_cache = _caches(16, D // 2)
    pos = rng.integers(0, 16, (B, S)).astype(np.int64)
    got = run_op(
        "RotaryEmbedding", {"x": x, "pos": pos},
        initializers={"cos": cos_cache, "sin": sin_cache},
        input_names=["x", "pos", "cos", "sin"],
        domain="com.microsoft",
    )[0]
    want = _rotary_oracle(x, pos, cos_cache, sin_cache)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_contrib_rotary_3d_inferred_heads_and_start_position():
    """3D input with num_heads inferred from the cache width, and the
    [1]-shaped position_ids decode-step form (pos = start + arange(S))."""
    rng = np.random.default_rng(1)
    B, S, H, D = 1, 4, 2, 6
    x = rng.standard_normal((B, S, H * D)).astype(np.float32)
    cos_cache, sin_cache = _caches(32, D // 2)
    start = np.array([7], np.int64)
    got = run_op(
        "RotaryEmbedding", {"x": x, "pos": start},
        initializers={"cos": cos_cache, "sin": sin_cache},
        input_names=["x", "pos", "cos", "sin"],
        domain="com.microsoft", interleaved=1,
    )[0]
    x4 = x.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    pos = (7 + np.arange(S))[None, :]
    want4 = _rotary_oracle(x4, pos, cos_cache, sin_cache, interleaved=True)
    want = want4.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ai_onnx_rotary_unaffected():
    """Default-domain RotaryEmbedding keeps the opset-23 input order
    (X, cos, sin, position_ids)."""
    rng = np.random.default_rng(2)
    B, H, S, D = 1, 2, 3, 4
    x = rng.standard_normal((B, H, S, D)).astype(np.float32)
    cos_cache, sin_cache = _caches(8, D // 2)
    pos = rng.integers(0, 8, (B, S)).astype(np.int64)
    got = run_op(
        "RotaryEmbedding", {"x": x, "pos": pos},
        initializers={"cos": cos_cache, "sin": sin_cache},
        input_names=["x", "cos", "sin", "pos"],
        opset=23,
    )[0]
    want = _rotary_oracle(x, pos, cos_cache, sin_cache)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_unknown_contrib_op_refused_with_domain():
    x = np.zeros((2, 2), np.float32)
    with pytest.raises(NotImplementedError, match="com.microsoft::NotAnOp"):
        run_op("NotAnOp", {"x": x}, domain="com.microsoft")


def test_name_collision_refusal_names_the_alias_mechanism():
    """A contrib op whose NAME exists in ai.onnx but has no contrib entry
    or alias must refuse with the registry hint, never silently run the
    ai.onnx math."""
    x = np.zeros((2, 3), np.float32)
    with pytest.raises(NotImplementedError,
                       match="CONTRIB_ALIASES|CONTRIB_OPS"):
        # ai.onnx has Softmax; com.microsoft does not declare one here
        run_op("Softmax", {"x": x}, domain="com.microsoft")


def test_declared_alias_reaches_default_emitter():
    """com.microsoft::Gelu's schema coincides with ai.onnx Gelu — the
    alias table routes it there explicitly."""
    x = np.linspace(-2, 2, 12, dtype=np.float32).reshape(3, 4)
    got = run_op("Gelu", {"x": x}, domain="com.microsoft", opset=20)[0]
    from scipy.special import erf  # noqa — scipy ships with jax stack

    want = 0.5 * x * (1 + erf(x / np.sqrt(2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lookup_op_contract():
    assert canon_domain("ai.onnx") == ""
    assert canon_domain(None) == ""
    assert lookup_op("", "MatMul") is OPS["MatMul"]
    assert lookup_op("ai.onnx", "MatMul") is OPS["MatMul"]
    ms_rot = lookup_op("com.microsoft", "RotaryEmbedding")
    assert ms_rot is CONTRIB_OPS[("com.microsoft", "RotaryEmbedding")]
    assert ms_rot is not OPS["RotaryEmbedding"]
    ms_att = lookup_op("com.microsoft", "Attention")
    assert ms_att is not OPS["Attention"]
    # aliases resolve to the default table; unknown contrib ops miss
    for key, target in CONTRIB_ALIASES.items():
        assert lookup_op(*key) is OPS[target], key
    assert lookup_op("com.microsoft", "Conv") is None
    assert lookup_op("ai.onnx.ml", "TreeEnsemble") is None


def test_contrib_attention_and_sln_registered_per_domain():
    # SimplifiedLayerNormalization: ORT's kOnnxDomain quirk — registered
    # in BOTH domains
    assert lookup_op("", "SimplifiedLayerNormalization") is not None
    assert lookup_op("com.microsoft",
                     "SimplifiedLayerNormalization") is not None
    assert lookup_op("com.microsoft", "MatMulNBits") is not None
    assert lookup_op("", "MatMulNBits") is None  # contrib-only name
