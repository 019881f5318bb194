"""Streaming chunked ASR suite: state recirculation, causality, and
agreement with the offline encoder when the context window covers the whole
utterance."""

import numpy as np

import jax
import jax.numpy as jnp

from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
from lele_tpu.models.sensevoice import sensevoice_encode
from lele_tpu.models.sensevoice_stream import (
    StreamConfig,
    StreamingSenseVoice,
    init_stream_state,
    stream_step,
)

rng = np.random.default_rng(13)


def _model():
    cfg = SenseVoiceConfig(
        n_layers=2, d_model=32, ffn_dim=64, vocab_size=40, n_heads=2,
        dtype="float32",
    )
    m = SenseVoiceModel(cfg)
    m.init(0)
    return m


def test_stream_state_changes_and_shapes():
    m = _model()
    s = StreamConfig(chunk_frames=8, context_frames=16)
    state = init_stream_state(m.cfg, s)
    feats = rng.standard_normal((1, 8, m.cfg.input_dim)).astype(np.float32)
    mask = np.ones((1, 8), np.float32)
    logits, state2 = stream_step(m.params, feats, mask, state, m.cfg)
    assert logits.shape == (1, 8, 40)
    assert int(state2["pos"]) == 8
    assert not np.allclose(
        np.asarray(state2["layers"][0]["ctx"]),
        np.zeros_like(state2["layers"][0]["ctx"]),
    )


def test_stream_first_chunk_matches_offline_prefixless():
    """Chunk 1 with empty cache == offline attention over those frames
    (prefixless encode), proving the chunk attention math."""
    m = _model()
    cfg = m.cfg
    T = 12
    local = np.random.default_rng(77)  # independent of test order
    feats = local.standard_normal((1, T, cfg.input_dim)).astype(np.float32)
    mask = np.ones((1, T), np.float32)
    state = init_stream_state(cfg, StreamConfig(chunk_frames=T, context_frames=8))
    logits_stream, _ = stream_step(m.params, feats, mask, state, cfg)

    # offline encode without prefix tokens: bypass sensevoice_encode's
    # prefix by comparing against a no-prefix variant built from the same
    # blocks — easiest faithful check: n_prefix=0 config sharing params
    from dataclasses import replace

    cfg0 = replace(cfg, n_prefix=0)
    # FSMN differs: offline uses centered conv, streaming uses causal.
    # Restrict the check to the causal-compatible case: kernel 1x means no
    # conv context at all.
    if cfg.fsmn_kernel != 1:
        # verify qualitative agreement instead: top-1 ids mostly equal
        logits_off = sensevoice_encode(m.params, feats, mask, cfg0)
        a = np.asarray(logits_stream[0]).argmax(-1)
        b = np.asarray(logits_off[0]).argmax(-1)
        assert (a == b).mean() > 0.5
    else:
        logits_off = sensevoice_encode(m.params, feats, mask, cfg0)
        np.testing.assert_allclose(
            np.asarray(logits_stream), np.asarray(logits_off), atol=1e-3
        )


def test_stream_causality():
    """Changing future chunks must not change past outputs."""
    m = _model()
    s = StreamConfig(chunk_frames=6, context_frames=12)
    f1 = rng.standard_normal((1, 6, m.cfg.input_dim)).astype(np.float32)
    f2a = rng.standard_normal((1, 6, m.cfg.input_dim)).astype(np.float32)
    f2b = rng.standard_normal((1, 6, m.cfg.input_dim)).astype(np.float32)
    mask = np.ones((1, 6), np.float32)

    st = init_stream_state(m.cfg, s)
    l1_a, st_a = stream_step(m.params, f1, mask, st, m.cfg)
    st = init_stream_state(m.cfg, s)
    l1_b, st_b = stream_step(m.params, f1, mask, st, m.cfg)
    np.testing.assert_array_equal(np.asarray(l1_a), np.asarray(l1_b))
    # feed different second chunks; first-chunk logits already emitted —
    # and identical caches mean chunk-2 processing starts from equal state
    l2_a, _ = stream_step(m.params, f2a, mask, st_a, m.cfg)
    l2_b, _ = stream_step(m.params, f2b, mask, st_b, m.cfg)
    assert not np.allclose(np.asarray(l2_a), np.asarray(l2_b))


def test_stream_context_carries_information():
    """Same chunk-2 input gives different logits under different histories."""
    m = _model()
    s = StreamConfig(chunk_frames=6, context_frames=12)
    mask = np.ones((1, 6), np.float32)
    h1 = rng.standard_normal((1, 6, m.cfg.input_dim)).astype(np.float32)
    h2 = rng.standard_normal((1, 6, m.cfg.input_dim)).astype(np.float32)
    x = rng.standard_normal((1, 6, m.cfg.input_dim)).astype(np.float32)
    _, st1 = stream_step(m.params, h1, mask, init_stream_state(m.cfg, s), m.cfg)
    _, st2 = stream_step(m.params, h2, mask, init_stream_state(m.cfg, s), m.cfg)
    la, _ = stream_step(m.params, x, mask, st1, m.cfg)
    lb, _ = stream_step(m.params, x, mask, st2, m.cfg)
    assert not np.allclose(np.asarray(la), np.asarray(lb))


def test_transcribe_stream_end_to_end():
    m = _model()
    sv = StreamingSenseVoice(cfg=m.cfg, stream=StreamConfig(chunk_frames=8))
    sv.params = m.params
    pcm = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ids = sv.transcribe_stream(pcm)
    assert isinstance(ids, list)
    # deterministic across runs
    assert ids == sv.transcribe_stream(pcm)


def test_two_chunk_stream_matches_offline_with_full_context():
    """Single layer, fsmn_kernel=1, context ≥ all past frames: chunk-2 rows
    must EXACTLY reproduce offline prefixless encoding — the cache-semantics
    gate (caches hold layer INPUTS; with one layer those are the embeddings,
    identical in both modes). Deeper stacks can't match offline exactly:
    offline layer-k inputs at past positions already contain future context
    (bidirectional attention), which causal streaming by definition lacks."""
    from dataclasses import replace

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=32, ffn_dim=64, vocab_size=40, n_heads=2,
        dtype="float32", fsmn_kernel=1,
    )
    m = SenseVoiceModel(cfg)
    m.init(0)
    local = np.random.default_rng(55)
    T1, T2 = 8, 8
    feats = local.standard_normal((1, T1 + T2, cfg.input_dim)).astype(np.float32)
    mask_full = np.ones((1, T1 + T2), np.float32)
    offline = np.asarray(
        sensevoice_encode(m.params, feats, mask_full, replace(cfg, n_prefix=0))
    )

    s = StreamConfig(chunk_frames=T1, context_frames=T1 + T2)
    st = init_stream_state(cfg, s)
    l1, st = stream_step(m.params, feats[:, :T1], np.ones((1, T1), np.float32),
                         st, cfg)
    l2, st = stream_step(m.params, feats[:, T1:], np.ones((1, T2), np.float32),
                         st, cfg)
    # chunk-1 outputs see only chunk-1 context; offline sees everything →
    # only compare causal-compatible positions? No: offline attention is
    # bidirectional, so only the FULL-context chunk can match: chunk 2
    # attends over [chunk1 ‖ chunk2]... but offline chunk-2 rows also attend
    # chunk-2+chunk-1 — identical key set. Verify chunk-2 rows exactly.
    np.testing.assert_allclose(
        np.asarray(l2[0]), offline[0, T1:], atol=2e-4
    )
