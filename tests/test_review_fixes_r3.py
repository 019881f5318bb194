"""Regressions for the r3 models/runtime review: framing semantics,
segment-time scaling, per-chunk lang tags, abandoned-iterator dataloader,
batched-decoder cut_eos."""

import numpy as np

from lele_tpu.models import SileroConfig, SileroVad
from lele_tpu.models.silero import VadSegmentConfig

rng = np.random.default_rng(13)


def test_frame_chunks_left_context_and_full_coverage():
    vad = SileroVad(SileroConfig())
    c = vad.cfg
    pcm = rng.standard_normal(c.chunk * 3 + 100).astype(np.float32)
    ch = vad.frame_chunks(pcm)
    # every COMPLETE chunk is scored (the old framing dropped the last one
    # and returned zero chunks for exactly-one-chunk audio)
    assert ch.shape == (3, c.context + c.chunk)
    one = vad.frame_chunks(pcm[: c.chunk])
    assert one.shape[0] == 1
    # window 0: zero-padded leading context, then the chunk itself
    assert (one[0, : c.context] == 0).all()
    np.testing.assert_array_equal(one[0, c.context :], pcm[: c.chunk])
    # window i's prefix is the TAIL of chunk i-1 (carried context)
    np.testing.assert_array_equal(
        ch[1, : c.context], pcm[c.chunk - c.context : c.chunk]
    )
    np.testing.assert_array_equal(
        ch[1, c.context :], pcm[c.chunk : 2 * c.chunk]
    )


def test_segments_timescale_follows_model_chunking():
    """A non-default model chunk must not scale timestamps (the automaton
    used to convert chunk index → seconds with the INDEPENDENT seg_cfg
    defaults)."""
    vad = SileroVad(SileroConfig(chunk=256))
    vad.init(0)
    n_chunks = 8
    pcm = (rng.standard_normal(256 * n_chunks) * 0.3).astype(np.float32)
    seg_cfg = VadSegmentConfig(threshold=0.0, neg_threshold=-1.0,
                               min_speech_ms=0.0, pad_ms=0.0)
    segs = vad.segments(pcm, seg_cfg)
    # threshold 0 → the whole clip is one segment; its end must be the true
    # audio length, not 2× (the old 512/256 scale error)
    assert len(segs) == 1
    end = segs[0][1]
    want = n_chunks * 256 / 16000.0
    assert abs(end - want) < 1e-6, (end, want)


def test_prepare_chunks_tags_every_chunk():
    from lele_tpu.models import prepare_chunks

    long = ". ".join(f"sentence number {i} with several words"
                     for i in range(30)) + "."
    chunks = prepare_chunks(long, "en", max_len=120)
    assert len(chunks) > 2
    for c in chunks:
        assert c.startswith("<en>") and c.endswith("</en>"), c[:40]
    # short text: single tagged chunk identical to normalize_text
    from lele_tpu.models import normalize_text

    assert prepare_chunks("hi there", "en") == [normalize_text("hi there", "en")]


def test_dataloader_early_break_releases_producer(tmp_path):
    import threading
    import time

    from lele_tpu.runtime.dataloader import WavBatchLoader
    from lele_tpu.utils.wav import write_wav

    paths = []
    for i in range(6):
        p = tmp_path / f"{i}.wav"
        write_wav(str(p), np.zeros(1600, np.float32), 16000)
        paths.append(p)
    before = threading.active_count()
    it = iter(WavBatchLoader(paths, batch_size=1, prefetch=1))
    next(it)
    it.close()  # consumer abandons mid-stream
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_cut_eos_handles_batched_rows():
    from lele_tpu.runtime.seq2seq import Seq2SeqGenerator

    gen = Seq2SeqGenerator.__new__(Seq2SeqGenerator)
    gen.eos_id = 2
    assert gen._cut_eos([5, 7, 2, 9]) == [5, 7]
    assert gen._cut_eos([[5, 7, 2, 9], [1, 2, 3, 4]]) == [5, 7]
