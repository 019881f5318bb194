"""CTC tokenizer suite (tokenizer.rs:38-86 semantics: blank/tag skipping,
sentencepiece underline → space) + timing utils."""

import json

import numpy as np

from lele_tpu.utils.timing import ScopeTimer, bench_stats
from lele_tpu.utils.tokenizer import CtcTokenizer


def _tok():
    return CtcTokenizer(
        ["<blank>", "▁he", "llo", "▁wor", "ld", "<|en|>", "<|EMO_NEUTRAL|>", "!"]
    )


def test_decode_skips_blank_and_tags():
    t = _tok()
    assert t.decode([5, 1, 2, 0, 3, 4, 6, 7]) == "hello world!"


def test_decode_greedy_collapses_repeats():
    t = _tok()
    logits = np.full((7, 8), -5.0, np.float32)
    for i, tok in enumerate([1, 1, 0, 2, 3, 3, 4]):
        logits[i, tok] = 5.0
    assert t.decode_greedy(logits) == "hello world"


def test_load_json_list_and_dict(tmp_path):
    p = tmp_path / "v.json"
    p.write_text(json.dumps(["<blank>", "a", "b"]))
    t = CtcTokenizer.load(p)
    assert t.decode([1, 2]) == "ab"
    p.write_text(json.dumps({"<blank>": 0, "x": 1, "y": 2}))
    t = CtcTokenizer.load(p)
    assert t.decode([2, 1]) == "yx"


def test_load_text_vocab(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("<blank>\nfoo 1\nbar\t2\n")
    t = CtcTokenizer.load(p)
    assert t.decode([1, 2]) == "foobar"


def test_out_of_range_ids_ignored():
    t = _tok()
    assert t.decode([999, 1, -5, 2]) == "hello"


def test_scope_timer_and_stats(capsys):
    timer = ScopeTimer()
    with timer.scope("a"):
        sum(range(1000))
    with timer.scope("b"):
        pass
    timer.print_scope()
    out = capsys.readouterr().out
    assert "[STAGE] a:" in out and "total:" in out
    st = bench_stats([0.1, 0.2, 0.3])
    assert abs(st["p50"] - 0.2) < 1e-9 and st["min"] == 0.1


def test_ctc_beam_matches_greedy_on_peaked_logits():
    from lele_tpu.models import greedy_ctc_decode
    from lele_tpu.utils.ctc_decode import ctc_beam_decode

    logits = np.full((7, 6), -8.0, np.float32)
    for t, tok in enumerate([1, 1, 0, 3, 3, 0, 2]):
        logits[t, tok] = 8.0
    assert ctc_beam_decode(logits) == greedy_ctc_decode(logits) == [1, 3, 2]


def test_ctc_beam_sums_alignments_better_than_greedy():
    """Classic case where greedy is suboptimal: the best single path picks a
    token whose total probability (summed over alignments) is lower."""
    from lele_tpu.utils.ctc_decode import ctc_prefix_beam_search

    # frame probs: blank very likely each frame, but token 1 has consistent
    # moderate mass; token 2 spikes once
    logits = np.log(np.array([
        [0.5, 0.4, 0.1],
        [0.5, 0.4, 0.1],
        [0.4, 0.1, 0.5],
    ], np.float32))
    beams = ctc_prefix_beam_search(logits, beam_size=8)
    prefixes = [tuple(b[0]) for b in beams]
    # total mass of [1] collects from many alignments; it must rank above [2]
    assert prefixes.index((1,)) < prefixes.index((2,))


def test_ctc_beam_total_probability_conserved():
    from lele_tpu.utils.ctc_decode import ctc_prefix_beam_search

    rng2 = np.random.default_rng(0)
    logits = rng2.standard_normal((5, 4)).astype(np.float32)
    beams = ctc_prefix_beam_search(logits, beam_size=64, topk_per_frame=4)
    total = np.logaddexp.reduce([lp for _, lp in beams])
    assert total < 1e-6  # log-prob mass ≤ 1 (≈1 with no pruning)
    assert total > -0.5  # and most mass retained with full beams
