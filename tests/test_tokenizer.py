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
