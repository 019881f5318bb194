"""WER/CER harness logic (scripts/eval_asr.py) vs hand-computed distances."""

import importlib.util
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "eval_asr", ROOT / "scripts" / "eval_asr.py"
)
ev = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ev)


def test_edit_distance_basics():
    assert ev.edit_distance([], []) == 0
    assert ev.edit_distance(list("abc"), []) == 3
    assert ev.edit_distance([], list("ab")) == 2
    assert ev.edit_distance(list("kitten"), list("sitting")) == 3
    assert ev.edit_distance("a b c".split(), "a b c".split()) == 0
    assert ev.edit_distance("a b c".split(), "a x c".split()) == 1
    assert ev.edit_distance("a b c".split(), "b c".split()) == 1


def test_wer_and_cer_scoring():
    pairs = [("the cat sat", "the cat sat"),      # 0/3
             ("hello world", "hello there world")]  # 1 insertion / 2
    rate, errs, total = ev.score_corpus(pairs, cer=False)
    assert (errs, total) == (1, 5)
    assert abs(rate - 0.2) < 1e-9
    # CER ignores spaces
    rate_c, errs_c, total_c = ev.score_corpus([("abc", "a bc")], cer=True)
    assert (errs_c, total_c) == (0, 3) and rate_c == 0.0


def test_tokens_of_normalizes_whitespace():
    assert ev.tokens_of("  a   b\tc ", cer=False) == ["a", "b", "c"]
    assert ev.tokens_of("ab c", cer=True) == ["a", "b", "c"]


def test_harness_end_to_end(tmp_path):
    """Full script against a tiny manifest + random-init tiny model: runs,
    reports an honest (garbage) rate without crashing."""
    import subprocess
    import sys

    import numpy as np

    sys.path.insert(0, str(ROOT))
    from lele_tpu.utils.wav import write_wav

    wav = tmp_path / "a.wav"
    t = np.arange(8000) / 16000.0
    write_wav(str(wav), (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32),
              16000)
    man = tmp_path / "m.tsv"
    man.write_text(f"{wav}\thello world\n")
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "eval_asr.py"), str(man)],
        capture_output=True, text=True, timeout=560,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "LELE_EVAL_TINY": "1"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "WER:" in r.stdout and "corpus RTF" in r.stdout
