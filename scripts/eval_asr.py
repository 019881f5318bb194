#!/usr/bin/env python
"""ASR accuracy harness: WER/CER over a manifest — the launch kit's
last mile (VERDICT r2 #2: the day real weights exist, accuracy must be
checkable in one command, not just latency).

    python scripts/eval_asr.py manifest.tsv \
        [--onnx examples/sensevoice/sensevoice.int8.onnx] \
        [--vocab examples/sensevoice/tokens.json] [--cer]

Manifest: one `wav_path<TAB>reference transcript` per line (the FunASR /
wenet convention). Runs every utterance through the bucketed batch path,
prints per-utterance and corpus WER (or CER with --cer for zh), plus RTF
over the whole corpus.

Without real weights this still runs (random-init or fixture models emit
garbage tokens — the harness reports honest ~100% WER); its own logic is
unit-tested in tests/test_eval_asr.py against hand-computed distances.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def edit_distance(ref: list, hyp: list) -> int:
    """Levenshtein distance (substitution/insertion/deletion, unit cost)."""
    if not ref:
        return len(hyp)
    if not hyp:
        return len(ref)
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(
                prev[j] + 1,          # deletion
                cur[j - 1] + 1,       # insertion
                prev[j - 1] + (r != h),  # substitution / match
            )
        prev = cur
    return prev[-1]


def tokens_of(text: str, cer: bool) -> list[str]:
    text = " ".join(text.strip().split())
    if cer:
        return [c for c in text if not c.isspace()]
    return text.split()


def score_corpus(pairs: list[tuple[str, str]], cer: bool):
    """pairs: (reference, hypothesis) → (rate, n_errors, n_ref_tokens)."""
    errs = total = 0
    for ref, hyp in pairs:
        r, h = tokens_of(ref, cer), tokens_of(hyp, cer)
        errs += edit_distance(r, h)
        total += len(r)
    return (errs / total if total else 0.0), errs, total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest", help="TSV: wav_path<TAB>reference per line")
    ap.add_argument("--onnx", default=None,
                    help="run a compiled checkpoint instead of the native "
                         "random-init model")
    ap.add_argument("--vocab", default=None, help="tokens.json for decoding")
    ap.add_argument("--cer", action="store_true",
                    help="character error rate (zh) instead of word")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    from lele_tpu.runtime import enable_cache
    from lele_tpu.utils.wav import read_wav

    enable_cache()

    entries = []
    for line in Path(args.manifest).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        wav, _, ref = line.partition("\t")
        entries.append((wav, ref))
    if args.limit:
        entries = entries[: args.limit]
    if not entries:
        sys.exit("empty manifest")

    tok = None
    if args.vocab:
        from lele_tpu.utils.tokenizer import CtcTokenizer

        tok = CtcTokenizer.load(args.vocab)

    if args.onnx:
        from lele_tpu.models.checkpoints import SenseVoiceOnnx

        model = SenseVoiceOnnx(args.onnx)
        transcribe = model.transcribe
    else:
        import os

        from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel

        cfg = SenseVoiceConfig()
        if os.environ.get("LELE_EVAL_TINY"):  # CI/dev smoke without weights
            cfg = SenseVoiceConfig(n_layers=1, d_model=32, ffn_dim=64,
                                   vocab_size=40, n_heads=2, dtype="float32")
        m = SenseVoiceModel(cfg)
        m.init(0)
        transcribe = m.transcribe_ids

    pairs = []
    audio_s = 0.0
    t0 = time.perf_counter()
    for wav, ref in entries:
        pcm, sr = read_wav(wav)
        audio_s += len(pcm) / sr
        ids = transcribe(pcm)
        hyp = tok.decode(list(map(int, ids))) if tok is not None \
            else " ".join(map(str, ids))
        pairs.append((ref, hyp))
    wall = time.perf_counter() - t0

    rate, errs, total = score_corpus(pairs, args.cer)
    unit = "CER" if args.cer else "WER"
    for (ref, hyp), (wav, _) in zip(pairs[:5], entries[:5]):
        print(f"  {Path(wav).name}: ref={ref[:40]!r} hyp={hyp[:40]!r}")
    print(f"{unit}: {rate:.4f} ({errs} errors / {total} ref tokens, "
          f"{len(entries)} utts)")
    print(f"corpus RTF: {wall / audio_s:.6f} ({audio_s:.1f}s audio in "
          f"{wall:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
