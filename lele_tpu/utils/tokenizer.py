"""SenseVoice CTC tokenizer (examples/sensevoice/src/tokenizer.rs:38-86
surface): vocab lookup, greedy decode with blank/special-tag skipping and
sentencepiece underline → space."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class CtcTokenizer:
    """Vocab formats: JSON list ["<blank>", "a", ...] or JSON dict
    {token: id} or one-token-per-line text."""

    def __init__(self, tokens: list[str], blank_id: int = 0):
        self.tokens = tokens
        self.blank_id = blank_id

    @classmethod
    def load(cls, path: str | Path, blank_id: int = 0) -> "CtcTokenizer":
        p = Path(path)
        text = p.read_text(encoding="utf-8")
        if p.suffix == ".json":
            raw = json.loads(text)
            if isinstance(raw, dict):
                tokens = [""] * (max(raw.values()) + 1)
                for tok, i in raw.items():
                    tokens[i] = tok
            else:
                tokens = list(raw)
        else:
            tokens = [line.split("\t")[0].split(" ")[0]
                      for line in text.splitlines() if line]
        return cls(tokens, blank_id)

    def id_to_token(self, i: int) -> str:
        return self.tokens[i] if 0 <= i < len(self.tokens) else ""

    def decode(self, ids: list[int]) -> str:
        """ids → text: skip blanks and <|...|> control tags, ▁ → space."""
        out = []
        for i in ids:
            if i == self.blank_id:
                continue
            tok = self.id_to_token(int(i))
            if tok.startswith("<|") and tok.endswith("|>"):
                continue
            if tok in ("<blank>", "<unk>", "<s>", "</s>", ""):
                continue
            out.append(tok.replace("▁", " "))
        return "".join(out).strip()

    def decode_greedy(self, logits: np.ndarray) -> str:
        """Frame logits [T, V] → text (argmax + collapse + decode)."""
        from ..models.sensevoice import greedy_ctc_decode

        return self.decode(greedy_ctc_decode(logits, self.blank_id))
