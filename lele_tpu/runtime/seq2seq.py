"""Encoder–decoder (seq2seq) generation over compiled ONNX graphs.

Whisper-class ASR / translation topology, beyond the reference (miuda-ai/
lele ships encoder-style pipelines only, SURVEY.md §2.5): the encoder runs
ONCE per utterance and its cross-attention keys/values are precomputed
ONCE (the standard production split — per-step recomputation of cross K/V
is pure waste); the decoder step graph then consumes them as fixed extras
while its self-attention KV cache advances through the fused
whole-generation program (runtime/decode.py).

Graph contract:
  encoder graph:  source features → (cross_k, cross_v), each
                  [L, B, H, T_enc, D] — the per-layer cross-attention
                  projections of the encoder states.
  decoder graph:  the StaticKVDecoder step contract (decode.py docstring)
                  plus two trailing inputs cross_k, cross_v.

Two device dispatches per utterance: encode (+cross projection) and the
fused decode scan.
"""

from __future__ import annotations

import numpy as np

from .decode import StaticKVDecoder


class Seq2SeqGenerator:
    def __init__(self, encoder_cm, decoder_cm, num_layers: int,
                 num_heads: int, head_dim: int, max_len: int,
                 bos_id: int = 1, eos_id: int = 2, batch: int = 1):
        """batch: the decoder step graph's compiled batch dimension — 1 for
        greedy/sampling, = beam width for `generate_beam`."""
        self.encoder = encoder_cm
        self.decoder = StaticKVDecoder(
            decoder_cm, num_layers=num_layers, num_heads=num_heads,
            head_dim=head_dim, max_len=max_len, batch=batch,
        )
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.max_len = max_len

    def encode(self, *source) -> tuple:
        """→ (cross_k, cross_v) device arrays, computed once per utterance."""
        outs = self.encoder(*source)
        return tuple(outs[:2])

    def generate(self, *source, max_steps: int | None = None,
                 temperature: float = 0.0, seed: int = 0) -> list[int]:
        """source features → token ids (BOS-primed, cut at EOS host-side —
        the scan runs the static step count; XLA's static shapes make
        early-exit a host concern, SURVEY §7 "dynamic shapes")."""
        steps = max_steps or (self.max_len - 1)
        cross = self.encode(*source)
        ids, _ = self.decoder.generate(
            [self.bos_id], steps, temperature=temperature, seed=seed,
            extras=cross,
        )
        return self._cut_eos(ids)

    def generate_beam(self, *source, beam: int | None = None,
                      max_steps: int | None = None,
                      length_penalty: float = 0.0) -> tuple[list[int], float]:
        """Beam-search generation (decode.py beam_search): the decoder step
        graph must be compiled with batch = beam; the encoder's cross K/V
        (batch 1) tile across the beam rows here. → (ids, score)."""
        import jax.numpy as jnp

        steps = max_steps or (self.max_len - 1)
        K = beam or self.decoder.B
        cross = tuple(
            jnp.broadcast_to(c, (c.shape[0], K) + tuple(c.shape[2:]))
            for c in self.encode(*source)
        )
        return self.decoder.beam_search(
            [self.bos_id], steps, beam=K, eos_id=self.eos_id,
            length_penalty=length_penalty, extras=cross,
        )

    def generate_hostloop(self, *source, max_steps: int | None = None
                          ) -> list[int]:
        """Per-token host-loop oracle for the fused path."""
        steps = max_steps or (self.max_len - 1)
        cross = tuple(np.asarray(c) for c in self.encode(*source))
        ids, _ = self.decoder.generate_hostloop(
            [self.bos_id], steps, extras=cross)
        return self._cut_eos(ids)

    def _cut_eos(self, ids) -> list[int]:
        if ids and isinstance(ids[0], (list, tuple)):
            # decoder compiled with batch > 1 returns per-row lists; this
            # single-sequence API reports row 0 (generate_beam is the
            # batched surface)
            ids = ids[0]
        out = []
        for t in ids:
            if int(t) == self.eos_id:
                break
            out.append(int(t))
        return out
