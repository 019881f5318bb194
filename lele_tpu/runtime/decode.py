"""Autoregressive decoding over compiled ONNX decoder-step graphs.

A capability with no reference counterpart (miuda-ai/lele ships only
encoder-style pipelines — SURVEY.md §2.5): generative decode on XLA's
static-shape model. The trick is a STATIC KV cache: instead of the usual
exported "past/present" graphs whose cache grows one slot per step (a new
shape — and a new XLA program — every token), the step graph keeps a
fixed-capacity cache and returns only the new slot, which the host writes
at the current position. One program serves every step.

Step-graph contract (see tests/test_torch_onnx.py::test_torch_decoder_kv_cache
for a real torch-exported instance):

  inputs (in graph order):
    ids      int64  [B, 1]           current token
    pos      int64  [B, 1]           its absolute position
    cache_k  f32    [L, B, H, P, D]  static key cache (P = max length - 1)
    cache_v  f32    [L, B, H, P, D]  static value cache
    mask     f32    [B, 1, 1, P+1]   additive attention mask (0 / -inf);
                                     slot P is the current token
    ...extras                        any further inputs are per-utterance
                                     constants (e.g. precomputed cross-
                                     attention K/V from an encoder — the
                                     seq2seq path, runtime/seq2seq.py),
                                     passed via `extras=`
  outputs:
    logits   f32    [B, V] or [B, 1, V]
    new_k    f32    [L, B, H, 1, D]  this step's key, one slot
    new_v    f32    [L, B, H, 1, D]
"""

from __future__ import annotations

import numpy as np


class StaticKVDecoder:
    """Greedy/temperature decoding loop around a CompiledModel step graph."""

    def __init__(self, cm, num_layers: int, num_heads: int, head_dim: int,
                 max_len: int, batch: int = 1, neg: float = -1e9):
        self.cm = cm
        self.L, self.H, self.D = num_layers, num_heads, head_dim
        self.P = max_len - 1  # cache slots; slot P rides in the step itself
        self.B = batch
        self.neg = np.float32(neg)

    def _mask(self, pos: int) -> np.ndarray:
        """Additive mask: allow cache slots < pos and the current slot P."""
        m = np.full((self.B, 1, 1, self.P + 1), self.neg, np.float32)
        m[..., :pos] = 0.0
        m[..., self.P] = 0.0
        return m

    def generate(self, prompt_ids, steps: int, temperature: float = 0.0,
                 seed: int = 0, extras: tuple = ()):
        """Default decode API → the fused whole-generation device program
        (one dispatch per utterance). See `generate_fused` for semantics;
        `generate_hostloop` keeps the step-by-step host loop as a debugging
        oracle (it pays one tunnel round trip per token)."""
        return self.generate_fused(prompt_ids, steps, temperature=temperature,
                                   seed=seed, extras=extras)

    def generate_hostloop(self, prompt_ids, steps: int, rng=None,
                          temperature: float = 0.0, extras: tuple = ()):
        """Feed the prompt token-by-token (prefill), then sample `steps`
        tokens. Returns (generated_ids list, last_logits). Oracle path —
        per-token host round trips; use `generate` for deployment."""
        B, L, H, P, D = self.B, self.L, self.H, self.P, self.D
        ck = np.zeros((L, B, H, P, D), np.float32)
        cv = np.zeros((L, B, H, P, D), np.float32)
        logits = None
        pos = 0
        out_ids: list[int] = []

        if len(prompt_ids) + steps > P + 1:
            raise ValueError(f"decode length exceeds max_len={P + 1}")

        def step(tok: int):
            nonlocal ck, cv, logits, pos
            ids = np.full((B, 1), tok, np.int64)
            ppos = np.full((B, 1), pos, np.int64)
            outs = self.cm.run_np(ids, ppos, ck, cv, self._mask(pos),
                                  *extras)
            logits, nk, nv = outs[0], outs[1], outs[2]
            if pos < P:  # the final (pos == P) token rides in-step only;
                ck[:, :, :, pos] = nk[:, :, :, 0]  # nothing attends after it
                cv[:, :, :, pos] = nv[:, :, :, 0]
            pos += 1

        for tok in prompt_ids:
            step(int(tok))
        for _ in range(steps):
            lg = np.asarray(logits).reshape(B, -1)[0]
            if temperature > 0.0:
                rng = rng or np.random.default_rng(0)
                p = np.exp((lg - lg.max()) / temperature)
                nxt = int(rng.choice(len(p), p=p / p.sum()))
            else:
                nxt = int(np.argmax(lg))
            out_ids.append(nxt)
            step(nxt)
        return out_ids, np.asarray(logits)

    def beam_search(self, prompt_ids, steps: int, beam: int | None = None,
                    eos_id: int | None = None, length_penalty: float = 0.0,
                    extras: tuple = ()):
        """Beam-search decode as ONE fused device program.

        The beam lives in the step graph's batch dimension (compile the
        decoder with B = beam): every step scores all beam×V continuations,
        keeps the global top-`beam`, and REORDERS the KV caches and the
        sequence buffer by parent beam with a device-side gather — the
        standard production decode for seq2seq (no host round trips; the
        whole search is one dispatch). EOS rows freeze: they may only
        extend with EOS at unchanged score. Returns (best_ids, best_score)
        with `best_ids` cut at eos; `length_penalty` α applies GNMT-style
        normalization score/len^α at the final selection.

        Like everything on XLA, shapes are static: the scan always runs
        `steps` iterations; early convergence costs nothing extra on the
        device and the host cut discards the tail."""
        import jax
        import jax.numpy as jnp

        cm = self.cm
        B, L, H, P, D = self.B, self.L, self.H, self.P, self.D
        K = beam or B
        if K != B:
            raise ValueError(
                f"beam ({K}) must equal the decoder batch ({B}) — compile "
                "the step graph with B = beam")
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if prompt.shape[0] + steps > P + 1:
            raise ValueError(f"decode length exceeds max_len={P + 1}")
        names = cm.input_order
        neg = float(self.neg)
        n_prompt = prompt.shape[0]

        def one_step(params, ck, cv, tok, pos, ex):
            ids = tok.astype(jnp.int32).reshape(K, 1)
            pp = jnp.broadcast_to(
                jnp.asarray(pos, jnp.int32).reshape(1, 1), (K, 1))
            slots = jnp.arange(P + 1)
            mask = jnp.where((slots < pos) | (slots == P), 0.0, neg)
            mask = jnp.broadcast_to(
                mask.astype(jnp.float32).reshape(1, 1, 1, P + 1),
                (K, 1, 1, P + 1))
            outs = cm._walk_fn(
                params, dict(zip(names, [ids, pp, ck, cv, mask, *ex])))
            logits, nk, nv = outs[0], outs[1], outs[2]
            wp = jnp.minimum(pos, P - 1)
            write = pos < P
            ck = jnp.where(write, jax.lax.dynamic_update_slice_in_dim(
                ck, nk, wp, axis=3), ck)
            cv = jnp.where(write, jax.lax.dynamic_update_slice_in_dim(
                cv, nv, wp, axis=3), cv)
            return ck, cv, jnp.reshape(logits, (K, -1))

        def run(params, prompt_dev, *ex):
            ck = jnp.zeros((L, K, H, P, D), jnp.float32)
            cv = jnp.zeros((L, K, H, P, D), jnp.float32)

            def prefill(carry, tp):
                ck, cv = carry
                tok, pos = tp
                toks = jnp.broadcast_to(tok.reshape(1), (K,))
                ck, cv, logits = one_step(params, ck, cv, toks, pos, ex)
                return (ck, cv), logits

            (ck, cv), lg = jax.lax.scan(
                prefill, (ck, cv),
                (prompt_dev, jnp.arange(n_prompt, dtype=jnp.int32)),
            )
            logits = lg[-1]  # [K, V] — rows identical after prefill
            V = logits.shape[-1]
            # row 0 carries the live hypothesis; the rest start dead so the
            # first expansion draws the global top-K from one distribution
            scores = jnp.where(jnp.arange(K) == 0, 0.0, neg)
            seqs = jnp.zeros((K, steps), jnp.int32)
            finished = jnp.zeros((K,), bool)

            def step(carry, pos_i):
                ck, cv, logits, scores, seqs, finished = carry
                pos, i = pos_i
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                if eos_id is not None:
                    # frozen rows may only emit EOS, at unchanged score
                    frozen = jnp.where(
                        jnp.arange(V)[None, :] == eos_id, 0.0, neg)
                    logp = jnp.where(finished[:, None], frozen, logp)
                cand = scores[:, None] + logp            # [K, V]
                top_v, top_i = jax.lax.top_k(cand.reshape(-1), K)
                parent = top_i // V
                tok = (top_i % V).astype(jnp.int32)
                # reorder every per-beam carry by parentage
                ck = jnp.take(ck, parent, axis=1)
                cv = jnp.take(cv, parent, axis=1)
                seqs = jnp.take(seqs, parent, axis=0)
                seqs = seqs.at[:, i].set(tok)
                finished = jnp.take(finished, parent)
                if eos_id is not None:
                    finished = finished | (tok == eos_id)
                ck, cv, logits = one_step(params, ck, cv, tok, pos, ex)
                return (ck, cv, logits, top_v, seqs, finished), None

            (ck, cv, logits, scores, seqs, finished), _ = jax.lax.scan(
                step, (ck, cv, logits, scores, seqs, finished),
                (jnp.arange(n_prompt, n_prompt + steps, dtype=jnp.int32),
                 jnp.arange(steps, dtype=jnp.int32)),
            )
            if length_penalty > 0.0 and eos_id is not None:
                lengths = jnp.where(
                    (seqs == eos_id).any(-1),
                    jnp.argmax(seqs == eos_id, -1) + 1, steps)
                norm = scores / (lengths.astype(jnp.float32)
                                 ** length_penalty)
            else:
                norm = scores
            best = jnp.argmax(norm)
            return seqs[best], norm[best]

        key = ("beam", n_prompt, steps, K, eos_id, float(length_penalty))
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if key not in cache:
            cache[key] = jax.jit(run)
        ids, score = cache[key](
            cm.params, jnp.asarray(prompt),
            *[jnp.asarray(e) for e in extras])
        ids = [int(t) for t in np.asarray(ids)]
        if eos_id is not None and eos_id in ids:
            ids = ids[: ids.index(eos_id)]
        return ids, float(score)

    def generate_fused(self, prompt_ids, steps: int, temperature: float = 0.0,
                       seed: int = 0, extras: tuple = ()):
        """Whole-generation-as-ONE-program decode: prefill scan + decode
        scan with the KV cache, slot writes, mask build, and token selection
        all on device — a single dispatch returns `steps` token ids. This is
        the TPU-native decode loop (the host loop in `generate_hostloop` pays one
        tunnel round trip per token; this pays one per utterance).
        Prompt length and step count are static (one program per (len,
        steps, temperature>0) tuple, cached by jit).

        Batched rows: `prompt_ids` may be [n] (shared prompt, or B=1) or
        [B, n] — rows decode independently in one program. temperature > 0
        samples with jax.random.categorical (deterministic per `seed`).
        Returns a flat id list for B=1, else a list of B lists."""
        import jax
        import jax.numpy as jnp

        cm = self.cm
        B, L, H, P, D = self.B, self.L, self.H, self.P, self.D
        prompt = np.asarray(prompt_ids, np.int32)
        if prompt.ndim == 1:
            prompt = np.broadcast_to(prompt, (B, prompt.shape[0]))
        if prompt.shape[0] != B:
            raise ValueError(f"prompt batch {prompt.shape[0]} != decoder batch {B}")
        if prompt.shape[1] + steps > P + 1:
            raise ValueError(f"decode length exceeds max_len={P + 1}")
        names = cm.input_order
        neg = float(self.neg)

        def one_step(params, ck, cv, tok, pos, ex):
            tok = jnp.broadcast_to(jnp.asarray(tok).reshape(-1), (B,))
            ids = tok.astype(jnp.int32).reshape(B, 1)
            pp = jnp.broadcast_to(pos.astype(jnp.int32), (B, 1))
            slots = jnp.arange(P + 1)
            mask = jnp.where(
                (slots < pos) | (slots == P), 0.0, neg
            ).astype(jnp.float32).reshape(1, 1, 1, P + 1)
            mask = jnp.broadcast_to(mask, (B, 1, 1, P + 1))
            outs = cm._walk_fn(
                params, dict(zip(names, [ids, pp, ck, cv, mask, *ex])))
            logits, nk, nv = outs[0], outs[1], outs[2]
            # pos == P only on the very last step (entry guard): its KV rides
            # in-step and must NOT clamp-write into slot P-1
            wp = jnp.minimum(pos, P - 1)
            ck = jnp.where(pos < P,
                           jax.lax.dynamic_update_slice_in_dim(ck, nk, wp, axis=3), ck)
            cv = jnp.where(pos < P,
                           jax.lax.dynamic_update_slice_in_dim(cv, nv, wp, axis=3), cv)
            return ck, cv, jnp.reshape(logits, (B, -1))

        n_prompt = prompt.shape[1]
        sample = temperature > 0.0

        def pick(logits, pos, key0):
            """next token per row: argmax, or categorical at temperature."""
            if not sample:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            k = jax.random.fold_in(key0, pos)
            return jax.random.categorical(
                k, logits / jnp.float32(temperature), axis=-1
            ).astype(jnp.int32)

        def run(params, prompt, key0, *ex):
            ck = jnp.zeros((L, B, H, P, D), jnp.float32)
            cv = jnp.zeros((L, B, H, P, D), jnp.float32)

            def prefill(carry, tp):
                ck, cv = carry
                tok, pos = tp
                ck, cv, logits = one_step(params, ck, cv, tok, pos, ex)
                return (ck, cv), logits

            (ck, cv), lg = jax.lax.scan(
                prefill, (ck, cv),
                (prompt.T, jnp.arange(n_prompt, dtype=jnp.int32)),
            )
            logits = lg[-1]

            def decode(carry, pos):
                ck, cv, logits = carry
                tok = pick(logits, pos, key0)
                ck, cv, logits = one_step(params, ck, cv, tok, pos, ex)
                return (ck, cv, logits), tok

            (_, _, logits), toks = jax.lax.scan(
                decode, (ck, cv, logits),
                jnp.arange(n_prompt, n_prompt + steps, dtype=jnp.int32),
            )
            # toks[i] is the pick BEFORE step i ran — the generated sequence
            return toks.T, logits  # [B, steps]

        key = ("fused", n_prompt, steps, sample, float(temperature))
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if key not in cache:
            cache[key] = jax.jit(run)
        import jax.random as jrandom

        ids, logits = cache[key](
            cm.params, jnp.asarray(prompt), jrandom.PRNGKey(seed),
            *[jnp.asarray(e) for e in extras]
        )
        ids = np.asarray(ids)
        if B == 1:
            return [int(t) for t in ids[0]], np.asarray(logits)
        return [[int(t) for t in row] for row in ids], np.asarray(logits)
