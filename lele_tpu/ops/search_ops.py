"""com.microsoft generative search ops: BeamSearch / GreedySearch / Sampling.

ORT's generative exports (GPT-2 via onnxruntime's convert_generation.py,
Whisper, T5) ship the WHOLE generation loop as one node whose decoder — and
for model_type 1/2 the encoder_decoder_init graph — rides as an embedded
GraphProto attribute. ORT executes that node as a host orchestrator
re-running the decoder subgraph with growing dynamic shapes; here the whole
search lowers to ONE XLA program:

- the decoder subgraph is traced INTO a `lax.scan` step (tracer change:
  OpDef.subgraph ops get ctx.state/ctx.scope and are barred from the eager
  all-static fold); its initializers hoist to runtime params exactly once,
  shared between the context trace and the step trace via the scope name,
- the KV cache is a static max_length buffer per past input; each step's
  new row lands via `dynamic_update_slice` at the step counter, and a
  running key-validity mask covers the buffer's unwritten tail,
- beam bookkeeping (top-2k continuation selection, the finished-hypothesis
  pool, the early-stopping test) is static-shape jnp over [batch, beams]
  arrays, frozen by `where` once a batch finishes — no recompiles, no host
  round-trips, early exit is a freeze instead of a break (SURVEY §7
  "dynamic shapes").

Decoder contracts:

- **GPT (model_type=0)**: inputs (input_ids, position_ids, attention_mask,
  past_*), outputs (logits, present_*) — convert_generation.py's contract.
  The attention_mask input carries the running key-validity mask, so the
  static buffer is correct by construction.
- **T5/Whisper (model_type=1/2)**: the `encoder` attribute holds ORT's
  encoder_decoder_init graph (runs the encoder AND the first decoder pass
  on decoder_input_ids; emits logits + present_*_self + present_*_cross);
  the `decoder` attribute holds the step graph (inputs input_ids +
  optional encoder_attention_mask / encoder_hidden_states /
  past_sequence_length / beam_width + past self/cross tensors, classified
  BY NAME exactly like ORT's t5_decoder.cc does). Cross buffers are
  computed once and stay constant; self buffers are static max_length
  buffers. These subgraphs carry no self-attention mask input (ORT's
  default mode relies on exact dynamic shapes), so the walk injects the
  running key-validity mask into the subgraph's own MultiHeadAttention /
  Attention nodes that consume self-past buffers — the semantics of ORT's
  OTHER decode mode (DecoderMaskedMultiHeadAttention +
  past_sequence_length, its CUDA static-buffer path), which is the
  TPU-native one. Exports that derive positions from `Shape(past_*)`
  (instead of the past_sequence_length input this mode feeds) would read
  the buffer capacity and are NOT supported — documented deviation.

Semantics follow ORT's beam-search scorer (a port of the legacy HF
BeamSearchScorer, mirrored by onnxruntime beam_search_scorer.cc):
log-softmax before the logits processors, length penalty divides by the
FULL hypothesis length (prompt included, final EOS excluded), EOS
candidates enter the finished pool only from the top `num_beams` ranks, EOS
candidates never continue as running beams, and early_stopping=0 keeps
searching until the worst finished score can no longer be beaten. The
tests gate this against an independent torch implementation of that
algorithm plus HF `generate` for the greedy path.

max_length / num_beams / num_return_sequences are shape-determining and
must be trace-time static (graph initializers — published search exports
carry them as runtime inputs, which a static-shape TPU program cannot
honor; bind them at compile time).

Reference surface: the reference's product is running published exports
end-to-end (/root/reference/crates/lele-build/src/lib.rs:72-135); these
ops are the graph form ORT publishes generative models in.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from .registry import CONTRIB_OPS, OpContext, op, static_ints

NEG = -1e30  # finite -inf stand-in: keeps where()-arithmetic NaN-free


# --------------------------------------------------------------- subgraph io


def _run_decoder(ctx: OpContext, g, feeds: dict, tag: str):
    """Trace a subgraph once with the given input bindings.

    The scope is the same for every walk of one search node (per tag), so
    the subgraph's initializers hoist to ONE set of runtime params shared
    by the context trace and the in-scan step trace."""
    if ctx.tracer is None or ctx.state is None:
        raise RuntimeError(
            "search ops need the tracer walk state (ctx.state); they can "
            "only run under the graph tracer"
        )
    env: dict[str, Any] = {"": None}
    env.update(feeds)
    name = ctx.node.name if (ctx.node is not None and ctx.node.name) else "s"
    return ctx.tracer._walk_graph(
        ctx.state, g, env, f"{ctx.scope}{name}/{tag}/"
    )


def _run_decoder_masked(ctx, g, feeds, tag, self_past_names, mask):
    """Walk the decoder step graph with the running key-validity mask
    injected into its own self-attention nodes (the ones consuming a
    self-past buffer) — ORT's DecoderMasked* static-buffer semantics for
    subgraphs that carry no mask input of their own."""
    tr = ctx.tracer
    saved = tr.overrides

    def inject(name, mask_pos):
        base = saved.get(f"com.microsoft::{name}")
        orig = base if base is not None else CONTRIB_OPS[
            ("com.microsoft", name)].fn

        def ov(octx, *ins):
            if not any(nm in self_past_names for nm in octx.node.input):
                return orig(octx, *ins)
            ins = list(ins)
            while len(ins) <= mask_pos:
                ins.append(None)
            if ins[mask_pos] is None:
                ins[mask_pos] = mask
            return orig(octx, *ins)

        return ov

    try:
        tr.overrides = dict(saved)
        tr.overrides["com.microsoft::MultiHeadAttention"] = inject(
            "MultiHeadAttention", 4)  # key_padding_mask
        tr.overrides["com.microsoft::Attention"] = inject(
            "Attention", 3)  # mask_index
        return _run_decoder(ctx, g, feeds, tag)
    finally:
        tr.overrides = saved


# ------------------------------------------------------------- logits rules


@dataclass
class _SearchOpts:
    max_length: int
    prompt_len: int
    eos: int
    pad: int
    nb: int = 1
    nret: int = 1
    early_stopping: bool = False
    ngram: int = 0
    min_length: Any = None  # jnp scalar or None
    rep_penalty: Any = None  # jnp scalar or None
    length_penalty: Any = None  # jnp scalar (beam only)
    vocab_mask: Any = None  # [V] or None
    prefix_mask: Any = None  # [B, V] or None (first step only)
    seed: int = 0


def _scatter_any(tokens, flags, vocab):
    """tokens [R, W] i32, flags [R, W] bool → [R, vocab] bool: does any
    flagged position hold token t?"""
    import jax
    import jax.numpy as jnp

    def row(t, f):
        return jnp.zeros((vocab,), jnp.int32).at[t].max(f.astype(jnp.int32))

    return jax.vmap(row)(tokens, flags) > 0


def _ngram_ban(scores, seqs, p, n):
    """HF/ORT NoRepeatNGram: ban token t when the (n-1)-gram ending at the
    current position p already occurred in seq[0:p) followed by t."""
    import jax.numpy as jnp

    r, vocab = scores.shape
    ml = seqs.shape[-1]
    w = ml - n + 1
    if w <= 0:
        return scores
    if n > 1:
        wins = jnp.stack([seqs[:, i:i + w] for i in range(n - 1)], axis=-1)
        idx = jnp.clip(
            p - (n - 1) + jnp.arange(n - 1, dtype=jnp.int32), 0, ml - 1
        )
        prefix = jnp.take(seqs, idx, axis=1)
        match = (wins == prefix[:, None, :]).all(-1)  # [R, W]
    else:
        match = jnp.ones((r, w), bool)
    # the historic n-gram [j, j+n) must lie fully inside the generated
    # prefix [0, p); no bans before p >= n falls out of the same test
    jvalid = jnp.arange(w, dtype=jnp.int32) + (n - 1) < p
    nxt = seqs[:, n - 1: n - 1 + w]
    banned = _scatter_any(nxt, match & jvalid[None, :], vocab)
    return jnp.where(banned, jnp.asarray(NEG, scores.dtype), scores)


def _process_scores(scores, seqs, p, opts: _SearchOpts, first: bool):
    """The ORT logits-processor stack over [rows, V] scores (raw logits for
    greedy/sampling, logprobs for beam — matching where ORT applies them).
    seqs [rows, max_length] holds the tokens so far; p is the dynamic
    current length (position the new token will take)."""
    import jax.numpy as jnp

    neg = jnp.asarray(NEG, scores.dtype)
    if opts.rep_penalty is not None:
        valid = jnp.broadcast_to(
            jnp.arange(seqs.shape[-1], dtype=jnp.int32)[None, :] < p,
            seqs.shape,
        )
        appeared = _scatter_any(seqs, valid, scores.shape[-1])
        rp = opts.rep_penalty
        pen = jnp.where(scores < 0, scores * rp, scores / rp)
        scores = jnp.where(appeared, pen, scores)
    if opts.ngram > 0:
        scores = _ngram_ban(scores, seqs, p, opts.ngram)
    if opts.vocab_mask is not None:
        scores = jnp.where(opts.vocab_mask.astype(bool)[None, :], scores, neg)
    if first and opts.prefix_mask is not None:
        pm = jnp.repeat(opts.prefix_mask.astype(bool), opts.nb, axis=0)
        scores = jnp.where(pm, scores, neg)
    if opts.min_length is not None:
        ban = p < opts.min_length
        scores = scores.at[:, opts.eos].set(
            jnp.where(ban, neg, scores[:, opts.eos])
        )
    return scores


# ---------------------------------------------------------- GPT front end


def _gpt_io(g, what: str):
    ins = [vi.name for vi in g.input]
    outs = [vi.name for vi in g.output]
    if len(ins) < 3:
        raise ValueError(
            f"{what}: GPT decoder subgraph must declare (input_ids, "
            f"position_ids, attention_mask, past_*) inputs, got {ins}"
        )
    n_past = len(ins) - 3
    if len(outs) != 1 + n_past:
        raise ValueError(
            f"{what}: decoder subgraph declares {n_past} past inputs but "
            f"{len(outs) - 1} present outputs — they must pair positionally"
        )
    return ins, n_past


def _buf_tail_write(present, buf, slot):
    """Merge a step's present into the static buffer. Concat-form presents
    (length = buffer+1: contrib Attention / MHA) contribute their last kv
    row at column `slot`; share-buffer presents (length = buffer:
    DecoderMasked* ops, which update the buffer in-op at
    past_sequence_length) ARE the new buffer. Length axis is ndim-2 for
    every KV layout ([2,B,H,L,dh] stacked, [B,H,L,dh] split)."""
    import jax

    if present.shape[-2] == buf.shape[-2]:
        return present.astype(buf.dtype)
    tail = jax.lax.slice_in_dim(
        present, present.shape[-2] - 1, present.shape[-2],
        axis=present.ndim - 2,
    )
    return jax.lax.dynamic_update_slice_in_dim(
        buf, tail.astype(buf.dtype), slot, axis=buf.ndim - 2
    )


def _pad_to(x, length):
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, length - x.shape[-2])
    import jax.numpy as jnp

    return jnp.pad(x, pad)


def _gpt_front(ctx, g, what, ids, mask, ml, tag):
    """→ (logits0 [BB,V] f32, self KV buffers, key_mask [BB,ML], step_fn).
    ids/mask are already beam-expanded."""
    import jax.numpy as jnp

    in_names, n_past = _gpt_io(g, what)
    bb, s = ids.shape
    pos = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0)
    feeds = {in_names[0]: ids, in_names[1]: pos, in_names[2]: mask}
    for nm in in_names[3:]:
        feeds[nm] = None  # prefill runs with zero-length past
    outs = _run_decoder(ctx, g, feeds, tag)
    logits0 = outs[0][:, -1, :].astype(jnp.float32)
    bufs = [_pad_to(pr, ml) for pr in outs[1:1 + n_past]]
    key_mask = jnp.concatenate(
        [mask.astype(jnp.int32), jnp.zeros((bb, ml - s), jnp.int32)], axis=1
    )
    pos0 = jnp.sum(mask.astype(jnp.int32), axis=1)  # real prompt lengths

    def step_fn(tok, i, key_mask, bufs):
        slot = jnp.int32(s) + i
        mask_t = jnp.concatenate(
            [key_mask, jnp.ones((bb, 1), key_mask.dtype)], axis=1
        )
        feeds = {
            in_names[0]: tok[:, None],
            in_names[1]: (pos0 + i)[:, None].astype(jnp.int32),
            in_names[2]: mask_t,
        }
        for nm, b in zip(in_names[3:], bufs):
            feeds[nm] = b
        outs = _run_decoder(ctx, g, feeds, tag)
        logits = outs[0][:, -1, :].astype(jnp.float32)
        bufs = [
            _buf_tail_write(pr, b, slot)
            for pr, b in zip(outs[1:1 + n_past], bufs)
        ]
        return logits, bufs, key_mask.at[:, slot].set(1)

    return logits0, bufs, key_mask, step_fn


# -------------------------------------------- T5/Whisper (two-graph) front


def _batch_repeat(v, nb):
    """Expand the batch axis to batch*beams for any KV layout ([B,...],
    [B,H,L,dh], [2,B,H,L,dh]) or rank-≤3 activation."""
    import jax.numpy as jnp

    ax = v.ndim - 4 if v.ndim >= 4 else 0
    return jnp.repeat(v, nb, axis=ax)


def _encdec_front(ctx, what, enc_g, dec_g, feats, enc_mask, start_ids, nb,
                  ml, tag):
    """ORT encoder_decoder_init + step-decoder front end (model_type 1/2).
    feats is BeamSearch's input 0 (token ids for T5, float features for
    Whisper); start_ids [B, S0] are the decoder-side prompt. Subgraph
    inputs/outputs are classified BY NAME (the t5_decoder.cc convention:
    past_key_self_0 / past_value_cross_0 / encoder_attention_mask /
    encoder_hidden_states / past_sequence_length / beam_width)."""
    import jax.numpy as jnp

    b, s0 = start_ids.shape
    bb = b * nb

    # ---- encoder_decoder_init: classify inputs by name, run once at B
    feeds = {}
    for vi in enc_g.input:
        ln = vi.name.lower()
        if "decoder_input_ids" in ln:
            feeds[vi.name] = start_ids
        elif "mask" in ln:
            if enc_mask is None:
                raise ValueError(
                    f"{what}: the encoder subgraph declares "
                    f"{vi.name!r} but no attention_mask input was given"
                )
            feeds[vi.name] = enc_mask
        else:
            feeds[vi.name] = feats
    enc_outs = _run_decoder(ctx, enc_g, feeds, tag + "_init")
    by_name = {
        vi.name: v for vi, v in zip(enc_g.output, enc_outs)
    }
    logits_name = enc_g.output[0].name
    if "logits" not in logits_name.lower():
        raise ValueError(
            f"{what}: encoder_decoder_init's first output must be the "
            f"logits, got {logits_name!r}"
        )
    logits0 = _batch_repeat(
        by_name[logits_name][:, -1, :], nb
    ).astype(jnp.float32)

    # ---- decoder step graph: classify inputs by name
    dec_in = [vi.name for vi in dec_g.input]
    self_past, cross_past, special = [], [], {}
    for i, nm in enumerate(dec_in):
        ln = nm.lower()
        if i == 0:
            continue  # input_ids
        elif "cache_indirection" in ln:
            raise NotImplementedError(
                f"{what}: cache_indirection (in-kernel beam reordering) is "
                "not supported — beams are reordered by physical gather"
            )
        elif "past_sequence_length" in ln or ln == "past_seq_len":
            special["pseq"] = nm
        elif "past" in ln and "cross" in ln:
            cross_past.append(nm)
        elif "past" in ln:
            self_past.append(nm)
        elif "mask" in ln:
            special["emask"] = nm
        elif "hidden" in ln:
            special["ehid"] = nm
        elif "beam_width" in ln:
            special["beam"] = nm
        else:
            raise ValueError(
                f"{what}: unrecognized decoder-step input {nm!r} (expected "
                "input_ids / encoder_attention_mask / "
                "encoder_hidden_states / past_sequence_length / "
                "beam_width / past_*_self / past_*_cross names)"
            )
    if not self_past:
        raise ValueError(
            f"{what}: the decoder step graph declares no self-attention "
            "past inputs — nothing to cache"
        )

    def present_of(past_name, names, what_side):
        want = past_name.lower().replace("past", "present", 1)
        for nm in names:
            if nm.lower() == want:
                return nm
        raise ValueError(
            f"{what}: no {what_side} output pairs with {past_name!r} "
            f"(expected a tensor named {want!r})"
        )

    enc_out_names = list(by_name)
    self_bufs = [
        _pad_to(_batch_repeat(by_name[present_of(nm, enc_out_names,
                                                 "encoder_decoder_init")],
                              nb), ml)
        for nm in self_past
    ]
    cross_vals = {
        nm: _batch_repeat(by_name[present_of(nm, enc_out_names,
                                             "encoder_decoder_init")], nb)
        for nm in cross_past
    }
    extra = {}
    if "emask" in special:
        if enc_mask is None:
            raise ValueError(
                f"{what}: decoder declares {special['emask']!r} but no "
                "attention_mask input was given"
            )
        extra[special["emask"]] = _batch_repeat(enc_mask, nb)
    if "ehid" in special:
        eh = next(
            (v for k, v in by_name.items()
             if "hidden" in k.lower()), None
        )
        if eh is None:
            raise ValueError(
                f"{what}: decoder consumes encoder_hidden_states but the "
                "encoder subgraph does not emit it"
            )
        extra[special["ehid"]] = _batch_repeat(eh, nb)
    if "beam" in special:
        extra[special["beam"]] = jnp.asarray([nb], jnp.int32)

    dec_out_names = [vi.name for vi in dec_g.output]
    present_ix = {
        nm: dec_out_names.index(present_of(nm, dec_out_names,
                                           "decoder step"))
        for nm in self_past
    }
    key_mask = jnp.concatenate(
        [jnp.ones((bb, s0), jnp.int32),
         jnp.zeros((bb, ml - s0), jnp.int32)], axis=1
    )
    self_set = frozenset(self_past)

    def step_fn(tok, i, key_mask, bufs):
        slot = jnp.int32(s0) + i
        mask_t = jnp.concatenate(
            [key_mask, jnp.ones((bb, 1), key_mask.dtype)], axis=1
        )
        feeds = {dec_in[0]: tok[:, None]}
        feeds.update(extra)
        feeds.update(cross_vals)
        if "pseq" in special:
            feeds[special["pseq"]] = jnp.reshape(slot, (1,))
        for nm, bf in zip(self_past, bufs):
            feeds[nm] = bf
        outs = _run_decoder_masked(ctx, dec_g, feeds, tag, self_set, mask_t)
        logits = outs[0][:, -1, :].astype(jnp.float32)
        bufs = [
            _buf_tail_write(outs[present_ix[nm]], bf, slot)
            for nm, bf in zip(self_past, bufs)
        ]
        return logits, bufs, key_mask.at[:, slot].set(1)

    return logits0, self_bufs, key_mask, step_fn


# --------------------------------------------------------- shared front door


def _setup(ctx, what, input_ids, max_length, attention_mask,
           decoder_input_ids=None):
    """Common scalar parsing + front-end construction (before beam
    expansion: the caller expands by its own nb)."""
    import jax.numpy as jnp

    g = ctx.attr("decoder")
    if g is None:
        raise ValueError(f"{what} requires the `decoder` graph attribute")
    model_type = int(ctx.attr("model_type", 0))
    if model_type not in (0, 1, 2):
        raise NotImplementedError(f"{what}: model_type {model_type}")
    ml = static_ints(max_length, f"{what} max_length")[0]
    eos = ctx.attr("eos_token_id")
    pad = ctx.attr("pad_token_id")
    if eos is None or pad is None:
        raise ValueError(f"{what} requires eos_token_id and pad_token_id")

    if model_type == 0:
        if ctx.attr("encoder") is not None or \
                ctx.attr("init_decoder") is not None:
            raise NotImplementedError(
                f"{what}: model_type=0 with encoder/init_decoder subgraphs"
            )
        if decoder_input_ids is not None:
            raise ValueError(
                f"{what}: decoder_input_ids is a T5/Whisper input"
            )
        ids = jnp.asarray(input_ids).astype(jnp.int32)
        if ids.ndim != 2:
            raise ValueError(f"{what}: input_ids must be [batch, seq]")
        b, s = ids.shape
        mask = (
            jnp.ones((b, s), jnp.int32)
            if attention_mask is None
            else jnp.asarray(attention_mask).astype(jnp.int32).reshape(b, s)
        )
        prompt, enc = (ids, mask), None
    else:
        enc_g = ctx.attr("encoder")
        if enc_g is None:
            raise NotImplementedError(
                f"{what}: model_type {model_type} requires the `encoder` "
                "(encoder_decoder_init) subgraph; init_decoder-only exports "
                "are not supported"
            )
        feats = jnp.asarray(input_ids)
        if model_type == 1:
            feats = feats.astype(jnp.int32)  # T5: token ids
        b = feats.shape[0]
        if decoder_input_ids is not None:
            start = jnp.asarray(decoder_input_ids).astype(
                jnp.int32).reshape(b, -1)
        else:
            sid = ctx.attr("decoder_start_token_id")
            if sid is None:
                raise ValueError(
                    f"{what}: model_type {model_type} needs "
                    "decoder_input_ids or decoder_start_token_id"
                )
            start = jnp.full((b, 1), int(sid), jnp.int32)
        emask = (
            None if attention_mask is None
            else jnp.asarray(attention_mask).astype(jnp.int32)
        )
        s = start.shape[1]
        prompt, enc = (start, None), (enc_g, feats, emask)
    if s >= ml:
        raise ValueError(
            f"{what}: max_length ({ml}) must exceed the prompt length ({s})"
        )
    return g, model_type, enc, prompt, ml, int(eos), int(pad)


def _make_front(ctx, what, g, model_type, enc, prompt, nb, ml, tag):
    """Beam-expand and build the per-type front end. Returns
    (seq_init [B,S] i32, logits0 [BB,V], bufs, key_mask, step_fn)."""
    import jax.numpy as jnp

    if model_type == 0:
        ids, mask = prompt
        ids_x = jnp.repeat(ids, nb, axis=0)
        mask_x = jnp.repeat(mask, nb, axis=0)
        logits0, bufs, key_mask, step_fn = _gpt_front(
            ctx, g, what, ids_x, mask_x, ml, tag
        )
        return ids, logits0, bufs, key_mask, step_fn
    enc_g, feats, emask = enc
    start, _ = prompt
    logits0, bufs, key_mask, step_fn = _encdec_front(
        ctx, what, enc_g, g, feats, emask, start, nb, ml, tag
    )
    return start, logits0, bufs, key_mask, step_fn


def _opt_scalar(v, dtype):
    import jax.numpy as jnp

    if v is None:
        return None
    return jnp.reshape(jnp.asarray(v), ()).astype(dtype)


# ----------------------------------------------------- greedy and sampling


def _run_simple(seq_init, logits0, key_mask, bufs, step_fn,
                opts: _SearchOpts, pick):
    """Shared greedy/sampling loop (nb=1): pick(processed_scores, step_key)
    → [BB] token ids. Finished rows keep emitting pad (the HF/ORT freeze
    rule: the EOS itself is written, everything after is pad)."""
    import jax
    import jax.numpy as jnp

    bb, s = seq_init.shape
    ml = opts.max_length
    seqs = jnp.full((bb, ml), opts.pad, jnp.int32).at[:, :s].set(seq_init)
    done = jnp.zeros((bb,), bool)

    def select(logits, seqs, done, p, first, key):
        sc = _process_scores(logits, seqs, p, opts, first)
        tok = pick(sc, key).astype(jnp.int32)
        tok = jnp.where(done, opts.pad, tok)
        seqs = seqs.at[:, p].set(tok)
        done = done | (tok == opts.eos)
        return tok, seqs, done

    key0 = jax.random.PRNGKey(opts.seed)
    tok, seqs, done = select(
        logits0, seqs, done, jnp.int32(s), True, jax.random.fold_in(key0, 0)
    )
    steps = ml - s - 1
    if steps > 0:
        def body(carry, i):
            tok, seqs, done, key_mask, bufs = carry
            logits, bufs, key_mask = step_fn(tok, i, key_mask, bufs)
            tok, seqs, done = select(
                logits, seqs, done, jnp.int32(s) + i + 1, False,
                jax.random.fold_in(key0, i + 1),
            )
            return (tok, seqs, done, key_mask, bufs), None

        (tok, seqs, done, key_mask, bufs), _ = jax.lax.scan(
            body, (tok, seqs, done, key_mask, bufs),
            jnp.arange(steps, dtype=jnp.int32),
        )
    return seqs


@op("GreedySearch", foldable=False, domain="com.microsoft",
    static_args=(1,), subgraph=True)
def greedy_search(ctx: OpContext, input_ids, max_length, min_length=None,
                  repetition_penalty=None, vocab_mask=None,
                  prefix_vocab_mask=None, attention_mask=None):
    """com.microsoft::GreedySearch — argmax generation with the whole loop
    inside one node (see module docstring for the TPU lowering)."""
    import jax.numpy as jnp

    g, mt, enc, prompt, ml, eos, pad = _setup(
        ctx, "GreedySearch", input_ids, max_length, attention_mask
    )
    seq_init, logits0, bufs, key_mask, step_fn = _make_front(
        ctx, "GreedySearch", g, mt, enc, prompt, 1, ml, "greedy"
    )
    opts = _SearchOpts(
        max_length=ml, prompt_len=seq_init.shape[1], eos=eos, pad=pad,
        ngram=int(ctx.attr("no_repeat_ngram_size", 0)),
        min_length=_opt_scalar(min_length, jnp.int32),
        rep_penalty=_opt_scalar(repetition_penalty, jnp.float32),
        vocab_mask=vocab_mask, prefix_mask=prefix_vocab_mask,
    )
    return _run_simple(
        seq_init, logits0, key_mask, bufs, step_fn, opts,
        lambda sc, key: jnp.argmax(sc, axis=-1),
    )


@op("Sampling", foldable=False, domain="com.microsoft",
    static_args=(1,), subgraph=True)
def sampling(ctx: OpContext, input_ids, max_length, min_length=None,
             repetition_penalty=None, vocab_mask=None,
             prefix_vocab_mask=None, attention_mask=None,
             presence_mask=None, seed=None):
    """com.microsoft::Sampling — top-p / temperature sampling generation.

    The RNG is jax.random (threefry), NOT ORT's std::mt19937, so sampled
    sequences differ from ORT run-for-run by design; the processed
    distribution itself (temperature → penalties → top-p filter, the HF
    warper order ORT ports) is what the tests pin down."""
    import jax
    import jax.numpy as jnp

    if int(ctx.attr("custom", 0)):
        raise NotImplementedError("Sampling: custom=1 (external sampling "
                                  "function) is not supported")
    g, mt, enc, prompt, ml, eos, pad = _setup(
        ctx, "Sampling", input_ids, max_length, attention_mask
    )
    seq_init, logits0, bufs, key_mask, step_fn = _make_front(
        ctx, "Sampling", g, mt, enc, prompt, 1, ml, "sampling"
    )
    temperature = float(ctx.attr("temperature", 1.0)) or 1.0
    top_p = float(ctx.attr("top_p", 0.0))
    filter_value = float(ctx.attr("filter_value", NEG))
    presence_penalty = float(ctx.attr("presence_penalty", 0.0))
    opts = _SearchOpts(
        max_length=ml, prompt_len=seq_init.shape[1], eos=eos, pad=pad,
        ngram=int(ctx.attr("no_repeat_ngram_size", 0)),
        min_length=_opt_scalar(min_length, jnp.int32),
        rep_penalty=_opt_scalar(repetition_penalty, jnp.float32),
        vocab_mask=vocab_mask, prefix_mask=prefix_vocab_mask,
        seed=int(ctx.attr("seed", 0)),
    )
    seed_dyn = None if seed is None else jnp.reshape(
        jnp.asarray(seed), ()).astype(jnp.uint32)

    def pick(sc, key):
        sc = sc / jnp.float32(temperature)
        if presence_penalty and presence_mask is not None:
            sc = sc - jnp.float32(presence_penalty) * presence_mask.astype(
                sc.dtype)
        if top_p > 0.0:
            srt = jnp.sort(sc, axis=-1)[:, ::-1]
            cum = jnp.cumsum(jax.nn.softmax(srt, axis=-1), axis=-1)
            keep = jnp.concatenate(
                [jnp.ones((sc.shape[0], 1), bool), cum[:, :-1] < top_p],
                axis=1,
            )
            thr = jnp.min(
                jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True
            )
            sc = jnp.where(sc >= thr, sc, jnp.asarray(filter_value, sc.dtype))
        if seed_dyn is not None:
            key = jax.random.fold_in(key, seed_dyn)
        return jax.random.categorical(key, sc, axis=-1)

    seqs = _run_simple(seq_init, logits0, key_mask, bufs, step_fn, opts,
                       pick)
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    if n_out > 1 and ctx.node.output[1]:
        raise NotImplementedError(
            "Sampling: the filtered_logits output is not supported"
        )
    return seqs


# ------------------------------------------------------------- beam search


@op("BeamSearch", foldable=False, domain="com.microsoft",
    static_args=(1, 3, 4), subgraph=True)
def beam_search(ctx: OpContext, input_ids, max_length, min_length=None,
                num_beams=None, num_return_sequences=None,
                length_penalty=None, repetition_penalty=None,
                vocab_mask=None, prefix_vocab_mask=None, attention_mask=None,
                decoder_input_ids=None, logits_processor=None):
    """com.microsoft::BeamSearch — the full beam search as one XLA program
    (module docstring has the lowering; semantics are ORT's legacy-HF
    scorer port, gated in tests/test_search_ops.py against an independent
    torch implementation of that algorithm)."""
    import jax
    import jax.numpy as jnp

    if logits_processor is not None:
        try:
            nonzero = bool(np.any(np.asarray(logits_processor)))
        except Exception:
            nonzero = True
        if nonzero:
            raise NotImplementedError(
                "BeamSearch: logits_processor=1 (Whisper timestamp rules) "
                "is not supported"
            )
    g, mt, enc, prompt, ml, eos, pad = _setup(
        ctx, "BeamSearch", input_ids, max_length, attention_mask,
        decoder_input_ids=decoder_input_ids,
    )
    if num_beams is None or num_return_sequences is None:
        raise ValueError(
            "BeamSearch requires num_beams and num_return_sequences"
        )
    nb = static_ints(num_beams, "BeamSearch num_beams")[0]
    nret = static_ints(num_return_sequences,
                       "BeamSearch num_return_sequences")[0]
    if nret > nb:
        raise ValueError(
            f"BeamSearch: num_return_sequences ({nret}) > num_beams ({nb})"
        )
    seq_init, logits0, bufs, key_mask, step_fn = _make_front(
        ctx, "BeamSearch", g, mt, enc, prompt, nb, ml, "beam"
    )
    b, s = seq_init.shape
    bb = b * nb
    opts = _SearchOpts(
        max_length=ml, prompt_len=s, eos=eos, pad=pad, nb=nb, nret=nret,
        early_stopping=bool(ctx.attr("early_stopping", 0)),
        ngram=int(ctx.attr("no_repeat_ngram_size", 0)),
        min_length=_opt_scalar(min_length, jnp.int32),
        rep_penalty=_opt_scalar(repetition_penalty, jnp.float32),
        length_penalty=(
            jnp.float32(1.0) if length_penalty is None
            else _opt_scalar(length_penalty, jnp.float32)
        ),
        vocab_mask=vocab_mask, prefix_mask=prefix_vocab_mask,
    )
    n_out = len(ctx.node.output) if ctx.node is not None else 1
    want_scores = n_out > 2 and bool(ctx.node.output[2])
    if n_out > 3:
        raise NotImplementedError(
            "BeamSearch: Whisper cross_qk / no_speech_probs outputs are "
            "not supported"
        )

    seqs = jnp.full((b, nb, ml), pad, jnp.int32).at[:, :, :s].set(
        seq_init[:, None, :]
    )
    # HF/ORT beam-score init: only beam 0 is live at the first expansion
    bscore = jnp.zeros((b, nb), jnp.float32).at[:, 1:].set(-1e9)
    fseq = jnp.full((b, nb, ml), pad, jnp.int32)
    fsc = jnp.full((b, nb), NEG, jnp.float32)
    done = jnp.zeros((b,), bool)
    col_ids = jnp.arange(ml, dtype=jnp.int32)
    lp = opts.length_penalty

    def select(logits, st, p, first):
        """One scorer round at dynamic current-length p (the position the
        chosen token takes). Returns flat next tokens + parent rows and the
        updated (seqs, bscore, fseq, fsc, done) state."""
        seqs, bscore, fseq, fsc, done = st
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp = _process_scores(logp, seqs.reshape(bb, ml), p, opts, first)
        vocab = logp.shape[-1]
        cand = (bscore[:, :, None] + logp.reshape(b, nb, vocab)).reshape(
            b, nb * vocab
        )
        top_sc, top_ix = jax.lax.top_k(cand, 2 * nb)  # sorted desc
        tok = (top_ix % vocab).astype(jnp.int32)
        parent = (top_ix // vocab).astype(jnp.int32)
        is_eos = tok == eos
        plen = p.astype(jnp.float32)

        # finished pool: EOS candidates ranked inside the top nb join, with
        # the ORT/legacy-HF score = sum_logprobs / full_len^penalty (the
        # stored hypothesis excludes the EOS; the EOS logprob is included)
        add = is_eos & (jnp.arange(2 * nb) < nb)[None, :] & ~done[:, None]
        cand_f = jnp.where(add, top_sc / plen ** lp, NEG)
        pseq = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
        at_p = col_ids[None, None, :] == p
        cand_seq = jnp.where(at_p, eos, pseq)
        # old pool first: lax.top_k is stable, so ties keep the incumbent
        # (the legacy scorer's strict `score > worst_score` replacement)
        m_sc = jnp.concatenate([fsc, cand_f], axis=1)
        m_seq = jnp.concatenate([fseq, cand_seq], axis=1)
        new_fsc, sel = jax.lax.top_k(m_sc, nb)
        new_fseq = jnp.take_along_axis(m_seq, sel[:, :, None], axis=1)

        # running beams: best nb non-EOS continuations, in rank order
        alive = jnp.where(is_eos, NEG, top_sc)
        a_sc, aix = jax.lax.top_k(alive, nb)
        a_tok = jnp.take_along_axis(tok, aix, axis=1)
        a_par = jnp.take_along_axis(parent, aix, axis=1)
        new_seqs = jnp.where(
            at_p, a_tok[:, :, None],
            jnp.take_along_axis(seqs, a_par[:, :, None], axis=1),
        )

        # done test (legacy scorer): pool full AND (early stop, or the best
        # running sum can no longer beat the worst finished score)
        n_fin = (new_fsc > NEG / 2).sum(axis=1)
        worst = new_fsc[:, -1]
        attainable = top_sc[:, 0] / plen ** lp
        done_now = (n_fin >= nb) & (
            jnp.asarray(True) if opts.early_stopping else (worst >= attainable)
        )
        keep = done[:, None]
        out_tok = jnp.where(keep, pad, a_tok)
        out_par = jnp.where(keep, jnp.arange(nb)[None, :], a_par)
        st = (
            jnp.where(keep[:, :, None], seqs, new_seqs),
            jnp.where(keep, bscore, a_sc),
            jnp.where(keep[:, :, None], fseq, new_fseq),
            jnp.where(keep, fsc, new_fsc),
            done | done_now,
        )
        flat_par = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * nb + out_par
        ).reshape(bb)
        return out_tok.reshape(bb), flat_par, st, logp.reshape(b, nb, vocab)

    def gather_rows(bufs, flat_idx):
        return [jnp.take(bf, flat_idx, axis=bf.ndim - 4) for bf in bufs]

    st = (seqs, bscore, fseq, fsc, done)
    tok, flat_par, st, logp0 = select(logits0, st, jnp.int32(s), True)
    bufs = gather_rows(bufs, flat_par)
    steps = ml - s - 1
    ys = None
    if steps > 0:
        def body(carry, i):
            tok, st, key_mask, bufs = carry
            logits, bufs, key_mask = step_fn(tok, i, key_mask, bufs)
            tok, flat_par, st, logp = select(
                logits, st, jnp.int32(s) + i + 1, False
            )
            bufs = gather_rows(bufs, flat_par)
            return (tok, st, key_mask, bufs), (logp if want_scores else None)

        (tok, st, key_mask, bufs), ys = jax.lax.scan(
            body, (tok, st, key_mask, bufs),
            jnp.arange(steps, dtype=jnp.int32),
        )
    seqs, bscore, fseq, fsc, done = st

    # finalize (legacy scorer): batches that never went done contribute all
    # running beams at full length; then the best nret hypotheses win
    alive_f = jnp.where(done[:, None], NEG, bscore / jnp.float32(ml) ** lp)
    m_sc = jnp.concatenate([fsc, alive_f], axis=1)
    m_seq = jnp.concatenate([fseq, seqs], axis=1)
    fin_sc, sel = jax.lax.top_k(m_sc, nb)
    fin_seq = jnp.take_along_axis(m_seq, sel[:, :, None], axis=1)
    sequences = fin_seq[:, :nret]
    sequences_scores = fin_sc[:, :nret]

    if n_out <= 1:
        return sequences
    outs = [sequences, sequences_scores]
    if n_out > 2:
        if want_scores:
            scores = (
                jnp.concatenate([logp0[None], ys], axis=0)
                if ys is not None else logp0[None]
            )
        else:
            scores = jnp.zeros((0,), jnp.float32)
        outs.append(scores)
    return tuple(outs[:n_out])


@op("WhisperBeamSearch", foldable=False, domain="com.microsoft",
    static_args=(1, 3, 4), subgraph=True)
def whisper_beam_search(ctx: OpContext, input_features, max_length,
                        min_length=None, num_beams=None,
                        num_return_sequences=None, length_penalty=None,
                        repetition_penalty=None, vocab_mask=None,
                        prefix_vocab_mask=None, attention_mask=None,
                        decoder_input_ids=None, logits_processor=None,
                        cross_qk_layer_head=None, extra_decoding_ids=None,
                        temperature=None):
    """com.microsoft::WhisperBeamSearch — the node name newer ORT Whisper
    exports carry; same search as BeamSearch (model_type=2) with extra
    whisper-only inputs, the unsupported ones refused loudly."""
    if cross_qk_layer_head is not None:
        raise NotImplementedError(
            "WhisperBeamSearch: cross_qk_layer_head (word-level timestamp "
            "QK extraction) is not supported"
        )
    if extra_decoding_ids is not None:
        raise NotImplementedError(
            "WhisperBeamSearch: extra_decoding_ids is not supported"
        )
    if temperature is not None:
        t = np.asarray(temperature).reshape(-1)
        if not (t.size == 1 and float(t[0]) == 1.0):
            raise NotImplementedError(
                "WhisperBeamSearch: temperature != 1.0 is not supported "
                "in beam mode (ORT only uses it for its sampling fork)"
            )
    return beam_search(
        ctx, input_features, max_length, min_length, num_beams,
        num_return_sequences, length_penalty, repetition_penalty,
        vocab_mask, prefix_vocab_mask, attention_mask, decoder_input_ids,
        logits_processor,
    )


@op("NGramRepeatBlock", foldable=False, domain="com.microsoft")
def ngram_repeat_block(ctx: OpContext, input_ids, scores):
    """com.microsoft::NGramRepeatBlock — the standalone no-repeat-ngram
    logits processor (fairseq-lineage generative exports carry it as its
    own node next to a host search loop). Bans token t when the
    (ngram_size−1)-gram ending at the current position already occurred
    in input_ids followed by t; banned scores go to −inf (finite NEG
    stand-in). Same math as the in-search processor (`_ngram_ban`), with
    the current length being input_ids' static trailing dim."""
    import jax.numpy as jnp

    n = int(ctx.attr("ngram_size", 0))
    if n <= 0:
        raise ValueError("NGramRepeatBlock requires ngram_size > 0")
    seqs = input_ids.astype(jnp.int32)
    p = jnp.asarray(seqs.shape[1], jnp.int32)
    return _ngram_ban(scores, seqs, p, n).astype(scores.dtype)
