"""Streaming SenseVoice: chunked encoding with per-layer context caches.

The reference (and our offline path) encodes whole utterances; this module
adds a streaming mode the reference lacks: audio arrives in fixed chunks,
each SAN-M layer attends over [left-context cache ‖ current chunk], and the
FSMN convolution carries its own (kernel-1)-frame tail — an Emformer-style
block-processing encoder built from the same weights.

State is a pytree of per-layer caches that recirculates through the jitted
step with buffer donation (the streaming-workspace pattern of SURVEY §3.3).
Numerics: within a chunk this matches full attention restricted to the
visible context window; it is a latency/quality mode, not bit-parity with
offline decoding.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..features.fbank import FbankConfig, FbankFrontend
from .common import Params, layer_norm, linear, sinusoidal_positions
from .sensevoice import SenseVoiceConfig


@dataclass
class StreamConfig:
    chunk_frames: int = 16  # LFR frames per chunk (~0.96 s)
    context_frames: int = 32  # left-context frames cached per layer


def init_stream_state(cfg: SenseVoiceConfig, s: StreamConfig, batch: int = 1):
    """Per-layer caches: attention context [B, L, D] + validity [B, L] +
    FSMN tail [B, k-1, D], plus the absolute frame position."""
    layers = []
    for _ in range(cfg.n_layers):
        layers.append(
            {
                "ctx": jnp.zeros((batch, s.context_frames, cfg.d_model)),
                "ctx_mask": jnp.zeros((batch, s.context_frames)),
                "fsmn_tail": jnp.zeros((batch, cfg.fsmn_kernel - 1, cfg.d_model)),
            }
        )
    return {"layers": layers, "pos": jnp.zeros((), jnp.int32)}


def _stream_block(p: Params, x, cache, mask, cfg: SenseVoiceConfig):
    """One SAN-M layer over [ctx ‖ chunk]; returns (y, new_cache).

    The cache holds this layer's INPUT activations from previous chunks
    (matching offline attention, which attends over the layer's inputs),
    not its outputs."""
    B, T, D = x.shape
    H = cfg.n_heads
    hd = D // H
    L = cache["ctx"].shape[1]
    x_in = x  # cached for the next chunk's attention context

    h = layer_norm(p["norm1"], x)
    qkv = linear(p["qkv"], h).astype(jnp.float32)
    q, k_cur, v_cur = jnp.split(qkv, 3, axis=-1)

    # attention keys/values: cached context (already post-norm qkv space
    # would differ per layer; cache raw activations and re-project)
    hc = layer_norm(p["norm1"], cache["ctx"])
    qkv_c = linear(p["qkv"], hc).astype(jnp.float32)
    _, k_ctx, v_ctx = jnp.split(qkv_c, 3, axis=-1)
    k = jnp.concatenate([k_ctx, k_cur], axis=1)
    v = jnp.concatenate([v_ctx, v_cur], axis=1)
    kv_mask = jnp.concatenate([cache["ctx_mask"], mask], axis=1)

    # FSMN on values with carried tail (causal: pad left with tail only);
    # shifted multiply-adds as in the offline block (sensevoice.sanm_block)
    vm = v_cur * mask[..., None]
    v_ext = jnp.concatenate([cache["fsmn_tail"], vm], axis=1)
    fw = p["fsmn"]["w"]
    K = fw.shape[0]
    fsmn = jnp.zeros_like(vm)
    for kk in range(K):
        fsmn = fsmn + v_ext[:, kk : kk + T, :] * fw[kk]

    qh = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L + T, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L + T, H, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    scores = jnp.where(kv_mask[:, None, None, :] > 0, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx_out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    ctx_out = ctx_out.transpose(0, 2, 1, 3).reshape(B, T, D)
    x = x + linear(p["out"], ctx_out + fsmn)

    h2 = layer_norm(p["norm2"], x)
    x = x + linear(p["ffn2"], jax.nn.relu(linear(p["ffn1"], h2)))

    # roll caches: keep last L INPUT activations of [old ctx ‖ x_in]
    full = jnp.concatenate([cache["ctx"], x_in], axis=1)
    full_mask = jnp.concatenate([cache["ctx_mask"], mask], axis=1)
    new_cache = {
        "ctx": full[:, -L:],
        "ctx_mask": full_mask[:, -L:],
        "fsmn_tail": v_ext[:, -( cfg.fsmn_kernel - 1):] if cfg.fsmn_kernel > 1
        else cache["fsmn_tail"],
    }
    return x, new_cache


def stream_step(params: Params, feats, mask, state, cfg: SenseVoiceConfig):
    """feats: [B, chunk, 560]; mask: [B, chunk] → (logits [B, chunk, V],
    new_state). Prefix query frames are omitted in streaming mode."""
    B, T, _ = feats.shape
    x = feats * (cfg.d_model**0.5) / (cfg.input_dim**0.5)
    x = linear(params["embed"], x).astype(jnp.float32)
    pos = state["pos"]
    # absolute positions continue across chunks — computed IN-PROGRAM from
    # the traced position (a fixed table + dynamic_slice silently CLAMPS
    # past its last row, repeating positions after ~8k frames of stream)
    p = (pos + 1 + jnp.arange(T)).astype(jnp.float32)[:, None]  # FunASR 1-based
    div = jnp.exp(
        jnp.arange(0, cfg.d_model, 2, dtype=jnp.float32)
        * -(np.log(10000.0) / cfg.d_model)
    )
    pe = jnp.zeros((T, cfg.d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(p * div))
    pe = pe.at[:, 1::2].set(jnp.cos(p * div))
    x = x + pe
    new_layers = []
    for lp, cache in zip(params["layers"], state["layers"]):
        x, nc = _stream_block(lp, x, cache, mask, cfg)
        new_layers.append(nc)
    x = layer_norm(params["after_norm"], x)
    logits = linear(params["ctc"], x)
    n_valid = jnp.sum(mask[0]).astype(jnp.int32)
    return logits.astype(jnp.float32), {
        "layers": new_layers, "pos": pos + n_valid
    }


@dataclass
class StreamingSenseVoice:
    """Chunked streaming wrapper over a (shared-weights) SenseVoice model."""

    cfg: SenseVoiceConfig
    stream: StreamConfig = field(default_factory=StreamConfig)
    params: Params | None = None
    fbank: FbankFrontend | None = None
    _step: object = None
    _decode_step: object = None

    def __post_init__(self):
        if self.fbank is None:
            self.fbank = FbankFrontend(FbankConfig())

    def step_fn(self):
        if self._step is None:
            cfg = self.cfg

            def fn(params, feats, mask, state):
                return stream_step(params, feats, mask, state, cfg)

            self._step = jax.jit(fn, donate_argnums=(3,))
        return self._step

    def decode_step_fn(self):
        """Like step_fn but returns per-frame argmax ids (computed on device;
        KB-scale readback instead of the [C, vocab] logits)."""
        if getattr(self, "_decode_step", None) is None:
            cfg = self.cfg

            def fn(params, feats, mask, state):
                logits, new_state = stream_step(params, feats, mask, state, cfg)
                ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return ids, new_state

            self._decode_step = jax.jit(fn, donate_argnums=(3,))
        return self._decode_step

    def transcribe_stream(self, pcm: np.ndarray, blank_id: int = 0) -> list[int]:
        """Feed audio chunk by chunk; returns the concatenated greedy ids."""
        from .sensevoice import greedy_ctc_decode

        feats = np.asarray(self.fbank(np.asarray(pcm, np.float32)))
        C = self.stream.chunk_frames
        state = init_stream_state(self.cfg, self.stream)
        step = self.decode_step_fn()
        ids: list[int] = []
        prev_last = -1
        for start in range(0, feats.shape[0], C):
            chunk = feats[start : start + C]
            mask = np.ones((1, C), np.float32)
            if chunk.shape[0] < C:
                pad = C - chunk.shape[0]
                mask[0, chunk.shape[0] :] = 0.0
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            ids_dev, state = step(self.params, chunk[None], mask, state)
            valid = int(mask.sum())
            frame_ids = np.asarray(ids_dev[0, :valid])
            for t in frame_ids:
                t = int(t)
                if t != prev_last and t != blank_id:
                    ids.append(t)
                prev_last = t
        return ids
