"""Supertonic-style multi-model TTS (text → acoustic latent → waveform).

Product parity (/root/reference/examples/supertonic/src/main.rs:124-285,
SURVEY.md §3.4): four sub-models chained — DurationPredictor, TextEncoder,
VectorEstimator (flow matching, 5 Euler steps), Vocoder — plus the
UnicodeProcessor text pipeline (processor.rs:27-139), per-voice style
vectors from JSON (main.rs:69-122), noisy-latent sampling (processor.rs:141)
and latent mask + normalizer-scale denorm (main.rs:247-262). Supertonic 3 is
the same pipeline minus the mask/denorm block, speed 1.05 (SURVEY §2.5).

TPU redesign: the reference chains the 4 programs through host Vec copies
each step; here text→waveform jits as ONE program with the 5-step flow loop
as `lax.fori_loop`, the latent staying in HBM. Host RNG becomes
jax.random with a fixed-seed parity mode (SURVEY §7 hard parts). The latent
length is bucketed so every bucket is one static-shape program.
"""

from __future__ import annotations

import json
import re
import unicodedata
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    Params,
    conv1d,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    sinusoidal_positions,
)


# ---------------------------------------------------------------------------
# Config (tts.json schema: tolerates nested {ae:{...}, ttl:{...}} and flat
# layouts with defaulting back-fill — supertonic/src/config.rs:4-40)


@dataclass
class SupertonicConfig:
    vocab_size: int = 512
    d_text: int = 256
    d_latent: int = 64
    d_style: int = 128
    n_text_layers: int = 4
    n_est_layers: int = 4
    n_heads: int = 4
    ffn_mult: int = 4
    flow_steps: int = 5
    frames_per_second: float = 93.75  # 24000 / 256
    sample_rate: int = 24000
    hop: int = 256  # vocoder upsampling factor
    normalizer_scale: float = 1.0
    speed: float = 1.0
    latent_buckets: tuple = (64, 128, 256, 512, 1024)
    token_buckets: tuple = (48, 96, 160, 256, 320)  # ids pad to these, so
    #   the compile count is bounded by buckets², not by distinct text
    #   lengths (chunk_text caps chunks at ~300 chars → ≤ ~310 tokens);
    #   duration/text models are mask-exact under padding (see
    #   duration_predictor_forward)
    est_frames_per_token: float = 8.0  # bucket guess for the fused
    #   duration+synth program (synthesize retries one bucket up when the
    #   in-program durations overflow the guess — one extra dispatch, rare)
    apply_latent_denorm: bool = True  # Supertonic 2; v3 skips (SURVEY §2.5)
    fused_estimator: bool = False  # experimental: fuse the 8 attn blocks
    #   into one Pallas program (kernels/est_block.py). Interleaved slope
    #   trials read it 40% SLOWER than the XLA path at reference dims
    #   (0.115 vs 0.082 ms/step): the kernel pays both attention branches
    #   (traced where over self/cross) and 4 full-D masked-head score dots,
    #   and XLA's launch overhead here was smaller than assumed. Kept as an
    #   off-by-default knob + parity suite; the honest negative result is
    #   recorded in docs/PERF.md.
    dtype: str = "float32"  # attention/FFN MXU dtype (dtype plumbing in
    #   _attn_block lets deployments pick bf16; at the reference dims
    #   d=256/T=512 the matmuls are latency-bound and bf16 casts measure
    #   NEUTRAL-to-slightly-slower on v5e, so f32 stays default)

    @classmethod
    def from_json(cls, path: str | Path) -> "SupertonicConfig":
        raw = json.loads(Path(path).read_text())
        flat: dict = {}
        for section in ("ae", "ttl", "dp"):
            if isinstance(raw.get(section), dict):
                flat.update(raw[section])
        flat.update({k: v for k, v in raw.items() if not isinstance(v, dict)})
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in flat.items() if k in known})

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


# ---------------------------------------------------------------------------
# Text pipeline (UnicodeProcessor analog, processor.rs:27-139,:193-217)

#: Languages the published Supertonic checkpoints accept
#: (processor.rs:9-13 AVAILABLE_LANGS / is_valid_lang).
AVAILABLE_LANGS = ("en", "ko", "es", "pt", "fr", "zh")


def is_valid_lang(lang: str) -> bool:
    return lang in AVAILABLE_LANGS


# Emoji block ranges, exactly the reference's class (processor.rs:65).
_EMOJI_RE = re.compile(
    "["
    "\U0001F600-\U0001F64F"  # emoticons
    "\U0001F300-\U0001F5FF"  # symbols & pictographs
    "\U0001F680-\U0001F6FF"  # transport & map
    "\U0001F700-\U0001F77F"  # alchemical
    "\U0001F780-\U0001F7FF"  # geometric shapes ext
    "\U0001F800-\U0001F8FF"  # supplemental arrows-C
    "\U0001F900-\U0001F9FF"  # supplemental symbols
    "\U0001FA00-\U0001FA6F"  # chess symbols
    "\U0001FA70-\U0001FAFF"  # symbols ext-A
    "☀-⛿"          # misc symbols
    "✀-➿"          # dingbats
    "\U0001F1E6-\U0001F1FF"  # regional indicators
    "]+"
)

# Character replacement table, applied IN ORDER, each a global replace
# (processor.rs:68-89). Order and completeness matter for token-id parity
# on the real unicode_indexer.json: curly quotes/dashes fold to ASCII,
# brackets/pipes/slashes/hash/arrows become spaces.
_REPLACEMENTS = (
    ("–", "-"),   # – en dash
    ("‑", "-"),   # ‑ non-breaking hyphen
    ("—", "-"),   # — em dash
    ("_", " "),
    ("“", '"'),   # " left curly
    ("”", '"'),   # " right curly
    ("‘", "'"),   # ' left curly
    ("’", "'"),   # ' right curly
    ("´", "'"),   # ´ acute (unreachable post-NFKD; kept for parity)
    ("`", "'"),
    ("[", " "),
    ("]", " "),
    ("|", " "),
    ("/", " "),
    ("#", " "),
    ("→", " "),   # →
    ("←", " "),   # ←
)

# Symbols deleted outright (processor.rs:91-95).
_SPECIAL_STRIP = ("♥", "☆", "♡", "©", "\\")  # ♥ ☆ ♡ © \

_WS_RE = re.compile(r"\s+")

# Wide terminal-punctuation class (processor.rs:104-106): ASCII sentence
# punctuation, quotes (curly entries unreachable post-replacement but kept
# verbatim), closing brackets, and CJK terminators/quote-closers.
_ENDS_WITH_PUNCT = re.compile(
    "[.!?;:,'\"“”‘’)\\]}"
    "…。」』】〉》›»]$"
)


def normalize_text(text: str, lang: str = "en") -> str:
    """Exact port of the reference preprocessing (processor.rs:61-125):
    NFKD → emoji-range removal → ordered replacement table → special-symbol
    strip → whitespace collapse + trim → wide terminal-punctuation check →
    lang validation → ``<lang>…</lang>`` wrap. Byte-identical output to the
    reference on the same input is the contract (tests/test_text_parity.py);
    no extra Unicode-category stripping happens on this path, because any
    deviation changes token ids on the real unicode_indexer.json."""
    s = unicodedata.normalize("NFKD", text)
    s = _EMOJI_RE.sub("", s)
    for src, dst in _REPLACEMENTS:
        s = s.replace(src, dst)
    for sym in _SPECIAL_STRIP:
        s = s.replace(sym, "")
    # defensive only: lone surrogates can't round-trip UTF-8 (Rust &str can
    # never contain them, so parity is unaffected)
    s = "".join(ch for ch in s if not 0xD800 <= ord(ch) <= 0xDFFF)
    s = _WS_RE.sub(" ", s).strip()
    if s and not _ENDS_WITH_PUNCT.search(s):
        s += "."
    if not is_valid_lang(lang):
        raise ValueError(
            f"Invalid language: {lang}. Available: {list(AVAILABLE_LANGS)}"
        )
    return f"<{lang}>{s}</{lang}>"


def prepare_chunks(text: str, lang: str = "en", max_len: int = 300) -> list[str]:
    """normalize → chunk → wrap EACH chunk in <lang> tags. Chunking the
    already-tagged string would leave every chunk but the first without its
    opening tag (out-of-distribution conditioning for per-utterance-tagged
    checkpoints)."""
    import re

    s = normalize_text(text, lang)
    s = re.sub(rf"^<{re.escape(lang)}>|</{re.escape(lang)}>$", "", s)
    return [f"<{lang}>{c}</{lang}>" for c in chunk_text(s, max_len)]


def chunk_text(text: str, max_len: int = 300) -> list[str]:
    """Sentence-boundary chunking at ~max_len chars (processor.rs:193-217).

    Deliberate improvement over the reference: processor.rs splits on
    paragraph breaks and then TRUNCATES any over-long paragraph at max_len
    bytes ("Very simple split for now" — text is dropped); we split at
    sentence punctuation so every character is synthesized."""
    if len(text) <= max_len:
        return [text]
    chunks, cur = [], ""
    for part in text.replace("!", ".").replace("?", ".").split("."):
        part = part.strip()
        if not part:
            continue
        if len(cur) + len(part) + 1 > max_len and cur:
            chunks.append(cur)
            cur = part + "."
        else:
            cur += part + "."
    if cur:
        chunks.append(cur)
    return chunks


class UnicodeIndexer:
    """Codepoint → id tokenizer (unicode_indexer.json analog). Unknown
    codepoints hash into the reserved tail of the vocab."""

    def __init__(self, mapping: dict[str, int] | None = None, vocab_size: int = 512):
        self.vocab_size = vocab_size
        if mapping is None:
            printable = [chr(c) for c in range(32, 127)]
            mapping = {ch: i + 2 for i, ch in enumerate(printable)}
        self.mapping = mapping

    @classmethod
    def from_json(cls, path: str | Path, vocab_size: int = 512) -> "UnicodeIndexer":
        return cls(json.loads(Path(path).read_text()), vocab_size)

    def __call__(self, text: str) -> np.ndarray:
        ids = [
            self.mapping.get(ch, 2 + (ord(ch) % (self.vocab_size - 2)))
            for ch in text
        ]
        return np.asarray(ids, np.int32)


def load_voice_style(path: str | Path) -> dict[str, np.ndarray]:
    """voice_styles/*.json: {"ttl": [...], "dp": [...]} vectors."""
    raw = json.loads(Path(path).read_text())
    return {k: np.asarray(v, np.float32).reshape(-1) for k, v in raw.items()}


# ---------------------------------------------------------------------------
# Sub-models


def _init_attn_block(key, d, ffn):
    k = jax.random.split(key, 7)
    return {
        "norm1": init_layer_norm(k[0], d),
        "q": init_linear(k[1], d, d),
        "kv": init_linear(k[6], d, 2 * d),
        "out": init_linear(k[2], d, d),
        "norm2": init_layer_norm(k[3], d),
        "ffn1": init_linear(k[4], d, ffn),
        "ffn2": init_linear(k[5], ffn, d),
    }


def _attn_block(p, x, mask, n_heads, kv=None, kv_mask=None, dtype=None):
    """Self-attention (kv=None) or cross-attention block; distinct q and kv
    projections (the kv source is the text memory for cross layers).
    `dtype` (bf16 default via cfg) feeds the MXU; accumulation, softmax and
    norms stay f32."""
    B, T, D = x.shape
    h = layer_norm(p["norm1"], x)
    q = linear(p["q"], h, dtype=dtype)
    if kv is None:
        kvp = linear(p["kv"], h, dtype=dtype)
        att_mask = mask
    else:
        kvp = linear(p["kv"], layer_norm(p["norm1"], kv), dtype=dtype)
        att_mask = kv_mask
    k, v = jnp.split(kvp, 2, axis=-1)
    hd = D // n_heads
    Tk = k.shape[1]
    mm = dtype if dtype is not None else jnp.float32
    qh = q.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3).astype(mm)
    kh = k.reshape(B, Tk, n_heads, hd).transpose(0, 2, 1, 3).astype(mm)
    vh = v.reshape(B, Tk, n_heads, hd).transpose(0, 2, 1, 3).astype(mm)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    s = s / np.sqrt(hd)
    s = jnp.where(att_mask[:, None, None, :] > 0, s, -1e9)
    a = jax.nn.softmax(s, axis=-1)
    ctx_ = jnp.einsum("bhqk,bhkd->bhqd", a.astype(mm), vh,
                      preferred_element_type=jnp.float32)
    x = x + linear(p["out"], ctx_.transpose(0, 2, 1, 3).reshape(B, T, D),
                   dtype=dtype)
    h2 = layer_norm(p["norm2"], x)
    return x + linear(p["ffn2"], jax.nn.gelu(linear(p["ffn1"], h2,
                                                    dtype=dtype)),
                      dtype=dtype)


def init_text_encoder(key, cfg: SupertonicConfig) -> Params:
    ks = jax.random.split(key, cfg.n_text_layers + 3)
    return {
        "embed": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_text)) * 0.02,
        "style_proj": init_linear(ks[1], cfg.d_style, cfg.d_text),
        "blocks": [
            _init_attn_block(ks[2 + i], cfg.d_text, cfg.d_text * cfg.ffn_mult)
            for i in range(cfg.n_text_layers)
        ],
        "norm": init_layer_norm(ks[-1], cfg.d_text),
    }


def text_encoder_forward(p: Params, ids, style, mask, cfg: SupertonicConfig):
    x = p["embed"][ids] + linear(p["style_proj"], style)[:, None, :]
    x = x + sinusoidal_positions(ids.shape[1], cfg.d_text)
    for b in p["blocks"]:
        x = _attn_block(b, x, mask, cfg.n_heads, dtype=cfg.compute_dtype)
    return layer_norm(p["norm"], x)


def init_duration_predictor(key, cfg: SupertonicConfig) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.d_text
    return {
        "embed": jax.random.normal(ks[0], (cfg.vocab_size, d)) * 0.02,
        "style_proj": init_linear(ks[1], cfg.d_style, d),
        "conv1": init_conv1d(ks[2], d, d, 3),
        "conv2": init_conv1d(ks[3], d, d, 3),
        "norm": init_layer_norm(ks[4], d),
        "out": init_linear(ks[5], d, 1),
    }


def duration_predictor_forward(p: Params, ids, style, mask, cfg: SupertonicConfig):
    """→ per-token durations in frames (softplus, masked).

    Inputs and every conv output are re-masked so a PADDED sequence (ids
    padded to a token bucket, mask 0 on the pad) computes exactly what the
    unpadded program's SAME zero-padding would: the k=3 convs at the last
    real token see zeros either way. This makes token-length bucketing
    (synthesize) semantics-preserving, not just approximately right."""
    x = (p["embed"][ids] + linear(p["style_proj"], style)[:, None, :])
    x = x * mask[..., None]
    x = jax.nn.relu(conv1d(p["conv1"], x)) * mask[..., None]
    x = jax.nn.relu(conv1d(p["conv2"], x)) * mask[..., None]
    x = layer_norm(p["norm"], x)
    d = jax.nn.softplus(linear(p["out"], x))[..., 0]
    return d * mask


def init_vector_estimator(key, cfg: SupertonicConfig) -> Params:
    ks = jax.random.split(key, cfg.n_est_layers + 5)
    d = cfg.d_text
    return {
        "in_proj": init_linear(ks[0], cfg.d_latent, d),
        "style_proj": init_linear(ks[1], cfg.d_style, d),
        "t_proj": init_linear(ks[2], d, d),
        "blocks": [
            {
                "self": _init_attn_block(ks[3 + i], d, d * cfg.ffn_mult),
                "cross": _init_attn_block(
                    jax.random.fold_in(ks[3 + i], 1), d, d * cfg.ffn_mult
                ),
            }
            for i in range(cfg.n_est_layers)
        ],
        "out": init_linear(ks[-1], d, cfg.d_latent),
    }


def vector_estimator_forward(
    p: Params, xt, text_emb, style, latent_mask, text_mask, t_step, cfg: SupertonicConfig
):
    """Velocity field v(x_t, t): [B, T_latent, d_latent]."""
    B, T, _ = xt.shape
    d = cfg.d_text
    # timestep embedding (sinusoidal over a scalar t in [0,1])
    half = d // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t_step * 1000.0 * freqs
    temb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)])[None]
    x = linear(p["in_proj"], xt)
    x = x + linear(p["style_proj"], style)[:, None, :]
    x = x + linear(p["t_proj"], temb)[:, None, :]
    x = x + sinusoidal_positions(T, d)
    dt = cfg.compute_dtype
    if cfg.fused_estimator and x.shape[0] == 1:
        from ..kernels.quant_matmul import _on_tpu

        if _on_tpu():
            # all 8 blocks as ONE Pallas program (kernels/est_block.py):
            # the per-block XLA launch latency dominates this size
            from ..kernels.est_block import estimator_blocks_pallas

            y = estimator_blocks_pallas(
                x[0], text_emb[0], latent_mask[0], text_mask[0],
                p["blocks"], cfg.n_heads,
            )
            return linear(p["out"], y[None]) * latent_mask[..., None]
    for b in p["blocks"]:
        x = _attn_block(b["self"], x, latent_mask, cfg.n_heads, dtype=dt)
        x = _attn_block(b["cross"], x, latent_mask, cfg.n_heads, kv=text_emb,
                        kv_mask=text_mask, dtype=dt)
    return linear(p["out"], x) * latent_mask[..., None]


def init_vocoder(key, cfg: SupertonicConfig) -> Params:
    # 256× upsampling: 4 × ConvTranspose(×4) — latent rate → 24 kHz
    ks = jax.random.split(key, 6)
    chans = [cfg.d_latent, 128, 64, 32, 16]
    p: Params = {"ups": [], "pre": init_conv1d(ks[0], cfg.d_latent, chans[0], 7)}
    for i in range(4):
        scale = 1.0 / np.sqrt(chans[i] * 8)
        p["ups"].append(
            {
                "w": jax.random.uniform(
                    ks[1 + i], (8, chans[i], chans[i + 1]), jnp.float32, -scale, scale
                ),
                "b": jnp.zeros((chans[i + 1],), jnp.float32),
                "res": init_conv1d(jax.random.fold_in(ks[1 + i], 7), chans[i + 1],
                                   chans[i + 1], 7),
            }
        )
    p["out"] = init_conv1d(ks[5], chans[-1], 1, 7)
    return p


def vocoder_forward(p: Params, latent, cfg: SupertonicConfig):
    """latent [B, T, d_latent] → waveform [B, T*hop] (exactly ×256: each
    ConvTranspose level is SAME-padded ×4, so the hop contract holds).

    When `p` carries a "packed" subtree (prepare_vocoder_packed), the deep
    levels run in lane-packed [T/P, P·C] form (models/packed1d.py): the
    reference-shape vocoder spends 2.1 of its 2.7 ms in levels 3-4 + out
    conv purely because C=16..32 lane-pads to 128 at T up to 131k."""
    if "packed" in p:
        from .packed1d import vocoder_forward_packed

        return vocoder_forward_packed(p, latent, cfg)
    x = jax.nn.leaky_relu(conv1d(p["pre"], latent), 0.1)
    for up in p["ups"]:
        x = jax.lax.conv_transpose(
            x, up["w"], strides=(4,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + up["b"]
        x = jax.nn.leaky_relu(x, 0.1)
        x = x + jnp.tanh(conv1d(up["res"], x))
    return jnp.tanh(conv1d(p["out"], x))[..., 0]


# ---------------------------------------------------------------------------
# Full pipeline


def sample_noisy_latent(key, shape, latent_mask, max_t: int | None = None):
    """jax.random standard-normal latent (host-RNG → device-RNG redesign;
    fixed seed gives the parity mode from SURVEY §7).

    With `max_t`, the noise is sampled at [B, max_t, D] and prefix-sliced
    to the requested length, so the SAME seed yields the SAME latent
    regardless of which bucket the utterance landed in — same text + seed
    + style → same audio independent of bucketing (the fused-duration
    path may pick a larger bucket than the readback path would). The
    full-width sample is a few hundred KB of RNG — trivial."""
    B, T, D = shape
    if max_t is not None and max_t >= T:
        z = jax.random.normal(key, (B, max_t, D), jnp.float32)[:, :T]
    else:
        z = jax.random.normal(key, shape, jnp.float32)
    return z * latent_mask[..., None]


@dataclass
class SupertonicTts:
    cfg: SupertonicConfig = field(default_factory=SupertonicConfig)
    params: Params | None = None
    indexer: UnicodeIndexer | None = None
    _fn_cache: dict = field(default_factory=dict)
    # observed frames-per-token EMA: the fused-duration path's bucket guess
    # converges to THIS model's actual speaking rate after the first few
    # queries (cfg.est_frames_per_token is only the cold prior)
    _fpt_ema: float | None = None

    def __post_init__(self):
        if self.indexer is None:
            self.indexer = UnicodeIndexer(vocab_size=self.cfg.vocab_size)

    def init(self, seed: int = 0):
        def build(key):
            k = jax.random.split(key, 4)
            return {
                "duration": init_duration_predictor(k[0], self.cfg),
                "text": init_text_encoder(k[1], self.cfg),
                "estimator": init_vector_estimator(k[2], self.cfg),
                "vocoder": init_vocoder(k[3], self.cfg),
            }

        self.params = jax.jit(build)(jax.random.PRNGKey(seed))
        from .packed1d import prepare_vocoder_packed

        self.params["vocoder"] = prepare_vocoder_packed(
            self.params["vocoder"], self.cfg)
        return self.params

    def _synth_core(
        self, params, ids, text_mask, style_ttl, style_dp, latent_mask,
        seed, t_latent: int,
    ):
        """Shared trace body: batched styles + mask → (wave, durations)."""
        cfg = self.cfg
        durations = duration_predictor_forward(
            params["duration"], ids, style_dp, text_mask, cfg
        )
        text_emb = text_encoder_forward(
            params["text"], ids, style_ttl, text_mask, cfg
        )
        key = jax.random.PRNGKey(seed)
        xt = sample_noisy_latent(
            key, (ids.shape[0], t_latent, cfg.d_latent), latent_mask,
            max_t=cfg.latent_buckets[-1],
        )
        dt = 1.0 / cfg.flow_steps

        def flow_step(i, x):
            t = i.astype(jnp.float32) * dt
            v = vector_estimator_forward(
                params["estimator"], x, text_emb, style_ttl, latent_mask,
                text_mask, t, cfg,
            )
            return x + dt * v

        xt = jax.lax.fori_loop(0, cfg.flow_steps, flow_step, xt)
        if cfg.apply_latent_denorm:
            xt = xt * latent_mask[..., None] / cfg.normalizer_scale
        wave = vocoder_forward(params["vocoder"], xt, cfg)
        return wave, durations

    def synth_fn(self, t_latent: int):
        """One fused program per latent bucket: ids → waveform.

        The 5-step flow-matching loop is a lax.fori_loop; nothing leaves the
        device between sub-models (contrast: main.rs:240 host .to_vec()
        between each of the 4 programs)."""

        def fn(params, ids, text_mask, style_ttl, style_dp, latent_mask, seed):
            return self._synth_core(
                params, ids, text_mask, style_ttl[None], style_dp[None],
                latent_mask, seed, t_latent,
            )

        return fn

    def synth_e2e_fn(self, t_latent: int, min_frames: int = 8):
        """Duration → latent mask → synth as ONE program:
        (params, ids, text_mask, style_ttl, style_dp, seed)
        → (wave [1, t_latent·hop], t_real frames, durations).

        The two-step flow (duration program, host readback + rounding,
        mask build, synth program) pays a device→host sync between the
        two dispatches — ~33 ms on a tunneled TPU. Here the mask is built
        in-program from the predicted durations (static bucket shape,
        dynamic values; matches the host rounding: floor(Σdur/speed),
        clamped to [min_frames, t_latent]) and the caller trims the wave
        with the returned t_real. XLA CSEs the duration subgraph shared
        with `_synth_core`, so nothing runs twice."""
        cfg = self.cfg

        def fn(params, ids, text_mask, style_ttl, style_dp, seed):
            style_ttl_b = style_ttl[None]
            style_dp_b = style_dp[None]
            durations = duration_predictor_forward(
                params["duration"], ids, style_dp_b, text_mask, cfg
            )
            t_real = jnp.maximum(
                min_frames,
                jnp.floor(jnp.sum(durations) / cfg.speed).astype(jnp.int32),
            )
            t_real = jnp.minimum(t_real, t_latent)
            latent_mask = (
                jnp.arange(t_latent)[None, :] < t_real
            ).astype(jnp.float32)
            wave, _ = self._synth_core(
                params, ids, text_mask, style_ttl_b, style_dp_b,
                latent_mask, seed, t_latent,
            )
            return wave, t_real, durations

        return fn

    def _bucket(self, t: int) -> int:
        for b in self.cfg.latent_buckets:
            if t <= b:
                return b
        return self.cfg.latent_buckets[-1]

    def pad_tokens(self, ids: np.ndarray):
        """ids [1, n] → (padded ids [1, bucket], text_mask [1, bucket]).
        Zero-pad to the token bucket; the duration/text models are
        mask-exact under padding, so this only bounds the compile count."""
        n = ids.shape[1]
        b = n
        for tb in self.cfg.token_buckets:
            if n <= tb:
                b = tb
                break
        else:
            b = max(n, self.cfg.token_buckets[-1])
        padded = np.zeros((1, b), ids.dtype)
        padded[:, :n] = ids
        mask = np.zeros((1, b), np.float32)
        mask[:, :n] = 1.0
        return padded, mask

    def synthesize(
        self, text: str, style: dict[str, np.ndarray], lang: str = "en",
        seed: int = 0, min_frames: int = 8, fused_duration: bool = True,
    ) -> np.ndarray:
        """Host orchestration: normalize → chunk → per-chunk fused synth.

        fused_duration=True (default): ONE dispatch per chunk — the
        duration→mask→synth composite program (`synth_e2e_fn`), bucket
        guessed from token count (`est_frames_per_token`) with a one-bucket
        retry if the predicted frames overflow the guess. False: the
        two-dispatch flow (duration program, host rounding, synth program)
        — kept as the oracle; both paths produce identical audio for the
        same bucket (tested)."""
        import jax

        waves = []
        for chunk in prepare_chunks(text, lang):
            n_real = len(self.indexer(chunk))
            ids, text_mask = self.pad_tokens(self.indexer(chunk)[None])
            if fused_duration:
                # the guess (adaptive frames/token EMA, cold prior from
                # cfg) only predicts WHICH bucket to dispatch first; the
                # result is always taken from the CANONICAL bucket — the
                # one the model's own durations map to, identical to the
                # two-dispatch oracle's choice — so the audio is a pure
                # function of (text, style, seed): bit-deterministic
                # across calls, processes, and EMA state. A wrong guess
                # costs one extra dispatch, never a different waveform.
                fpt = self._fpt_ema or self.cfg.est_frames_per_token
                t_buck = self._bucket(max(
                    min_frames,
                    int(n_real * fpt / self.cfg.speed),
                ))
                for _attempt in range(2):
                    key = ("synth_e2e", t_buck, min_frames)
                    if key not in self._fn_cache:
                        self._fn_cache[key] = jax.jit(
                            self.synth_e2e_fn(t_buck, min_frames)
                        )
                    wave, _t, durations = self._fn_cache[key](
                        self.params, ids, text_mask,
                        np.asarray(style["ttl"]), np.asarray(style["dp"]),
                        seed,
                    )
                    t_true = max(
                        min_frames,
                        int(np.asarray(durations).sum() / self.cfg.speed),
                    )
                    ratio = t_true * self.cfg.speed / max(1, n_real)
                    self._fpt_ema = (
                        ratio if self._fpt_ema is None
                        else 0.7 * self._fpt_ema + 0.3 * ratio
                    )
                    canonical = self._bucket(t_true)
                    if t_buck == canonical:
                        break
                    t_buck = canonical  # guess missed: one re-dispatch
                # trim with the program's own (clamped) frame count — the
                # value the mask was built from
                waves.append(np.asarray(wave[0, : int(_t) * self.cfg.hop]))
                continue
            # two-dispatch oracle: latent length from predicted durations
            # (host rounding, then bucketed static shape)
            if "dur" not in self._fn_cache:
                self._fn_cache["dur"] = jax.jit(
                    lambda p, i, s, m: duration_predictor_forward(
                        p["duration"], i, s, m, self.cfg
                    )
                )
            durations = np.asarray(
                self._fn_cache["dur"](
                    self.params, ids, np.asarray(style["dp"])[None], text_mask
                )
            )
            t_real = max(min_frames, int(durations.sum() / self.cfg.speed))
            t_buck = self._bucket(t_real)
            latent_mask = np.zeros((1, t_buck), np.float32)
            latent_mask[:, :t_real] = 1.0
            if ("synth", t_buck) not in self._fn_cache:
                self._fn_cache[("synth", t_buck)] = jax.jit(self.synth_fn(t_buck))
            fn = self._fn_cache[("synth", t_buck)]
            wave, _ = fn(
                self.params, ids, text_mask, np.asarray(style["ttl"]),
                np.asarray(style["dp"]), latent_mask, seed,
            )
            waves.append(np.asarray(wave[0, : t_real * self.cfg.hop]))
        return np.clip(np.concatenate(waves), -1.0, 1.0)
