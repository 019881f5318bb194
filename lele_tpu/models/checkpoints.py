"""Run REAL ONNX checkpoints through the compiler with each family's
pipeline around them (VERDICT r1 #1: `--onnx PATH` runners).

Each adapter introspects the checkpoint's input signature, so the same code
runs both the committed real-topology fixtures (scripts/make_fixtures.py)
and the actual published exports — dropping SenseVoiceSmall / Silero /
YOLO26 / Supertonic files in requires zero code changes. Reference
pipelines: examples/{sensevoice,silero,yolo26,supertonic}/src/main.rs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _collapse(ids, blank_id=0):
    out, prev = [], -1
    for t in ids:
        t = int(t)
        if t != prev and t != blank_id:
            out.append(t)
        prev = t
    return out


class SenseVoiceOnnx:
    """WAV → CTC ids through a compiled SenseVoice-class encoder.

    Handles both the real FunASR 4-input signature
    (speech/speech_lengths/language/textnorm — main.rs:56-246) and
    plain speech-only exports. Frame counts pad to buckets so compile count
    stays bounded (runtime/bucketing design)."""

    FRAME_BUCKET = 32

    def __init__(self, path: str | Path, language: int = 3, textnorm: int = 0):
        from ..onnx.loader import OnnxModel

        self.model = OnnxModel.load(str(path))
        self.in_names = self.model.input_names()
        self.language = language
        self.textnorm = textnorm
        self._cms: dict[int, object] = {}
        from ..features import FbankConfig, FbankFrontend

        self.frontend = FbankFrontend(FbankConfig())

    def _compiled(self, t_pad: int):
        if t_pad not in self._cms:
            from ..compiler import compile_model

            shapes = {"speech": (1, t_pad, 560)}
            self._cms[t_pad] = compile_model(self.model, input_shapes=shapes)
        return self._cms[t_pad]

    def features(self, pcm: np.ndarray) -> np.ndarray:
        return np.asarray(self.frontend(np.asarray(pcm, np.float32)))[None]

    def logits(self, pcm: np.ndarray) -> np.ndarray:
        feats = self.features(pcm)
        t = feats.shape[1]
        t_pad = -(-t // self.FRAME_BUCKET) * self.FRAME_BUCKET
        padded = np.zeros((1, t_pad, feats.shape[2]), np.float32)
        padded[:, :t] = feats
        cm = self._compiled(t_pad)
        kwargs = {"speech": padded}
        if "speech_lengths" in self.in_names:
            kwargs["speech_lengths"] = np.asarray([t], np.int64)
        if "language" in self.in_names:
            kwargs["language"] = np.asarray([self.language], np.int32)
        if "textnorm" in self.in_names:
            kwargs["textnorm"] = np.asarray([self.textnorm], np.int32)
        outs = cm.run_np(**{k: v for k, v in kwargs.items()
                            if k in self.in_names})
        logits = np.asarray(outs[0])
        n_prefix = logits.shape[1] - t_pad
        return logits[:, : n_prefix + t]

    def _pcm_bucket(self, n_pcm: int) -> int:
        """Smallest pcm-length bucket covering n_pcm. One bucket step is
        FRAME_BUCKET LFR frames of audio (32·6·160 samples ≈ 1.9 s at the
        Kaldi defaults), so both the fbank program shape AND the encoder
        frame padding are shared by every input in the bucket — compile
        count is bounded by the number of distinct buckets, not the number
        of distinct wav lengths (VERDICT r2 #4; the reference handles any
        length in one binary, examples/sensevoice/src/main.rs:56-246)."""
        c = self.frontend.config
        step = self.FRAME_BUCKET * c.lfr_n * c.hop_len
        return max(-(-n_pcm // step) * step, step)

    def _true_frames(self, n_pcm: int) -> int:
        """LFR frame count the unpadded waveform produces (host formula,
        mirrors features/fbank.py + lfr_stack)."""
        c = self.frontend.config
        t_raw = max(c.num_frames(n_pcm), 0)
        return -(-t_raw // c.lfr_n) if c.apply_lfr else t_raw

    def transcribe(self, pcm: np.ndarray, blank_id: int = 0,
                   n_prefix: int | None = None) -> list[int]:
        """Waveform → CTC ids as ONE device program: fbank frontend (mask-
        aware CMVN over the valid samples only), frame padding, the
        compiled encoder graph, and the per-frame argmax all fused — the
        readback is [T] i32 ids, not [T, vocab] logits (the BASELINE.json
        north star applied to *compiled checkpoints*, not just the native
        model). Inputs pad to pcm-length buckets, so feeding a directory
        of arbitrary-length WAVs compiles once per bucket."""
        pcm = np.asarray(pcm, np.float32)
        n_bucket = self._pcm_bucket(len(pcm))
        key = ("ids", n_bucket)
        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        if key not in self._fn_cache:
            fn, cm, t_pad = self._make_ids_fn(n_bucket)
            # lower+compile once and call the executable directly: on a
            # tunneled TPU the per-call jit dispatch path costs ~40-70 ms;
            # a compiled-executable call is sub-ms (docs/PERF.md cold start)
            probe = np.zeros(n_bucket, np.float32)
            comp = fn.lower(cm.params, probe, np.int32(len(pcm))).compile()
            self._fn_cache[key] = (comp, cm, t_pad)
        fn, cm, t_pad = self._fn_cache[key]
        padded = np.zeros(n_bucket, np.float32)
        padded[: len(pcm)] = pcm
        ids, np_prefix = fn(cm.params, padded, np.int32(len(pcm)))
        ids = np.asarray(ids)
        if n_prefix is None:
            n_prefix = int(np_prefix)
        t = self._true_frames(len(pcm))
        return _collapse(ids[n_prefix : n_prefix + t], blank_id)

    def compile_count(self) -> int:
        """Distinct compiled ids-programs so far (bucketing observability)."""
        return len(getattr(self, "_fn_cache", {}))

    def _make_ids_fn(self, n_bucket: int):
        import jax
        import jax.numpy as jnp

        from ..features.fbank import fbank_features

        fb = self.frontend
        # frame count is static given the bucket length: probe w/ eval_shape
        t = jax.eval_shape(
            lambda p: fbank_features(p, fb.config, fb.window, fb.mel_t),
            jax.ShapeDtypeStruct((n_bucket,), jnp.float32),
        ).shape[0]
        t_pad = -(-t // self.FRAME_BUCKET) * self.FRAME_BUCKET
        cm = self._compiled(t_pad)
        names = self.in_names

        def run(params, pcm, n_valid):
            feats, _mask = fbank_features(
                pcm, fb.config, fb.window, fb.mel_t, n_valid=n_valid
            )
            padded = jnp.zeros((1, t_pad, feats.shape[-1]), feats.dtype)
            padded = jax.lax.dynamic_update_slice(
                padded, feats[None].astype(padded.dtype), (0, 0, 0)
            )
            c = fb.config
            t_raw = jnp.maximum((n_valid - c.frame_len) // c.hop_len + 1, 0)
            valid = -(-t_raw // c.lfr_n) if c.apply_lfr else t_raw
            inputs = {"speech": padded}
            if "speech_lengths" in names:
                inputs["speech_lengths"] = jnp.reshape(
                    valid, (1,)).astype(cm._canon["speech_lengths"])
            if "language" in names:
                inputs["language"] = jnp.asarray(
                    [self.language], cm._canon["language"])
            if "textnorm" in names:
                inputs["textnorm"] = jnp.asarray(
                    [self.textnorm], cm._canon["textnorm"])
            outs = cm._walk_fn(params, {k: v for k, v in inputs.items()
                                        if k in names})
            logits = outs[0]
            n_prefix = logits.shape[1] - t_pad
            ids = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            return ids, n_prefix

        return jax.jit(run), cm, t_pad


class SileroOnnx:
    """Streaming VAD over a compiled Silero-class checkpoint: 512-sample
    chunks, packed [2,1,128] recurrent state (donated buffer — the
    workspace-reuse analog), dual-sr If handled inside the graph
    (main.rs:96-131)."""

    def __init__(self, path: str | Path, chunk: int = 512, scale: float = 32768.0):
        from ..compiler import compile_model

        self.cm = compile_model(str(path), donate=["state"])
        self.in_names = list(self.cm.input_order)
        self.chunk = chunk
        self.scale = scale

    def speech_probs(self, pcm: np.ndarray, sr: int = 16000,
                     max_chunks: int | None = None) -> np.ndarray:
        """Whole-utterance probs as ONE device program: the compiled step
        graph wrapped in a lax.scan carrying the recurrent state — one
        dispatch + one [n]-float readback instead of a host round trip per
        512-sample chunk (the reference's streaming loop, main.rs:110-130,
        is per-chunk because it's single-core; on a remote TPU per-chunk
        dispatch costs ~33 ms RTT each)."""
        import jax

        n = len(pcm) // self.chunk
        if max_chunks is not None:
            n = min(n, max_chunks)
        idx = (np.arange(n)[:, None] * self.chunk
               + np.arange(self.chunk)[None, :])
        chunks = (np.asarray(pcm)[idx] * self.scale).astype(np.float32)
        key = ("scan", n, sr)
        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(self._scan_fn(sr))
        probs = self._fn_cache[key](self.cm.params, chunks)
        return np.asarray(probs)

    def _scan_fn(self, sr: int):
        import jax
        import jax.numpy as jnp

        cm = self.cm
        names = self.in_names
        sr_v = jnp.asarray([sr], cm._canon[names[2]])

        def run(params, chunks):
            def body(state, x):
                outs = cm._walk_fn(
                    params, dict(zip(names, [x[None], state, sr_v]))
                )
                return outs[1], jnp.reshape(outs[0], ())

            s0 = jnp.zeros((2, 1, 128), jnp.float32)
            _, probs = jax.lax.scan(body, s0, chunks)
            return probs

        return run

    def speech_probs_hostloop(self, pcm: np.ndarray, sr: int = 16000,
                              max_chunks: int | None = None) -> np.ndarray:
        """Per-chunk host streaming loop — the parity oracle for the scan
        path, and the shape real streaming input arrives in."""
        state = np.zeros((2, 1, 128), np.float32)
        n = len(pcm) // self.chunk
        if max_chunks is not None:
            n = min(n, max_chunks)
        probs = np.zeros(n, np.float32)
        sr_arr = np.asarray([sr], np.int64)
        for i in range(n):
            x = (pcm[i * self.chunk : (i + 1) * self.chunk] * self.scale)
            out = self.cm.run_np(x[None].astype(np.float32), state, sr_arr)
            probs[i] = float(np.asarray(out[0]).reshape(-1)[0])
            state = out[1]
        return probs

    def segments(self, pcm: np.ndarray, sr: int = 16000, threshold=0.3):
        from .silero import VadSegmentConfig, collect_segments

        probs = self.speech_probs(pcm, sr)
        return collect_segments(
            probs,
            VadSegmentConfig(threshold=threshold, sample_rate=sr,
                             chunk=self.chunk),
        )


class YoloOnnx:
    """Compiled YOLO-class detector: image → NMS-free decode
    (main.rs:41-118; logits/boxes either as two outputs or one [1,300,4+C])."""

    def __init__(self, path: str | Path, img_size: int = 640,
                 compute: str | None = None):
        """compute="bfloat16" runs the compiled graph under the same TPU
        dtype policy as the native detector (models/yolo26.py CFG.dtype):
        bf16 weights/activations, 1-pass MXU convs. Default None keeps
        f32 + HIGHEST precision for ORT-grade parity."""
        from ..compiler import compile_model
        from ..onnx.loader import OnnxModel

        model = OnnxModel.load(str(path))
        name = model.input_names()[0]
        self.cm = compile_model(
            model, input_shapes={name: (1, 3, img_size, img_size)},
            pack_image_stem=True,  # s2d stem rewrite (compiler/s2d_stem.py)
            compute=compute,
            precision="default" if compute else None,
        )
        self.img_size = img_size

    def forward(self, x_chw: np.ndarray):
        return self.cm.run_np(np.asarray(x_chw, np.float32))

    def prepare(self, image: np.ndarray):
        """Host preprocess (PIL-nearest resize parity) + upload once; the
        returned device array can be passed to `forward_device` repeatedly
        — the reference's bench times forward only (yolo26 main.rs:49-84),
        preprocessing outside the loop.

        Fast path (stem rewrite active + u8 HWC input): the C++ fused
        resize+s2d-pack (runtime/native pack_s2d_u8) on the raw u8 image,
        then ONE /255 on the small packed array — bit-identical to
        preprocess → NCHW → pack_host (same nearest map, /255 commutes
        with the permutation) at a fraction of the host time."""
        import jax.numpy as jnp

        from ..utils.image import preprocess, preprocess_s2d

        if (self.cm.input_packers and isinstance(image, np.ndarray)
                and image.dtype == np.uint8 and image.ndim == 3
                and image.shape[2] == 3):
            (orig_shape, _), = self.cm.input_packers.values()
            if orig_shape == (1, 3, self.img_size, self.img_size):
                xp = preprocess_s2d(image, self.img_size)  # u8 packed
                return jnp.asarray(xp.astype(np.float32) / 255.0)
        x = preprocess(image, self.img_size)  # [1, H, W, 3] float
        x = np.transpose(np.asarray(x), (0, 3, 1, 2))  # ONNX NCHW
        for orig_shape, packer in self.cm.input_packers.values():
            if x.shape == orig_shape:
                x = packer(x)  # host s2d pack (stem rewrite active)
        return jnp.asarray(x)

    def forward_device(self, x_dev):
        """Forward on a device-resident input (no per-call upload), reusing
        the engine's already-compiled program (a fresh jit of the same walk
        would recompile the whole conv graph)."""
        return self.cm._jit(self.cm.params, (), (x_dev,))

    def detect(self, image: np.ndarray, threshold: float = 0.25):
        outs = self.forward_device(self.prepare(image))
        return self.decode(outs, threshold)

    def decode(self, outs, threshold: float = 0.25):
        from . import decode_detections

        if len(outs) >= 2 and np.ndim(outs[1]) == 3 and outs[1].shape[-1] == 4:
            logits, boxes = np.asarray(outs[0]), np.asarray(outs[1])
        else:  # single [1, N, 4+C]
            y = np.asarray(outs[0])
            boxes, logits = y[..., :4], y[..., 4:]
        return decode_detections(logits, boxes, threshold)


class SupertonicOnnx:
    """The 4-sub-model TTS chained through compiled programs with the
    5-step flow-matching loop on device values (main.rs:124-285)."""

    # accepted filenames per sub-model: our fixture names AND the names the
    # published Supertone exports ship under (scripts/fetch_models.py drops
    # them in as-is — zero renaming glue)
    _NAMES = {
        "dp": ("supertonic_dp.onnx", "duration_predictor.onnx"),
        "te": ("supertonic_te.onnx", "text_encoder.onnx"),
        "ve": ("supertonic_ve.onnx", "vector_estimator.onnx"),
        "voc": ("supertonic_voc.onnx", "vocoder.onnx"),
    }

    def __init__(self, model_dir: str | Path, steps: int = 5):
        from ..compiler import compile_model

        d = Path(model_dir)

        def find(key):
            for name in self._NAMES[key]:
                if (d / name).exists():
                    return str(d / name)
            raise FileNotFoundError(
                f"none of {self._NAMES[key]} in {d} (run "
                "scripts/fetch_models.py or scripts/make_fixtures.py)")

        self.dp = compile_model(find("dp"))
        self.te = compile_model(find("te"))
        self.ve = compile_model(find("ve"))
        self.voc = compile_model(find("voc"))
        self.steps = steps

    def synthesize_latent(self, ids, style, mask, latent_len: int, seed=0):
        """ids [1,Tn] i64; style [1,S]; mask [1,Tn] → (durations, wave).

        ONE fused device program: DurationPredictor + TextEncoder + the
        5-step flow-matching loop (lax.fori_loop — the latent never leaves
        the device between steps) + Vocoder. The reference chains the four
        generated models through host copies per step (main.rs:124-285,
        `.data.to_vec()`); SURVEY §3.4 names this fusion the TPU redesign.
        Host RNG supplies the noise (fixed-seed parity with the oracle)."""
        import jax

        ids = np.asarray(ids)
        key = ("fused", ids.shape[-1], latent_len)
        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        emb_dim = self._emb_dim(ids, style, mask)
        rng = np.random.default_rng(seed)
        noise = rng.standard_normal((1, emb_dim, latent_len)).astype(np.float32)
        args = (
            self.dp.params, self.te.params, self.ve.params, self.voc.params,
            self._canon_in(self.dp, 0, ids), np.asarray(style, np.float32),
            np.asarray(mask, np.float32), noise,
        )
        if key not in self._fn_cache:
            # direct lowered-executable calls skip the per-call jit dispatch
            # path (~40-70 ms each on a tunneled TPU; docs/PERF.md)
            self._fn_cache[key] = (
                jax.jit(self._fused_fn(latent_len)).lower(*args).compile()
            )
        dur, wave = self._fn_cache[key](*args)
        return np.asarray(dur), np.asarray(wave)

    def _canon_in(self, cm, i: int, v):
        name = cm.input_order[i]
        return np.asarray(v).astype(cm._canon[name])

    def _emb_dim(self, ids, style, mask) -> int:
        """Static latent channel count = TextEncoder's output dim."""
        if not hasattr(self, "_emb_dim_cache"):
            import jax

            specs = [
                jax.ShapeDtypeStruct(np.asarray(a).shape, self.te._canon[n])
                for n, a in zip(self.te.input_order, (ids, style, mask))
            ]
            out = jax.eval_shape(
                lambda p, a, b, c: self.te._walk_fn(
                    p, dict(zip(self.te.input_order, (a, b, c)))),
                {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                 for k, v in self.te.params.items()}, *specs,
            )
            self._emb_dim_cache = out[0].shape[1]
        return self._emb_dim_cache

    def _fused_fn(self, latent_len: int):
        import jax
        import jax.numpy as jnp

        dp, te, ve, voc = self.dp, self.te, self.ve, self.voc
        steps = self.steps

        def run(dp_p, te_p, ve_p, voc_p, ids, style, mask, noise):
            (dur,) = dp._walk_fn(dp_p, dict(zip(dp.input_order,
                                                (ids, style, mask))))
            (emb,) = te._walk_fn(te_p, dict(zip(te.input_order,
                                                (ids, style, mask))))
            emb = emb.astype(jnp.float32)
            # nearest upsample of text emb to the latent length (static idx)
            tn = emb.shape[-1]
            idx = np.minimum(np.arange(latent_len) * tn // latent_len, tn - 1)
            emb_l = jnp.take(emb, jnp.asarray(idx), axis=-1)

            def body(s, xt):
                t_step = (s.astype(jnp.float32) / steps).reshape(1)
                (v,) = ve._walk_fn(ve_p, dict(zip(
                    ve.input_order, (xt, emb_l, style, t_step))))
                return xt + v.astype(jnp.float32) / steps

            xt = jax.lax.fori_loop(0, steps, body, noise)
            (wave,) = voc._walk_fn(voc_p, {voc.input_order[0]: xt})
            return dur, wave

        return run

    def synthesize_latent_hostloop(self, ids, style, mask,
                                   latent_len: int, seed=0):
        """Host-chained oracle: 4 separate dispatches + per-step host copies
        (the reference's actual execution shape)."""
        (dur,) = self.dp.run_np(ids, style, mask)
        (emb,) = self.te.run_np(ids, style, mask)
        emb = np.asarray(emb, np.float32)
        idx = np.minimum(
            (np.arange(latent_len) * emb.shape[-1] // latent_len),
            emb.shape[-1] - 1,
        )
        emb_l = emb[..., idx]
        rng = np.random.default_rng(seed)
        xt = rng.standard_normal(
            (1, emb.shape[1], latent_len)).astype(np.float32)
        for s in range(self.steps):
            t_step = np.asarray([s / self.steps], np.float32)
            (v,) = self.ve.run_np(xt, emb_l, style, t_step)
            xt = xt + np.asarray(v, np.float32) / self.steps
        (wave,) = self.voc.run_np(xt)
        return np.asarray(dur), np.asarray(wave)
