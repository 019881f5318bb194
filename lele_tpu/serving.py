"""Serving engines: the web-demo engine surface, TPU-side.

Parity surface (/root/reference/examples/web-demo/src/lib.rs:48-427):
`SenseVoiceEngine::recognize`, `Yolo26Engine::detect`, TTS engine with
`load_style`/`synthesize`, `decode_wav`/`encode_wav`. The wasm target is
N/A on TPU (docs/WEB_DEMO.md); these classes are the same product surface
for a server process: bytes in → results out, everything hot inside cached
jitted programs.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Any

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono f32 samples, sample_rate); native C++ fast path,
    pure-Python byte parser fallback (no temp-file round trip)."""
    from .utils.wav import decode_wav_bytes

    return decode_wav_bytes(data, label="<request>")


def resample(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (scipy) with nearest fallback."""
    if sr_in == sr_out:
        return pcm
    try:
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(sr_in, sr_out)
        return resample_poly(pcm, sr_out // g, sr_in // g).astype(np.float32)
    except ImportError:  # pragma: no cover
        idx = (np.arange(int(len(pcm) * sr_out / sr_in)) * sr_in / sr_out)
        return pcm[np.minimum(idx.astype(int), len(pcm) - 1)]


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    import tempfile

    from .utils.wav import write_wav

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        write_wav(f.name, samples, sr)
        f.seek(0)
        return f.read()


@dataclass
class SenseVoiceEngine:
    """recognize(wav_bytes) → token ids (or text with a vocab)."""

    model: Any = None
    tokenizer: Any = None

    def __post_init__(self):
        if self.model is None:
            from .models import SenseVoiceModel

            self.model = SenseVoiceModel()
            self.model.init(0)

    def warm(self, seconds: float = 2.0, sr: int = 16000):
        """Precompile the bucket program before taking traffic."""
        import numpy as _np

        self.model.transcribe_ids(_np.zeros(int(seconds * sr), _np.float32))
        return self

    def recognize(self, wav_bytes: bytes):
        pcm, sr = decode_wav(wav_bytes)
        if sr != 16000:
            pcm = resample(pcm, sr, 16000)
        ids = self.model.transcribe_ids(pcm)
        if self.tokenizer is not None:
            return self.tokenizer.decode(ids)
        return ids

    def recognize_batch(self, wavs: list[bytes]):
        """Batch of utterances through ONE padded program
        (SenseVoiceModel.transcribe_batch) — the serving-throughput path."""
        pcms = []
        for data in wavs:
            pcm, sr = decode_wav(data)
            if sr != 16000:
                pcm = resample(pcm, sr, 16000)
            pcms.append(pcm)
        ids = self.model.transcribe_batch(pcms)
        if self.tokenizer is not None:
            return [self.tokenizer.decode(i) for i in ids]
        return ids


@dataclass
class Yolo26Engine:
    """detect(image_array | jpeg_bytes) → list of detections."""

    model: Any = None
    conf_threshold: float = 0.25
    mesh: Any = None  # serving dp mesh (server.py --mesh auto)
    _fn: Any = None

    def __post_init__(self):
        if self.model is None:
            from .models import Yolo26Model

            self.model = Yolo26Model()
            self.model.init(0)

    def _to_input(self, image) -> np.ndarray:
        from .utils.image import preprocess

        if isinstance(image, (bytes, bytearray)):
            from PIL import Image

            image = np.asarray(Image.open(io.BytesIO(image)).convert("RGB"))
        return preprocess(image, self.model.cfg.img_size)[0]

    def detect(self, image) -> list[dict]:
        return self.detect_batch([image])[0]

    def detect_batch(self, images: list) -> list[list[dict]]:
        """One batched forward for N images (batch throughput scales nearly
        linearly, docs/PERF.md) — the MicroBatcher serving path. The batch
        dim pads to powers of two up to 8, bounding the compile count."""
        import jax

        from .models import decode_detections

        from .runtime.bucketing import pad_batch_pow2

        if not images:
            return []
        arrs = [self._to_input(im) for im in images]
        n = len(arrs)
        nb = pad_batch_pow2(n)
        x = np.zeros((nb,) + arrs[0].shape, np.float32)
        for i, a in enumerate(arrs):
            x[i] = a
        if self._fn is None:
            self._fn = jax.jit(self.model.forward_fn())
        if self.mesh is not None:
            from .parallel.sharding import dp_put, replicate

            if not getattr(self, "_mesh_placed", False):
                self.model.params = jax.device_put(
                    self.model.params, replicate(self.mesh))
                self._mesh_placed = True
            (x,) = dp_put(self.mesh, (x,))
            with self.mesh:
                outs = self._fn(self.model.params, x)
        else:
            outs = self._fn(self.model.params, x)
        scores = np.asarray(outs[0])
        boxes = np.asarray(outs[1])
        return [
            decode_detections(scores[i : i + 1], boxes[i : i + 1],
                              self.conf_threshold)
            for i in range(n)
        ]


@dataclass
class TtsEngine:
    """load_style(name_or_path) + synthesize(text) → wav bytes."""

    tts: Any = None
    styles: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.tts is None:
            from .models import SupertonicTts

            self.tts = SupertonicTts()
            self.tts.init(0)

    def load_style(self, path: str, name: str | None = None):
        from .models import load_voice_style

        style = load_voice_style(path)
        self.styles[name or path] = style
        return style

    def synthesize(self, text: str, voice: str | None = None, lang: str = "en",
                   seed: int = 0) -> bytes:
        if voice and voice in self.styles:
            style = self.styles[voice]
        elif self.styles:
            style = next(iter(self.styles.values()))
        else:
            rng = np.random.default_rng(7)
            style = {
                "ttl": rng.standard_normal(self.tts.cfg.d_style).astype(np.float32),
                "dp": rng.standard_normal(self.tts.cfg.d_style).astype(np.float32),
            }
        wave = self.tts.synthesize(text, style, lang=lang, seed=seed)
        return encode_wav(wave, self.tts.cfg.sample_rate)
