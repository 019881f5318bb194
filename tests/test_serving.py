"""Serving-engine suite (web-demo lib.rs surface: recognize/detect/
synthesize + wav codecs), on tiny configs."""

import numpy as np

from lele_tpu.serving import (
    SenseVoiceEngine,
    TtsEngine,
    Yolo26Engine,
    decode_wav,
    encode_wav,
)
from lele_tpu.models import (
    SenseVoiceConfig,
    SenseVoiceModel,
    SupertonicConfig,
    SupertonicTts,
    Yolo26Config,
    Yolo26Model,
)

rng = np.random.default_rng(23)


def test_wav_codec_roundtrip():
    x = (np.sin(np.arange(3200) / 6) * 0.6).astype(np.float32)
    data = encode_wav(x, 16000)
    y, sr = decode_wav(data)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_sensevoice_engine_recognize():
    m = SenseVoiceModel(
        SenseVoiceConfig(n_layers=1, d_model=32, ffn_dim=64, vocab_size=40,
                         n_heads=2, dtype="float32")
    )
    m.init(0)
    eng = SenseVoiceEngine(model=m)
    wav = encode_wav((rng.standard_normal(12000) * 0.1).astype(np.float32), 16000)
    ids = eng.recognize(wav)
    assert isinstance(ids, list)

    class FakeTok:
        def decode(self, ids):
            return " ".join(map(str, ids))

    eng.tokenizer = FakeTok()
    text = eng.recognize(wav)
    assert isinstance(text, str)


def test_sensevoice_engine_resamples_odd_rate():
    m = SenseVoiceModel(
        SenseVoiceConfig(n_layers=1, d_model=32, ffn_dim=64, vocab_size=40,
                         n_heads=2, dtype="float32")
    )
    m.init(0)
    eng = SenseVoiceEngine(model=m)
    wav = encode_wav((rng.standard_normal(22050) * 0.1).astype(np.float32), 22050)
    ids = eng.recognize(wav)
    assert isinstance(ids, list)


def test_yolo_engine_detect_from_array_and_bytes():
    m = Yolo26Model(
        Yolo26Config(img_size=128, widths=(8, 16, 32, 64), dtype="float32")
    )
    m.init(0)
    eng = Yolo26Engine(model=m, conf_threshold=0.0)
    img = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
    dets = eng.detect(img)
    assert len(dets) > 0 and {"xyxy", "score", "class_id"} <= set(dets[0])
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG")
    dets2 = eng.detect(buf.getvalue())
    assert len(dets2) > 0


def test_yolo_engine_detect_batch_matches_single():
    """detect_batch pads the batch dim (pow2 ≤ 8) — per-image results must
    be identical to single detect, dead rows invisible."""
    m = Yolo26Model(
        Yolo26Config(img_size=128, widths=(8, 16, 32, 64), dtype="float32")
    )
    m.init(0)
    eng = Yolo26Engine(model=m, conf_threshold=0.0)
    imgs = [rng.integers(0, 255, (200 + 8 * i, 320, 3)).astype(np.uint8)
            for i in range(3)]
    batch = eng.detect_batch(imgs)          # n=3 rides the nb=4 program
    singles = [eng.detect(im) for im in imgs]
    assert len(batch) == 3
    for b, s in zip(batch, singles):
        assert len(b) == len(s)
        for db, ds in zip(b, s):
            assert db["class_id"] == ds["class_id"]
            np.testing.assert_allclose(db["xyxy"], ds["xyxy"], atol=1e-4)
            np.testing.assert_allclose(db["score"], ds["score"], atol=1e-5)


def test_tts_engine_synthesize(tmp_path):
    tts = SupertonicTts(
        SupertonicConfig(n_text_layers=1, n_est_layers=1, latent_buckets=(32,))
    )
    tts.init(0)
    eng = TtsEngine(tts=tts)
    import json

    style_path = tmp_path / "v.json"
    style_path.write_text(json.dumps({
        "ttl": (rng.standard_normal(128) * 0.3).tolist(),
        "dp": (rng.standard_normal(128) * 0.3).tolist(),
    }))
    eng.load_style(str(style_path), "v1")
    wav = eng.synthesize("Hello engine.", voice="v1")
    y, sr = decode_wav(wav)
    assert sr == tts.cfg.sample_rate and len(y) > 0
