"""Native C++ extension suite: build, ONNX scan parity, WAV decode parity.

The backend-equivalence pattern (tests/verify_neon_accuracy.rs) applied to
the native layer: every native function must match its Python reference
bit-for-bit. Skips cleanly when no toolchain is present (stub-on-failure
spirit, lele-build lib.rs:193)."""

import numpy as np
import pytest

from lele_tpu.runtime.native import get_native

nat = get_native()
pytestmark = pytest.mark.skipif(nat is None, reason="native toolchain unavailable")


def test_scan_initializers_matches_python_loader():
    from lele_tpu.onnx import OnnxModel, builder as ob
    from lele_tpu.onnx.loader import DTYPE_MAP

    rng = np.random.default_rng(0)
    arrays = {
        "wf": rng.standard_normal((17, 5)).astype(np.float32),
        "wi": rng.integers(0, 100, (9,)).astype(np.int64),
        "wb": rng.integers(0, 255, (33,)).astype(np.uint8),
    }
    bs = ob.build_model_bytes(
        [ob.node("Identity", ["x"], ["y"])],
        inputs=[ob.value_info("x", 1, [1])],
        outputs=[ob.value_info("y", 1, [1])],
        initializers=[ob.tensor_from_array(v, k) for k, v in arrays.items()],
    )
    metas = nat.scan_initializers(bs)
    assert {m[0] for m in metas} == set(arrays)
    for name, dtype, dims, off, ln in metas:
        view = np.frombuffer(bs[off : off + ln], dtype=DTYPE_MAP[dtype]).reshape(dims)
        np.testing.assert_array_equal(view, arrays[name])
    # python loader agrees
    m = OnnxModel.from_bytes(bs)
    for name in arrays:
        np.testing.assert_array_equal(m.initializer_array(name), arrays[name])


def test_scan_rejects_garbage():
    with pytest.raises(ValueError):
        nat.scan_initializers(b"\xff\xff\xff\xff not a proto")


def test_scan_rejects_truncated_model():
    """Truncation anywhere in a valid model must raise, never read OOB
    (ADVICE r1: unvalidated varint length segfaulted on a 20-byte input)."""
    from lele_tpu.onnx import builder as ob

    w = np.arange(64, dtype=np.float32).reshape(8, 8)
    bs = ob.build_model_bytes(
        [ob.node("Identity", ["x"], ["y"])],
        inputs=[ob.value_info("x", 1, [1])],
        outputs=[ob.value_info("y", 1, [1])],
        initializers=[ob.tensor_from_array(w, "weight_with_a_long_name")],
    )
    for cut in [5, 10, 20, len(bs) // 2, len(bs) - 7, len(bs) - 1]:
        try:
            metas = nat.scan_initializers(bs[:cut])
        except ValueError:
            continue  # rejected: good
        # if accepted, every reported span must lie inside the buffer
        for _name, _dt, _dims, off, ln in metas:
            assert off + ln <= cut


def test_scan_rejects_oversized_raw_data_claim():
    """raw_data whose declared length runs past EOF must raise."""
    from lele_tpu.onnx import builder as ob

    w = np.ones(16, dtype=np.float32)
    bs = bytearray(
        ob.build_model_bytes(
            [ob.node("Identity", ["x"], ["y"])],
            inputs=[ob.value_info("x", 1, [1])],
            outputs=[ob.value_info("y", 1, [1])],
            initializers=[ob.tensor_from_array(w, "w")],
        )
    )
    # find the raw_data payload (64 bytes of 1.0f) and inflate the varint
    # length byte that precedes it (64 = 0x40)
    payload = w.tobytes()
    idx = bytes(bs).find(payload)
    assert idx > 0 and bs[idx - 1] == 64
    bs[idx - 1] = 0x7F  # claim 127 bytes; only 64 remain
    with pytest.raises(ValueError):
        nat.scan_initializers(bytes(bs[: idx + 64]))


def test_wav_decode_parity_16bit_stereo():
    import struct

    sr = 16000
    n = 500
    left = (np.sin(np.arange(n) / 5) * 0.5 * 32767).astype("<i2")
    right = (np.cos(np.arange(n) / 5) * 0.5 * 32767).astype("<i2")
    inter = np.empty(n * 2, "<i2")
    inter[0::2], inter[1::2] = left, right
    pcm = inter.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
    dat = b"data" + struct.pack("<I", len(pcm))
    raw, got_sr = nat.decode_wav(hdr + fmt + dat + pcm)
    y = np.frombuffer(raw, np.float32)
    assert got_sr == sr and len(y) == n
    want = (left.astype(np.float64) + right) / 2 / 32768.0
    np.testing.assert_allclose(y, want, atol=1e-6)


def test_wav_decode_float32():
    import struct

    x = np.linspace(-1, 1, 256).astype(np.float32)
    pcm = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
    dat = b"data" + struct.pack("<I", len(pcm))
    raw, sr = nat.decode_wav(hdr + fmt + dat + pcm)
    np.testing.assert_allclose(np.frombuffer(raw, np.float32), x)


def test_wav_decode_garbage_raises():
    with pytest.raises(ValueError):
        nat.decode_wav(b"definitely not a wav file" * 10)


def test_wav_decode_truncated_fmt_raises():
    """fmt chunk claiming size>=16 but truncated must raise, not read OOB
    (ADVICE r1: reachable from the HTTP /recognize endpoint)."""
    import struct

    hdr = b"RIFF" + struct.pack("<I", 100) + b"WAVE"
    fmt_hdr = b"fmt " + struct.pack("<I", 16)  # claims 16-byte body...
    blob = hdr + fmt_hdr + b"\x01\x00\x02\x00"  # ...provides 4
    with pytest.raises(ValueError):
        nat.decode_wav(blob)


def test_wav_decode_truncated_data_clamps():
    """data chunk claiming more bytes than present decodes what exists."""
    import struct

    x = np.linspace(-1, 1, 64).astype(np.float32)
    pcm = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
    dat = b"data" + struct.pack("<I", len(pcm) * 4)  # lies: 4x actual
    raw, _sr = nat.decode_wav(hdr + fmt + dat + pcm)
    np.testing.assert_allclose(np.frombuffer(raw, np.float32), x)


def test_read_wav_uses_native_and_matches_python(tmp_path):
    from lele_tpu.utils import wav as wav_mod

    x = (np.sin(np.arange(2000) / 9) * 0.7).astype(np.float32)
    wav_mod.write_wav(tmp_path / "t.wav", x, 22050)
    y, sr = wav_mod.read_wav(tmp_path / "t.wav")
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_content_hash_stable():
    h1 = nat.content_hash(b"abc")
    h2 = nat.content_hash(b"abc")
    h3 = nat.content_hash(b"abd")
    assert h1 == h2 != h3


def test_decode_wav_files_threaded_batch(tmp_path):
    """Native batch loader: N files decode in parallel off the GIL and
    match the single-file decoder exactly; a bad file raises with its name."""
    import numpy as np

    from lele_tpu.runtime.dataloader import decode_wav_files
    from lele_tpu.serving import encode_wav
    from lele_tpu.utils.wav import read_wav

    paths = []
    rng = np.random.default_rng(5)
    for i in range(12):
        pcm = (rng.standard_normal(4000 + 321 * i) * 0.2).astype(np.float32)
        p = tmp_path / f"a{i:02d}.wav"
        p.write_bytes(encode_wav(pcm, 16000))
        paths.append(p)
    got = decode_wav_files(paths)
    assert len(got) == 12
    for p, (pcm, sr) in zip(paths, got):
        want, wsr = read_wav(p)
        assert sr == wsr
        np.testing.assert_array_equal(pcm, np.asarray(want, np.float32))

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFxxxxWAVE" + b"\x00" * 8)
    import pytest

    with pytest.raises(ValueError, match="bad.wav"):
        decode_wav_files([paths[0], bad])
    with pytest.raises(ValueError, match="missing.wav"):
        decode_wav_files([tmp_path / "missing.wav"])


def test_wav_batch_loader_prefetch_order(tmp_path):
    import numpy as np

    from lele_tpu.runtime.dataloader import WavBatchLoader
    from lele_tpu.serving import encode_wav

    rng = np.random.default_rng(6)
    paths = []
    for i in range(7):
        pcm = (rng.standard_normal(1000 + i) * 0.1).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        p.write_bytes(encode_wav(pcm, 16000))
        paths.append(p)
    loader = WavBatchLoader(paths, batch_size=3)
    assert len(loader) == 3
    batches = list(loader)
    assert [len(b) for b in batches] == [3, 3, 1]
    # order preserved: lengths encode the file index
    lens = [len(p) for b in batches for p, _ in b]
    assert lens == [1000 + i for i in range(7)]
    # error propagation through the prefetch thread
    import pytest

    bad = tmp_path / "nope.wav"
    with pytest.raises(ValueError):
        list(WavBatchLoader([paths[0], bad], batch_size=1))


# ---------------------------------------------------------------------------
# fused resize + s2d pack (pack_s2d_u8)


def test_pack_s2d_u8_matches_numpy_chain():
    """C++ fused nearest-resize + s2d pack ≡ the numpy reference chain
    (nearest_resize → reshape/transpose pack) byte-for-byte, including
    non-square and upscale inputs."""
    from lele_tpu.runtime.native import get_native
    from lele_tpu.utils.image import nearest_resize, preprocess_s2d

    nat = get_native()
    if nat is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    for h, w, size in [(480, 640, 640), (640, 640, 640), (123, 457, 128),
                       (64, 48, 256)]:
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        g = size // 4
        x = nearest_resize(img, size)
        ref = np.ascontiguousarray(
            x.reshape(g, 4, g, 4, 3).transpose(0, 2, 1, 3, 4)
        ).reshape(1, g, g, 48)
        got = preprocess_s2d(img, size)  # native fast path
        assert got.dtype == np.uint8
        assert np.array_equal(got, ref), (h, w, size)


def test_pack_s2d_u8_rejects_bad_dims():
    from lele_tpu.runtime.native import get_native

    nat = get_native()
    if nat is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    import pytest

    with pytest.raises(ValueError):
        nat.pack_s2d_u8(b"\0" * 12, 2, 2, 3, 7, 4)     # size % block
    with pytest.raises(ValueError):
        nat.pack_s2d_u8(b"\0" * 11, 2, 2, 3, 8, 4)     # byte count


def test_yolo_onnx_prepare_u8_fast_path_exact():
    """YoloOnnx.prepare's u8 fast path (C++ pack + one /255) is
    bit-identical to the f32 preprocess → NCHW → pack_host chain."""
    from pathlib import Path

    fixtures = Path(__file__).resolve().parents[1] / "fixtures"
    if not (fixtures / "yolo26.onnx").exists():
        import pytest

        pytest.skip("fixture not present")
    from lele_tpu.models.checkpoints import YoloOnnx
    from lele_tpu.utils.image import preprocess

    yo = YoloOnnx(fixtures / "yolo26.onnx", img_size=640)
    rng = np.random.default_rng(9)
    img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    fast = np.asarray(yo.prepare(img))
    x = np.transpose(np.asarray(preprocess(img, 640)), (0, 3, 1, 2))
    (orig_shape, packer), = yo.cm.input_packers.values()
    assert x.shape == orig_shape
    slow = np.asarray(packer(x), np.float32)
    assert np.array_equal(fast, slow)
