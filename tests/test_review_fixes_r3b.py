"""Regressions for the r3 onnx/parallel/serving/native review."""

import struct

import numpy as np
import pytest

rng = np.random.default_rng(99)


def test_external_data_tensor_raises_not_zeros():
    """A non-empty tensor with no inline payload (external data) must raise
    — zeros would run a garbage model with no error anywhere."""
    from lele_tpu.onnx import builder as ob
    from lele_tpu.onnx.loader import OnnxModel, tensor_to_array
    from lele_tpu.onnx.schema import Proto

    t = ob.tensor_from_array(np.ones((2, 3), np.float32), "w")
    t.pop("raw_data", None)
    t["data_location"] = 1  # EXTERNAL
    with pytest.raises(ValueError, match="external data"):
        tensor_to_array(Proto(t, "TensorProto"))
    t2 = ob.tensor_from_array(np.ones((2, 3), np.float32), "w")
    t2.pop("raw_data", None)
    with pytest.raises(ValueError, match="no ""recognized payload".replace('""', '')):
        tensor_to_array(Proto(t2, "TensorProto"))


def test_long_string_attribute_decodes():
    """>256-byte string attrs ride wire.py's zero-copy memoryview fast path
    — parse_attr must still .decode() them (Einsum equations, doc strings)."""
    from lele_tpu.onnx import builder as ob
    from lele_tpu.onnx.schema import REGISTRY, Proto
    from lele_tpu.onnx.wire import decode, encode
    from lele_tpu.ops.registry import parse_attr

    long_s = "b" * 400
    node = ob.node("Identity", ["x"], ["y"], custom=long_s)
    bs = encode(node, REGISTRY["NodeProto"], REGISTRY)
    back = Proto(decode(bs, REGISTRY["NodeProto"], REGISTRY), "NodeProto")
    (attr,) = [a for a in back.attribute if a.name == "custom"]
    assert parse_attr(attr) == long_s


def _wav_extensible_float(sr=16000, n=64):
    """WAVE_FORMAT_EXTENSIBLE container with IEEE-float SubFormat."""
    x = (np.sin(np.linspace(0, 6.0, n)) * 0.5).astype(np.float32)
    pcm = x.tobytes()
    sub = struct.pack("<H", 3) + b"\x00\x00" + bytes(12)  # GUID: fmt 3
    fmt_body = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32) \
        + struct.pack("<H", 22) + struct.pack("<H", 32) \
        + struct.pack("<I", 0x1) + sub
    fmt = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    dat = b"data" + struct.pack("<I", len(pcm)) + pcm
    hdr = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(dat)) + b"WAVE"
    return hdr + fmt + dat, x


def test_extensible_float_wav_decodes_correctly():
    from lele_tpu.utils.wav import decode_wav_bytes

    data, want = _wav_extensible_float()
    # both decoders (native attempts first, python fallback) must agree
    got, sr = decode_wav_bytes(data)
    assert sr == 16000
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_py, _ = decode_wav_bytes(data, try_native=False)
    np.testing.assert_allclose(got_py, want, atol=1e-6)


def test_unsupported_wav_format_raises_everywhere():
    """A-law (fmt=6) must raise in BOTH decoders, not return garbage."""
    from lele_tpu.utils.wav import decode_wav_bytes

    fmt_body = struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
    fmt = b"fmt " + struct.pack("<I", 16) + fmt_body
    pcm = bytes(range(64))
    dat = b"data" + struct.pack("<I", len(pcm)) + pcm
    data = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(dat)) + b"WAVE" \
        + fmt + dat
    with pytest.raises(ValueError):
        decode_wav_bytes(data)


def test_shard_params_replicates_undividable_dims():
    """vocab 25055 has no power-of-two factor: the ctc head must REPLICATE
    on a model-parallel mesh instead of device_put raising."""
    import jax

    from lele_tpu.parallel import make_mesh, shard_params

    mesh = make_mesh(len(jax.devices()), model=2)
    params = {
        "layers": [{"qkv": {"w": np.zeros((32, 96), np.float32)}}],
        "ctc": {"w": np.zeros((32, 25055), np.float32),
                "b": np.zeros((25055,), np.float32)},
    }
    placed = shard_params(params, mesh)
    ctc_sharding = placed["ctc"]["w"].sharding
    assert ctc_sharding.is_fully_replicated
    qkv = placed["layers"][0]["qkv"]["w"].sharding
    assert not qkv.is_fully_replicated  # 96 % 2 == 0 → still sharded


def test_stub_with_hostile_reason_still_imports(tmp_path):
    from lele_tpu.build_tool import generate_stub

    reason = 'multi\nline "quoted" and C:\\Users\\x \\Uhoh'
    path = generate_stub(tmp_path, "Broken", reason)
    ns: dict = {}
    exec(path.read_text(), ns)  # must be valid Python
    with pytest.raises(RuntimeError, match="stub"):
        ns["Broken"]()


def test_detect_batch_empty_returns_empty():
    from lele_tpu.serving import Yolo26Engine
    from lele_tpu.models import Yolo26Config, Yolo26Model

    m = Yolo26Model(Yolo26Config(img_size=128, widths=(8, 16, 32, 64),
                                 dtype="float32"))
    m.init(0)
    assert Yolo26Engine(model=m).detect_batch([]) == []
