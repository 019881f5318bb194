"""CLI + build-tool + weights-blob suite.

Covers: lele_gen-style compile-to-dir (bin/lele_gen.rs surface), weights
blob round-trip with 16B alignment + content dedup (mod.rs:1381-1505),
model.toml build driver with stub-on-failure + env flags (lele-build
lib.rs:193-322).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from lele_tpu.compiler.weights import load_weights, pack_weights, save_weights
from lele_tpu.onnx import builder as ob

REPO = Path(__file__).resolve().parents[1]


def _write_toy_onnx(path: Path):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 300)).astype(np.float32)
    nodes = [
        ob.node("MatMul", ["x", "w"], ["mm"]),
        ob.node("Relu", ["mm"], ["y"]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [2, 8])],
        outputs=[ob.value_info("y", 1, [2, 300])],
        initializers=[ob.tensor_from_array(w, "w")],
    )
    path.write_bytes(bs)
    return w


# -- weights blob ------------------------------------------------------------


def test_weights_blob_roundtrip_and_alignment(tmp_path):
    rng = np.random.default_rng(1)
    params = {
        "a": rng.standard_normal((17, 3)).astype(np.float32),
        "b": rng.integers(0, 255, (33,)).astype(np.uint8),
        "c": rng.standard_normal((4,)).astype(np.float16),
    }
    blob, manifest = pack_weights(params)
    for e in manifest["tensors"].values():
        assert e["offset"] % 16 == 0
    save_weights(tmp_path / "w", params)
    loaded = load_weights(tmp_path / "w")
    for k in params:
        np.testing.assert_array_equal(loaded[k], params[k])
        assert loaded[k].dtype == params[k].dtype


def test_weights_blob_content_dedup():
    a = np.arange(100, dtype=np.float32)
    blob, manifest = pack_weights({"x": a, "y": a.copy(), "z": a + 1})
    t = manifest["tensors"]
    assert t["x"]["offset"] == t["y"]["offset"]  # deduped
    assert t["z"]["offset"] != t["x"]["offset"]
    assert len(blob) < 3 * a.nbytes


# -- CLI ---------------------------------------------------------------------


def test_cli_compile_and_generated_wrapper(tmp_path):
    onnx_path = tmp_path / "toy_model.onnx"
    w = _write_toy_onnx(onnx_path)
    out = tmp_path / "gen"
    from lele_tpu.cli import compile_to_dir

    wrapper = compile_to_dir(str(onnx_path), str(out), "ToyModel")
    assert wrapper.name == "ToyModel.py"
    assert (out / "ToyModel_weights.bin").exists()
    assert (out / "ToyModel_weights.json").exists()
    # import and run the generated wrapper
    sys.path.insert(0, str(out))
    try:
        import importlib

        mod = importlib.import_module("ToyModel")
        importlib.reload(mod)
        model = mod.ToyModel()
        x = np.random.default_rng(2).standard_normal((2, 8)).astype(np.float32)
        (y,) = model.forward(x)
        np.testing.assert_allclose(y, np.maximum(x @ w, 0), atol=1e-4)
    finally:
        sys.path.remove(str(out))


def test_cli_xc_bundle_wrapper(tmp_path):
    """--xc writes the pickled executable and the generated wrapper prefers
    it (no recompile); outputs match the jit path."""
    onnx_path = tmp_path / "xc_model.onnx"
    w = _write_toy_onnx(onnx_path)
    out = tmp_path / "gen_xc"
    from lele_tpu.cli import compile_to_dir

    compile_to_dir(str(onnx_path), str(out), "XcModel", xc=True)
    assert (out / "XcModel.xc").exists()
    assert (out / "XcModel.xc.tree").exists()
    sys.path.insert(0, str(out))
    try:
        import importlib

        mod = importlib.import_module("XcModel")
        importlib.reload(mod)
        model = mod.XcModel()  # 8-virtual-device env: probe fails, jit path
        x = np.random.default_rng(3).standard_normal((2, 8)).astype(np.float32)
        (y,) = model.forward(x)
        np.testing.assert_allclose(y, np.maximum(x @ w, 0), atol=1e-4)
    finally:
        sys.path.remove(str(out))
    # the executable itself must load+run in a single-device process (the
    # deployment shape); assert the wrapper reports aot_loaded there
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    code = f"""
import sys; sys.path.insert(0, {str(REPO)!r}); sys.path.insert(0, {str(out)!r})
import numpy as np
from XcModel import XcModel
m = XcModel()
assert m.aot_loaded, "saved executable did not load in a 1-device process"
x = np.random.default_rng(3).standard_normal((2, 8)).astype(np.float32)
(y,) = m.forward(x)
import json
np.save({str(out / "sub_y.npy")!r}, np.asarray(y))
print("XC_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "XC_OK" in r.stdout, r.stderr[-2000:]
    np.testing.assert_allclose(np.load(out / "sub_y.npy"),
                               np.maximum(x @ w, 0), atol=1e-4)


def test_cli_main_errors(tmp_path):
    from lele_tpu.cli import main

    assert main(["/nonexistent/model.onnx", str(tmp_path)]) != 0


def test_cli_quantize_dynamic_flag(tmp_path):
    """--quantize-dynamic rewrites the model to int8 DQL form, writes the
    quantized .onnx next to the artifact, and the compiled wrapper still
    computes relu(x @ w) within quantization noise."""
    from lele_tpu.cli import main
    from lele_tpu.onnx import schema

    onnx_path = tmp_path / "toy_model.onnx"
    w = _write_toy_onnx(onnx_path)
    out = tmp_path / "gen"
    rc = main([str(onnx_path), str(out), "ToyQ", "--quantize-dynamic"])
    assert rc == 0
    qpath = out / "toy_model.int8.onnx"
    assert qpath.exists()
    ops = [n.op_type for n in
           schema.decode_model(qpath.read_bytes()).graph.node]
    assert "MatMulInteger" in ops and "MatMul" not in ops
    sys.path.insert(0, str(out))
    try:
        import importlib

        mod = importlib.import_module("ToyQ")
        importlib.reload(mod)
        model = mod.ToyQ()
        x = np.random.default_rng(5).standard_normal((2, 8)).astype(
            np.float32)
        (y,) = model.forward(x)
        # K=8 fan-in, unit-std weights: outputs are O(3), and u8 dynamic
        # activation quantization carries ~1e-2-scale noise per element
        np.testing.assert_allclose(y, np.maximum(x @ w, 0), atol=0.15)
    finally:
        sys.path.remove(str(out))


def test_cli_quantize_static_flag(tmp_path):
    """--quantize-static CALIB.npz: calibrated QDQ rewrite, quantized
    .onnx written, wrapper still computes relu(x @ w)."""
    from lele_tpu.cli import main
    from lele_tpu.onnx import schema

    onnx_path = tmp_path / "toy_model.onnx"
    w = _write_toy_onnx(onnx_path)
    rng = np.random.default_rng(11)
    calib = tmp_path / "calib.npz"
    np.savez(calib, x=rng.standard_normal((2, 8)).astype(np.float32))
    out = tmp_path / "gen"
    rc = main([str(onnx_path), str(out), "ToyS",
               "--quantize-static", str(calib)])
    assert rc == 0
    qpath = out / "toy_model.qdq.onnx"
    assert qpath.exists()
    ops = [n.op_type for n in
           schema.decode_model(qpath.read_bytes()).graph.node]
    assert "QuantizeLinear" in ops and "MatMul" in ops  # QDQ keeps op float
    # exclusivity guard
    assert main([str(onnx_path), str(out), "ToyS", "--quantize-static",
                 str(calib), "--quantize-dynamic"]) == 1
    sys.path.insert(0, str(out))
    try:
        import importlib

        mod = importlib.import_module("ToyS")
        importlib.reload(mod)
        model = mod.ToyS()
        x = np.random.default_rng(12).standard_normal((2, 8)).astype(
            np.float32)
        (y,) = model.forward(x)
        err = np.abs(y - np.maximum(x @ w, 0))
        assert err.mean() < 0.1, err.mean()
    finally:
        sys.path.remove(str(out))


def test_build_tool_quantize_dynamic(tmp_path):
    """codegen.quantize = "dynamic" quantizes at build time: the artifact
    compiles from the int8 rewrite and still computes relu(x @ w)."""
    from lele_tpu.build_tool import build_model
    from lele_tpu.onnx import schema

    onnx_path = tmp_path / "toy.onnx"
    w = _write_toy_onnx(onnx_path)
    (tmp_path / "model.toml").write_text(
        '[model]\nsource = "local"\npath = "toy.onnx"\n'
        '[codegen]\nclass_name = "ToyDyn"\nquantize = "dynamic"\n'
    )
    out = tmp_path / "gen"
    wrapper = build_model(tmp_path / "model.toml", out)
    assert wrapper.name == "ToyDyn.py"
    qpath = out / "toy.int8.onnx"
    assert qpath.exists()
    ops = [n.op_type for n in
           schema.decode_model(qpath.read_bytes()).graph.node]
    assert "MatMulInteger" in ops and "MatMul" not in ops
    sys.path.insert(0, str(out))
    try:
        import importlib

        mod = importlib.import_module("ToyDyn")
        importlib.reload(mod)
        model = mod.ToyDyn()
        x = np.random.default_rng(9).standard_normal((2, 8)).astype(
            np.float32)
        (y,) = model.forward(x)
        np.testing.assert_allclose(y, np.maximum(x @ w, 0), atol=0.15)
    finally:
        sys.path.remove(str(out))


def test_cli_sanitize_name():
    from lele_tpu.cli import sanitize_name

    assert sanitize_name("yolo26n-seg") == "yolo26n_seg"
    assert sanitize_name("2fast") == "M_2fast"


# -- build tool --------------------------------------------------------------


def test_build_tool_local_source(tmp_path):
    onnx_path = tmp_path / "m.onnx"
    _write_toy_onnx(onnx_path)
    (tmp_path / "model.toml").write_text(
        f'[model]\nsource = "local"\npath = "m.onnx"\n'
        f'[codegen]\nclass_name = "LocalToy"\n'
    )
    from lele_tpu.build_tool import build_model

    out = build_model(tmp_path / "model.toml", tmp_path / "gen")
    assert out.name == "LocalToy.py"
    assert "STUB" not in out.read_text()
    # second build: staleness check skips regeneration (same mtime)
    m1 = out.stat().st_mtime
    out2 = build_model(tmp_path / "model.toml", tmp_path / "gen")
    assert out2.stat().st_mtime == m1


def test_build_tool_stub_on_download_failure(tmp_path, monkeypatch):
    (tmp_path / "model.toml").write_text(
        '[model]\nsource = "hf-hub"\nrepo = "nobody/nonexistent"\n'
        'files = ["model.onnx"]\n[codegen]\nclass_name = "Ghost"\n'
    )
    monkeypatch.setenv("LELE_MODEL_CACHE", str(tmp_path / "cache"))
    monkeypatch.setenv("HF_ENDPOINT", "http://127.0.0.1:1")  # unroutable fast
    from lele_tpu.build_tool import build_model

    out = build_model(tmp_path / "model.toml", tmp_path / "gen")
    assert out.exists()
    text = out.read_text()
    assert "STUB" in text
    sys.path.insert(0, str(tmp_path / "gen"))
    try:
        import importlib

        mod = importlib.import_module("Ghost")
        importlib.reload(mod)
        with pytest.raises(RuntimeError):
            mod.Ghost()
    finally:
        sys.path.remove(str(tmp_path / "gen"))


def test_build_tool_skip_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LELE_SKIP_MODEL_GEN", "1")
    (tmp_path / "model.toml").write_text(
        '[model]\nsource = "local"\npath = "nope.onnx"\n'
        '[codegen]\nclass_name = "Skipped"\n'
    )
    from lele_tpu.build_tool import build_model

    out = build_model(tmp_path / "model.toml", tmp_path / "gen")
    assert not out.exists()  # nothing generated, build not broken


def test_force_regen_env(tmp_path, monkeypatch):
    from lele_tpu.build_tool import force_regenerate, need_regenerate

    assert not force_regenerate()
    monkeypatch.setenv("LELE_FORCE_REGEN", "1")
    assert force_regenerate()
    assert need_regenerate(tmp_path / "x", tmp_path / "y")


def test_model_toml_files_array_of_tables_schema(tmp_path):
    """The reference's [[model.files]] file/dest form parses (lib.rs:9-68)."""
    (tmp_path / "model.toml").write_text(
        '[model]\nsource = "hf-hub"\nrepo = "org/repo"\nrevision = "v1"\n\n'
        '[[model.files]]\nfile = "onnx/a.onnx"\ndest = "a.onnx"\n\n'
        '[[model.files]]\nfile = "b.json"\n\n'
        '[codegen]\nclass_name = "X"\nmodel_file = "a.onnx"\n'
        'custom_methods = ["m1"]\n'
    )
    from lele_tpu.build_tool import ModelConfig

    cfg = ModelConfig.load(tmp_path / "model.toml")
    assert cfg.revision == "v1"
    assert cfg.files[0] == {"file": "onnx/a.onnx", "dest": "a.onnx"}
    assert cfg.files[1] == {"file": "b.json", "dest": "b.json"}
    assert cfg.custom_methods == ["m1"]


def test_repo_example_tomls_parse():
    from lele_tpu.build_tool import ModelConfig

    for name in ["sensevoice", "silero", "supertonic", "supertonic3",
                 "yolo26", "yolo26n_seg"]:
        cfg = ModelConfig.load(REPO / "examples" / name / "model.toml")
        assert cfg.class_name


def test_weights_blob_bfloat16(tmp_path):
    import ml_dtypes

    a = np.arange(64, dtype=np.float32).astype(ml_dtypes.bfloat16)
    save_weights(tmp_path / "w", {"a": a})
    loaded = load_weights(tmp_path / "w")
    assert loaded["a"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(loaded["a"], a)


def test_quantized_weight_blob_roundtrip(tmp_path):
    rng2 = np.random.default_rng(3)
    w = rng2.standard_normal((64, 64)).astype(np.float32)
    small = rng2.standard_normal((8,)).astype(np.float32)
    save_weights(tmp_path / "q", {"w": w, "small": small}, quantize=True)
    size_q = (tmp_path / "q.bin").stat().st_size
    save_weights(tmp_path / "f", {"w": w, "small": small})
    size_f = (tmp_path / "f.bin").stat().st_size
    assert size_q < size_f * 0.3
    loaded = load_weights(tmp_path / "q")
    # small tensors stay exact; big ones within one quant step
    np.testing.assert_array_equal(loaded["small"], small)
    step = np.abs(w).max() / 127.0
    assert np.abs(loaded["w"] - w).max() <= step * 0.51
    assert loaded["w"].dtype == np.float32


def test_cli_quantize_weights_flag(tmp_path):
    onnx_path = tmp_path / "m.onnx"
    w = _write_toy_onnx(onnx_path)
    from lele_tpu.cli import compile_to_dir

    compile_to_dir(str(onnx_path), str(tmp_path / "g"), "Q",
                   quantize_weights=True)
    import json as _json

    man = _json.loads((tmp_path / "g/Q_weights.json").read_text())
    assert any("dequant_scale" in e for e in man["tensors"].values())
    # generated wrapper still runs and approximates the f32 model
    sys.path.insert(0, str(tmp_path / "g"))
    try:
        import importlib

        mod = importlib.import_module("Q")
        importlib.reload(mod)
        model = mod.Q()
        x = np.random.default_rng(2).standard_normal((2, 8)).astype(np.float32)
        (y,) = model.forward(x)
        np.testing.assert_allclose(y, np.maximum(x @ w, 0), atol=0.1)
    finally:
        sys.path.remove(str(tmp_path / "g"))
