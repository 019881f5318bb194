"""Day-one launch rehearsal WITHOUT egress (VERDICT r3 #7).

A local mock HF endpoint (stdlib HTTP server) serves the real lock-file
paths; the FULL launch glue then runs against it: fetch_models.py fetch →
TOFU sha256 record (--update-lock) → re-fetch verify → pin-mismatch
rejection (--strict exit 1) → build_tool's own hf-hub acquisition +
mtime-staleness + codegen → the --onnx runner adapter on the fetched file.
On launch day the only untested step left is the bytes themselves.

Reference analog: lele-build's download/cache/staleness flow
(/root/reference/crates/lele-build/src/lib.rs:72-135, :252-322).
"""

import hashlib
import json
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
FIXTURE = ROOT / "fixtures" / "silero.onnx"
FETCH = ROOT / "scripts" / "fetch_models.py"


@pytest.fixture(scope="module")
def hub():
    """Mock HF endpoint serving the silero lock entry's resolve path."""
    if not FIXTURE.exists():
        pytest.skip("fixtures/silero.onnx not present")
    body = FIXTURE.read_bytes()
    routes = {"/onnx-community/silero-vad/resolve/main/onnx/model.onnx": body}

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            data = routes.get(self.path)
            if data is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", body
    srv.shutdown()


def _run_fetch(endpoint, lock, root, *extra):
    return subprocess.run(
        [sys.executable, str(FETCH), "silero",
         "--lock", str(lock), "--root", str(root), *extra],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "HF_ENDPOINT": endpoint,
             "HOME": str(root), "JAX_PLATFORMS": "cpu"},
    )


def _write_lock(path):
    path.write_text(json.dumps({
        "silero": {
            "source": "hf-hub",
            "repo": "onnx-community/silero-vad",
            "revision": "main",
            "files": [{"file": "onnx/model.onnx", "dest": "model.onnx",
                       "sha256": None}],
        }
    }))


def test_fetch_tofu_verify_and_pin_rejection(hub, tmp_path):
    endpoint, body = hub
    lock = tmp_path / "lock.json"
    _write_lock(lock)
    dest = tmp_path / "examples" / "silero" / "model.onnx"

    # 1. first fetch records the TOFU pin
    r = _run_fetch(endpoint, lock, tmp_path, "--update-lock")
    assert r.returncode == 0, r.stderr
    assert "recorded" in r.stdout, r.stdout
    assert dest.read_bytes() == body
    pinned = json.loads(lock.read_text())["silero"]["files"][0]["sha256"]
    assert pinned == hashlib.sha256(body).hexdigest()

    # 2. re-fetch verifies against the pin
    r = _run_fetch(endpoint, lock, tmp_path)
    assert r.returncode == 0 and "verified" in r.stdout, r.stdout

    # 3. a tampered artifact fails its pin, --strict exits 1
    dest.write_bytes(body[:-1] + b"\x00")
    r = _run_fetch(endpoint, lock, tmp_path, "--strict")
    assert r.returncode == 1 and "hash-mismatch" in r.stdout, r.stdout

    # 4. a fresh download whose bytes do not match the pin is DELETED
    dest.unlink()
    bad_lock = tmp_path / "bad_lock.json"
    _write_lock(bad_lock)
    data = json.loads(bad_lock.read_text())
    data["silero"]["files"][0]["sha256"] = "0" * 64
    bad_lock.write_text(json.dumps(data))
    r = _run_fetch(endpoint, bad_lock, tmp_path, "--strict")
    assert r.returncode == 1 and "hash-mismatch" in r.stdout, r.stdout
    assert not dest.exists(), "artifact failing its pin must not be kept"


def test_build_tool_hub_acquire_staleness_and_runner(hub, tmp_path,
                                                     monkeypatch):
    """build_tool.build_model with source=hf-hub against the mock endpoint:
    download into LELE_MODEL_CACHE → codegen wrapper → staleness no-op on
    rebuild → regen after the model file is touched; then the --onnx
    runner adapter (SileroOnnx) runs the fetched bytes end to end."""
    endpoint, body = hub
    monkeypatch.setenv("HF_ENDPOINT", endpoint)
    monkeypatch.setenv("LELE_MODEL_CACHE", str(tmp_path / "cache"))
    monkeypatch.delenv("LELE_FORCE_REGENERATE", raising=False)
    monkeypatch.delenv("LELE_SKIP_MODEL_GEN", raising=False)

    from lele_tpu.build_tool import build_model, need_regenerate

    toml = tmp_path / "model.toml"
    toml.write_text(
        '[model]\nsource = "hf-hub"\nrepo = "onnx-community/silero-vad"\n'
        'revision = "main"\n'
        '[[model.files]]\nfile = "onnx/model.onnx"\ndest = "model.onnx"\n'
        '[codegen]\nclass_name = "SileroVadC"\nmodel_file = "model.onnx"\n'
        'input_shapes = { input = [1, 576], state = [2, 1, 128] }\n'
    )
    out = tmp_path / "gen"
    wrapper = build_model(toml, out)
    assert wrapper.exists(), wrapper
    text = wrapper.read_text()
    assert "STUB" not in text, f"stubbed: {text[:300]}"
    fetched = tmp_path / "cache" / "onnx-community__silero-vad" / "model.onnx"
    assert fetched.read_bytes() == body

    # staleness: fresh wrapper → no regen; touched model → regen
    assert not need_regenerate(fetched, wrapper)
    import os
    os.utime(fetched, (fetched.stat().st_atime,
                       wrapper.stat().st_mtime + 10))
    assert need_regenerate(fetched, wrapper)

    # the runner adapter consumes the fetched bytes directly
    from lele_tpu.models.checkpoints import SileroOnnx

    vad = SileroOnnx(fetched)
    pcm = (np.sin(2 * np.pi * 220 * np.arange(4096) / 16000) * 0.1)
    probs = vad.speech_probs(pcm.astype(np.float32))
    assert probs.shape[0] == 4096 // 512
    assert np.all(np.isfinite(probs)) and np.all((0 <= probs) & (probs <= 1))


def test_llm_int4_family_rehearsal(tmp_path):
    """Launch rehearsal for the llm_int4 lock family (Phi-3-mini int4 ONNX):
    a mock hub serves a synthetic ORT-GenAI-form decoder under the REAL
    lock paths — model.onnx + model.onnx.data external side file, exactly
    how the published repo distributes it — then fetch → TOFU pin →
    compile (strict) → two greedy decode steps. On launch day only the
    bytes differ."""
    import test_genai_decoder_e2e as G

    from lele_tpu.onnx import OnnxModel, builder as ob
    from lele_tpu.compiler import compile_model

    rng = np.random.default_rng(0)
    inits, _ = G._params(rng)
    raw = G._build(inits, 1, raw=True)
    src = tmp_path / "src"
    src.mkdir()
    ob.save_with_external_data(raw, src / "model.onnx")
    assert (src / "model.onnx.data").exists(), "side file must spill"

    base = "/microsoft/Phi-3-mini-4k-instruct-onnx/resolve/main/" \
           "cpu_and_mobile/cpu-int4-rtn-block-32/"
    stem = "phi3-mini-4k-instruct-cpu-int4-rtn-block-32"
    routes = {
        base + stem + ".onnx": (src / "model.onnx").read_bytes(),
        base + stem + ".onnx.data": (src / "model.onnx.data").read_bytes(),
        base + "genai_config.json": b'{"model": {"type": "phi3"}}',
        base + "tokenizer.json": b'{"version": "1.0"}',
    }

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            data = routes.get(self.path)
            if data is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        lock = tmp_path / "lock.json"
        full = json.loads((ROOT / "scripts" / "MODELS.lock.json").read_text())
        lock.write_text(json.dumps({"llm_int4": full["llm_int4"]}))
        r = subprocess.run(
            [sys.executable, str(FETCH), "llm_int4", "--lock", str(lock),
             "--root", str(tmp_path), "--update-lock"],
            capture_output=True, text=True,
            env={"PATH": "/usr/bin:/bin", "HF_ENDPOINT": endpoint,
                 "HOME": str(tmp_path), "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr + r.stdout
        pins = json.loads(lock.read_text())["llm_int4"]["files"]
        assert all(f["sha256"] for f in pins), pins
    finally:
        srv.shutdown()

    fetched = tmp_path / "examples" / "llm_int4" / "model.onnx"
    assert fetched.exists() and fetched.with_suffix(".onnx.data").exists()
    cm = compile_model(OnnxModel.load(fetched), strict=True)
    B, KVH, L, HD, NL = G.B, G.KVH, G.L, G.HD, G.NL
    pks = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    pvs = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    tok = np.ones((B, 1), np.int64)
    for step in range(2):
        outs = cm.run_np(**G._ours_feeds(
            tok, np.full((B, 1), step, np.int64), step, 1, pks, pvs))
        for i in range(NL):
            pks[i] = np.asarray(outs[1 + 2 * i])
            pvs[i] = np.asarray(outs[2 + 2 * i])
        tok = np.asarray(outs[0])[:, -1].argmax(-1)[:, None].astype(np.int64)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_llm_moe_family_rehearsal(tmp_path):
    """Launch rehearsal for the llm_moe lock family (Phi-3.5-MoE ONNX):
    the mock hub serves a synthetic MoE-form decoder (router + QMoE
    experts) under the REAL lock paths with the external side file, then
    fetch → TOFU pin → strict compile → two greedy decode steps."""
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel, builder as ob
    from lele_tpu.onnx.synth import (
        GENAI_MOE_CFG,
        build_genai_decoder,
        genai_decoder_params,
        genai_feeds,
    )

    rng = np.random.default_rng(0)
    inits, _ = genai_decoder_params(rng, cfg=GENAI_MOE_CFG)
    raw = build_genai_decoder(inits, 1, cfg=GENAI_MOE_CFG, raw=True)
    src = tmp_path / "src"
    src.mkdir()
    ob.save_with_external_data(raw, src / "model.onnx")
    assert (src / "model.onnx.data").exists(), "side file must spill"

    base = "/microsoft/Phi-3.5-MoE-instruct-onnx/resolve/main/" \
           "gpu/gpu-int4-rtn-block-32/"
    routes = {
        base + "model.onnx": (src / "model.onnx").read_bytes(),
        base + "model.onnx.data": (src / "model.onnx.data").read_bytes(),
        base + "genai_config.json": b'{"model": {"type": "phimoe"}}',
        base + "tokenizer.json": b'{"version": "1.0"}',
    }

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            data = routes.get(self.path)
            if data is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        lock = tmp_path / "lock.json"
        full = json.loads((ROOT / "scripts" / "MODELS.lock.json").read_text())
        lock.write_text(json.dumps({"llm_moe": full["llm_moe"]}))
        r = subprocess.run(
            [sys.executable, str(FETCH), "llm_moe", "--lock", str(lock),
             "--root", str(tmp_path), "--update-lock"],
            capture_output=True, text=True,
            env={"PATH": "/usr/bin:/bin", "HF_ENDPOINT": endpoint,
                 "HOME": str(tmp_path), "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr + r.stdout
        pins = json.loads(lock.read_text())["llm_moe"]["files"]
        assert all(f["sha256"] for f in pins), pins
    finally:
        srv.shutdown()

    fetched = tmp_path / "examples" / "llm_moe" / "model.onnx"
    assert fetched.exists() and fetched.with_suffix(".onnx.data").exists()
    cm = compile_model(OnnxModel.load(fetched), strict=True)
    c = GENAI_MOE_CFG
    B, KVH, L, HD, NL = (c[k] for k in ("B", "kvh", "L", "hd", "nl"))
    pks = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    pvs = [np.zeros((B, KVH, L, HD), np.float32) for _ in range(NL)]
    tok = np.ones((B, 1), np.int64)
    for step in range(2):
        outs = cm.run_np(**genai_feeds(
            tok, np.full((B, 1), step, np.int64), step, 1, pks, pvs,
            cfg=c))
        for i in range(NL):
            pks[i] = np.asarray(outs[1 + 2 * i])
            pvs[i] = np.asarray(outs[2 + 2 * i])
        tok = np.asarray(outs[0])[:, -1].argmax(-1)[:, None].astype(np.int64)
    assert np.isfinite(np.asarray(outs[0])).all()
