"""Launch-kit behavior (scripts/fetch_models.py, VERDICT r2 #3): offline
soft-fail, sha256 verification, TOFU pin recording."""

import importlib.util
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load(tmp_path, lock: dict):
    spec = importlib.util.spec_from_file_location(
        "fetch_models", ROOT / "scripts" / "fetch_models.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.ROOT = tmp_path
    mod.LOCK = tmp_path / "MODELS.lock.json"
    mod.LOCK.write_text(json.dumps(lock))
    return mod


def test_offline_soft_fail_and_strict(tmp_path, monkeypatch):
    # export-recipe families are informational: this script can never
    # download them, so they must not fail even --strict (a with-network
    # CI run where every downloadable file verified should exit 0)
    lock = {"fam": {"source": "export", "files": [{"dest": "m.onnx"}],
                    "recipe": ["echo export it"]}}
    mod = _load(tmp_path, lock)
    monkeypatch.setattr(sys, "argv", ["fetch_models.py"])
    assert mod.main() == 0
    monkeypatch.setattr(sys, "argv", ["fetch_models.py", "--strict"])
    assert mod.main() == 0
    # a DOWNLOADABLE family that fails to fetch is what --strict catches
    lock2 = {"fam": {"source": "hf-hub", "repo": "nobody/nothing",
                     "files": [{"dest": "m.onnx", "file": "m.onnx"}]}}
    mod2 = _load(tmp_path, lock2)
    monkeypatch.setattr(sys, "argv", ["fetch_models.py"])
    assert mod2.main() == 0          # offline: soft
    monkeypatch.setattr(sys, "argv", ["fetch_models.py", "--strict"])
    assert mod2.main() == 1          # strict: hard


def test_hash_verify_and_tofu(tmp_path, monkeypatch):
    f = tmp_path / "examples" / "fam" / "m.onnx"
    f.parent.mkdir(parents=True)
    f.write_bytes(b"weights")
    lock = {"fam": {"source": "export",
                    "files": [{"dest": "m.onnx", "sha256": None}]}}
    mod = _load(tmp_path, lock)
    # TOFU: --update-lock records the hash
    monkeypatch.setattr(sys, "argv", ["fetch_models.py", "--update-lock"])
    assert mod.main() == 0
    pinned = json.loads(mod.LOCK.read_text())
    want = mod.sha256_of(f)
    assert pinned["fam"]["files"][0]["sha256"] == want
    # verification passes against the recorded pin
    mod2 = _load(tmp_path, pinned)
    monkeypatch.setattr(sys, "argv", ["fetch_models.py", "--strict"])
    assert mod2.main() == 0
    # corruption is caught
    f.write_bytes(b"tampered")
    mod3 = _load(tmp_path, pinned)
    assert mod3.main() == 1


def test_repo_lock_covers_all_families():
    lock = json.loads((ROOT / "scripts" / "MODELS.lock.json").read_text())
    fams = {k for k in lock if not k.startswith("_")}
    assert fams == {"silero", "sensevoice", "supertonic", "supertonic3",
                    "yolo26", "yolo26n_seg", "llm_int4", "llm_moe"}
    for name, spec in lock.items():
        if name.startswith("_"):
            continue
        assert spec["source"] in ("hf-hub", "export")
        if spec["source"] == "hf-hub":
            assert spec["repo"]
        else:
            assert spec["recipe"]
        assert all("dest" in f for f in spec["files"])
