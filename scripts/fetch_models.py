#!/usr/bin/env python
"""Fetch (and verify) the real published checkpoints for all five model
families into examples/<family>/ — the one-command launch kit for the day
network egress exists (VERDICT r2 #3).

    python scripts/fetch_models.py                # fetch everything fetchable
    python scripts/fetch_models.py silero         # one family
    python scripts/fetch_models.py --update-lock  # record sha256 pins (TOFU)
    python scripts/fetch_models.py --strict       # exit 1 on download/pin
                                                  # failures (export-recipe
                                                  # families stay soft)

Sources come from scripts/MODELS.lock.json: hf-hub families download via
lele_tpu.build_tool.download_from_hf_hub (HF_ENDPOINT honored, same flow as
the reference's lele-build, /root/reference/crates/lele-build/src/lib.rs:72-
135); "export" families (sensevoice int8, yolo26 — which the reference also
treats as user-provided local exports, examples/*/model.toml) print their
export recipe and verify the file if present. Every file with a recorded
sha256 is verified after download; --update-lock records hashes on first
successful fetch. Without egress this script fails SOFT (summary + exit 0
unless --strict): CI and the zero-egress dev loop stay green.

After a successful fetch, the runners pick the files up with zero code
changes:

    python examples/silero/run.py --onnx examples/silero/model.onnx
    python examples/sensevoice/run.py --onnx examples/sensevoice/sensevoice.int8.onnx \
        --vocab examples/sensevoice/tokens.json
    python examples/supertonic/run.py --onnx examples/supertonic
    python examples/yolo26/run.py --onnx examples/yolo26/yolo26.onnx
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

LOCK = Path(__file__).resolve().parent / "MODELS.lock.json"


def sha256_of(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def fetch_family(name: str, spec: dict, update_lock: bool,
                 root: Path = ROOT) -> list[tuple]:
    """Returns [(dest, status, detail)]; status ∈ ok | verified | failed |
    hash-mismatch | recorded | needs-export."""
    out_dir = root / "examples" / name
    rows = []
    for entry in spec["files"]:
        dest = out_dir / entry["dest"]
        want = entry.get("sha256")
        if dest.exists():
            got = sha256_of(dest)
            if want is None:
                if update_lock:
                    entry["sha256"] = got
                    rows.append((entry["dest"], "recorded", got[:12]))
                else:
                    rows.append((entry["dest"], "ok", "present (no pin)"))
            elif got == want:
                rows.append((entry["dest"], "verified", got[:12]))
            else:
                rows.append((entry["dest"], "hash-mismatch",
                             f"want {want[:12]} got {got[:12]}"))
            continue
        if spec["source"] == "hf-hub":
            from lele_tpu.build_tool import download_from_hf_hub

            try:
                download_from_hf_hub(
                    spec["repo"], entry["file"], dest,
                    spec.get("revision", "main"),
                )
            except Exception as e:
                rows.append((entry["dest"], "failed", f"{type(e).__name__}: {e}"))
                continue
            got = sha256_of(dest)
            if want is None:
                if update_lock:
                    entry["sha256"] = got
                rows.append((entry["dest"], "recorded" if update_lock else "ok",
                             got[:12]))
            elif got == want:
                rows.append((entry["dest"], "verified", got[:12]))
            else:
                dest.unlink()  # do not keep an artifact that fails its pin
                rows.append((entry["dest"], "hash-mismatch",
                             f"want {want[:12]} got {got[:12]}"))
        else:
            # export families can never be downloaded by this script — the
            # user runs the recipe; not a failure even under --strict
            rows.append((entry["dest"], "needs-export", "recipe below"))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", help="subset (default: all)")
    ap.add_argument("--update-lock", action="store_true",
                    help="record sha256 of fetched/present files into the "
                         "lock (trust-on-first-use pinning)")
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 if any DOWNLOADABLE file failed or a pin "
                         "mismatched (with-network CI mode; export-recipe "
                         "families are informational either way)")
    ap.add_argument("--lock", default=str(LOCK),
                    help="lock file path (tests point this at a temp copy)")
    ap.add_argument("--root", default=str(ROOT),
                    help="tree root: files land in <root>/examples/<family>")
    args = ap.parse_args()

    lock_path = Path(args.lock)
    root = Path(args.root)
    lock = json.loads(lock_path.read_text())
    fams = {k: v for k, v in lock.items() if not k.startswith("_")}
    names = args.families or list(fams)
    bad = False
    for name in names:
        if name not in fams:
            print(f"unknown family {name!r} (have: {', '.join(fams)})")
            return 2
        spec = fams[name]
        rows = fetch_family(name, spec, args.update_lock, root=root)
        print(f"[{name}] source={spec['source']}"
              + (f" repo={spec.get('repo')}" if spec.get("repo") else ""))
        for dest, status, detail in rows:
            print(f"  {status:13s} {dest}  {detail}")
            if status in ("failed", "hash-mismatch"):
                bad = True
        if spec["source"] == "export" and any(
            r[1] == "needs-export" for r in rows
        ):
            print("  export recipe:")
            for line in spec.get("recipe", []):
                print(f"    $ {line}")
    if args.update_lock:
        lock_path.write_text(json.dumps(lock, indent=2) + "\n")
        print(f"lock updated: {lock_path}")
    if bad and not args.strict:
        print("\n(some files unavailable — fine without network egress; "
              "rerun when online, or follow the export recipes above)")
    return 1 if (bad and args.strict) else 0


if __name__ == "__main__":
    raise SystemExit(main())
