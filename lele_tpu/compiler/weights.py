"""Weights blob: flat binary + JSON manifest.

Parity target: the reference's weight collection (compiler/mod.rs:1381
`collect_weights`) — little-endian flat byte stream, 16-byte-aligned records
(mod.rs:1417-1422), content-hash dedup (mod.rs:1372,:1406), addressed by
(offset, len, shape, dtype). The reference burns the offsets into generated
Rust; we emit a sidecar JSON manifest instead, and the loader returns
zero-copy numpy views over the mmap'd blob.
"""

from __future__ import annotations

import hashlib
import json
import mmap
from pathlib import Path

import numpy as np

try:  # registers the bfloat16 dtype name with numpy (bf16 artifacts)
    import ml_dtypes  # noqa: F401
except ImportError:  # pragma: no cover
    pass

ALIGN = 16
MAGIC = "lele-tpu-weights-v1"


def pack_weights(params: dict[str, np.ndarray]) -> tuple[bytes, dict]:
    """→ (blob, manifest). Identical content stored once (dedup)."""
    blob = bytearray()
    entries: dict[str, dict] = {}
    by_hash: dict[str, int] = {}
    for name, arr in params.items():
        arr = np.ascontiguousarray(arr)
        raw = arr.tobytes()
        h = hashlib.sha256(raw).hexdigest()[:32]
        if h in by_hash:
            offset = by_hash[h]
        else:
            pad = (-len(blob)) % ALIGN
            blob += b"\0" * pad
            offset = len(blob)
            blob += raw
            by_hash[h] = offset
        entries[name] = {
            "offset": offset,
            "nbytes": len(raw),
            "shape": list(arr.shape),
            "dtype": arr.dtype.name,
        }
    manifest = {"magic": MAGIC, "align": ALIGN, "tensors": entries}
    return bytes(blob), manifest


def save_weights(path_prefix: str | Path, params: dict[str, np.ndarray]) -> None:
    """Writes <prefix>.bin + <prefix>.json."""
    blob, manifest = pack_weights(params)
    prefix = Path(path_prefix)
    prefix.with_suffix(".bin").write_bytes(blob)
    prefix.with_suffix(".json").write_text(json.dumps(manifest, indent=1))


def load_weights(path_prefix: str | Path) -> dict[str, np.ndarray]:
    """mmap the blob; tensors are zero-copy views (reference: zero-copy f32
    views over the weights file, tensor.rs:131)."""
    prefix = Path(path_prefix)
    manifest = json.loads(prefix.with_suffix(".json").read_text())
    if manifest.get("magic") != MAGIC:
        raise ValueError(f"{prefix}: bad weights manifest magic")
    f = open(prefix.with_suffix(".bin"), "rb")
    buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    out = {}
    for name, e in manifest["tensors"].items():
        arr = np.frombuffer(
            buf, dtype=np.dtype(e["dtype"]), count=int(np.prod(e["shape"])) if e["shape"] else 1,
            offset=e["offset"],
        )
        out[name] = arr.reshape(e["shape"])
    return out
