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


def pack_weights(
    params: dict[str, np.ndarray], quantize: bool = False
) -> tuple[bytes, dict]:
    """→ (blob, manifest). Identical content stored once (dedup).

    quantize=True stores rank-≥2 float tensors as symmetric per-tensor int8
    with a dequant scale in the manifest (~4× smaller artifact, the
    reference's int8 deployment format); the loader dequantizes on read."""
    blob = bytearray()
    entries: dict[str, dict] = {}
    by_hash: dict[str, int] = {}
    for name, arr in params.items():
        shape = np.asarray(arr).shape
        arr = np.ascontiguousarray(arr)  # NB: promotes 0-d to 1-d
        scale = None
        if (
            quantize
            and arr.ndim >= 2
            and arr.dtype in (np.float32, np.float64)
            and arr.size >= 1024
        ):
            absmax = float(np.abs(arr).max()) or 1.0
            scale = absmax / 127.0
            arr = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
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
            "shape": list(shape),
            "dtype": arr.dtype.name,
        }
        if scale is not None:
            entries[name]["dequant_scale"] = scale
            entries[name]["dequant_dtype"] = "float32"
    manifest = {"magic": MAGIC, "align": ALIGN, "tensors": entries}
    return bytes(blob), manifest


def save_weights(
    path_prefix: str | Path, params: dict[str, np.ndarray], quantize: bool = False
) -> None:
    """Writes <prefix>.bin + <prefix>.json."""
    blob, manifest = pack_weights(params, quantize=quantize)
    # APPEND suffixes — with_suffix would REPLACE a dot-containing final
    # component ("model.enc" and "model.dec" would silently collide)
    bin_path(path_prefix).write_bytes(blob)
    json_path(path_prefix).write_text(json.dumps(manifest, indent=1))


def bin_path(path_prefix: str | Path) -> Path:
    p = Path(path_prefix)
    return p.parent / (p.name + ".bin")


def json_path(path_prefix: str | Path) -> Path:
    p = Path(path_prefix)
    return p.parent / (p.name + ".json")


def load_weights(path_prefix: str | Path) -> dict[str, np.ndarray]:
    """mmap the blob; tensors are zero-copy views (reference: zero-copy f32
    views over the weights file, tensor.rs:131)."""
    prefix = Path(path_prefix)
    manifest = json.loads(json_path(prefix).read_text())
    if manifest.get("magic") != MAGIC:
        raise ValueError(f"{prefix}: bad weights manifest magic")
    f = open(bin_path(prefix), "rb")
    buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    out = {}
    for name, e in manifest["tensors"].items():
        arr = np.frombuffer(
            buf, dtype=np.dtype(e["dtype"]), count=int(np.prod(e["shape"])) if e["shape"] else 1,
            offset=e["offset"],
        ).reshape(e["shape"])
        if "dequant_scale" in e:
            arr = (arr.astype(e.get("dequant_dtype", "float32"))
                   * e["dequant_scale"])
        out[name] = arr
    return out
