"""Native (C++) runtime components with build-on-demand + Python fallback.

`get_native()` returns the compiled `_lele_native` module or None. The
extension builds lazily with the system toolchain into this directory
(mirrors the reference's build.rs native linking, with the stub-on-failure
spirit of lele-build: import never breaks if the toolchain is absent).
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_native = None
_tried = False


def build_native(verbose: bool = False) -> bool:
    """Compile native.cpp → _lele_native.so in-place. Returns success."""
    src = _HERE / "native.cpp"
    out = _HERE / "_lele_native.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", str(src), "-o", str(out),
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            if verbose:
                print(res.stderr, file=sys.stderr)
            return False
        return True
    except Exception:
        return False


def get_native():
    """The compiled module, building it on first use; None on any failure."""
    global _native, _tried
    if _native is not None or _tried:
        return _native
    _tried = True
    if not build_native():
        return None
    try:
        if str(_HERE) not in sys.path:
            sys.path.insert(0, str(_HERE))
        import _lele_native  # noqa: F401

        _native = _lele_native
    except Exception:
        _native = None
    return _native
