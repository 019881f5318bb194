"""Persistent compilation cache (cold-start latency).

The analog of the reference's build-time codegen caching + staleness checks
(lele-build lib.rs:234-322): XLA executables persist across processes so a
model's second cold start skips compilation. Runners/bench call
`enable_cache()`; apps can point LELE_CACHE_DIR elsewhere.
"""

from __future__ import annotations

import os


def enable_cache(path: str | None = None) -> str:
    import jax

    cache_dir = path or os.environ.get("LELE_CACHE_DIR", "/tmp/lele_tpu_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
