"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes. Multi-chip sharding tests use the
8 virtual devices; kernel/numerics tests just use CPU. Real-TPU execution is
covered by bench.py and the driver's compile checks.
"""

import os

# force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which must not serve unit tests. The axon sitecustomize shim
# overrides the env var via jax.config at interpreter start, so we must
# override the config again before any backend initializes.
os.environ["JAX_PLATFORMS"] = os.environ.get("LELE_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: x64 stays off — the device canonicalizes ONNX i64/f64 to i32/f32
# (TPU-first; documented in lele_tpu.ops). Tests assert values, not widths.
