"""Pallas TPU kernels + fused jnp paths for fusion-critical ops.

The analog of the reference's arch backends (src/kernels/{neon,avx,wasm}):
one jnp reference implementation per kernel is the numerics oracle, and a
Pallas TPU implementation overrides it where profiles demand (the
backend-parity test pattern from tests/verify_neon_accuracy.rs becomes
Pallas-vs-jnp parity in tests/test_pallas_parity.py).
"""
