"""Prepared-parameter artifact roundtrip (runtime/artifact.py).

The cold-start story (docs/PERF.md): run init+quantize+stack once, save the
final pytree, and a fresh process rebuilds it with one mmap + one batched
device_put — no jitted init, no per-leaf transfers.
"""

import os
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lele_tpu.runtime.artifact import load_pytree, save_pytree  # noqa: E402


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [k for k, _ in la] == [k for k, _ in lb]
    for (_, x), (_, y) in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_array_equal(x, y)


def test_roundtrip_nested_mixed_dtypes(tmp_path):
    tree = {
        "embed": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                  "b": np.zeros(4, np.float32)},
        "layers": [
            {"wq8": np.arange(-8, 8, dtype=np.int8).reshape(4, 4),
             "ws8": np.full(4, 0.5, np.float32)},
            {"wq8": np.ones((4, 4), np.int8),
             "ws8": np.full(4, 0.25, np.float32)},
        ],
        "scalar": np.float32(3.0),
    }
    save_pytree(tmp_path / "m", tree)
    out = load_pytree(tmp_path / "m", device=False)
    _assert_tree_equal(tree, out)


def test_roundtrip_bf16_and_device_put(tmp_path):
    tree = {"w": jnp.asarray(np.random.default_rng(0)
                             .standard_normal((8, 8)), jnp.bfloat16),
            "idx": jnp.arange(5, dtype=jnp.int32)}
    save_pytree(tmp_path / "m", tree)
    out = load_pytree(tmp_path / "m", device=True)
    assert isinstance(out["w"], jax.Array)
    assert out["w"].dtype == jnp.bfloat16
    _assert_tree_equal(tree, out)


def test_roundtrip_prepared_stacked_model(tmp_path):
    """End-to-end: a small w8a16 stacked SenseVoice saved and reloaded
    produces bit-identical logits."""
    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
    from lele_tpu.models.sensevoice import (
        prepare_w8_params,
        stack_layer_params,
    )

    cfg = SenseVoiceConfig(
        d_model=64, n_heads=2, ffn_dim=96, n_layers=3, vocab_size=50,
        dtype="float32", weight_int8=True,
    )
    m = SenseVoiceModel(cfg)
    params = stack_layer_params(prepare_w8_params(m.init(0)))
    pcm = (np.sin(np.arange(8000) / 9.0) * 0.2).astype(np.float32)
    fn = jax.jit(m.forward_fn())
    ref = np.asarray(fn(params, pcm))

    save_pytree(tmp_path / "sv", params)
    loaded = load_pytree(tmp_path / "sv")
    got = np.asarray(fn(loaded, pcm))
    np.testing.assert_array_equal(ref, got)


def test_root_list_and_single_leaf(tmp_path):
    save_pytree(tmp_path / "l", [np.ones(3, np.float32),
                                 [np.zeros(2, np.int8)]])
    out = load_pytree(tmp_path / "l", device=False)
    assert isinstance(out, list) and isinstance(out[1], list)
    save_pytree(tmp_path / "s", np.arange(4.0, dtype=np.float32))
    out = load_pytree(tmp_path / "s", device=False)
    np.testing.assert_array_equal(out, np.arange(4.0, dtype=np.float32))


def test_aot_bundle_fresh_process(tmp_path):
    """Compiled-executable bundle: save in one process, load + execute in a
    FRESH single-device process (the actual cold-start flow). The in-process
    8-virtual-device mesh can't host a 1-device executable, so both halves
    run in clean subprocesses."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    code_save = f"""
import sys; sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})
import numpy as np, jax, jax.numpy as jnp
from lele_tpu.runtime.artifact import save_aot_bundle
params = {{"w": jnp.asarray(np.random.default_rng(1)
                            .standard_normal((16, 16)), jnp.float32)}}
def f(p, x):
    return jnp.tanh(x @ p["w"])
x = np.random.default_rng(2).standard_normal((4, 16)).astype(np.float32)
compiled = jax.jit(f).lower(params, x).compile()
save_aot_bundle({str(tmp_path / "m")!r}, compiled, params)
np.save({str(tmp_path / "ref.npy")!r}, np.asarray(f(params, x)))
"""
    code_load = f"""
import sys; sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})
import numpy as np
from lele_tpu.runtime.artifact import load_aot_bundle
fn, params = load_aot_bundle({str(tmp_path / "m")!r})
x = np.random.default_rng(2).standard_normal((4, 16)).astype(np.float32)
ref = np.load({str(tmp_path / "ref.npy")!r})
np.testing.assert_allclose(np.asarray(fn(params, x)), ref, rtol=1e-6)
print("AOT_OK")
"""
    for code, tag in ((code_save, "save"), (code_load, "load")):
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, f"{tag} failed: {r.stderr[-2000:]}"
    assert "AOT_OK" in r.stdout


def test_packed_single_dma_load(tmp_path):
    """Single-DMA load path: blob pushed as ONE u8 array + bundled unpack
    executable must reproduce the per-leaf load bit-for-bit (incl. bf16,
    int8, scalars, nested lists). Runs in a single-device subprocess — a
    1-device serialized executable can't execute on the in-process
    8-virtual-device mesh (load_pytree falls back per-leaf there, covered
    below)."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    code = f"""
import sys; sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})
import json, numpy as np, jax, jax.numpy as jnp
from lele_tpu.runtime.artifact import (
    _load_pytree_packed, load_pytree, save_pytree, save_unpack_exec)
rng = np.random.default_rng(3)
tree = {{
    "w_bf16": jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16),
    "wq8": np.asarray(rng.integers(-127, 127, (4, 128)), np.int8),
    "b": rng.standard_normal(128).astype(np.float32),
    "n": np.int32(7),
    "layers": [rng.standard_normal((2, 2)).astype(np.float32)],
}}
prefix = {str(tmp_path / "p")!r}
save_pytree(prefix, tree)
save_unpack_exec(prefix)
structure = json.loads(open(prefix + ".tree.json").read())
got = _load_pytree_packed(prefix, structure)
want = load_pytree(prefix, device=False)
ga = jax.tree_util.tree_leaves_with_path(got)
wa = jax.tree_util.tree_leaves_with_path(want)
assert [k for k, _ in ga] == [k for k, _ in wa]
for (_, x), (_, y) in zip(ga, wa):
    x, y = np.asarray(x), np.asarray(y)
    assert x.dtype == y.dtype and x.shape == y.shape, (x.dtype, y.dtype)
    np.testing.assert_array_equal(x, y)
print("PACKED_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"packed load failed: {r.stderr[-2000:]}"
    assert "PACKED_OK" in r.stdout


def test_packed_load_falls_back_on_mesh_mismatch(tmp_path):
    """A .up.xc that can't execute in this process (here: 1-device
    executable on the 8-virtual-device mesh) must degrade silently to the
    per-leaf path with identical results."""
    from lele_tpu.runtime.artifact import _UP_SUFFIX, save_unpack_exec

    tree = {"w": np.arange(24, dtype=np.float32).reshape(4, 6),
            "q": np.ones((2, 3), np.int8)}
    save_pytree(tmp_path / "p", tree)
    save_unpack_exec(tmp_path / "p")
    assert (tmp_path / ("p" + _UP_SUFFIX)).exists()
    out = load_pytree(tmp_path / "p", device=True)
    _assert_tree_equal(tree, out)


def test_dotted_prefix_does_not_collide(tmp_path):
    """Prefixes with dots in the final component ('model.enc'/'model.dec')
    must address distinct artifacts — Path.with_suffix would REPLACE the
    dot segment and silently collide both onto model.bin."""
    import numpy as np

    from lele_tpu.runtime.artifact import load_pytree, save_pytree

    enc = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    dec = {"w": np.arange(6, dtype=np.float32).reshape(2, 3) * 10}
    save_pytree(tmp_path / "model.enc", enc)
    save_pytree(tmp_path / "model.dec", dec)
    got_enc = load_pytree(tmp_path / "model.enc", device=False)
    got_dec = load_pytree(tmp_path / "model.dec", device=False)
    np.testing.assert_array_equal(np.asarray(got_enc["w"]), enc["w"])
    np.testing.assert_array_equal(np.asarray(got_dec["w"]), dec["w"])
    assert (tmp_path / "model.enc.bin").exists()
    assert (tmp_path / "model.dec.bin").exists()
