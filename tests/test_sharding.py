"""Multi-chip sharding suite (virtual 8-device CPU mesh, conftest).

Covers lele_tpu.parallel (mesh construction, Megatron param rules), sharded
CTC training (GSPMD-propagated collectives), and data-parallel compiled-
model inference — the component class the reference lacks entirely
(SURVEY.md §2.6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lele_tpu.parallel import make_mesh, shard_params
from lele_tpu.parallel.sharding import param_spec_tree, sensevoice_param_rules


def test_make_mesh_factoring():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh = make_mesh(8, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(1)
    assert mesh.shape == {"data": 1, "model": 1}
    with pytest.raises(AssertionError):
        make_mesh(8, data=3, model=2)


def test_param_rules():
    assert sensevoice_param_rules("layers/0/qkv/w") == P(None, "model")
    assert sensevoice_param_rules("layers/7/ffn2/w") == P("model", None)
    assert sensevoice_param_rules("layers/3/norm1/g") == P()
    assert sensevoice_param_rules("embed/w") == P()


def test_shard_params_places_on_mesh():
    from lele_tpu.models import SenseVoiceConfig, init_sensevoice

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32",
    )
    mesh = make_mesh(8, model=2)
    params = init_sensevoice(jax.random.PRNGKey(0), cfg)
    sharded = shard_params(params, mesh)
    qkv = sharded["layers"][0]["qkv"]["w"]
    # column-parallel: each model-shard holds half the output features
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 96 // 2)}
    norm = sharded["layers"][0]["norm1"]["g"]
    assert all(s.data.shape == (32,) for s in norm.addressable_shards)
    # structure preserved (lists stay lists)
    assert isinstance(sharded["layers"], list)


def test_spec_tree_matches_structure():
    from lele_tpu.models import SenseVoiceConfig, init_sensevoice

    cfg = SenseVoiceConfig(
        n_layers=2, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32",
    )
    params = init_sensevoice(jax.random.PRNGKey(0), cfg)
    specs = param_spec_tree(params)
    assert jax.tree.structure(
        specs, is_leaf=lambda x: isinstance(x, P)
    ) == jax.tree.structure(params)


def test_sharded_train_step_runs_and_matches_single_device():
    """The dryrun_multichip path, plus a numerical check: the sharded step
    must produce the same loss as the unsharded one."""
    from lele_tpu.models import SenseVoiceConfig, init_sensevoice
    from lele_tpu.train import make_train_step, shard_batch

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32",
    )
    rng = np.random.default_rng(0)
    B, T, L = 4, 12, 4
    batch_np = {
        "feats": rng.standard_normal((B, T, cfg.input_dim)).astype(np.float32),
        "feat_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32),
        "label_mask": np.ones((B, L), np.float32),
    }
    params = init_sensevoice(jax.random.PRNGKey(0), cfg)

    tx, step = make_train_step(cfg, lr=1e-3)
    p1, o1, loss_single = step(
        jax.tree.map(jnp.copy, params), tx.init(params), batch_np
    )

    mesh = make_mesh(8, model=2)
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    opt = tx.init(sp)
    batch = shard_batch(batch_np, mesh)
    tx2, step2 = make_train_step(cfg, lr=1e-3)
    with mesh:
        p2, o2, loss_sharded = step2(sp, opt, batch)
    assert np.isfinite(float(loss_sharded))
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=2e-4
    )
    # updated params agree across the strategies
    w1 = np.asarray(p1["layers"][0]["qkv"]["w"])
    w2 = np.asarray(p2["layers"][0]["qkv"]["w"])
    np.testing.assert_allclose(w1, w2, atol=2e-4)


def test_data_parallel_compiled_model():
    """ONNX-compiled model runs data-parallel over the mesh."""
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel, builder as ob

    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 300)).astype(np.float32)
    bs = ob.build_model_bytes(
        [ob.node("MatMul", ["x", "w"], ["mm"]), ob.node("Relu", ["mm"], ["y"])],
        inputs=[ob.value_info("x", 1, [8, 16])],
        outputs=[ob.value_info("y", 1, [8, 300])],
        initializers=[ob.tensor_from_array(w, "w")],
    )
    mesh = make_mesh(8, data=8, model=1)
    cm = compile_model(OnnxModel.from_bytes(bs), mesh=mesh, batch_axis=0)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    (y,) = cm.run_np(x)
    np.testing.assert_allclose(y, np.maximum(x @ w, 0), atol=1e-4)
    # the input really was sharded 1-row-per-device
    xs = cm._prep("x", x)
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (1, 16)


def test_3d_mesh_with_sequence_parallelism():
    """dp×sp×tp: time-sharded activations must give the same loss."""
    from lele_tpu.models import SenseVoiceConfig, init_sensevoice
    from lele_tpu.train import make_train_step, shard_batch

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32",
    )
    rng = np.random.default_rng(2)
    B, T, L = 2, 24, 4
    batch_np = {
        "feats": rng.standard_normal((B, T, cfg.input_dim)).astype(np.float32),
        "feat_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32),
        "label_mask": np.ones((B, L), np.float32),
    }
    params = init_sensevoice(jax.random.PRNGKey(0), cfg)
    tx, step = make_train_step(cfg, lr=1e-3)
    _, _, loss_single = step(jax.tree.map(jnp.copy, params), tx.init(params), batch_np)

    mesh = make_mesh(8, seq=2, model=2)
    assert mesh.shape == {"data": 2, "seq": 2, "model": 2}
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    batch = shard_batch(batch_np, mesh)
    # feats really sharded over seq
    assert len(batch["feats"].addressable_shards) == 8
    assert batch["feats"].addressable_shards[0].data.shape[1] == T // 2
    tx2, step2 = make_train_step(cfg, lr=1e-3)
    with mesh:
        _, _, loss_sp = step2(sp, tx2.init(sp), batch)
    np.testing.assert_allclose(float(loss_single), float(loss_sp), rtol=2e-4)


def test_train_checkpoint_roundtrip(tmp_path):
    """Save/restore training state (params + moments + step) exactly."""
    from lele_tpu.models import SenseVoiceConfig, init_sensevoice
    from lele_tpu.train import make_train_step
    from lele_tpu.train.checkpoint import (
        latest_step,
        restore_train_state,
        save_train_state,
    )

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32",
    )
    rng = np.random.default_rng(5)
    batch = {
        "feats": rng.standard_normal((2, 10, cfg.input_dim)).astype(np.float32),
        "feat_mask": np.ones((2, 10), np.float32),
        "labels": rng.integers(1, 32, (2, 3)).astype(np.int32),
        "label_mask": np.ones((2, 3), np.float32),
    }
    params = init_sensevoice(jax.random.PRNGKey(0), cfg)
    tx, step = make_train_step(cfg, lr=1e-3)
    opt = tx.init(params)
    params, opt, _ = step(params, opt, batch)
    save_train_state(tmp_path, params, opt, 1)
    assert latest_step(tmp_path) == 1

    fresh_p = init_sensevoice(jax.random.PRNGKey(1), cfg)
    fresh_o = tx.init(fresh_p)
    rp, ro, rstep = restore_train_state(tmp_path, fresh_p, fresh_o)
    assert rstep == 1
    np.testing.assert_array_equal(
        np.asarray(rp["layers"][0]["qkv"]["w"]),
        np.asarray(params["layers"][0]["qkv"]["w"]),
    )
    # resuming produces identical next step to continuing
    p1, o1, l1 = step(params, opt, batch)
    p2, o2, l2 = step(rp, ro, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_moe_expert_parallel_train_step():
    """MoE FFN (top-1) with experts sharded over "model": runs on the mesh
    and matches the single-device loss."""
    from lele_tpu.models import SenseVoiceConfig, init_sensevoice
    from lele_tpu.train import make_train_step, shard_batch

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32", n_experts=4,
    )
    rng = np.random.default_rng(9)
    B = 4  # divisible by the mesh's data axis
    batch = {
        "feats": rng.standard_normal((B, 12, cfg.input_dim)).astype(np.float32),
        "feat_mask": np.ones((B, 12), np.float32),
        "labels": rng.integers(1, 32, (B, 4)).astype(np.int32),
        "label_mask": np.ones((B, 4), np.float32),
    }
    params = init_sensevoice(jax.random.PRNGKey(0), cfg)
    assert "moe" in params["layers"][0]
    tx, step = make_train_step(cfg, lr=1e-3)
    _, _, loss_single = step(jax.tree.map(jnp.copy, params), tx.init(params), batch)

    mesh = make_mesh(8, model=2)
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    w1 = sp["layers"][0]["moe"]["w1"]
    # experts really sharded: each model-shard holds E/2 experts
    assert {s.data.shape[0] for s in w1.addressable_shards} == {2}
    tx2, step2 = make_train_step(cfg, lr=1e-3)
    with mesh:
        _, _, loss_ep = step2(sp, tx2.init(sp), shard_batch(batch, mesh))
    np.testing.assert_allclose(float(loss_single), float(loss_ep), rtol=2e-4)


def test_moe_forward_selects_experts():
    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel

    cfg = SenseVoiceConfig(
        n_layers=1, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32", n_experts=4,
    )
    m = SenseVoiceModel(cfg)
    m.init(0)
    pcm = (np.random.default_rng(3).standard_normal(8000) * 0.1).astype(np.float32)
    logits = jax.jit(m.forward_fn())(m.params, pcm)
    assert np.isfinite(np.asarray(logits)).all()


def test_tensor_parallel_inference_matches_single_device():
    """Native encoder inference with Megatron-sharded params == unsharded."""
    from lele_tpu.models import SenseVoiceConfig, init_sensevoice, sensevoice_encode

    cfg = SenseVoiceConfig(
        n_layers=2, d_model=32, ffn_dim=64, vocab_size=32, n_heads=2,
        dtype="float32",
    )
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 10, cfg.input_dim)).astype(np.float32)
    mask = np.ones((2, 10), np.float32)
    params = init_sensevoice(jax.random.PRNGKey(0), cfg)
    ref = np.asarray(jax.jit(
        lambda p, f, m_: sensevoice_encode(p, f, m_, cfg)
    )(params, feats, mask))

    mesh = make_mesh(8, model=4)
    sp = shard_params(params, mesh)
    with mesh:
        got = np.asarray(jax.jit(
            lambda p, f, m_: sensevoice_encode(p, f, m_, cfg)
        )(sp, feats, mask))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_onnx_model_tensor_parallel_param_rules():
    """ONNX-compiled model with user param rules: weights shard over
    "model", inputs replicate, outputs match single-device."""
    from jax.sharding import PartitionSpec as P

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel, builder as ob

    rng = np.random.default_rng(6)
    w1 = rng.standard_normal((16, 512)).astype(np.float32)
    w2 = rng.standard_normal((512, 8)).astype(np.float32)
    bs = ob.build_model_bytes(
        [ob.node("MatMul", ["x", "w1"], ["h"]),
         ob.node("Relu", ["h"], ["hr"]),
         ob.node("MatMul", ["hr", "w2"], ["y"])],
        inputs=[ob.value_info("x", 1, [4, 16])],
        outputs=[ob.value_info("y", 1, [4, 8])],
        initializers=[ob.tensor_from_array(w1, "w1"),
                      ob.tensor_from_array(w2, "w2")],
    )
    x = rng.standard_normal((4, 16)).astype(np.float32)
    ref = np.maximum(x @ w1, 0) @ w2

    mesh = make_mesh(8, data=2, model=4)

    def rules(name, shape):
        if name == "w1":
            return P(None, "model")  # column-parallel
        if name == "w2":
            return P("model", None)  # row-parallel
        return None

    cm = compile_model(OnnxModel.from_bytes(bs), mesh=mesh, batch_axis=0,
                       param_rules=rules)
    w1_dev = cm.params["w1"]
    assert {s.data.shape for s in w1_dev.addressable_shards} == {(16, 128)}
    (y,) = cm.run_np(x)
    np.testing.assert_allclose(y, ref, atol=1e-3)


def test_pipeline_parallel_matches_sequential():
    """GPipe inference pipeline over a 4-device "pipe" mesh: stacked stage
    params shard one-stage-per-device, microbatches stream via ppermute,
    and the result matches the plain sequential stack."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lele_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

    rng = np.random.default_rng(0)
    S, D, batch, M = 4, 16, 8, 4
    per_stage = [
        {"w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.3),
         "b": jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1)}
        for _ in range(S)
    ]
    stacked = stack_stage_params(per_stage)

    def stage_fn(p, mb):
        return jnp.tanh(mb @ p["w"] + p["b"])

    x = rng.standard_normal((batch, D)).astype(np.float32)
    want = x
    for p in per_stage:
        want = np.tanh(want @ np.asarray(p["w"]) + np.asarray(p["b"]))

    mesh = Mesh(np.array(jax.devices()[:S]), ("pipe",))
    got = pipeline_apply(stage_fn, stacked, jnp.asarray(x), mesh, n_microbatch=M)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_pipeline_parallel_single_microbatch_and_ragged_guard():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lele_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

    rng = np.random.default_rng(1)
    S, D = 2, 8
    per_stage = [{"w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.2)}
                 for _ in range(S)]
    stacked = stack_stage_params(per_stage)
    stage_fn = lambda p, mb: mb @ p["w"]
    x = rng.standard_normal((3, D)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:S]), ("pipe",))
    # M=1 degenerates to plain staged execution
    got = pipeline_apply(stage_fn, stacked, jnp.asarray(x), mesh, n_microbatch=1)
    want = x @ np.asarray(per_stage[0]["w"]) @ np.asarray(per_stage[1]["w"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        pipeline_apply(stage_fn, stacked, jnp.asarray(x), mesh, n_microbatch=2)
