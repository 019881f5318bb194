"""Planner → engine → batcher integration (VERDICT r3 #4).

The roofline planner's recommended layout is wired INTO the compiled
engine: `plan_mesh` turns a MeshPlan into the jax Mesh + compile kwargs
that `compiler.compile_model` takes, and the MicroBatcher fans coalesced
requests across the mesh's "data" axis. Runs on the 8-virtual-device CPU
mesh from conftest; the multichip driver exercises the same leg
(__graft_entry__._dryrun_serving).
"""

import threading

import jax
import numpy as np
import pytest

from lele_tpu.parallel import (
    EncoderSpec,
    plan_encoder,
    plan_mesh,
    recommend_plan,
    recommend_serving_plan,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_planner_ranks_and_recommends():
    spec = EncoderSpec(batch=8, seq=96)
    plans = plan_encoder(spec, 8)
    assert plans and plans == sorted(plans, key=lambda p: p.step_s)
    assert all(p.chips == 8 for p in plans)
    best = recommend_plan(spec, 8)
    assert best.fits_hbm and not best.notes
    srv = recommend_serving_plan(spec, 8)
    assert srv.tp == 1 and srv.sp == 1 and srv.dp == 8


def test_plan_mesh_shapes_match_plan():
    spec = EncoderSpec(batch=8, seq=96)
    srv = recommend_serving_plan(spec, 8)
    mesh, kw = plan_mesh(srv)
    assert dict(mesh.shape) == {"data": srv.dp, "seq": srv.sp,
                                "model": srv.tp}
    assert kw["batch_axis"] == 0 and kw["mesh"] is mesh
    # a tp/sp plan carries seq_axis only when sp > 1
    tp_plan = next(p for p in plan_encoder(spec, 8) if p.sp > 1)
    _, kw2 = plan_mesh(tp_plan)
    assert kw2.get("seq_axis") == 1


def test_batcher_over_planned_dp_engine_bit_equal():
    """Concurrent requests through MicroBatcher over the planner's dp mesh.

    Two gates: (a) BIT-equality of each request's output whether it rides
    the coalesced batch or a batch alone — the serving-correctness property
    (no cross-request contamination, deterministic under batching; same
    compiled program either way); (b) tight allclose vs the UNSHARDED
    single-device program — bit-equality across those two is not a sound
    gate, they are different XLA programs (per-shard batch 1 vs batch 8
    tiles/fuses differently, so f32 reduction order differs at ~1e-7)."""
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.runtime.batcher import MicroBatcher

    import __graft_entry__ as ge

    rng = np.random.default_rng(0)
    D, H, F, L, T, B = 32, 2, 64, 2, 12, 8
    spec = EncoderSpec(n_layers=L, d_model=D, ffn=F, vocab=D, seq=T,
                       batch=B, weight_bytes=4)
    plan = recommend_serving_plan(spec, 8, quantized=False)
    mesh, kw = plan_mesh(plan)
    model = OnnxModel.from_bytes(ge._build_mha_encoder_bytes(rng, D, H, F, L))
    ref = compile_model(model, dim_values={"B": B, "T": T})
    cm = compile_model(model, dim_values={"B": B, "T": T}, **kw)

    reqs = [rng.standard_normal((T, D)).astype(np.float32) for _ in range(6)]

    def process(items):
        x = np.zeros((B, T, D), np.float32)
        for i, it in enumerate(items):
            x[i] = it
        with mesh:
            (y,) = cm.run_np(x)
        return [y[i] for i in range(len(items))]

    mb = MicroBatcher(process, max_batch=B, window_ms=50.0)
    results = [None] * len(reqs)
    ts = [threading.Thread(target=lambda i=i: results.__setitem__(
        i, mb.submit(reqs[i]))) for i in range(len(reqs))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    mb.close()

    # (a) bit-equal vs the same engine with the request batched ALONE
    for i, r in enumerate(reqs):
        alone = np.zeros((B, T, D), np.float32)
        alone[0] = r
        with mesh:
            (ya,) = cm.run_np(alone)
        assert np.array_equal(results[i], ya[0]), f"request {i} batch-dep"

    # (b) tight agreement with the unsharded single-device program
    x_ref = np.zeros((B, T, D), np.float32)
    for i, r in enumerate(reqs):
        x_ref[i] = r
    (want,) = ref.run_np(x_ref)
    for i in range(len(reqs)):
        np.testing.assert_allclose(results[i], want[i], atol=1e-5, rtol=1e-5)
    xs = cm._prep("x", x_ref)
    assert len(xs.addressable_shards) >= plan.dp
