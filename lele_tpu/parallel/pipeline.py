"""GPipe-style pipeline parallelism over a "pipe" mesh axis.

No reference counterpart (SURVEY.md §2.6 — the reference has no
distributed execution at all) and beyond the dp/tp/sp/ep axes elsewhere in
this package: layers are partitioned into S contiguous stages, one device
each, and microbatches stream through with `jax.lax.ppermute` hops on the
ICI ring. The schedule is the classic inference pipeline: S + M - 1 ticks
for M microbatches, bubble fraction (S-1)/(S+M-1).

Design notes (TPU-first):
- Stage params are STACKED on a leading axis and sharded over "pipe", so
  each device only holds (and only streams from HBM) its own stage's
  weights — the point of pipelining giant stacks that don't fit one chip.
- Everything runs inside ONE `shard_map`-ped program: the tick loop is a
  `lax.fori_loop`, the per-device stage apply is dense compute, and the
  hop is one `ppermute`. No host round trips between ticks.
- Stages must be shape-preserving ([mb, ...] in == out), which holds for
  the transformer-encoder stacks this framework targets.
"""

from __future__ import annotations

from functools import partial


def pipeline_apply(stage_fn, stage_params, x, mesh, n_microbatch: int,
                   axis: str = "pipe"):
    """Run `x` through S pipelined stages.

    stage_fn:      (params_slice, mb) -> mb, the per-stage computation.
                   Applied by every device to its own stage's params.
    stage_params:  pytree whose leaves are stacked [S, ...] per-stage
                   params (use `stack_stage_params`); sharded over `axis`.
    x:             [batch, ...] input; batch must divide by n_microbatch.
    mesh:          jax Mesh containing `axis` (size S).
    n_microbatch:  M; latency is (S + M - 1) stage-ticks.

    Returns [batch, ...] output (stage S-1's results, re-assembled).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    S = mesh.shape[axis]
    batch = x.shape[0]
    if batch % n_microbatch:
        raise ValueError(f"batch {batch} not divisible by M={n_microbatch}")
    M = n_microbatch
    mb = batch // M
    xs = x.reshape((M, mb) + x.shape[1:])

    # every device sees the full microbatch queue (replicated) but only its
    # own stage's params (sharded on the stacked axis)
    pspec_params = jax.tree.map(lambda _: P(axis), stage_params)
    fwd = [(i, (i + 1) % S) for i in range(S)]

    def device_body(params, xs_all):
        # params leaves arrive as [1, ...] (this device's stage); drop the
        # stage axis for the user fn
        p_local = jax.tree.map(lambda a: a[0], params)
        sid = jax.lax.axis_index(axis)
        zero = jnp.zeros_like(xs_all[0])
        out = jnp.zeros_like(xs_all)

        def tick(t, carry):
            cur, out = carry
            # stage 0 ingests microbatch t (while t < M); others use the
            # value ppermute'd from the previous stage last tick
            feed = jnp.where(t < M, xs_all[jnp.minimum(t, M - 1)], zero)
            cur = jnp.where(sid == 0, feed, cur)
            res = stage_fn(p_local, cur)
            # my microbatch index this tick; valid while 0 <= t-sid < M
            mine = t - sid
            valid = (mine >= 0) & (mine < M)
            res = jnp.where(valid, res, zero)
            # last stage banks its finished microbatch
            slot = jnp.clip(mine, 0, M - 1)
            bank = valid & (sid == S - 1)
            out = out.at[slot].set(jnp.where(bank, res, out[slot]))
            # hop to the next stage for the next tick
            cur = jax.lax.ppermute(res, axis, fwd)
            return cur, out

        _, out = jax.lax.fori_loop(0, S + M - 1, tick, (zero, out))
        # only stage S-1's bank is populated; psum broadcasts it to all
        # (other stages contribute zeros)
        return jax.lax.psum(out, axis)

    sharded = shard_map(
        device_body, mesh=mesh,
        in_specs=(pspec_params, P()),
        out_specs=P(),
        check_rep=False,
    )
    params_sh = jax.device_put(
        stage_params,
        jax.tree.map(lambda s: NamedSharding(mesh, s), pspec_params),
    )
    out = sharded(params_sh, xs)
    return out.reshape((batch,) + x.shape[1:])


def stack_stage_params(per_stage: list):
    """[p_0, ..., p_{S-1}] pytrees (same structure) → one pytree with
    leaves stacked on a new leading stage axis, ready to shard on "pipe"."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda *ls: jnp.stack(ls), *per_stage)
