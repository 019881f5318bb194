"""Fine-tuning support: sharded CTC training step for the ASR family.

Beyond the reference (lele is inference-only — SURVEY.md intro); included
because a TPU-native stack should fine-tune the models it serves. The step
jits over a ("data", "model") mesh with Megatron-style param shardings from
lele_tpu.parallel; XLA inserts the gradient psums.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.sensevoice import SenseVoiceConfig, sensevoice_encode


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def ctc_loss_fn(params, batch, cfg: SenseVoiceConfig):
    logits = sensevoice_encode(params, batch["feats"], batch["feat_mask"], cfg)
    # drop the 4 prefix query frames for CTC alignment
    logits = logits[:, cfg.n_prefix :, :]
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logit_pad = 1.0 - batch["feat_mask"]
    label_pad = 1.0 - batch["label_mask"]
    loss = optax.ctc_loss(logprobs, logit_pad, batch["labels"], label_pad)
    denom = jnp.maximum(jnp.sum(batch["label_mask"]), 1.0)
    return jnp.sum(loss) / denom


def _step_body(params, opt_state, batch, cfg: SenseVoiceConfig, tx):
    """The one training-step body (value_and_grad → tx.update → apply) —
    ctc_train_step and make_train_step both run THIS, so a change (grad
    clipping, loss scaling) can never reach one and miss the other."""
    loss, grads = jax.value_and_grad(ctc_loss_fn)(params, batch, cfg)
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt, loss


def ctc_train_step(state: TrainState, batch, cfg: SenseVoiceConfig, tx):
    """TrainState convenience wrapper (unjitted: the debugging/eager
    surface; production loops use make_train_step's jitted step)."""
    new_params, new_opt, loss = _step_body(
        state.params, state.opt_state, batch, cfg, tx)
    return TrainState(new_params, new_opt, state.step + 1), loss


def make_train_step(cfg: SenseVoiceConfig, lr: float = 1e-4):
    """Returns (tx, jitted_step).

    Sharded use: place params with `parallel.shard_params(params, mesh)`
    BEFORE `tx.init` — the optimizer moments then inherit the tensor-parallel
    shardings, the batch is device_put with P("data", ...) placement, and
    plain jit + GSPMD propagates everything (collectives inserted by XLA).
    """
    tx = optax.adamw(lr)

    def step(params, opt_state, batch):
        return _step_body(params, opt_state, batch, cfg, tx)

    return tx, jax.jit(step, donate_argnums=(0, 1))


def shard_batch(batch, mesh):
    """Batch over "data"; on a 3-D mesh, time-major tensors (feats,
    feat_mask) additionally shard their T axis over "seq" (sequence
    parallelism — GSPMD all-gathers K/V inside attention)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    has_seq = "seq" in mesh.shape
    seq_keys = {"feats", "feat_mask"}

    def put(name, arr):
        rank = arr.ndim
        parts = ["data"] + [None] * (rank - 1)
        if has_seq and name in seq_keys and rank >= 2:
            if arr.shape[1] % mesh.shape["seq"] == 0:
                parts[1] = "seq"
        return jax.device_put(arr, NamedSharding(mesh, P(*parts)))

    return {k: put(k, v) for k, v in batch.items()}
