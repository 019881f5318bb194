#!/usr/bin/env python
"""Fine-tune the SenseVoice-style encoder with CTC on synthetic data —
demonstrates the training path (beyond the inference-only reference) and the
sharded step from lele_tpu.train.

Usage: python examples/finetune_sensevoice.py [--steps 20] [--mesh]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()

import jax  # noqa: E402

from lele_tpu.models import SenseVoiceConfig, init_sensevoice  # noqa: E402
from lele_tpu.train import make_train_step, shard_batch  # noqa: E402


def synthetic_batch(rng, cfg, B=8, T=32, L=8):
    """Labels correlate with input features so the loss can actually drop."""
    labels = rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32)
    feats = rng.standard_normal((B, T, cfg.input_dim)).astype(np.float32) * 0.1
    for b in range(B):
        for i, tok in enumerate(labels[b]):
            feats[b, i * (T // L) : (i + 1) * (T // L), tok % cfg.input_dim] += 2.0
    return {
        "feats": feats,
        "feat_mask": np.ones((B, T), np.float32),
        "labels": labels,
        "label_mask": np.ones((B, L), np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--mesh", action="store_true", help="shard over all devices")
    args = ap.parse_args()

    cfg = SenseVoiceConfig(
        n_layers=args.layers, d_model=64, ffn_dim=256, vocab_size=128, n_heads=2,
        dtype="float32",
    )
    params = jax.jit(lambda k: init_sensevoice(k, cfg))(jax.random.PRNGKey(0))
    mesh = None
    if args.mesh:
        from lele_tpu.parallel import make_mesh, shard_params

        mesh = make_mesh()
        params = shard_params(params, mesh)
        print(f"mesh: {dict(mesh.shape)}")
    tx, step = make_train_step(cfg, lr=3e-4)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, cfg)
    if mesh is not None:
        batch = shard_batch(batch, mesh)
    losses = []
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
        if i % 5 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  ctc_loss {losses[-1]:.4f}")
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.2f}s ({dt / args.steps * 1e3:.1f} ms/step)")
    assert losses[-1] < losses[0], "loss did not decrease"
    print("loss decreased:", f"{losses[0]:.3f} → {losses[-1]:.3f}")


if __name__ == "__main__":
    main()
