#!/usr/bin/env python
"""Per-stage chained-slope decomposition of the flagship ASR forward.

Times, with the honest protocol (bench.py `_chain_slope`), each stage of
the w8a16 waveform→logits program in isolation:

  frontend   fbank features (framing, FFT, mel, LFR, CMVN)
  embed      prefix concat + scale + embed linear + positions
  stack      the 50-layer fused SAN-M Pallas program
  head       final LayerNorm + int8 CTC projection to [T, vocab]
  full       the whole fused program

full − (frontend+embed+stack+head) = cross-stage glue XLA pays at the
boundaries (output materialization, casts). Use it to find where the
residual between the stack's weight-streaming roofline and the headline
lives before hunting.  `python scripts/stage_probe.py`
"""

import sys
from pathlib import Path

import numpy as np

if any(a.startswith("-") for a in sys.argv[1:]):
    sys.exit(__doc__)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.runtime import enable_cache  # noqa: E402

enable_cache()


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
    from lele_tpu.models.common import cast_big_params
    from lele_tpu.models.sensevoice import (
        prepare_w8_params,
        stack_layer_params,
    )
    from lele_tpu.models.common import layer_norm, linear

    pcm, sr = bench._load_audio()
    audio_s = len(pcm) / sr
    cfg = SenseVoiceConfig(weight_int8=True)
    model = SenseVoiceModel(cfg)
    params = stack_layer_params(
        prepare_w8_params(cast_big_params(model.init(0), jnp.bfloat16))
    )
    fwd = model.forward_fn()
    fb = model.fbank

    Ks = (8, 40) if jax.devices()[0].platform == "tpu" else (1, 2)

    def slope(fn, args):
        return bench._chain_slope(fn, args, Ks=Ks)

    feats_host = np.asarray(fb(np.asarray(pcm, np.float32)))
    T = feats_host.shape[0]

    # frontend: pcm -> feats
    t_front = slope(lambda c, p, x: fb(x + c * 1e-30), (params, pcm))

    # embed: feats -> pre-stack hidden (mirror of sensevoice_encode's prologue)
    from lele_tpu.models.common import sinusoidal_positions

    def embed_stage(c, p, f):
        x = f + c * 1e-30
        B = 1
        prefix = jnp.broadcast_to(
            p["prefix"][: cfg.n_prefix], (B, cfg.n_prefix, cfg.input_dim)
        )
        x = jnp.concatenate([prefix, x[None]], axis=1)
        x = x * (cfg.d_model**0.5) / (cfg.input_dim**0.5)
        x = linear(p["embed"], x, dtype=cfg.compute_dtype).astype(jnp.float32)
        return x + sinusoidal_positions(T + cfg.n_prefix, cfg.d_model)

    t_embed = slope(embed_stage, (params, feats_host))

    # stack: hidden -> hidden through the fused Pallas program
    from lele_tpu.kernels.sanm_block import sanm_stack_w8_pallas

    x0 = np.asarray(
        jax.jit(embed_stage)(0.0, params, feats_host), np.float32
    )[0]
    mask = np.ones((x0.shape[0],), np.float32)

    def stack_stage(c, p, x, m):
        return sanm_stack_w8_pallas(
            x + c * 1e-30, m, p["layers_stacked"], cfg.n_heads,
            cfg.fsmn_kernel,
        )

    t_stack = slope(stack_stage, (params, x0, mask))

    # head: hidden -> logits
    def head_stage(c, p, x):
        h = layer_norm(p["after_norm"], x + c * 1e-30)
        return linear(p["ctc"], h, dtype=cfg.compute_dtype)

    t_head = slope(head_stage, (params, x0))

    # full program
    t_full = slope(lambda c, p, x: fwd(p, x + c * 1e-30), (params, pcm))

    rows = [
        ("frontend", t_front), ("embed", t_embed), ("stack", t_stack),
        ("head", t_head), ("full", t_full),
        ("glue=full-parts", t_full - (t_front + t_embed + t_stack + t_head)),
    ]
    for name, t in rows:
        print(f"{name:>16}: {t * 1e3:8.4f} ms"
              + (f"  (RTF {t / audio_s:.2e})" if name == "full" else ""))


if __name__ == "__main__":
    main()
