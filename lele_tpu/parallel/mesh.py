"""Device mesh construction.

Default topology: 2-D ("data", "model") — data parallelism over the first
axis, tensor parallelism over the second. A 3-D ("data", "seq", "model")
mesh adds sequence parallelism: activations shard over time and GSPMD
all-gathers K/V inside attention (collectives ride ICI). Axis sizes
auto-factor from the device count; callers can pin sizes explicitly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "model")
AXES3 = ("data", "seq", "model")


def mesh_axes() -> tuple[str, str]:
    return AXES


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    model: int | None = None,
    seq: int | None = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if seq is not None:
        rest = n // seq
        if data is None and model is None:
            model = 2 if rest % 2 == 0 else 1
            data = rest // model
        elif data is None:
            data = rest // model
        elif model is None:
            model = rest // data
        assert data * seq * model == n, f"mesh {data}x{seq}x{model} != {n}"
        return Mesh(np.asarray(devices).reshape(data, seq, model), AXES3)
    if data is None and model is None:
        # favor model-parallel up to 4, rest data-parallel
        model = 1
        for cand in (4, 2):
            if n % cand == 0:
                model = cand
                break
        data = n // model
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, AXES)
