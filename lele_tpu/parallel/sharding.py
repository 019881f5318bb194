"""Sharding rules: param-path → PartitionSpec.

Megatron-style tensor parallelism for the transformer blocks: column-parallel
first matmul (qkv / ffn1 sharded on the output feature axis), row-parallel
second matmul (out / ffn2 sharded on the input feature axis) so each block
needs exactly one psum, which XLA inserts automatically from the shardings.
Activations shard on batch over the "data" axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

def batch_sharding(mesh: Mesh, rank: int = 3) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (rank - 1))))


def sensevoice_param_rules(path: str) -> P:
    """PartitionSpec for a SenseVoice param, keyed by its tree path string.

    qkv/ffn1 → column-parallel (shard last dim on "model");
    out/ffn2 → row-parallel (shard first dim);
    biases of row-parallel layers + norms + small tensors → replicated.
    """
    if path.endswith("qkv/w") or path.endswith("ffn1/w"):
        return P(None, "model")
    if path.endswith("qkv/b") or path.endswith("ffn1/b"):
        return P("model")
    if path.endswith("out/w") or path.endswith("ffn2/w"):
        return P("model", None)
    if path.endswith("ctc/w"):
        return P(None, "model")
    if path.endswith("ctc/b"):
        return P("model")
    if path.endswith("fsmn/w"):
        return P(None, "model")
    if "/moe/w1" in path or "/moe/w2" in path:
        return P("model", None, None)  # expert parallelism
    return P()


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, f"{prefix}{i}/")
    else:
        yield prefix.rstrip("/"), tree


def shard_params(params, mesh: Mesh, rules=sensevoice_param_rules):
    """Place a param pytree on the mesh per the rules (device_put once).

    A rule only applies when every named axis DIVIDES the corresponding
    array dimension — otherwise that leaf replicates. The flagship's CTC
    head is the canonical case: vocab 25055 has no power-of-two factor, so
    on model=2/4/8 meshes it stays replicated instead of device_put
    raising, and the matmul still runs with sharded activations."""
    flat = dict(_tree_paths(params))

    def spec_for(path, leaf):
        spec = rules(path)
        shape = getattr(leaf, "shape", ())
        for i, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else \
                int(np.prod([mesh.shape[a] for a in axis]))
            if i >= len(shape) or shape[i] % size:
                return P()  # not evenly partitionable → replicate
        return spec

    placed = {
        p: jax.device_put(l, NamedSharding(mesh, spec_for(p, l)))
        for p, l in flat.items()
    }
    # rebuild tree
    return _unflatten(placed)


def _unflatten(flat: dict):
    root: dict = {}
    for path, leaf in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return _listify(root)


def _listify(node):
    if isinstance(node, dict):
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [_listify(node[str(i)]) for i in range(len(keys))]
        return {k: _listify(v) for k, v in node.items()}
    return node


def param_spec_tree(params, rules=sensevoice_param_rules):
    """Pytree of PartitionSpecs matching the params structure (for jit
    in_shardings/out_shardings)."""
    flat = dict(_tree_paths(params))
    placed = {p: rules(p) for p in flat}
    return _unflatten(placed)


def dp_put(mesh: Mesh, arrays, axis: int = 0):
    """device_put live batch inputs with the batch dim sharded over
    "data" (the serving dp layout). An array whose batch dim does not
    divide the axis replicates instead — same leniency rule as
    shard_params, so partially-filled power-of-two batches still run."""
    dp = mesh.shape.get("data", 1)
    out = []
    for a in arrays:
        a = np.asarray(a)
        spec = [None] * a.ndim
        if a.ndim > axis and dp > 1 and a.shape[axis] % dp == 0:
            spec[axis] = "data"
        out.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
    return tuple(out)
