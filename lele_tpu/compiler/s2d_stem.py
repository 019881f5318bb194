"""Space-to-depth image-stem rewrite for compiled ONNX graphs.

An ONNX vision model's first Conv reads [B, 3, H, W] — on TPU the C=3
minor/lane padding and the small contraction make the stem the single
most expensive conv in the graph (~0.33 ms at 640² whatever the device
layout, docs/PERF.md r2). The native YOLO model fixes this with the s2d
conv domain (models/s2d.py); this pass brings the SAME rewrite to any
compiled checkpoint:

This module holds the DETECTION + host-packing primitives; the rewrite
itself lives in compiler/conv_domain.py (`build_conv_domain`, whose
chain of length 1 is exactly the old stem rewrite): `detect_stem` finds
the rewritable input Conv (stride 2, C_in ≤ 4, square kernel, H and W
divisible by 4 — otherwise the graph compiles unchanged), and
`pack_host` is the NCHW → s2d4 [B, H/4, W/4, 16C] packer the
CompiledModel applies to incoming numpy transparently, so `run_np`
keeps its drop-in ONNX signature. Reference counterpart: none (lele's
NEON conv2d has small-channel fast paths instead, conv2d.rs:535-567).
"""

from __future__ import annotations

import numpy as np


def _attr(node, name, default=None):
    from ..ops.registry import parse_attr

    for a in node.attribute:
        if a.name == name:
            return parse_attr(a)
    return default


def _attr_ints(node, name, default=None):
    v = _attr(node, name)
    return default if v is None else [int(x) for x in np.atleast_1d(v)]


def _attr_int(node, name, default=0):
    v = _attr(node, name)
    return default if v is None else int(v)


def detect_stem(model, specs):
    """→ (node_index, input_name, weight_name, bias_name) or None."""
    nodes = list(model.graph.node)
    input_names = set(model.input_names())
    inits = set(model.initializers)
    for i, n in enumerate(nodes):
        if n.op_type != "Conv":
            continue
        x = n.input[0]
        if x not in input_names or x not in specs:
            return None  # first Conv isn't on a graph input
        shape = specs[x][0]
        if len(shape) != 4 or shape[1] > 4 or shape[2] % 4 or shape[3] % 4:
            return None
        if _attr_ints(n, "strides", [1, 1]) != [2, 2]:
            return None
        if _attr_int(n, "group", 1) != 1:
            return None
        if _attr_ints(n, "dilations", [1, 1]) != [1, 1]:
            return None
        consumers = [m for m in nodes if x in list(m.input)]
        if len(consumers) != 1:
            return None
        if n.input[1] not in inits:
            return None
        bias = n.input[2] if len(n.input) > 2 else None
        return i, x, n.input[1], bias
    return None


def pack_host(x: np.ndarray) -> np.ndarray:
    """Host packer: NCHW [B, C, H, W] → s2d4 [B, H/4, W/4, 16C], slot
    (u*4+v)*C + c (models/s2d.py layout)."""
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // 4, 4, W // 4, 4)
    x = x.transpose(0, 2, 4, 3, 5, 1)
    return np.ascontiguousarray(x.reshape(B, H // 4, W // 4, 16 * C))
