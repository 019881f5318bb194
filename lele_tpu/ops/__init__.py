"""ONNX op semantics over jnp/numpy — the portable kernel layer.

Importing this package registers every builtin emitter in ``registry.OPS``.
The module split mirrors the reference's emitter files (SURVEY.md §2.1):
math_ops ↔ ops/math.rs, nn_ops ↔ ops/nn.rs, tensor_ops ↔ ops/tensor.rs,
activation_ops ↔ ops/activations.rs, quant_ops ↔ kernels/quantization.rs.
Control flow (If) lives in the tracer, which owns subgraph scoping.
"""

from . import (  # noqa: F401
    activation_ops,
    attention_ops,
    contrib_ops,
    deform_ops,
    diffusion_ops,
    extra_ops,
    fused_ops,
    genai_ops,
    io_ops,
    math_ops,
    moe_ops,
    nn_ops,
    packed_ops,
    qlinear_ops,
    quant_ops,
    search_ops,
    string_ops,
    tensor_ops,
    tfidf_ops,
)
from .registry import OPS, OpContext, make_ctx, op  # noqa: F401
