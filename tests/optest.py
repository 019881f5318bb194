"""Shared helper: run a single ONNX op (or small graph) through the full
compile pipeline and return numpy outputs.

This is the analog of the reference's one-op ORT oracle harness
(tests/verify_kernels_with_ort.py) — but driven end to end through our own
builder → loader → tracer → XLA, asserted against numpy/scipy oracles.
"""

import numpy as np

from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel, builder as ob


def run_op(
    op_type,
    inputs,
    n_outputs=1,
    initializers=None,
    opset=17,
    input_names=None,
    strict=True,
    **attrs,
):
    """inputs: dict name→array (dynamic graph inputs);
    initializers: dict name→array (static). Returns list of np outputs."""
    initializers = initializers or {}
    in_names = input_names or list(inputs) + list(initializers)
    out_names = [f"out{i}" for i in range(n_outputs)]
    node = ob.node(op_type, in_names, out_names, **attrs)
    bs = ob.build_model_bytes(
        [node],
        inputs=[ob.vi_from_array(k, v) for k, v in inputs.items()],
        outputs=[ob.value_info(o, 1, []) for o in out_names],
        initializers=[ob.tensor_from_array(v, k) for k, v in initializers.items()],
        opset=opset,
    )
    cm = compile_model(OnnxModel.from_bytes(bs), strict=strict)
    return cm.run_np(**{k: v for k, v in inputs.items()})


def run_graph(nodes, inputs, output_names, initializers=None, opset=17, strict=True):
    initializers = initializers or {}
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.vi_from_array(k, v) for k, v in inputs.items()],
        outputs=[ob.value_info(o, 1, []) for o in output_names],
        initializers=[ob.tensor_from_array(v, k) for k, v in initializers.items()],
        opset=opset,
    )
    cm = compile_model(OnnxModel.from_bytes(bs), strict=strict)
    return cm.run_np(**{k: v for k, v in inputs.items()})


def assert_close(got, want, tol=1e-5):
    """Max-abs-diff assertion, mirroring the reference's assert_close
    (tests/kernel_accuracy.rs:5-24)."""
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    assert got.shape == want.shape, f"shape {got.shape} != {want.shape}"
    diff = np.max(np.abs(got - want)) if got.size else 0.0
    assert diff <= tol, f"max abs diff {diff} > {tol}"
