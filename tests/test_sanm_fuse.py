"""Whole-layer SAN-M fusion on compiled int8 graphs (compiler/sanm_fuse.py).

The same fixture graph is compiled twice — per-op path (LELE_SANM_FUSE=0)
vs fused-stack path (interpret mode on CPU) — and the logits must agree.
The int8 linears are bit-exact by construction (same DQL math, exact int
dots); the tolerance covers f32 reduction-order noise in LN/attention.
This is the compiled-path analog of tests/test_pallas_parity.py (the
reference's backend-equivalence pattern, tests/verify_neon_accuracy.rs).
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).resolve().parents[1] / "fixtures"


def _need(*names):
    missing = [n for n in names if not (FIXTURES / n).exists()]
    if missing:
        pytest.skip(f"fixtures not present: {missing}")


def _compile_fixture(monkeypatch, mode: str):
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx.loader import OnnxModel

    monkeypatch.setenv("LELE_SANM_FUSE", mode)
    feats = np.load(FIXTURES / "sensevoice_input.npy")
    t = feats.shape[1]
    t_pad = -(-t // 32) * 32
    padded = np.zeros((1, t_pad, feats.shape[2]), np.float32)
    padded[:, :t] = feats
    model = OnnxModel.load(str(FIXTURES / "sensevoice.onnx"))
    cm = compile_model(model, input_shapes={"speech": (1, t_pad, 560)})
    outs = cm.run_np(
        speech=padded,
        speech_lengths=np.asarray([t], np.int64),
        language=np.asarray([3], np.int32),
        textnorm=np.asarray([0], np.int32),
    )
    return np.asarray(outs[0]), cm.stats["pattern_hits"]


def test_fused_stack_matches_per_op(monkeypatch):
    """Fused whole-layer kernel ≡ per-op trace of the identical graph."""
    _need("sensevoice.onnx", "sensevoice_input.npy")
    want, hits0 = _compile_fixture(monkeypatch, "0")
    assert "sanm_fused_layers" not in hits0
    got, hits1 = _compile_fixture(monkeypatch, "interpret")
    # all 4 fixture layers must route through the stack kernel
    assert hits1.get("sanm_fused_layers", 0) == 4, hits1
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)
    # argmax parity must be essentially perfect (same quantization grid)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"


def test_fused_stack_vs_independent_oracle(monkeypatch):
    """Fused path vs the checked-in reference_eval oracle (computed
    independently of the XLA compile) — same MAE gate as the per-op
    fixture e2e test."""
    _need("sensevoice.onnx", "sensevoice_input.npy", "sensevoice_logits.npy")
    want = np.load(FIXTURES / "sensevoice_logits.npy")
    got, hits = _compile_fixture(monkeypatch, "interpret")
    assert hits.get("sanm_fused_layers", 0) == 4
    got = got[:, : want.shape[1]]
    # measured: fused and per-op agree with each other to ~1e-6; BOTH sit
    # at MAE ≈ 0.0045 vs the f64 oracle (f32 activation-quant boundary
    # flips) — gate with margin at 0.02 (logit std ≈ 1.0)
    mae = np.abs(got - want).mean()
    assert mae <= 0.02, f"MAE {mae}"
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.97, f"argmax agreement {agree}"


def test_fuse_off_by_env(monkeypatch):
    """LELE_SANM_FUSE=0 keeps the per-op path (and stays correct —
    covered in depth by test_fixture_e2e)."""
    _need("sensevoice.onnx", "sensevoice_input.npy")
    _, hits = _compile_fixture(monkeypatch, "0")
    assert hits.get("dql_matmul_dataflow", 0) >= 1
    assert "sanm_fused_layers" not in hits
