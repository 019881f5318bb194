"""Fixture-gated e2e tests (the reference's e2e_test.rs pattern,
SURVEY §4.7-8: load .npy fixtures of reference inputs/logits when present,
assert MAE/argmax agreement, and degrade to SKIP when fixtures are absent
so the suite never breaks without downloaded models)."""

from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).resolve().parents[1] / "fixtures"


def _need(*names):
    missing = [n for n in names if not (FIXTURES / n).exists()]
    if missing:
        pytest.skip(f"fixtures not present: {missing} (expected in {FIXTURES})")


def test_sensevoice_onnx_logits_parity():
    """Compile fixtures/sensevoice.onnx, run fixtures/sensevoice_input.npy,
    gate MAE ≤ 1.0 and per-frame argmax agreement > 0 against
    fixtures/sensevoice_logits.npy (thresholds from e2e_test.rs:69-190)."""
    _need("sensevoice.onnx", "sensevoice_input.npy", "sensevoice_logits.npy")
    from lele_tpu.compiler import compile_model

    feats = np.load(FIXTURES / "sensevoice_input.npy")
    want = np.load(FIXTURES / "sensevoice_logits.npy")
    cm = compile_model(
        str(FIXTURES / "sensevoice.onnx"),
        input_shapes={"speech": feats.shape},
        dim_values={"T": feats.shape[1]},
    )
    outs = cm.run_np(feats)
    got = outs[0]
    mae = np.abs(got - want).mean()
    assert mae <= 1.0, f"MAE {mae}"
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0


def test_silero_onnx_prob_trace_parity():
    _need("silero.onnx", "silero_probs.npy")
    from lele_tpu.compiler import compile_model
    from lele_tpu.utils.wav import read_wav

    pcm, sr = read_wav("/root/reference/fixtures/zh.wav")
    want = np.load(FIXTURES / "silero_probs.npy")
    cm = compile_model(
        str(FIXTURES / "silero.onnx"), donate=["state"],
    )
    state = np.zeros((2, 1, 128), np.float32)
    probs = []
    for i in range(len(want)):
        chunk = pcm[i * 512 : i * 512 + 512][None].astype(np.float32)
        out = cm.run_np(chunk, state, np.array(sr, np.int64))
        probs.append(float(out[0].reshape(-1)[0]))
        state = out[1]
    np.testing.assert_allclose(probs, want, atol=1e-3)
