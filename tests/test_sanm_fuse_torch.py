"""Foreign-provenance robustness for the SAN-M whole-layer fusion: a graph
EXPORTED BY TORCH (not our onnx/synth.py) and quantized by onnx/quantize.py
must fuse — and agree with the per-op trace of the identical bytes.

This closes the remaining circularity in the r3 verdict ("the matcher and
the exporter are written by the same hand"): here the exporter is
torch.onnx's TorchScript backend with all its idioms (Constant-node shapes
and scales, Div-form attention scaling, opset-17 Split-with-sizes-input,
Identity glue), and the int8 form comes from the generic dynamic quantizer,
mirroring how real FunASR checkpoints are produced (float export + ORT
quantize_dynamic). The fused kernel's generality contract is the same as
the reference compiler's: compile arbitrary exports, not just your own
(/root/reference/src/compiler/generate.rs:802-997).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx.quantize import quantize_dynamic  # noqa: E402
from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()

L, T, D, H, FFN, K = 2, 48, 64, 4, 128, 11


class SanmLayer(nn.Module):
    """The SAN-M transformer layer in its export form: fused-qkv attention
    with Div scaling + additive bias, the depthwise-conv FSMN memory branch
    on v, post-LN residual blocks (FunASR SenseVoice encoder architecture,
    written independently in torch)."""

    def __init__(self):
        super().__init__()
        self.ln1 = nn.LayerNorm(D)
        self.qkv = nn.Linear(D, 3 * D)
        self.fsmn = nn.Conv1d(D, D, K, groups=D, bias=False,
                              padding=(K - 1) // 2)
        self.out = nn.Linear(D, D)
        self.ln2 = nn.LayerNorm(D)
        self.ff1 = nn.Linear(D, FFN)
        self.ff2 = nn.Linear(FFN, D)

    def forward(self, x, attn_bias, vmask):
        hd = D // H
        y = self.ln1(x)
        q, k, v = self.qkv(y).chunk(3, dim=-1)
        qh = q.reshape(1, T, H, hd).permute(0, 2, 1, 3)
        kh = k.reshape(1, T, H, hd).permute(0, 2, 3, 1)
        vh = v.reshape(1, T, H, hd).permute(0, 2, 1, 3)
        att = torch.matmul(qh, kh) / math.sqrt(hd)
        att = torch.softmax(att + attn_bias, dim=-1)
        ctx = torch.matmul(att, vh).permute(0, 2, 1, 3).reshape(1, T, D)
        fs = self.fsmn(v.transpose(1, 2) * vmask).transpose(1, 2)
        h1 = x + self.out(ctx + fs)
        return h1 + self.ff2(torch.relu(self.ff1(self.ln2(h1))))


class SanmEncoder(nn.Module):
    def __init__(self, n_layers=L):
        super().__init__()
        self.layers = nn.ModuleList(SanmLayer() for _ in range(n_layers))

    def forward(self, x, attn_bias, vmask):
        for layer in self.layers:
            x = layer(x, attn_bias, vmask)
        return x


def _export_quantized(tmp_path):
    torch.manual_seed(11)
    m = SanmEncoder().eval()
    x = torch.randn(1, T, D)
    attn_bias = torch.zeros(1, 1, 1, T)
    attn_bias[..., T - 6:] = -1e4  # padded tail masked out
    vmask = torch.ones(1, 1, T)
    vmask[..., T - 6:] = 0.0
    path = str(tmp_path / "sanm_torch.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (x, attn_bias, vmask), path,
                          opset_version=17, dynamo=False,
                          input_names=["x", "attn_bias", "vmask"])
        want_float = m(x, attn_bias, vmask).numpy()
    with open(path, "rb") as f:
        qdata = quantize_dynamic(f.read())
    qpath = tmp_path / "sanm_torch_int8.onnx"
    qpath.write_bytes(qdata)
    args = (x.numpy(), attn_bias.numpy(), vmask.numpy())
    return qpath, args, want_float


def _run(qpath, args, mode, monkeypatch):
    monkeypatch.setenv("LELE_SANM_FUSE", mode)
    cm = compile_model(str(qpath))
    out = np.asarray(cm.run_np(*args)[0])
    return out, cm.stats["pattern_hits"]


def test_torch_exported_encoder_fuses_with_parity(tmp_path, monkeypatch):
    qpath, args, want_float = _export_quantized(tmp_path)
    per_op, hits0 = _run(qpath, args, "0", monkeypatch)
    assert "sanm_fused_layers" not in hits0
    fused, hits1 = _run(qpath, args, "interpret", monkeypatch)
    # BOTH layers of the torch export must route through the stack kernel
    assert hits1.get("sanm_fused_layers", 0) == L, hits1
    np.testing.assert_allclose(fused, per_op, atol=2e-3, rtol=0)
    # and the per-op compile of the quantized graph tracks the float torch
    # model within dynamic-quantization noise (independent oracle)
    assert np.abs(per_op - want_float).mean() < 0.03


def test_torch_export_unquantized_bails_cleanly(tmp_path, monkeypatch):
    """The FLOAT torch export has no DQL chains — the matcher must bail to
    the per-op path, which must agree with torch itself."""
    torch.manual_seed(12)
    m = SanmEncoder(n_layers=1).eval()
    x = torch.randn(1, T, D)
    attn_bias = torch.zeros(1, 1, 1, T)
    vmask = torch.ones(1, 1, T)
    path = str(tmp_path / "sanm_float.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (x, attn_bias, vmask), path,
                          opset_version=17, dynamo=False)
        want = m(x, attn_bias, vmask).numpy()
    monkeypatch.setenv("LELE_SANM_FUSE", "interpret")
    cm = compile_model(path)
    assert "sanm_fused_layers" not in cm.stats["pattern_hits"]
    out = np.asarray(cm.run_np(x.numpy(), attn_bias.numpy(),
                               vmask.numpy())[0])
    np.testing.assert_allclose(out, want, atol=5e-4, rtol=1e-4)


def test_function_packaged_export_fuses(tmp_path, monkeypatch):
    """torch export_modules_as_functions packaging: each SAN-M layer ships
    as a FunctionProto call. Inlining (compile-time AND inside
    quantize_dynamic, whose MatMul rewrite cannot see function bodies)
    must compose with the matcher — the flagship fusion survives the
    function-packaged real-export form."""
    from lele_tpu.onnx import schema

    torch.manual_seed(13)
    m = SanmEncoder().eval()
    x = torch.randn(1, T, D)
    attn_bias = torch.zeros(1, 1, 1, T)
    vmask = torch.ones(1, 1, T)
    path = str(tmp_path / "sanm_fn.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (x, attn_bias, vmask), path,
                          opset_version=17, dynamo=False,
                          input_names=["x", "attn_bias", "vmask"],
                          export_modules_as_functions={SanmLayer})
        want_float = m(x, attn_bias, vmask).numpy()
    with open(path, "rb") as f:
        data = f.read()
    assert schema.decode_model(data).functions, "export not function-packaged"
    qpath = tmp_path / "sanm_fn_int8.onnx"
    qpath.write_bytes(quantize_dynamic(data))
    args = (x.numpy(), attn_bias.numpy(), vmask.numpy())
    per_op, hits0 = _run(qpath, args, "0", monkeypatch)
    fused, hits1 = _run(qpath, args, "interpret", monkeypatch)
    assert hits1.get("sanm_fused_layers", 0) == L, hits1
    np.testing.assert_allclose(fused, per_op, atol=2e-3, rtol=0)
    assert np.abs(per_op - want_float).mean() < 0.03
