"""Foreign-provenance flagship check ON THE REAL TPU KERNEL.

tests/test_sanm_fuse_torch.py proves a torch-exported, generically
quantized SAN-M encoder fuses in the Pallas INTERPRETER (CPU CI). This
script is the real-hardware twin: d_model=512 / head_dim=128 satisfies the
lane-alignment gate, so LELE_SANM_FUSE=1 routes the torch-provenance graph
through the actual Mosaic-compiled stack kernel, asserts per-op parity on
device, and reports the chained-slope time.

Run on the TPU host (no pytest env): python scripts/torch_provenance_tpu.py
"""

import math
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

L, T, D, H, FFN, K = 8, 256, 512, 4, 2048, 11


def build_export() -> tuple[str, tuple]:
    import torch
    import torch.nn as nn

    from lele_tpu.onnx.torch_shim import install

    install()

    class SanmLayer(nn.Module):
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

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList(SanmLayer() for _ in range(L))

        def forward(self, x, attn_bias, vmask):
            for layer in self.layers:
                x = layer(x, attn_bias, vmask)
            return x

    torch.manual_seed(20)
    m = Enc().eval()
    x = torch.randn(1, T, D)
    attn_bias = torch.zeros(1, 1, 1, T)
    vmask = torch.ones(1, 1, T)
    path = tempfile.mktemp(suffix=".onnx")
    with torch.no_grad():
        torch.onnx.export(m, (x, attn_bias, vmask), path,
                          opset_version=17, dynamo=False,
                          input_names=["x", "attn_bias", "vmask"])
    return path, (x.numpy(), attn_bias.numpy(), vmask.numpy())


def main():
    from lele_tpu.compiler import compile_model
    from lele_tpu.config import config
    from lele_tpu.onnx.quantize import quantize_dynamic

    # the parity gate compares the fused Pallas kernel (f32 attention/LN
    # internals) against the per-op XLA path — run the per-op oracle at
    # ORT-parity (f32) matmul precision, not the TPU bf16 default, or the
    # ORACLE carries ~1e-2 of bf16 rounding the kernel doesn't have
    config.matmul_precision = "highest"

    import jax

    dev = jax.devices()[0]
    print(f"[provenance] device = {dev}")

    fpath, args = build_export()
    qpath = tempfile.mktemp(suffix=".onnx")
    with open(fpath, "rb") as f:
        Path(qpath).write_bytes(quantize_dynamic(f.read()))
    print(f"[provenance] torch export {Path(fpath).stat().st_size / 1e6:.0f}"
          f" MB -> quantized {Path(qpath).stat().st_size / 1e6:.0f} MB")

    os.environ["LELE_SANM_FUSE"] = "0"
    cm0 = compile_model(qpath)
    want = np.asarray(cm0.run_np(*args)[0])
    assert "sanm_fused_layers" not in cm0.stats["pattern_hits"]

    os.environ["LELE_SANM_FUSE"] = "1"
    cm1 = compile_model(qpath)
    hits = cm1.stats["pattern_hits"].get("sanm_fused_layers", 0)
    print(f"[provenance] sanm_fused_layers = {hits} (want {L})")
    assert hits == L, cm1.stats["pattern_hits"]
    got = np.asarray(cm1.run_np(*args)[0])
    mae = np.abs(got - want).mean()
    mx = np.abs(got - want).max()
    print(f"[provenance] fused-vs-per-op on device: MAE {mae:.2e} "
          f"max {mx:.2e}")
    # the real kernel's attention dots are bf16-in/f32-accum by design
    # (kernels/sanm_block.py — the deployment numerics the int8 model
    # gates at MAE <= 0.02 in test_fixture_e2e); interpret-mode CI holds
    # the tighter 2e-3 bound where both sides are f32
    assert mae < 2e-2 and mx < 0.15, (mae, mx)

    # chained-slope timing of the fused torch-provenance program
    # (LELE_SANM_FUSE stays "1": _walk_fn re-matches at jit-trace time)
    from bench import _chain_slope  # repo-root bench harness

    import jax.numpy as jnp

    xs = [jnp.asarray(a) for a in args]

    def body(c, p, x, ab, vm):
        return cm1._walk_fn(p, {"x": x + c * 1e-30, "attn_bias": ab,
                                "vmask": vm})

    ms = _chain_slope(body, (cm1.params, xs[0], xs[1], xs[2]),
                      Ks=(4, 32), reps=5) * 1e3
    print(f"[provenance] fused forward (8L d512 T256, torch-provenance): "
          f"{ms:.3f} ms")
    print("[provenance] OK")


if __name__ == "__main__":
    main()
