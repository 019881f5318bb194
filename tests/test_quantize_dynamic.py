"""Dynamic-quantizer graph transform (onnx/quantize.py).

The reference consumes ORT-quantized int8 graphs (DynamicQuantizeLinear →
MatMulInteger chains, /root/reference/src/compiler/mod.rs:865-990); with no
ORT wheel here, onnx/quantize.py must produce that exact graph form from a
float export. These tests drive it with REAL torch.onnx exports (foreign
provenance — not our builder) and gate on (a) the emitted structure, (b)
numeric closeness to the float model, (c) the weight grid being ORT's
symmetric int8.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx import schema  # noqa: E402
from lele_tpu.onnx.quantize import (  # noqa: E402
    quantize_dynamic,
    quantize_weight_int8,
)
from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()


def _export(model, args, tmp_path, name="m.onnx"):
    path = str(tmp_path / name)
    model = model.eval()
    with torch.no_grad():
        torch.onnx.export(model, args, path, opset_version=17, dynamo=False)
        want = model(*args)
    with open(path, "rb") as f:
        data = f.read()
    if isinstance(want, (tuple, list)):
        want = want[0]
    return data, want.numpy()


def _ops(data: bytes) -> list[str]:
    m = schema.decode_model(data)
    return [n.op_type for n in m.graph.node]


def test_mlp_matmul_3d(tmp_path):
    """3-D Linears (MatMul+Add form) → DQL chains; output stays close to
    the float model within dynamic-u8 quantization noise."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Linear(96, 128)
            self.b = nn.Linear(128, 64)

        def forward(self, x):
            return self.b(torch.relu(self.a(x)))

    torch.manual_seed(0)
    x = torch.randn(1, 7, 96)
    data, want = _export(M(), (x,), tmp_path)
    qdata = quantize_dynamic(data)

    ops = _ops(qdata)
    assert ops.count("DynamicQuantizeLinear") == 2
    assert ops.count("MatMulInteger") == 2
    assert "MatMul" not in ops and "Gemm" not in ops

    cm = compile_model(str(_write(tmp_path, qdata)))
    # the emitted form must ride the compiler's DQL dataflow fusion (the
    # MXU int8-dot path) — same chains real FunASR-style exports produce
    assert cm.stats["pattern_hits"].get("dql_matmul_dataflow", 0) == 2, \
        cm.stats["pattern_hits"]
    out = np.asarray(cm.run_np(x.numpy())[0])
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=0.05, rtol=0)


def _write(tmp_path, data, name="q.onnx"):
    p = tmp_path / name
    p.write_bytes(data)
    return p


def test_gemm_2d(tmp_path):
    """2-D Linear exports as Gemm(transB=1); the quantizer pre-transposes
    the weight and keeps the bias as a float Add."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(80, 40)

        def forward(self, x):
            return self.fc(x)

    torch.manual_seed(1)
    x = torch.randn(5, 80)
    data, want = _export(M(), (x,), tmp_path)
    assert "Gemm" in _ops(data)
    qdata = quantize_dynamic(data)
    ops = _ops(qdata)
    assert "Gemm" not in ops and ops.count("MatMulInteger") == 1
    assert "Add" in ops  # bias survives as float Add

    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    np.testing.assert_allclose(out, want, atol=0.05, rtol=0)


def test_dynamic_matmuls_stay_float(tmp_path):
    """Attention-style dynamic×dynamic MatMul must NOT be rewritten."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(32, 32)

        def forward(self, x):
            y = self.proj(x)
            return torch.matmul(y, y.transpose(1, 2))

    torch.manual_seed(2)
    x = torch.randn(1, 6, 32)
    data, want = _export(M(), (x,), tmp_path)
    qdata = quantize_dynamic(data)
    ops = _ops(qdata)
    assert ops.count("MatMulInteger") == 1  # the projection only
    assert ops.count("MatMul") == 1         # y @ y^T stays float

    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    np.testing.assert_allclose(out, want, atol=0.08, rtol=0)


def test_conv_opt_in(tmp_path):
    """op_types including "Conv" rewrites Conv → ConvInteger with attrs
    carried over and the bias re-applied as a float [1,M,1,1] Add; Conv is
    NOT rewritten by default (ORT's opt-in behavior)."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 8, 3, padding=1)
            self.c2 = nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)

        def forward(self, x):
            return self.c2(torch.relu(self.c1(x)))

    torch.manual_seed(8)
    x = torch.randn(1, 3, 16, 16)
    data, want = _export(M(), (x,), tmp_path)

    # default: convs untouched
    assert "ConvInteger" not in _ops(quantize_dynamic(data))

    qdata = quantize_dynamic(data, op_types=("MatMul", "Gemm", "Conv"))
    ops = _ops(qdata)
    assert ops.count("ConvInteger") == 2 and "Conv" not in ops
    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    assert out.shape == want.shape
    # two stacked quantized convs: tolerance scales with activation range
    np.testing.assert_allclose(out, want, atol=0.1, rtol=0)


def test_weight_grid_is_ort_symmetric():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    wq, ws = quantize_weight_int8(w)
    assert wq.dtype == np.int8
    assert ws == pytest.approx(float(np.abs(w).max()) / 127.0)
    assert int(np.abs(wq).max()) == 127
    np.testing.assert_array_equal(
        wq, np.clip(np.round(w / ws), -127, 127).astype(np.int8))
    # degenerate all-zero weight: scale falls back to 1.0, grid all zeros
    wq0, ws0 = quantize_weight_int8(np.zeros((4, 4), np.float32))
    assert ws0 == 1.0 and not wq0.any()


def test_shared_weight_two_orientations(tmp_path):
    """A weight consumed by BOTH MatMul(x, W) and Gemm(y, W, transB=1)
    needs two int8 copies — the cache must key on orientation, not name
    (review finding: the Gemm path got the untransposed copy back)."""
    from lele_tpu.onnx import builder as ob

    rng = np.random.default_rng(6)
    w = rng.standard_normal((16, 24)).astype(np.float32)  # non-square
    x = rng.standard_normal((3, 16)).astype(np.float32)
    y = rng.standard_normal((3, 24)).astype(np.float32)
    nodes = [
        ob.node("MatMul", ["x", "w"], ["a"]),          # [3,16]@[16,24]
        ob.node("Gemm", ["y", "w"], ["b"], transB=1),  # [3,24]@[24,16]
        ob.node("Flatten", ["a"], ["af"]),
        ob.node("Flatten", ["b"], ["bf"]),
        ob.node("Concat", ["af", "bf"], ["out"], axis=1),
    ]
    data = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [3, 16]), ob.value_info("y", 1, [3, 24])],
        outputs=[ob.value_info("out", 1, [3, 120])],
        initializers=[ob.tensor_from_array(w, "w")],
    )
    qdata = quantize_dynamic(data)
    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x, y)[0])
    want = np.concatenate(
        [(x @ w).reshape(3, -1), (y @ w.T).reshape(3, -1)], axis=1)
    np.testing.assert_allclose(out, want, atol=0.15, rtol=0)


def test_initializers_as_inputs_export(tmp_path):
    """keep_initializers_as_inputs exports list weights in graph.input —
    the dropped float weight must leave that list too, or it becomes a
    required runtime input (review finding)."""
    from lele_tpu.onnx.loader import OnnxModel

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(32, 16)

        def forward(self, x):
            return self.fc(x)

    torch.manual_seed(7)
    x = torch.randn(1, 4, 32)
    model = M().eval()
    path = str(tmp_path / "kii.onnx")
    with torch.no_grad():
        torch.onnx.export(model, (x,), path, opset_version=17, dynamo=False,
                          keep_initializers_as_inputs=True,
                          input_names=["x"])
        want = model(x).numpy()
    with open(path, "rb") as f:
        qdata = quantize_dynamic(f.read())
    om = OnnxModel.from_bytes(qdata)
    assert om.input_names() == ["x"], om.input_names()
    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    np.testing.assert_allclose(out, want, atol=0.05, rtol=0)


def test_old_opset_refused(tmp_path):
    """Pre-11 opsets can't host DynamicQuantizeLinear; a silent opset bump
    would change pre-11 attribute-form op semantics — must refuse."""
    from lele_tpu.onnx import builder as ob

    w = np.ones((4, 4), np.float32)
    data = ob.build_model_bytes(
        [ob.node("MatMul", ["x", "w"], ["y"])],
        inputs=[ob.value_info("x", 1, [2, 4])],
        outputs=[ob.value_info("y", 1, [2, 4])],
        initializers=[ob.tensor_from_array(w, "w")],
        opset=9,
    )
    with pytest.raises(ValueError, match="opset"):
        quantize_dynamic(data)


def test_quantize_fuzz(tmp_path):
    """Composition fuzz: random MatMul/Gemm/Conv chains (builder-made, no
    torch) through quantize_dynamic, compiled output vs the float numpy
    oracle with magnitude-scaled tolerance. Error stays bounded because
    the chain is linear+ReLU only (no amplifying ops)."""
    from lele_tpu.onnx import builder as ob

    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        nodes, inits = [], {}
        uid = [0]

        def fresh(tag):
            uid[0] += 1
            return f"{tag}{uid[0]}"

        kind0 = rng.choice(["mm3", "gemm", "conv"])
        if kind0 == "conv":
            C, H = int(rng.integers(2, 6)), int(rng.integers(6, 12))
            x = rng.standard_normal((1, C, H, H)).astype(np.float32)
        elif kind0 == "mm3":
            T, K = int(rng.integers(2, 6)), int(rng.integers(8, 40))
            x = rng.standard_normal((1, T, K)).astype(np.float32)
        else:
            B, K = int(rng.integers(2, 5)), int(rng.integers(8, 40))
            x = rng.standard_normal((B, K)).astype(np.float32)
        cur, want = "x", x
        for step in range(int(rng.integers(1, 4))):
            kind = kind0 if want.ndim == 4 else rng.choice(
                ["mm3"] if want.ndim == 3 else ["gemm"])
            if kind == "conv":
                M = int(rng.integers(2, 8))
                w = (rng.standard_normal((M, want.shape[1], 3, 3))
                     / np.sqrt(9 * want.shape[1])).astype(np.float32)
                wn, out = fresh("w"), fresh("c")
                inits[wn] = w
                nodes.append(ob.node("Conv", [cur, wn], [out],
                                     pads=[1, 1, 1, 1]))
                want = torch.conv2d(torch.from_numpy(want),
                                    torch.from_numpy(w), padding=1).numpy()
            else:
                K = want.shape[-1]
                N = int(rng.integers(8, 40))
                w = (rng.standard_normal((K, N)) / np.sqrt(K)).astype(
                    np.float32)
                b = rng.standard_normal(N).astype(np.float32) * 0.1
                wn, bn, out = fresh("w"), fresh("b"), fresh("y")
                inits[wn], inits[bn] = w, b
                if kind == "gemm":
                    nodes.append(ob.node(
                        "Gemm", [cur, wn, bn], [out],
                        transB=0))
                    want = want @ w + b
                else:
                    mm = fresh("mm")
                    nodes.append(ob.node("MatMul", [cur, wn], [mm]))
                    nodes.append(ob.node("Add", [mm, bn], [out]))
                    want = want @ w + b
            if rng.random() < 0.5:
                r = fresh("r")
                nodes.append(ob.node("Relu", [out], [r]))
                want, out = np.maximum(want, 0), r
            cur = out
        data = ob.build_model_bytes(
            nodes,
            inputs=[ob.vi_from_array("x", x)],
            outputs=[ob.value_info(cur, 1, list(want.shape))],
            initializers=[ob.tensor_from_array(v, k)
                          for k, v in inits.items()],
        )
        qdata = quantize_dynamic(
            data, op_types=("MatMul", "Gemm", "Conv"))
        ops = _ops(qdata)
        assert "MatMul" not in ops and "Gemm" not in ops \
            and "Conv" not in ops, (seed, ops)
        cm = compile_model(str(_write(tmp_path, qdata, f"fz{seed}.onnx")))
        out = np.asarray(cm.run_np(x)[0])
        tol = 0.05 * float(np.abs(want).max()) + 1e-3
        np.testing.assert_allclose(out, want, atol=tol, rtol=0,
                                   err_msg=f"seed={seed}")


def test_shared_weight_quantized_once(tmp_path):
    """Two MatMuls sharing one initializer → one quantized copy, and the
    float original is dropped from the model."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.w = nn.Parameter(torch.randn(48, 48) * 0.1)

        def forward(self, x):
            return torch.matmul(torch.matmul(x, self.w), self.w)

    torch.manual_seed(4)
    x = torch.randn(1, 5, 48)
    data, want = _export(M(), (x,), tmp_path)
    qdata = quantize_dynamic(data)
    m = schema.decode_model(qdata)
    i8 = [t for t in m.graph.initializer
          if len(t.dims) == 2 and t.data_type == 3]  # INT8 2-D weights
    assert len(i8) == 1
    f32_2d = [t for t in m.graph.initializer
              if len(t.dims) == 2 and t.data_type == 1]
    assert not f32_2d  # float copy removed

    cm = compile_model(str(_write(tmp_path, qdata)))
    out = np.asarray(cm.run_np(x.numpy())[0])
    np.testing.assert_allclose(out, want, atol=0.08, rtol=0)
