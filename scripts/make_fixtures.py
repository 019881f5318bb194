#!/usr/bin/env python
"""Generate real-topology parity fixtures into fixtures/ (VERDICT r1 #1/#7).

No network egress means the real checkpoints can't be downloaded here, so
these fixtures reproduce each family's EXACT graph topology (ops, signature,
control flow, quantization chains) at reduced dims, with oracles computed by
paths independent of the XLA compile:

- silero.onnx       — dual-sample-rate `If` subgraphs with DIFFERENT
                      front-ends (the real Silero shape: main.rs:96-131),
                      STFT-as-conv, conv stack, multi-step LSTM, packed
                      [2,1,128] state. Oracle: hand-written numpy
                      (conv/LSTM/sigmoid re-implemented in this script).
- sensevoice.onnx   — SAN-M encoder with INTERLEAVED DynamicQuantizeLinear →
                      MatMulInteger → Cast/Mul/Add int8 chains (the real
                      int8 export layout, mod.rs:865-990), real 4-input
                      signature (speech/speech_lengths/language/textnorm),
                      FSMN conv, prefix query frames, dynamic-shape position
                      slice. Oracle: eager per-node evaluation
                      (compiler.debug.reference_eval — no tracer folding, no
                      patterns, no jit).
- yolo26.onnx       — torch-exported conv/SiLU backbone + DETR-style
                      [1,300,4+C] head. Oracle: torch forward (fully
                      independent implementation).
- supertonic_{dp,te,ve,voc}.onnx — torch-exported 4-sub-model TTS with the
                      reference signatures. Oracle: torch forwards.

Dropping the REAL checkpoints over these files requires zero code changes:
tests introspect input signatures and shapes from the files themselves.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
FIX = ROOT / "fixtures"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # oracle generation stays off-TPU

from lele_tpu.onnx import builder as ob  # noqa: E402

rng = np.random.default_rng(2026)


def w(*shape, scale=None):
    s = scale if scale is not None else 1.0 / np.sqrt(shape[0])
    return (rng.standard_normal(shape) * s).astype(np.float32)


# ---------------------------------------------------------------------------
# Silero VAD: dual-sr If graph + numpy oracle
# ---------------------------------------------------------------------------

def _stft_basis(n_fft: int) -> np.ndarray:
    """[2*(n_fft//2+1), 1, n_fft] conv filters computing rFFT re/im — how the
    real Silero export implements its STFT front-end."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)
    k = np.arange(n_bins)[:, None]
    win = np.hanning(n_fft).astype(np.float64)
    re = np.cos(2 * np.pi * k * t / n_fft) * win
    im = -np.sin(2 * np.pi * k * t / n_fft) * win
    return np.concatenate([re, im], 0)[:, None, :].astype(np.float32)


def _silero_branch_weights(n_fft: int, tag: str):
    n_bins = n_fft // 2 + 1
    return {
        f"stft_{tag}": _stft_basis(n_fft),
        f"c0w_{tag}": w(64, n_bins, 3, scale=1.0 / np.sqrt(3 * n_bins)),
        f"c0b_{tag}": np.zeros(64, np.float32),
        f"c1w_{tag}": w(64, 64, 3, scale=1.0 / np.sqrt(3 * 64)),
        f"c1b_{tag}": np.zeros(64, np.float32),
        f"c2w_{tag}": w(128, 64, 3, scale=1.0 / np.sqrt(3 * 64)),
        f"c2b_{tag}": np.zeros(128, np.float32),
    }


def _silero_shared_weights():
    H, D = 128, 128
    return {
        "lstm_W": (rng.standard_normal((1, 4 * H, D)) * 0.15).astype(np.float32),
        "lstm_R": (rng.standard_normal((1, 4 * H, H)) * 0.15).astype(np.float32),
        "lstm_B": np.zeros((1, 8 * H), np.float32),
        "head_w": w(128, 1),
        "head_b": np.zeros(1, np.float32),
        "c16000": np.asarray([16000], np.int64),
    }


def _silero_branch_nodes(tag: str, stride: int):
    """Front-end for one sample rate: STFT conv (stride 128) → magnitude →
    3 conv1d+relu (first one stride differs per sr) → LSTM over time steps."""
    n = []
    n.append(ob.node("Unsqueeze", ["input", "axes1"], [f"x3_{tag}"]))
    n.append(ob.node("Conv", [f"x3_{tag}", f"stft_{tag}"], [f"spec_{tag}"],
                     strides=[128]))
    # split re/im, magnitude
    n.append(ob.node("Split", [f"spec_{tag}"], [f"re_{tag}", f"im_{tag}"],
                     axis=1, num_outputs=2))
    n.append(ob.node("Mul", [f"re_{tag}", f"re_{tag}"], [f"re2_{tag}"]))
    n.append(ob.node("Mul", [f"im_{tag}", f"im_{tag}"], [f"im2_{tag}"]))
    n.append(ob.node("Add", [f"re2_{tag}", f"im2_{tag}"], [f"p_{tag}"]))
    # log power keeps activations tame regardless of input scale
    n.append(ob.node("Add", [f"p_{tag}", "one_f"], [f"p1_{tag}"]))
    n.append(ob.node("Log", [f"p1_{tag}"], [f"mag_{tag}"]))
    for i in range(3):
        src = f"mag_{tag}" if i == 0 else f"h{i - 1}_{tag}"
        st = [stride] if i == 0 else [1]
        n.append(ob.node("Conv", [src, f"c{i}w_{tag}", f"c{i}b_{tag}"],
                         [f"cv{i}_{tag}"], pads=[1, 1], strides=st))
        n.append(ob.node("Relu", [f"cv{i}_{tag}"], [f"h{i}_{tag}"]))
    # [1, 128, T'] → [T', 1, 128] for LSTM
    n.append(ob.node("Transpose", [f"h2_{tag}"], [f"seq_{tag}"], perm=[2, 0, 1]))
    # packed [2,1,128] state → h0/c0 [1,1,128]
    n.append(ob.node("Split", ["state"], [f"h0_{tag}", f"c0_{tag}"],
                     axis=0, num_outputs=2))
    n.append(ob.node(
        "LSTM",
        [f"seq_{tag}", "lstm_W", "lstm_R", "lstm_B", "", f"h0_{tag}",
         f"c0_{tag}"],
        [f"Y_{tag}", f"Yh_{tag}", f"Yc_{tag}"],
        hidden_size=128,
    ))
    n.append(ob.node("Concat", [f"Yh_{tag}", f"Yc_{tag}"], [f"ns_{tag}"],
                     axis=0))
    n.append(ob.node("Squeeze", [f"Yh_{tag}", "axes0"], [f"hl_{tag}"]))
    n.append(ob.node("MatMul", [f"hl_{tag}", "head_w"], [f"hm_{tag}"]))
    n.append(ob.node("Add", [f"hm_{tag}", "head_b"], [f"lg_{tag}"]))
    n.append(ob.node("Sigmoid", [f"lg_{tag}"], [f"prob_{tag}"]))
    return n


def build_silero() -> tuple[bytes, dict]:
    """Returns (onnx_bytes, all_weights)."""
    ws = _silero_shared_weights()
    ws.update(_silero_branch_weights(256, "a"))   # 16 kHz front-end
    ws.update(_silero_branch_weights(128, "b"))   # 8 kHz front-end
    ws["axes1"] = np.asarray([1], np.int64)
    ws["axes0"] = np.asarray([0], np.int64)
    ws["one_f"] = np.float32(1.0)

    then_g = ob.graph(
        _silero_branch_nodes("a", 1),
        name="sr16k",
        outputs=[ob.value_info("prob_a", 1, [1, 1]),
                 ob.value_info("ns_a", 1, [2, 1, 128])],
    )
    else_g = ob.graph(
        _silero_branch_nodes("b", 2),
        name="sr8k",
        outputs=[ob.value_info("prob_b", 1, [1, 1]),
                 ob.value_info("ns_b", 1, [2, 1, 128])],
    )
    nodes = [
        ob.node("Equal", ["sr", "c16000"], ["sr_eq"]),
        ob.node("Squeeze", ["sr_eq"], ["cond"]),
        ob.node("If", ["cond"], ["prob", "state_out"],
                then_branch=then_g, else_branch=else_g),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[
            ob.value_info("input", 1, [1, 512]),
            ob.value_info("state", 1, [2, 1, 128]),
            ob.value_info("sr", 7, [1]),
        ],
        outputs=[
            ob.value_info("prob", 1, [1, 1]),
            ob.value_info("state_out", 1, [2, 1, 128]),
        ],
        initializers=[ob.tensor_from_array(v, k) for k, v in ws.items()],
        name="silero_vad",
    )
    return bs, ws


# -- numpy oracle (fully independent re-implementation) ----------------------

def _np_conv1d(x, wgt, b=None, stride=1, pad=0):
    """x [C_in, T]; wgt [C_out, C_in, K] → [C_out, T_out]."""
    c_out, c_in, k = wgt.shape
    if pad:
        x = np.pad(x, ((0, 0), (pad, pad)))
    t_out = (x.shape[1] - k) // stride + 1
    out = np.zeros((c_out, t_out), np.float64)
    for t in range(t_out):
        seg = x[:, t * stride : t * stride + k]  # [C_in, K]
        out[:, t] = np.tensordot(wgt, seg, axes=([1, 2], [0, 1]))
    if b is not None:
        out += b[:, None]
    return out


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_lstm(seq, W, R, B, h0, c0):
    """ONNX LSTM gate order iofc. seq [T,1,D]; W [1,4H,D]; R [1,4H,H]."""
    H = R.shape[2]
    Wx, Rh = W[0], R[0]
    bsum = B[0][: 4 * H] + B[0][4 * H :]
    h, c = h0[0, 0].astype(np.float64), c0[0, 0].astype(np.float64)
    for t in range(seq.shape[0]):
        g = Wx @ seq[t, 0] + Rh @ h + bsum
        i = _np_sigmoid(g[:H])
        o = _np_sigmoid(g[H : 2 * H])
        f = _np_sigmoid(g[2 * H : 3 * H])
        cc = np.tanh(g[3 * H :])
        c = f * c + i * cc
        h = o * np.tanh(c)
    return h, c


def silero_oracle_chunk(ws, chunk, state, sr):
    tag = "a" if sr == 16000 else "b"
    n_fft = 256 if sr == 16000 else 128
    stride0 = 1 if sr == 16000 else 2
    x = chunk.reshape(1, 512).astype(np.float64)
    spec = _np_conv1d(x, ws[f"stft_{tag}"].astype(np.float64), stride=128)
    n_bins = n_fft // 2 + 1
    mag = np.log1p(spec[:n_bins] ** 2 + spec[n_bins:] ** 2)
    h = mag
    for i, st in ((0, stride0), (1, 1), (2, 1)):
        h = _np_conv1d(h, ws[f"c{i}w_{tag}"].astype(np.float64),
                       ws[f"c{i}b_{tag}"].astype(np.float64), stride=st, pad=1)
        h = np.maximum(h, 0)
    seq = h.T[:, None, :]  # [T', 1, 128]
    hh, cc = _np_lstm(seq, ws["lstm_W"].astype(np.float64),
                      ws["lstm_R"].astype(np.float64),
                      ws["lstm_B"].astype(np.float64),
                      state[:1], state[1:])
    prob = _np_sigmoid(hh @ ws["head_w"].astype(np.float64)[:, 0]
                       + ws["head_b"][0])
    new_state = np.stack([hh, cc])[:, None, :].astype(np.float32)
    return float(prob), new_state


def gen_silero():
    bs, ws = build_silero()
    (FIX / "silero.onnx").write_bytes(bs)
    from lele_tpu.utils.wav import read_wav

    pcm, sr = read_wav("/root/reference/fixtures/zh.wav")
    pcm = np.asarray(pcm, np.float32) * 32768.0  # reference scaling
    state = np.zeros((2, 1, 128), np.float32)
    probs = []
    n_chunks = min(40, len(pcm) // 512)
    for i in range(n_chunks):
        chunk = pcm[i * 512 : (i + 1) * 512]
        p, state = silero_oracle_chunk(ws, chunk, state, 16000)
        probs.append(p)
    np.save(FIX / "silero_probs.npy", np.asarray(probs, np.float32))
    # a short 8 kHz trace exercises the else-branch front-end
    state = np.zeros((2, 1, 128), np.float32)
    probs8 = []
    for i in range(8):
        chunk = pcm[i * 512 : (i + 1) * 512]
        p, state = silero_oracle_chunk(ws, chunk, state, 8000)
        probs8.append(p)
    np.save(FIX / "silero_probs_8k.npy", np.asarray(probs8, np.float32))
    print(f"silero.onnx ({len(bs)} bytes), {n_chunks}+8 oracle probs")


# ---------------------------------------------------------------------------
# SenseVoice: SAN-M int8 encoder with interleaved DQL chains
# (graph construction lives in lele_tpu.onnx.synth.build_sanm_int8_model so
# bench.py can build the FULL 50L/d512 encoder without this module's forced
# CPU platform; the fixture passes this script's shared rng through)
# ---------------------------------------------------------------------------

SV = dict(L=4, d=128, h=4, ffn=256, vocab=512, din=560, maxlen=2048)


def build_sensevoice() -> bytes:
    from lele_tpu.onnx.synth import build_sanm_int8_model

    return build_sanm_int8_model(**SV, rng=rng)


def gen_sensevoice():
    bs = build_sensevoice()
    (FIX / "sensevoice.onnx").write_bytes(bs)
    # input features: real zh.wav through the fbank frontend
    from lele_tpu.features import FbankConfig, FbankFrontend
    from lele_tpu.utils.wav import read_wav

    pcm, sr = read_wav("/root/reference/fixtures/zh.wav")
    feats = np.asarray(FbankFrontend(FbankConfig())(
        np.asarray(pcm, np.float32)))[None].astype(np.float32)
    np.save(FIX / "sensevoice_input.npy", feats)
    inputs = {
        "speech": feats,
        "speech_lengths": np.asarray([feats.shape[1]], np.int64),
        "language": np.asarray([3], np.int32),
        "textnorm": np.asarray([0], np.int32),
    }
    from lele_tpu.compiler.debug import reference_eval
    from lele_tpu.onnx import OnnxModel

    outs = reference_eval(OnnxModel.from_bytes(bs), inputs)
    np.save(FIX / "sensevoice_logits.npy", outs["logits"].astype(np.float32))
    print(f"sensevoice.onnx ({len(bs)} bytes), logits {outs['logits'].shape}")


# ---------------------------------------------------------------------------
# YOLO26-style backbone via torch export (independent oracle)
# ---------------------------------------------------------------------------

def gen_yolo():
    import torch
    import torch.nn as tnn

    from lele_tpu.onnx.torch_shim import install

    install()

    class ConvSiLU(tnn.Module):
        def __init__(self, ci, co, k=3, s=2):
            super().__init__()
            self.c = tnn.Conv2d(ci, co, k, s, k // 2)
            self.bn = tnn.BatchNorm2d(co)

        def forward(self, x):
            return tnn.functional.silu(self.bn(self.c(x)))

    class Yolo(tnn.Module):
        def __init__(self, nc=16):
            super().__init__()
            self.stem = ConvSiLU(3, 16)
            self.s2 = ConvSiLU(16, 32)
            self.s3 = ConvSiLU(32, 64)
            self.s4 = ConvSiLU(64, 64)
            self.s5 = ConvSiLU(64, 64)
            self.head = tnn.Conv2d(64, 4 + nc, 1)

        def forward(self, x):
            x = self.s5(self.s4(self.s3(self.s2(self.stem(x)))))
            y = self.head(x)                       # [1, 4+nc, 20, 20]
            y = y.flatten(2).transpose(1, 2)       # [1, 400, 4+nc]
            y = y[:, :300]                         # [1, 300, 4+nc]
            boxes = y[..., :4].sigmoid() * 640
            logits = y[..., 4:]
            return logits, boxes

    torch.manual_seed(0)
    m = Yolo().eval()
    x = torch.rand(1, 3, 640, 640)
    with torch.no_grad():
        logits, boxes = m(x)
    torch.onnx.export(
        m, (x,), str(FIX / "yolo26.onnx"),
        input_names=["images"], output_names=["logits", "boxes"],
        opset_version=17, dynamo=False,
    )
    np.save(FIX / "yolo26_input.npy", x.numpy())
    np.save(FIX / "yolo26_logits.npy", logits.numpy())
    np.save(FIX / "yolo26_boxes.npy", boxes.numpy())
    print(f"yolo26.onnx, logits {tuple(logits.shape)}")


# ---------------------------------------------------------------------------
# Supertonic 4-sub-model TTS via torch export
# ---------------------------------------------------------------------------

def gen_supertonic():
    import torch
    import torch.nn as tnn

    from lele_tpu.onnx.torch_shim import install

    install()
    torch.manual_seed(1)
    D, S, V, LAT = 64, 32, 96, 24  # text dim, style dim, vocab, latent ch

    class DurationPredictor(tnn.Module):
        def __init__(self):
            super().__init__()
            self.emb = tnn.Embedding(V, D)
            self.style = tnn.Linear(S, D)
            self.out = tnn.Linear(D, 1)

        def forward(self, ids, style, mask):
            h = self.emb(ids) + self.style(style)[:, None, :]
            d = tnn.functional.softplus(self.out(h)).squeeze(-1)
            return d * mask

    class TextEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.emb = tnn.Embedding(V, D)
            self.style = tnn.Linear(S, D)
            self.mix = tnn.Conv1d(D, LAT, 3, padding=1)

        def forward(self, ids, style, mask):
            h = self.emb(ids) + self.style(style)[:, None, :]
            h = h * mask[..., None]
            return torch.tanh(self.mix(h.transpose(1, 2)))

    class VectorEstimator(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv1d(2 * LAT + 1, 48, 3, padding=1)
            self.style = tnn.Linear(S, 48)
            self.c2 = tnn.Conv1d(48, LAT, 3, padding=1)

        def forward(self, xt, text_emb, style, t_step):
            B, C, T = xt.shape
            tt = t_step.reshape(1, 1, 1).expand(B, 1, T)
            h = torch.cat([xt, text_emb, tt], 1)
            h = tnn.functional.silu(self.c1(h) + self.style(style)[:, :, None])
            return self.c2(h)

    class Vocoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.up = tnn.ConvTranspose1d(LAT, 16, 8, stride=4, padding=2)
            self.out = tnn.Conv1d(16, 1, 7, padding=3)

        def forward(self, latent):
            return torch.tanh(self.out(
                tnn.functional.silu(self.up(latent)))).squeeze(1)

    Tn, Tl = 24, 32
    ids = torch.randint(2, V, (1, Tn))
    style = torch.rand(1, S)
    mask = torch.ones(1, Tn)
    xt = torch.rand(1, LAT, Tl)
    t_step = torch.tensor([0.4])

    dp, te, ve, voc = (DurationPredictor().eval(), TextEncoder().eval(),
                       VectorEstimator().eval(), Vocoder().eval())
    text_emb = te(ids, style, mask)
    text_emb_l = tnn.functional.interpolate(text_emb, size=Tl)
    with torch.no_grad():
        o_dp = dp(ids, style, mask)
        o_ve = ve(xt, text_emb_l, style, t_step)
        o_voc = voc(xt)

    torch.onnx.export(dp, (ids, style, mask), str(FIX / "supertonic_dp.onnx"),
                      input_names=["ids", "style", "mask"],
                      output_names=["durations"], opset_version=17,
                      dynamo=False)
    torch.onnx.export(te, (ids, style, mask), str(FIX / "supertonic_te.onnx"),
                      input_names=["ids", "style", "mask"],
                      output_names=["text_emb"], opset_version=17,
                      dynamo=False)
    torch.onnx.export(ve, (xt, text_emb_l, style, t_step),
                      str(FIX / "supertonic_ve.onnx"),
                      input_names=["xt", "text_emb", "style", "t_step"],
                      output_names=["v"], opset_version=17, dynamo=False)
    torch.onnx.export(voc, (xt,), str(FIX / "supertonic_voc.onnx"),
                      input_names=["latent"], output_names=["wave"],
                      opset_version=17, dynamo=False)
    np.savez(FIX / "supertonic_io.npz",
             ids=ids.numpy(), style=style.numpy(), mask=mask.numpy(),
             xt=xt.numpy(), text_emb=text_emb_l.detach().numpy(),
             t_step=t_step.numpy(), durations=o_dp.numpy(),
             te_out=text_emb.detach().numpy(),
             v=o_ve.numpy(), wave=o_voc.numpy())
    print("supertonic_{dp,te,ve,voc}.onnx + io oracle")


if __name__ == "__main__":
    gens = {"silero": gen_silero, "sensevoice": gen_sensevoice,
            "yolo": gen_yolo, "supertonic": gen_supertonic}
    which = sys.argv[1:] or list(gens)
    bad = [n for n in which if n not in gens]
    if bad:
        sys.exit(f"usage: make_fixtures.py [{'|'.join(gens)} ...]   "
                 f"(unknown: {' '.join(bad)})")
    for name in which:
        gens[name]()
