"""Cross-runtime oracle suite: REAL PyTorch-exported ONNX graphs through the
full compiler vs torch's own outputs.

This replaces the reference's ORT-oracle strategy
(tests/verify_kernels_with_ort.py — ORT isn't installed here, torch is):
the graphs come out of a real exporter with all its idioms (Shape chains,
Constant nodes, BN folding, LSTM packing), not our builder. The export runs
through lele_tpu.onnx.torch_shim (no `onnx` package needed).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from lele_tpu.compiler import compile_model  # noqa: E402
from lele_tpu.onnx.torch_shim import install  # noqa: E402

install()

TOL = 5e-5


def roundtrip(model, args, tmp_path, **export_kw):
    model = model.eval()
    path = str(tmp_path / "m.onnx")
    with torch.no_grad():
        torch.onnx.export(model, args, path, opset_version=17, dynamo=False,
                          **export_kw)
        want = model(*args)
    cm = compile_model(path)
    outs = cm.run_np(*[a.numpy() for a in args])
    if isinstance(want, (tuple, list)):
        want = want[0]
    np.testing.assert_allclose(outs[0], want.numpy(), atol=TOL, rtol=1e-4)
    return cm


def test_torch_cnn_bn_pool(tmp_path):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 8, 3, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.c2 = nn.Conv2d(8, 16, 3, stride=2, padding=1)
            self.fc = nn.Linear(16 * 8 * 8, 10)

        def forward(self, x):
            h = torch.relu(self.bn(self.c1(x)))
            h = torch.relu(self.c2(h))
            return torch.softmax(self.fc(h.flatten(1)), -1)

    torch.manual_seed(0)
    roundtrip(M(), (torch.randn(2, 3, 16, 16),), tmp_path)


def test_torch_lstm(tmp_path):
    torch.manual_seed(1)

    class R(nn.Module):
        def __init__(self):
            super().__init__()
            self.l = nn.LSTM(6, 8)
            self.fc = nn.Linear(8, 3)

        def forward(self, x):
            h, _ = self.l(x)
            return self.fc(h)

    roundtrip(R(), (torch.randn(12, 2, 6),), tmp_path)


def test_torch_gru_bidirectional(tmp_path):
    torch.manual_seed(2)

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.g = nn.GRU(5, 7, bidirectional=True)

        def forward(self, x):
            h, _ = self.g(x)
            return h

    roundtrip(G(), (torch.randn(9, 2, 5),), tmp_path)


def test_torch_attention_block(tmp_path):
    """Explicit multi-head attention (the fused nn.TransformerEncoderLayer
    fast path doesn't export; plain aten ops do)."""
    torch.manual_seed(3)

    class A(nn.Module):
        def __init__(self, d=32, h=4):
            super().__init__()
            self.h = h
            self.qkv = nn.Linear(d, 3 * d)
            self.out = nn.Linear(d, d)
            self.ln = nn.LayerNorm(d)

        def forward(self, x):
            B, T, D = x.shape
            q, k, v = self.qkv(self.ln(x)).chunk(3, dim=-1)
            q = q.view(B, T, self.h, -1).transpose(1, 2)
            k = k.view(B, T, self.h, -1).transpose(1, 2)
            v = v.view(B, T, self.h, -1).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) / (D // self.h) ** 0.5, -1)
            ctx = (a @ v).transpose(1, 2).reshape(B, T, D)
            return x + self.out(ctx)

    roundtrip(A(), (torch.randn(2, 10, 32),), tmp_path)


def test_torch_conv1d_glu_stack(tmp_path):
    torch.manual_seed(4)

    class T(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv1d(8, 32, 5, padding=2)
            self.c2 = nn.Conv1d(16, 16, 3, padding=1, groups=16)  # depthwise
            self.out = nn.ConvTranspose1d(16, 4, 4, stride=2, padding=1)

        def forward(self, x):
            h = nn.functional.glu(self.c1(x), dim=1)
            h = torch.tanh(self.c2(h))
            return self.out(h)

    roundtrip(T(), (torch.randn(1, 8, 20),), tmp_path)


def test_torch_residual_mlp_layernorm(tmp_path):
    torch.manual_seed(5)

    class B(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln = nn.LayerNorm(24)
            self.fc1 = nn.Linear(24, 48)
            self.fc2 = nn.Linear(48, 24)

        def forward(self, x):
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.ln(x))))

    roundtrip(B(), (torch.randn(3, 24),), tmp_path)


def test_torch_embedding_argmax_pipeline(tmp_path):
    torch.manual_seed(6)

    class E(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(50, 16)
            self.fc = nn.Linear(16, 50)

        def forward(self, ids):
            h = self.emb(ids).mean(dim=1)
            return torch.argmax(self.fc(h), dim=-1)

    m = E().eval()
    ids = torch.randint(0, 50, (4, 7))
    path = str(tmp_path / "m.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (ids,), path, opset_version=17, dynamo=False)
        want = m(ids)
    cm = compile_model(path)
    (got,) = cm.run_np(ids.numpy())
    np.testing.assert_array_equal(got.astype(np.int64), want.numpy())


def test_transformers_whisper_encoder(tmp_path):
    """A real production architecture (HF transformers Whisper encoder,
    random weights) through export + compile."""
    transformers = pytest.importorskip("transformers")
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    torch.manual_seed(7)
    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, num_mel_bins=80, max_source_positions=100,
        attn_implementation="eager",
    )
    enc = WhisperEncoder(cfg).eval()

    class Wrap(nn.Module):
        def __init__(self):
            super().__init__()
            self.e = enc

        def forward(self, x):
            return self.e(x).last_hidden_state

    feats = torch.randn(1, 80, 200)
    roundtrip(Wrap(), (feats,), tmp_path)


@pytest.mark.parametrize("opset", [11, 13, 17, 18, 20])
def test_torch_composite_across_opsets(tmp_path, opset):
    """Same model exported at opset 11/13/17/18/20 — exercises attr-vs-input
    forms of Squeeze/Unsqueeze/Split/ReduceSum and Softmax semantics changes
    (18/20 export through the torch shim, which stands in for the `onnx`
    package the exporter wants for newer opsets)."""
    torch.manual_seed(8)

    class C(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(12, 24)

        def forward(self, x):
            h = self.fc(x)  # [B, 24]
            a, b_ = torch.split(h, 12, dim=1)
            h = torch.softmax(a, -1) + torch.relu(b_)
            h = h.unsqueeze(1).expand(-1, 3, -1)
            return h.sum(dim=1, keepdim=False)

    m = C().eval()
    x = torch.randn(4, 12)
    path = str(tmp_path / f"m{opset}.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (x,), path, opset_version=opset, dynamo=False)
        want = m(x).numpy()
    cm = compile_model(path)
    (got,) = cm.run_np(x.numpy())
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_torch_resnet_style_classifier(tmp_path):
    torch.manual_seed(9)

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
            self.b1 = nn.BatchNorm2d(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
            self.b2 = nn.BatchNorm2d(cout)
            self.down = (
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False)
                if stride != 1 or cin != cout else None
            )

        def forward(self, x):
            h = torch.relu(self.b1(self.c1(x)))
            h = self.b2(self.c2(h))
            s = self.down(x) if self.down is not None else x
            return torch.relu(h + s)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
            self.pool = nn.MaxPool2d(3, stride=2, padding=1)
            self.b1 = Block(8, 8)
            self.b2 = Block(8, 16, stride=2)
            self.fc = nn.Linear(16, 10)

        def forward(self, x):
            h = self.pool(torch.relu(self.stem(x)))
            h = self.b2(self.b1(h))
            h = h.mean(dim=(2, 3))  # GAP
            return self.fc(h)

    roundtrip(Net(), (torch.randn(2, 3, 32, 32),), tmp_path)


def test_torch_unet_style_decoder(tmp_path):
    """ConvTranspose2d upsampling + skip concat (the vocoder/segmentation
    decoder op pattern)."""
    torch.manual_seed(10)

    class U(nn.Module):
        def __init__(self):
            super().__init__()
            self.down = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.mid = nn.Conv2d(8, 8, 3, padding=1)
            self.up = nn.ConvTranspose2d(8, 4, 4, stride=2, padding=1)
            self.out = nn.Conv2d(4 + 3, 2, 1)

        def forward(self, x):
            d = torch.relu(self.down(x))
            m = torch.relu(self.mid(d))
            u = torch.relu(self.up(m))
            return self.out(torch.cat([u, x], dim=1))

    roundtrip(U(), (torch.randn(1, 3, 16, 16),), tmp_path)


def test_torch_wav2vec_style_frontend(tmp_path):
    """Strided Conv1d stack + GroupNorm + GELU (wav2vec feature extractor)."""
    torch.manual_seed(11)

    class W(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv1d(1, 16, 10, stride=5)
            self.gn = nn.GroupNorm(4, 16)
            self.c2 = nn.Conv1d(16, 16, 3, stride=2)

        def forward(self, x):
            h = nn.functional.gelu(self.gn(self.c1(x)))
            return nn.functional.gelu(self.c2(h))

    roundtrip(W(), (torch.randn(2, 1, 400),), tmp_path)


def test_torch_pixel_shuffle_upsample(tmp_path):
    """PixelShuffle exports as DepthToSpace (CRD mode)."""
    torch.manual_seed(12)

    class P(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv2d(3, 12, 3, padding=1)
            self.ps = nn.PixelShuffle(2)

        def forward(self, x):
            return self.ps(self.c(x))

    roundtrip(P(), (torch.randn(1, 3, 8, 8),), tmp_path)


def test_torch_interpolate_nearest(tmp_path):
    torch.manual_seed(13)

    class I(nn.Module):
        def forward(self, x):
            return nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")

    roundtrip(I(), (torch.randn(1, 2, 5, 5),), tmp_path)


class TinyDecoderStep(nn.Module):
    """Transformer decoder STEP with a static KV cache: takes the fixed-size
    cache + one token, returns logits and the step's new K/V slot only (so
    every step is the same XLA program — see lele_tpu/runtime/decode.py)."""

    def __init__(self, vocab=97, d=64, heads=4, layers=2, max_len=24):
        super().__init__()
        self.V, self.d, self.H, self.L = vocab, d, heads, layers
        self.hd = d // heads
        self.tok = nn.Embedding(vocab, d)
        self.posemb = nn.Embedding(max_len, d)
        self.ln1 = nn.ModuleList([nn.LayerNorm(d) for _ in range(layers)])
        self.ln2 = nn.ModuleList([nn.LayerNorm(d) for _ in range(layers)])
        self.qkv = nn.ModuleList([nn.Linear(d, 3 * d) for _ in range(layers)])
        self.proj = nn.ModuleList([nn.Linear(d, d) for _ in range(layers)])
        self.up = nn.ModuleList([nn.Linear(d, 4 * d) for _ in range(layers)])
        self.down = nn.ModuleList([nn.Linear(4 * d, d) for _ in range(layers)])
        self.lnf = nn.LayerNorm(d)
        self.head = nn.Linear(d, vocab, bias=False)

    def forward(self, ids, pos, cache_k, cache_v, mask):
        B = ids.shape[0]
        x = self.tok(ids) + self.posemb(pos)  # [B, 1, d]
        nks, nvs = [], []
        for i in range(self.L):
            h = self.ln1[i](x)
            q, k, v = self.qkv[i](h).split(self.d, dim=-1)
            q = q.view(B, 1, self.H, self.hd).transpose(1, 2)  # [B,H,1,hd]
            k = k.view(B, 1, self.H, self.hd).transpose(1, 2)
            v = v.view(B, 1, self.H, self.hd).transpose(1, 2)
            nks.append(k)
            nvs.append(v)
            K = torch.cat([cache_k[i], k], dim=2)  # [B,H,P+1,hd]
            Vv = torch.cat([cache_v[i], v], dim=2)
            att = (q @ K.transpose(-1, -2)) / (self.hd ** 0.5) + mask
            att = torch.softmax(att, dim=-1)
            o = (att @ Vv).transpose(1, 2).reshape(B, 1, self.d)
            x = x + self.proj[i](o)
            h2 = self.ln2[i](x)
            x = x + self.down[i](torch.nn.functional.gelu(self.up[i](h2)))
        logits = self.head(self.lnf(x))[:, 0]  # [B, V]
        return logits, torch.stack(nks), torch.stack(nvs)


def test_torch_decoder_kv_cache_greedy_decode(tmp_path):
    """Full autoregressive greedy decode through the compiled ONNX step
    graph vs the identical torch loop: token-for-token agreement."""
    torch.manual_seed(21)
    V, d, H, L, MAXLEN = 97, 64, 4, 2, 24
    P = MAXLEN - 1
    m = TinyDecoderStep(V, d, H, L, MAXLEN).eval()
    hd = d // H
    B = 1
    args = (
        torch.zeros(B, 1, dtype=torch.long),
        torch.zeros(B, 1, dtype=torch.long),
        torch.zeros(L, B, H, P, hd),
        torch.zeros(L, B, H, P, hd),
        torch.zeros(B, 1, 1, P + 1),
    )
    path = str(tmp_path / "dec.onnx")
    with torch.no_grad():
        torch.onnx.export(m, args, path, opset_version=17, dynamo=False,
                          input_names=["ids", "pos", "ck", "cv", "mask"],
                          output_names=["logits", "nk", "nv"])
    cm = compile_model(path)

    from lele_tpu.runtime.decode import StaticKVDecoder

    dec = StaticKVDecoder(cm, num_layers=L, num_heads=H, head_dim=hd,
                          max_len=MAXLEN)
    prompt = [5, 17, 3]
    steps = 12
    got_ids, got_logits = dec.generate_hostloop(prompt, steps)

    # torch oracle: growing-cache loop with the same module
    with torch.no_grad():
        ck = torch.zeros(L, B, H, 0, hd)
        cv = torch.zeros(L, B, H, 0, hd)
        seq = list(prompt)
        want_ids = []
        logits = None
        for t in range(len(prompt) + steps):
            tok = seq[t] if t < len(seq) else want_ids[-1]
            if t >= len(prompt):
                pass
            n = ck.shape[3]
            mask = torch.zeros(B, 1, 1, n + 1)
            x = m.tok(torch.tensor([[tok]])) + m.posemb(torch.tensor([[t]]))
            nks, nvs = [], []
            for i in range(L):
                h = m.ln1[i](x)
                q, k, v = m.qkv[i](h).split(d, dim=-1)
                q = q.view(B, 1, H, hd).transpose(1, 2)
                k = k.view(B, 1, H, hd).transpose(1, 2)
                v = v.view(B, 1, H, hd).transpose(1, 2)
                nks.append(k); nvs.append(v)
                K = torch.cat([ck[i], k], dim=2)
                Vv = torch.cat([cv[i], v], dim=2)
                att = torch.softmax((q @ K.transpose(-1, -2)) / (hd ** 0.5) + mask, -1)
                o = (att @ Vv).transpose(1, 2).reshape(B, 1, d)
                x = x + m.proj[i](o)
                x = x + m.down[i](torch.nn.functional.gelu(m.up[i](m.ln2[i](x))))
            logits = m.head(m.lnf(x))[:, 0]
            ck = torch.cat([ck, torch.stack(nks)], dim=3)
            cv = torch.cat([cv, torch.stack(nvs)], dim=3)
            if t >= len(prompt) - 1 and len(want_ids) < steps:
                want_ids.append(int(logits[0].argmax()))
    assert got_ids == want_ids, (got_ids, want_ids)
    np.testing.assert_allclose(got_logits.reshape(-1), logits[0].numpy(),
                               atol=5e-4, rtol=1e-3)


def test_torch_decoder_fused_device_decode(tmp_path):
    """generate_fused (whole generation as ONE program: prefill scan +
    decode scan + cache writes + argmax on device) must reproduce the
    host-loop decode token-for-token."""
    torch.manual_seed(22)
    V, d, H, L, MAXLEN = 61, 32, 2, 2, 20
    P = MAXLEN - 1
    hd = d // H
    m = TinyDecoderStep(V, d, H, L, MAXLEN).eval()
    args = (
        torch.zeros(1, 1, dtype=torch.long),
        torch.zeros(1, 1, dtype=torch.long),
        torch.zeros(L, 1, H, P, hd),
        torch.zeros(L, 1, H, P, hd),
        torch.zeros(1, 1, 1, P + 1),
    )
    path = str(tmp_path / "dec2.onnx")
    with torch.no_grad():
        torch.onnx.export(m, args, path, opset_version=17, dynamo=False)
    cm = compile_model(path)

    from lele_tpu.runtime.decode import StaticKVDecoder

    dec = StaticKVDecoder(cm, num_layers=L, num_heads=H, head_dim=hd,
                          max_len=MAXLEN)
    prompt, steps = [7, 11], 10
    want_ids, want_logits = dec.generate_hostloop(prompt, steps)
    got_ids, got_logits = dec.generate_fused(prompt, steps)
    assert got_ids == want_ids, (got_ids, want_ids)
    np.testing.assert_allclose(got_logits, want_logits, atol=1e-4, rtol=1e-4)


def test_decoder_exact_capacity_and_guard(tmp_path):
    """prompt+steps == max_len is allowed on BOTH decode paths (the final
    token's KV rides in-step); one past it raises on both."""
    torch.manual_seed(23)
    V, d, H, L, MAXLEN = 31, 16, 2, 1, 8
    P = MAXLEN - 1
    hd = d // H
    m = TinyDecoderStep(V, d, H, L, MAXLEN).eval()
    args = (torch.zeros(1, 1, dtype=torch.long),
            torch.zeros(1, 1, dtype=torch.long),
            torch.zeros(L, 1, H, P, hd), torch.zeros(L, 1, H, P, hd),
            torch.zeros(1, 1, 1, P + 1))
    path = str(tmp_path / "dec3.onnx")
    with torch.no_grad():
        torch.onnx.export(m, args, path, opset_version=17, dynamo=False)
    cm = compile_model(path)

    from lele_tpu.runtime.decode import StaticKVDecoder

    dec = StaticKVDecoder(cm, num_layers=L, num_heads=H, head_dim=hd,
                          max_len=MAXLEN)
    prompt = [3, 5]
    steps = MAXLEN - len(prompt)  # fills every position
    want_ids, _ = dec.generate_hostloop(prompt, steps)
    got_ids, _ = dec.generate_fused(prompt, steps)
    assert got_ids == want_ids
    with pytest.raises(ValueError):
        dec.generate_hostloop(prompt, steps + 1)
    with pytest.raises(ValueError):
        dec.generate_fused(prompt, steps + 1)


def test_decoder_batched_rows_and_sampling(tmp_path):
    """B=2 fused decode: rows decode independently (each row matches the
    B=1 run of its own prompt); temperature sampling is seed-deterministic
    and tiny-temperature converges to greedy."""
    torch.manual_seed(24)
    V, d, H, L, MAXLEN = 53, 32, 2, 2, 16
    P = MAXLEN - 1
    hd = d // H
    m = TinyDecoderStep(V, d, H, L, MAXLEN).eval()

    def export(B):
        args = (torch.zeros(B, 1, dtype=torch.long),
                torch.zeros(B, 1, dtype=torch.long),
                torch.zeros(L, B, H, P, hd), torch.zeros(L, B, H, P, hd),
                torch.zeros(B, 1, 1, P + 1))
        path = str(tmp_path / f"dec_b{B}.onnx")
        with torch.no_grad():
            torch.onnx.export(m, args, path, opset_version=17, dynamo=False)
        return compile_model(path)

    from lele_tpu.runtime.decode import StaticKVDecoder

    cm1, cm2 = export(1), export(2)
    d1 = StaticKVDecoder(cm1, L, H, hd, MAXLEN, batch=1)
    d2 = StaticKVDecoder(cm2, L, H, hd, MAXLEN, batch=2)
    pa, pb = [3, 7], [11, 2]
    steps = 8
    ids_a, _ = d1.generate_fused(pa, steps)
    ids_b, _ = d1.generate_fused(pb, steps)
    ids2, _ = d2.generate_fused(np.array([pa, pb]), steps)
    assert ids2[0] == ids_a and ids2[1] == ids_b, (ids2, ids_a, ids_b)

    s1, _ = d1.generate_fused(pa, steps, temperature=1.5, seed=7)
    s2, _ = d1.generate_fused(pa, steps, temperature=1.5, seed=7)
    assert s1 == s2 and all(0 <= t < V for t in s1)
    cold, _ = d1.generate_fused(pa, steps, temperature=1e-4, seed=7)
    assert cold == ids_a  # tiny temperature → greedy


class TinyS2SEncoder(nn.Module):
    """Encoder + cross-attention projection: source feats → per-decoder-
    layer cross K/V, computed ONCE per utterance (runtime/seq2seq.py)."""

    def __init__(self, feat=16, d=64, heads=4, dec_layers=2):
        super().__init__()
        self.d, self.H, self.Ld = d, heads, dec_layers
        self.hd = d // heads
        self.inp = nn.Linear(feat, d)
        self.ln = nn.LayerNorm(d)
        self.ff = nn.Linear(d, d)
        self.k_proj = nn.ModuleList([nn.Linear(d, d) for _ in range(dec_layers)])
        self.v_proj = nn.ModuleList([nn.Linear(d, d) for _ in range(dec_layers)])

    def forward(self, x):
        B, Te, _ = x.shape
        h = torch.tanh(self.inp(x))
        h = h + self.ff(self.ln(h))
        ks, vs = [], []
        for i in range(self.Ld):
            k = self.k_proj[i](h).view(B, Te, self.H, self.hd).transpose(1, 2)
            v = self.v_proj[i](h).view(B, Te, self.H, self.hd).transpose(1, 2)
            ks.append(k)
            vs.append(v)
        return torch.stack(ks), torch.stack(vs)  # [L,B,H,Te,hd]


class TinyS2SDecoderStep(nn.Module):
    """Decoder STEP: self-attention on the static KV cache + cross-attention
    over precomputed encoder K/V (trailing extras in the step contract)."""

    def __init__(self, vocab=61, d=64, heads=4, layers=2, max_len=20):
        super().__init__()
        self.V, self.d, self.H, self.L = vocab, d, heads, layers
        self.hd = d // heads
        self.tok = nn.Embedding(vocab, d)
        self.posemb = nn.Embedding(max_len, d)
        self.ln1 = nn.ModuleList([nn.LayerNorm(d) for _ in range(layers)])
        self.lnx = nn.ModuleList([nn.LayerNorm(d) for _ in range(layers)])
        self.ln2 = nn.ModuleList([nn.LayerNorm(d) for _ in range(layers)])
        self.qkv = nn.ModuleList([nn.Linear(d, 3 * d) for _ in range(layers)])
        self.proj = nn.ModuleList([nn.Linear(d, d) for _ in range(layers)])
        self.q_x = nn.ModuleList([nn.Linear(d, d) for _ in range(layers)])
        self.proj_x = nn.ModuleList([nn.Linear(d, d) for _ in range(layers)])
        self.up = nn.ModuleList([nn.Linear(d, 2 * d) for _ in range(layers)])
        self.down = nn.ModuleList([nn.Linear(2 * d, d) for _ in range(layers)])
        self.lnf = nn.LayerNorm(d)
        self.head = nn.Linear(d, vocab, bias=False)

    def forward(self, ids, pos, cache_k, cache_v, mask, cross_k, cross_v):
        B = ids.shape[0]
        x = self.tok(ids) + self.posemb(pos)
        nks, nvs = [], []
        for i in range(self.L):
            h = self.ln1[i](x)
            q, k, v = self.qkv[i](h).split(self.d, dim=-1)
            q = q.view(B, 1, self.H, self.hd).transpose(1, 2)
            k = k.view(B, 1, self.H, self.hd).transpose(1, 2)
            v = v.view(B, 1, self.H, self.hd).transpose(1, 2)
            nks.append(k)
            nvs.append(v)
            K = torch.cat([cache_k[i], k], dim=2)
            Vv = torch.cat([cache_v[i], v], dim=2)
            att = (q @ K.transpose(-1, -2)) / (self.hd ** 0.5) + mask
            att = torch.softmax(att, dim=-1)
            o = (att @ Vv).transpose(1, 2).reshape(B, 1, self.d)
            x = x + self.proj[i](o)
            hx = self.lnx[i](x)
            qx = self.q_x[i](hx).view(B, 1, self.H, self.hd).transpose(1, 2)
            attx = (qx @ cross_k[i].transpose(-1, -2)) / (self.hd ** 0.5)
            attx = torch.softmax(attx, dim=-1)
            ox = (attx @ cross_v[i]).transpose(1, 2).reshape(B, 1, self.d)
            x = x + self.proj_x[i](ox)
            h2 = self.ln2[i](x)
            x = x + self.down[i](torch.nn.functional.gelu(self.up[i](h2)))
        logits = self.head(self.lnf(x))[:, 0]
        return logits, torch.stack(nks), torch.stack(nvs)


def test_seq2seq_fused_generation_vs_torch(tmp_path):
    """Whisper-class encoder-decoder through two compiled graphs: encoder
    (+cross K/V projection) once, fused KV-cache decode consuming the cross
    tensors as extras — token-for-token vs the torch greedy loop, and the
    fused path vs the host-loop oracle."""
    torch.manual_seed(33)
    V, d, H, L, MAXLEN, Te, F = 61, 64, 4, 2, 20, 9, 16
    P = MAXLEN - 1
    hd = d // H
    enc = TinyS2SEncoder(F, d, H, L).eval()
    dec = TinyS2SDecoderStep(V, d, H, L, MAXLEN).eval()

    src = torch.randn(1, Te, F)
    enc_path = str(tmp_path / "s2s_enc.onnx")
    dec_path = str(tmp_path / "s2s_dec.onnx")
    with torch.no_grad():
        torch.onnx.export(enc, (src,), enc_path, opset_version=17,
                          dynamo=False, input_names=["src"],
                          output_names=["cross_k", "cross_v"])
        dec_args = (
            torch.zeros(1, 1, dtype=torch.long),
            torch.zeros(1, 1, dtype=torch.long),
            torch.zeros(L, 1, H, P, hd),
            torch.zeros(L, 1, H, P, hd),
            torch.zeros(1, 1, 1, P + 1),
            torch.zeros(L, 1, H, Te, hd),
            torch.zeros(L, 1, H, Te, hd),
        )
        torch.onnx.export(
            dec, dec_args, dec_path, opset_version=17, dynamo=False,
            input_names=["ids", "pos", "ck", "cv", "mask",
                         "cross_k", "cross_v"],
            output_names=["logits", "nk", "nv"])

    from lele_tpu.runtime.seq2seq import Seq2SeqGenerator

    gen = Seq2SeqGenerator(
        compile_model(enc_path), compile_model(dec_path),
        num_layers=L, num_heads=H, head_dim=hd, max_len=MAXLEN,
        bos_id=1, eos_id=0,  # eos 0: unlikely early, exercises full scan
    )
    steps = 12
    src_np = src.numpy()
    got = gen.generate(src_np, max_steps=steps)
    got_host = gen.generate_hostloop(src_np, max_steps=steps)
    assert got == got_host

    # torch oracle: growing-cache greedy loop
    with torch.no_grad():
        ck, cv = enc(src)
        ids = [1]
        cache_k = torch.zeros(L, 1, H, 0, hd)
        cache_v = torch.zeros(L, 1, H, 0, hd)
        out_ids = []
        for pos in range(steps + 1):
            m = torch.zeros(1, 1, 1, cache_k.shape[3] + 1)
            logits, nk, nv = dec(
                torch.tensor([[ids[-1]]]), torch.tensor([[pos]]),
                cache_k, cache_v, m, ck, cv)
            cache_k = torch.cat([cache_k, nk], dim=3)
            cache_v = torch.cat([cache_v, nv], dim=3)
            nxt = int(logits[0].argmax())
            if pos < steps:
                out_ids.append(nxt)
                ids.append(nxt)
    want = []
    for t in out_ids:
        if t == 0:
            break
        want.append(t)
    assert got == want, (got, want)


def _export_decoder(tmp_path, m, B, L, H, hd, P, name="dec_beam.onnx"):
    args = (
        torch.zeros(B, 1, dtype=torch.long),
        torch.zeros(B, 1, dtype=torch.long),
        torch.zeros(L, B, H, P, hd),
        torch.zeros(L, B, H, P, hd),
        torch.zeros(B, 1, 1, P + 1),
    )
    path = str(tmp_path / name)
    with torch.no_grad():
        torch.onnx.export(m, args, path, opset_version=17, dynamo=False,
                          input_names=["ids", "pos", "ck", "cv", "mask"],
                          output_names=["logits", "nk", "nv"])
    return path


def test_beam_search_beam1_equals_greedy(tmp_path):
    torch.manual_seed(41)
    V, d, H, L, MAXLEN = 53, 32, 4, 2, 18
    P, hd = MAXLEN - 1, 32 // 4
    m = TinyDecoderStep(V, d, H, L, MAXLEN).eval()
    cm = compile_model(_export_decoder(tmp_path, m, 1, L, H, hd, P))
    from lele_tpu.runtime.decode import StaticKVDecoder

    dec = StaticKVDecoder(cm, num_layers=L, num_heads=H, head_dim=hd,
                          max_len=MAXLEN)
    prompt, steps = [3, 7], 10
    greedy, _ = dec.generate_fused(prompt, steps)
    beam1, score = dec.beam_search(prompt, steps, beam=1)
    assert beam1 == greedy
    assert np.isfinite(score)


def test_beam_search_matches_host_oracle(tmp_path):
    """Fused device beam search vs a step-by-step numpy beam oracle over
    the SAME compiled step graph: identical sequences and scores."""
    torch.manual_seed(43)
    V, d, H, L, MAXLEN, K = 53, 32, 4, 2, 18, 4
    P, hd = MAXLEN - 1, 32 // 4
    m = TinyDecoderStep(V, d, H, L, MAXLEN).eval()
    cm = compile_model(_export_decoder(tmp_path, m, K, L, H, hd, P))
    from lele_tpu.runtime.decode import StaticKVDecoder

    dec = StaticKVDecoder(cm, num_layers=L, num_heads=H, head_dim=hd,
                          max_len=MAXLEN, batch=K)
    prompt, steps, EOS = [5], 8, 11
    got_ids, got_score = dec.beam_search(prompt, steps, beam=K, eos_id=EOS)

    # host oracle: same step graph, numpy beam bookkeeping
    def softmax_log(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    ck = np.zeros((L, K, H, P, hd), np.float32)
    cv = np.zeros((L, K, H, P, hd), np.float32)

    def step(toks, pos, ck, cv):
        ids = np.asarray(toks, np.int64).reshape(K, 1)
        pp = np.full((K, 1), pos, np.int64)
        mask = np.full((K, 1, 1, P + 1), -1e9, np.float32)
        mask[..., :pos] = 0.0
        mask[..., P] = 0.0
        logits, nk, nv = cm.run_np(ids, pp, ck, cv, mask)
        if pos < P:
            ck[:, :, :, pos] = nk[:, :, :, 0]
            cv[:, :, :, pos] = nv[:, :, :, 0]
        return np.asarray(logits).reshape(K, -1), ck, cv

    pos = 0
    logits = None
    for t in prompt:
        logits, ck, cv = step([t] * K, pos, ck, cv)
        pos += 1
    scores = np.full(K, -1e9, np.float32)
    scores[0] = 0.0
    seqs = np.zeros((K, steps), np.int32)
    finished = np.zeros(K, bool)
    for i in range(steps):
        logp = softmax_log(logits.astype(np.float32))
        for r in range(K):
            if finished[r]:
                logp[r, :] = -1e9
                logp[r, EOS] = 0.0
        cand = (scores[:, None] + logp).reshape(-1)
        top = np.argsort(-cand, kind="stable")[:K]
        parent, tok = top // logits.shape[-1], top % logits.shape[-1]
        scores = cand[top]
        ck = ck[:, parent]
        cv = cv[:, parent]
        seqs = seqs[parent]
        seqs[:, i] = tok
        finished = finished[parent] | (tok == EOS)
        logits, ck, cv = step(tok, pos, ck, cv)
        pos += 1
    best = int(np.argmax(scores))
    want = list(seqs[best])
    if EOS in want:
        want = want[: want.index(EOS)]
    assert got_ids == [int(t) for t in want], (got_ids, want)
    np.testing.assert_allclose(got_score, scores[best], rtol=1e-4)


def test_seq2seq_beam_search(tmp_path):
    """Beam search over the encoder-decoder: beam=2 runs with tiled cross
    K/V and scores at least as well as greedy (same model, same source)."""
    torch.manual_seed(51)
    V, d, H, L, MAXLEN, Te, F, K = 61, 64, 4, 2, 16, 7, 16, 2
    P, hd = MAXLEN - 1, 64 // 4
    enc = TinyS2SEncoder(F, d, H, L).eval()
    dec = TinyS2SDecoderStep(V, d, H, L, MAXLEN).eval()
    src = torch.randn(1, Te, F)
    enc_path = str(tmp_path / "be.onnx")
    dec_path = str(tmp_path / "bd.onnx")
    with torch.no_grad():
        torch.onnx.export(enc, (src,), enc_path, opset_version=17,
                          dynamo=False, input_names=["src"],
                          output_names=["cross_k", "cross_v"])
        torch.onnx.export(
            dec,
            (torch.zeros(K, 1, dtype=torch.long),
             torch.zeros(K, 1, dtype=torch.long),
             torch.zeros(L, K, H, P, hd), torch.zeros(L, K, H, P, hd),
             torch.zeros(K, 1, 1, P + 1),
             torch.zeros(L, K, H, Te, hd), torch.zeros(L, K, H, Te, hd)),
            dec_path, opset_version=17, dynamo=False,
            input_names=["ids", "pos", "ck", "cv", "mask",
                         "cross_k", "cross_v"],
            output_names=["logits", "nk", "nv"])

    from lele_tpu.runtime.seq2seq import Seq2SeqGenerator

    gen = Seq2SeqGenerator(
        compile_model(enc_path), compile_model(dec_path),
        num_layers=L, num_heads=H, head_dim=hd, max_len=MAXLEN,
        bos_id=1, eos_id=0, batch=K)  # step graph compiled at batch = beam
    steps = 8
    ids, score = gen.generate_beam(src.numpy(), beam=K, max_steps=steps)
    assert isinstance(ids, list) and len(ids) <= steps
    assert np.isfinite(score)

    # greedy on a B=1-compiled decoder must not beat the beam score: rescore
    # the greedy sequence under the beam's log-prob accounting
    # (beam search maximizes exactly this sum)
    dec1_path = str(tmp_path / "bd1.onnx")
    with torch.no_grad():
        torch.onnx.export(
            dec,
            (torch.zeros(1, 1, dtype=torch.long),
             torch.zeros(1, 1, dtype=torch.long),
             torch.zeros(L, 1, H, P, hd), torch.zeros(L, 1, H, P, hd),
             torch.zeros(1, 1, 1, P + 1),
             torch.zeros(L, 1, H, Te, hd), torch.zeros(L, 1, H, Te, hd)),
            dec1_path, opset_version=17, dynamo=False,
            input_names=["ids", "pos", "ck", "cv", "mask",
                         "cross_k", "cross_v"],
            output_names=["logits", "nk", "nv"])
    gen1 = Seq2SeqGenerator(
        compile_model(enc_path), compile_model(dec1_path),
        num_layers=L, num_heads=H, head_dim=hd, max_len=MAXLEN,
        bos_id=1, eos_id=0)
    g_ids, g_score = gen1.decoder.beam_search(
        [1], steps, beam=1, eos_id=0,
        extras=gen1.encode(src.numpy()))
    assert score >= g_score - 1e-4, (score, g_score)
