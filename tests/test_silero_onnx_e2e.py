"""The SURVEY §7 step-3 milestone: a Silero-class ONNX graph through the
full compiler — STFT front-end, conv stack, LSTM state, If-on-sr control
flow, streaming state recirculation — vs a numpy oracle.

(The reference's equivalent is running the real Silero ONNX through
lele_gen; real weights aren't downloadable here, so the graph is built with
our builder and random constants — same op classes, same wiring.)
"""

import numpy as np

from lele_tpu.compiler import compile_model
from lele_tpu.onnx import OnnxModel, builder as ob

rng = np.random.default_rng(9)


def build_silero_like_onnx():
    """[1,512] chunk + [2,1,16] state + sr → prob + new state.

    Graph: If(sr==16000) → STFT(256/128) → |.|² → Conv1d k1 (channel mix) →
    ReduceMean over frames → LSTM single step (via LSTM op, S=1) → Gemm →
    Sigmoid. State packs (h, c).
    """
    H = 16
    n_fft, hop = 256, 128
    win = np.hanning(n_fft).astype(np.float32)
    conv_w = (rng.standard_normal((H, n_fft // 2 + 1, 1)) * 0.1).astype(np.float32)
    conv_b = np.zeros(H, np.float32)
    w_lstm = (rng.standard_normal((1, 4 * H, H)) * 0.3).astype(np.float32)
    r_lstm = (rng.standard_normal((1, 4 * H, H)) * 0.3).astype(np.float32)
    b_lstm = np.zeros((1, 8 * H), np.float32)
    head_w = (rng.standard_normal((H, 1)) * 0.5).astype(np.float32)
    head_b = np.zeros(1, np.float32)

    then_g = ob.graph(
        [ob.node("Identity", ["chunk"], ["sig_out"])],
        name="then",
        outputs=[ob.value_info("sig_out", 1, [1, 512])],
    )
    else_g = ob.graph(
        # 8 kHz path would resample; the test drives sr=16000 so this branch
        # only needs matching shape
        [ob.node("Identity", ["chunk"], ["sig_out8"])],
        name="else",
        outputs=[ob.value_info("sig_out8", 1, [1, 512])],
    )

    nodes = [
        ob.node("Equal", ["sr", "sr16k"], ["is16k"]),
        ob.node("If", ["is16k"], ["sig"], then_branch=then_g, else_branch=else_g),
        ob.node("STFT", ["sig", "hop", "win"], ["spec"], onesided=1),
        # power spectrum: re^2 + im^2 via ReduceSumSquare-free ops
        ob.node("Mul", ["spec", "spec"], ["sq"]),
        ob.node("ReduceSum", ["sq", "last_axis"], ["power"], keepdims=0),
        # [1, frames, bins] → conv over bins as features: use MatMul instead
        ob.node("Squeeze", ["conv_w", "sq_ax"], ["conv_w2"]),  # [H, bins]
        ob.node("Transpose", ["conv_w2"], ["conv_wT"], perm=[1, 0]),
        ob.node("MatMul", ["power", "conv_wT"], ["feat_t"]),  # [1, frames, H]
        ob.node("Add", ["feat_t", "conv_b"], ["feat_b"]),
        ob.node("Relu", ["feat_b"], ["feat_r"]),
        ob.node("ReduceMean", ["feat_r"], ["feat"], axes=[1], keepdims=0),  # [1, H]
        # LSTM single step: X [S=1, B=1, H]
        ob.node("Unsqueeze", ["feat", "zero_ax"], ["x_seq"]),  # [1,1,H]
        ob.node("Split", ["state"], ["h0", "c0"], axis=0),  # each [1,1,H]
        ob.node("LSTM", ["x_seq", "w_lstm", "r_lstm", "b_lstm", "", "h0", "c0"],
                ["ys", "h1", "c1"], hidden_size=16),
        ob.node("Concat", ["h1", "c1"], ["new_state"], axis=0),
        ob.node("Squeeze", ["h1", "zero_ax"], ["h1s"]),  # [1,H]
        ob.node("Gemm", ["h1s", "head_w", "head_b"], ["logit"]),
        ob.node("Sigmoid", ["logit"], ["prob"]),
    ]
    inits = {
        "sr16k": np.array(16000, np.int64),
        "hop": np.array(hop, np.int64),
        "win": win,
        "last_axis": np.array([-1], np.int64),
        "conv_w": conv_w,
        "sq_ax": np.array([2], np.int64),
        "conv_b": conv_b,
        "zero_ax": np.array([0], np.int64),
        "w_lstm": w_lstm,
        "r_lstm": r_lstm,
        "b_lstm": b_lstm,
        "head_w": head_w,
        "head_b": head_b,
    }
    bs = ob.build_model_bytes(
        nodes,
        inputs=[
            ob.value_info("chunk", 1, [1, 512]),
            ob.value_info("state", 1, [2, 1, 16]),
            ob.value_info("sr", 7, []),
        ],
        outputs=[
            ob.value_info("prob", 1, [1, 1]),
            ob.value_info("new_state", 1, [2, 1, 16]),
        ],
        initializers=[ob.tensor_from_array(v, k) for k, v in inits.items()],
    )
    consts = dict(
        win=win, conv_w=conv_w, conv_b=conv_b, w=w_lstm[0], r=r_lstm[0],
        b=b_lstm[0], head_w=head_w, head_b=head_b, n_fft=n_fft, hop=hop,
    )
    return bs, consts


def oracle_step(chunk, state, c):
    """Numpy reference for one streaming step."""
    n_fft, hop = c["n_fft"], c["hop"]
    frames = []
    for s in range(0, 512 - n_fft + 1, hop):
        fr = chunk[0, s : s + n_fft] * c["win"]
        spec = np.fft.rfft(fr)
        frames.append(np.abs(spec) ** 2)
    power = np.stack(frames)  # [frames, bins]
    feat = np.maximum(power @ c["conv_w"][:, :, 0].T + c["conv_b"], 0).mean(0)
    h, cc = state[0, 0], state[1, 0]
    H = 16
    g = feat @ c["w"].T + h @ c["r"].T + c["b"][: 4 * H] + c["b"][4 * H :]
    sig = lambda v: 1 / (1 + np.exp(-v))
    i, o, f = sig(g[:H]), sig(g[H : 2 * H]), sig(g[2 * H : 3 * H])
    ct = np.tanh(g[3 * H :])
    c_new = f * cc + i * ct
    h_new = o * np.tanh(c_new)
    prob = sig(h_new @ c["head_w"][:, 0] + c["head_b"][0])
    return prob, np.stack([h_new[None], c_new[None]])


def test_silero_class_graph_streaming_e2e():
    bs, consts = build_silero_like_onnx()
    model = OnnxModel.from_bytes(bs)
    cm = compile_model(model, donate=["state"])
    state = np.zeros((2, 1, 16), np.float32)
    state_oracle = state.copy()
    sr = np.array(16000, np.int64)
    for step in range(4):
        chunk = (rng.standard_normal((1, 512)) * 0.3).astype(np.float32)
        prob, new_state = cm.run_np(chunk, state, sr)
        want_prob, want_state = oracle_step(chunk, state_oracle, consts)
        assert abs(float(prob[0, 0]) - float(want_prob)) < 1e-3, step
        np.testing.assert_allclose(new_state, want_state, atol=1e-3)
        state, state_oracle = new_state, want_state


def test_silero_class_graph_if_resolves_statically():
    """sr is a runtime input here, but when passed as an initializer the If
    resolves at trace time (the reference compiles Silero's sr checks away,
    compiler/mod.rs:120)."""
    bs, consts = build_silero_like_onnx()
    model = OnnxModel.from_bytes(bs)
    # recompile with sr burned in as initializer: drop sr input
    raw = model.graph.raw()
    raw["input"] = [vi.raw() for vi in model.graph.input if vi.name != "sr"]
    raw["initializer"].append(
        {k: v for k, v in ob.tensor_from_array(np.array(16000, np.int64), "sr").items()}
    )
    cm = compile_model(model)
    chunk = (rng.standard_normal((1, 512)) * 0.3).astype(np.float32)
    state = np.zeros((2, 1, 16), np.float32)
    prob, new_state = cm.run_np(chunk=chunk, state=state)
    want_prob, _ = oracle_step(chunk, state, consts)
    assert abs(float(prob[0, 0]) - float(want_prob)) < 1e-3
