"""Export-variant robustness for the SAN-M whole-layer fusion (VERDICT r3 #2).

The r3 circularity: every graph sanm_fuse ever matched was authored by our
own onnx/synth.py. This suite programmatically PERTURBS that exporter's
graph — inserted Identity/Cast glue, Div-form attention scale, opset-13
Split-with-sizes-input, biased FSMN conv, non-clean weight zero point, an
intermediate exposed as a graph output, an extra consumer, per-channel
weight scales, inconsistent inter-layer dims, missing MatMulInteger zp
wiring — and asserts each variant either FUSES with parity or BAILS cleanly
to the per-op path with parity, with the exact `sanm_fused_layers` count
visible in pattern_hits.

Parity oracle: the per-op trace (LELE_SANM_FUSE=0) of the SAME perturbed
graph — semantics-changing perturbations (bias, zp) are therefore fine; the
contract is fused(graph) ≡ per-op(graph) for every graph, which is the
reference compiler's generality contract
(/root/reference/src/compiler/generate.rs:802-997).
"""

import numpy as np
import pytest

from lele_tpu.onnx import builder as ob
from lele_tpu.onnx.synth import build_sanm_int8_graph, serialize_sanm_graph

L, D, H, FFN, VOCAB = 2, 128, 4, 256, 64
T_IN = 60  # +4 prefix frames = 64 total


def _graph():
    return build_sanm_int8_graph(L=L, d=D, h=H, ffn=FFN, vocab=VOCAB)


def _find(nodes, op_type, output):
    for i, n in enumerate(nodes):
        if n["op_type"] == op_type and output in n["output"]:
            return i
    raise AssertionError(f"{op_type} -> {output} not in graph")


def _rewire(nodes, old: str, new: str, start=0):
    """Point every consumer of `old` (from index `start`) at `new`."""
    for n in nodes[start:]:
        n["input"] = [new if x == old else x for x in n["input"]]


def _compile_run(model_bytes, mode, monkeypatch, n_outs=1):
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx.loader import OnnxModel

    monkeypatch.setenv("LELE_SANM_FUSE", mode)
    rng = np.random.default_rng(7)
    t_pad = 64
    speech = rng.standard_normal((1, T_IN, 560)).astype(np.float32)
    padded = np.zeros((1, t_pad - 4, 560), np.float32)
    padded[:, :T_IN] = speech
    m = OnnxModel.load_bytes(model_bytes) if hasattr(
        OnnxModel, "load_bytes") else OnnxModel.from_bytes(model_bytes)
    cm = compile_model(m, input_shapes={"speech": (1, t_pad - 4, 560)})
    outs = cm.run_np(
        speech=padded,
        speech_lengths=np.asarray([T_IN], np.int64),
        language=np.asarray([3], np.int32),
        textnorm=np.asarray([0], np.int32),
    )
    return [np.asarray(o) for o in outs[:n_outs]], cm.stats["pattern_hits"]


def _assert_variant(model_bytes, expect_hits, monkeypatch, n_outs=1):
    """fused(graph) ≡ per-op(graph), with the expected fuse count."""
    want, hits0 = _compile_run(model_bytes, "0", monkeypatch, n_outs)
    assert "sanm_fused_layers" not in hits0
    got, hits1 = _compile_run(model_bytes, "interpret", monkeypatch, n_outs)
    assert hits1.get("sanm_fused_layers", 0) == expect_hits, hits1
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-3, rtol=0)


def test_baseline_fuses_all(monkeypatch):
    nodes, inits, ins, outs = _graph()
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L, monkeypatch)


def test_identity_between_matched_nodes(monkeypatch):
    """Identity glue inside layer 0's chains (LN→qkv, linear→Split,
    attn-out→residual region) — the matcher skips through and still fuses
    ALL layers (real exports interleave Identity freely)."""
    nodes, inits, ins, outs = _graph()
    for src in ("ln1_l0", "qkv_l0", "fr_l0"):
        i = _find(nodes, next(
            n["op_type"] for n in nodes if src in n["output"]), src)
        alias = f"{src}__id"
        _rewire(nodes, src, alias, start=i + 1)
        nodes.insert(i + 1, ob.node("Identity", [src], [alias]))
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L, monkeypatch)


def test_noop_cast_bails_cleanly(monkeypatch):
    """A Cast(to=f32) between LN1 and the qkv DQL of layer 0: the matcher
    conservatively bails layer 0 to the per-op path; layer 1 still fuses."""
    nodes, inits, ins, outs = _graph()
    i = _find(nodes, "LayerNormalization", "ln1_l0")
    _rewire(nodes, "ln1_l0", "ln1_l0__c", start=i + 1)
    nodes.insert(i + 1, ob.node("Cast", ["ln1_l0"], ["ln1_l0__c"], to=1))
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L - 1, monkeypatch)


def test_div_form_attention_scale(monkeypatch):
    """Mul(scores, 1/sqrt(hd)) rewritten as Div(scores, sqrt(hd)) in BOTH
    layers — a common exporter choice; must fuse with identical math."""
    nodes, inits, ins, outs = _graph()
    inits["sqrt_hd"] = np.float32(np.sqrt(D // H))
    for li in range(L):
        i = _find(nodes, "Mul", f"sc1_l{li}")
        nodes[i] = ob.node("Div", [f"sc0_l{li}", "sqrt_hd"], [f"sc1_l{li}"])
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L, monkeypatch)


def test_opset13_split_sizes_input(monkeypatch):
    """Split sizes as a second INPUT tensor (opset >= 13 form) instead of
    the num_outputs attribute — must fuse."""
    nodes, inits, ins, outs = _graph()
    inits["qkv_sizes"] = np.asarray([D, D, D], np.int64)
    for li in range(L):
        i = _find(nodes, "Split", f"q_l{li}")
        nodes[i] = ob.node(
            "Split", [f"qkv_l{li}", "qkv_sizes"],
            [f"q_l{li}", f"k_l{li}", f"v_l{li}"], axis=2)
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L, monkeypatch)


def test_biased_fsmn_conv_bails(monkeypatch):
    """FSMN depthwise conv WITH a bias input in both layers: outside the
    fused kernel's contract → clean bail to per-op on every layer."""
    nodes, inits, ins, outs = _graph()
    rng = np.random.default_rng(3)
    inits["fsmn_bias"] = rng.standard_normal(D).astype(np.float32) * 0.1
    for li in range(L):
        i = _find(nodes, "Conv", f"fs0_l{li}")
        nodes[i]["input"] = list(nodes[i]["input"]) + ["fsmn_bias"]
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    0, monkeypatch)


def test_nonclean_weight_zero_point_bails(monkeypatch):
    """qkv weight zero point 131 != 128 in layer 0: the stack kernel only
    implements zp-free i8 dots → layer 0 bails, layer 1 fuses. The per-op
    path carries the full zp-corrected semantics (the parity oracle)."""
    nodes, inits, ins, outs = _graph()
    inits["wz_qkv0"] = np.uint8(131)
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L - 1, monkeypatch)


def test_intermediate_as_graph_output_bails(monkeypatch):
    """Layer 0's post-attention residual exposed as a graph output: fusing
    would hide a value the graph promises → the run bails; layer 1 (a fresh
    match root) still fuses."""
    nodes, inits, ins, outs = _graph()
    outs = list(outs) + [ob.value_info("x1_l0", 1, [1, "T4", D])]
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L - 1, monkeypatch, n_outs=2)


def test_extra_consumer_bails(monkeypatch):
    """A ReduceSum side-tap on layer 0's qkv output feeding a second graph
    output: Split is no longer the only consumer → layer 0 bails, layer 1
    fuses, both outputs match per-op."""
    nodes, inits, ins, outs = _graph()
    nodes.append(ob.node("ReduceSum", ["qkv_l0"], ["qkv_tap"], keepdims=0))
    outs = list(outs) + [ob.value_info("qkv_tap", 1, [])]
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L - 1, monkeypatch, n_outs=2)


def test_per_channel_weight_scale_fuses(monkeypatch):
    """Per-output-channel weight scales [N] on layer 0's qkv linear (the
    real per-channel export form) — must fuse with parity."""
    nodes, inits, ins, outs = _graph()
    rng = np.random.default_rng(5)
    base = float(inits["ws_qkv0"])
    inits["ws_qkv0"] = (
        base * (1.0 + 0.3 * rng.standard_normal(3 * D).astype(np.float32))
    ).astype(np.float32)
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L, monkeypatch)


def test_inconsistent_layer_dims_split_runs(monkeypatch):
    """Layer 1's FFN widened to a different size: the stack requires
    consistent dims, so the run splits — layer 0 fuses as one stack,
    layer 1 as another (both still fused, hits == 2)."""
    nodes, inits, ins, outs = _graph()
    rng = np.random.default_rng(9)
    ffn2 = FFN + 128

    def q_u8(arr):
        s = float(np.abs(arr).max() / 127.0) or 1.0
        q = np.clip(np.round(arr / s) + 128, 0, 255).astype(np.uint8)
        return q, np.float32(s)

    w1 = rng.standard_normal((D, ffn2)).astype(np.float32) / np.sqrt(D)
    w2 = rng.standard_normal((ffn2, D)).astype(np.float32) / np.sqrt(ffn2)
    inits["w_ff11"], inits["ws_ff11"] = q_u8(w1)
    inits["b_ff11"] = np.zeros(ffn2, np.float32)
    inits["w_ff21"], inits["ws_ff21"] = q_u8(w2)
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L, monkeypatch)


def test_missing_azp_wiring_bails(monkeypatch):
    """Layer 0's qkv MatMulInteger with NO zero-point inputs (2-input form,
    ONNX default zp = 0 — different math from the DQL zp): must bail to the
    per-op path, which implements the default-zp semantics."""
    nodes, inits, ins, outs = _graph()
    i = _find(nodes, "MatMulInteger", "mm_qkv0")
    nodes[i]["input"] = nodes[i]["input"][:2]
    _assert_variant(serialize_sanm_graph(nodes, inits, ins, outs),
                    L - 1, monkeypatch)


def test_fuse_count_is_visible(monkeypatch):
    """pattern_hits carries the exact per-compile fuse count — serving can
    alert when a graph quietly stops fusing (the observability half of the
    bail contract)."""
    nodes, inits, ins, outs = _graph()
    _, hits = _compile_run(
        serialize_sanm_graph(nodes, inits, ins, outs),
        "interpret", monkeypatch)
    assert hits["sanm_fused_layers"] == L
