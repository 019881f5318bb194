"""Dynamic-quantization graph transform (an `onnxruntime.quantization.
quantize_dynamic` analog, weight-only-initializer MatMul/Gemm scope).

The reference does not quantize models itself — it CONSUMES graphs that
were dynamically quantized by onnxruntime's tooling (the int8 SenseVoice
encoder runs through generated `linear_quantized*` snippets,
/root/reference/src/snippets/default_methods.rs:96, and the compiler's
DynamicQuantizeLinear chain grouping, /root/reference/src/compiler/
mod.rs:865-990). There is no ORT wheel in this environment, so users who
start from a FLOAT export (e.g. torch.onnx) need a way to produce the same
int8 graph form. This transform rewrites, at the ModelProto level:

    MatMul(x, W_init)            Gemm(x, W_init, C, transB=…)
        |                            |
        v                            v
    DynamicQuantizeLinear(x) -> (x_q u8, x_scale, x_zp)
    MatMulInteger(x_q, W_q i8, x_zp, w_zp=0) -> i32
    Cast(float) ; Mul(x_scale * w_scale) ; [Add C for Gemm]

with ORT's symmetric int8 weight grid: scale = max|W| / 127, zero point 0,
values np.clip(np.round(W/scale), -127, 127) (the "clean zero point" form
every FunASR-style export carries, which is also what compiler/sanm_fuse.py
and ops/quant_ops.py's prepared-weight paths expect). Activations keep
ONNX DynamicQuantizeLinear semantics exactly (u8 asymmetric, per tensor) —
the rewritten graph is plain standard ONNX and runs on any backend.

Only MatMul/Gemm whose weight is a 2-D float32 initializer (or a foldable
Constant node) are rewritten; dynamic-×-dynamic matmuls (attention scores)
stay float, matching ORT's dynamic-quantization behavior on transformer
encoders. One DynamicQuantizeLinear is emitted per distinct activation
(shared across consumers, like ORT's tensor-wise quantizer).
"""

from __future__ import annotations

import numpy as np

from . import builder as ob
from . import schema
from .loader import tensor_to_array


def _inline_tensor(t: dict, base_dir) -> dict:
    if int(t.get("data_location", 0) or 0) != 1:
        return t
    arr = tensor_to_array(schema.Proto(t, "TensorProto"), base_dir)
    t = dict(t)
    t.pop("data_location", None)
    t.pop("external_data", None)
    t["raw_data"] = np.ascontiguousarray(arr).tobytes()
    return t


def _consolidate_external(inits: list[dict], base_dir) -> list[dict]:
    """Inline any surviving data_location=EXTERNAL initializers: the
    quantized model is written wherever the caller wants (CLI: out_dir),
    so relative side-file references from the SOURCE directory would
    dangle. Quantized weights are inline already; this catches the
    untouched remainder (embeddings, norms, biases)."""
    return [_inline_tensor(t, base_dir) for t in inits]


def _consolidate_external_nodes(nodes: list[dict], base_dir) -> list[dict]:
    """Same, for Constant-NODE value tensors (the other static-weight
    spelling _weight_array supports)."""
    out = []
    for n in nodes:
        if n.get("op_type") == "Constant":
            attrs = n.get("attribute", [])
            if any(int(a.get("t", {}).get("data_location", 0) or 0) == 1
                   for a in attrs):
                n = dict(n)
                n["attribute"] = [
                    {**a, "t": _inline_tensor(a["t"], base_dir)}
                    if "t" in a else a
                    for a in attrs
                ]
        out.append(n)
    return out


def _weight_array(name: str, inits: dict, const_nodes: dict, base_dir=None):
    """Resolve `name` as a static tensor: initializer or Constant node."""
    t = inits.get(name)
    if t is not None:
        return tensor_to_array(schema.Proto(t, "TensorProto"), base_dir)
    n = const_nodes.get(name)
    if n is not None:
        for a in n.get("attribute", []):
            if a.get("name") == "value" and "t" in a:
                return tensor_to_array(schema.Proto(a["t"], "TensorProto"),
                                       base_dir)
    return None


def quantize_weight_int8(w: np.ndarray) -> tuple[np.ndarray, float]:
    """ORT symmetric int8 grid: scale = max|W|/127, zp = 0."""
    amax = float(np.max(np.abs(w))) if w.size else 0.0
    scale = amax / 127.0 if amax > 0 else 1.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale


def quantize_dynamic(data: bytes, op_types=("MatMul", "Gemm"),
                     base_dir=None) -> bytes:
    """Rewrite float MatMul/Gemm (initializer weights) to the dynamic-u8 ×
    static-i8 DQL form. Returns new ModelProto bytes.

    Pass op_types=("MatMul", "Gemm", "Conv") to also rewrite Conv →
    ConvInteger (ORT's op_types_to_quantize=['Conv'] analog — opt-in, like
    ORT, because dynamic activation quantization of conv stacks costs more
    accuracy than transformer linears).

    Local-function models (torch export_modules_as_functions) inline
    before quantization: the MatMuls live inside function BODIES, which
    the node rewrite below cannot see."""
    raw = schema.decode_model(data).raw()
    if raw.get("functions"):
        from .functions import inline_functions

        raw = inline_functions(raw)
    # DynamicQuantizeLinear needs opset 11 (MatMulInteger 10). Bumping the
    # declared opset ourselves would silently change the meaning of pre-11
    # attribute-form ops (Pad/Slice/...) elsewhere in the graph — refuse
    # instead, like ORT's quantizer does for old opsets.
    for op_imp in raw.get("opset_import", []):
        if not op_imp.get("domain") and int(op_imp.get("version", 0)) < 11:
            raise ValueError(
                "quantize_dynamic needs opset >= 11 (DynamicQuantizeLinear); "
                f"model declares opset {op_imp.get('version')} — re-export "
                "with a newer opset_version"
            )
    g = raw["graph"]
    nodes: list[dict] = list(g.get("node", []))
    inits = {t.get("name", ""): t for t in g.get("initializer", [])}
    const_nodes = {
        n["output"][0]: n for n in nodes
        if n.get("op_type") == "Constant" and n.get("output")
    }

    out_nodes: list[dict] = []
    new_inits: list[dict] = []
    dql_cache: dict[str, tuple[str, str, str]] = {}
    wq_cache: dict[str, tuple[str, str, str]] = {}  # wname -> (q, s, zp)
    consumed_weights: dict[str, int] = {}
    uid = [0]

    def fresh(base: str) -> str:
        uid[0] += 1
        return f"{base}__dq{uid[0]}"

    def dql(src: str) -> tuple[str, str, str]:
        if src not in dql_cache:
            q, s, z = (fresh(f"{src}_q"), fresh(f"{src}_scale"),
                       fresh(f"{src}_zp"))
            out_nodes.append(
                ob.node("DynamicQuantizeLinear", [src], [q, s, z]))
            dql_cache[src] = (q, s, z)
        return dql_cache[src]

    def quant_weight(wname: str, w: np.ndarray,
                     transposed: bool) -> tuple[str, str, str]:
        # cache key carries the orientation: a weight shared by MatMul and
        # Gemm(transB=1) needs two int8 copies, not one reused wrongly
        key = f"{wname}|T" if transposed else wname
        if key not in wq_cache:
            wq, ws = quantize_weight_int8(w)
            qn, sn, zn = (fresh(f"{wname}_quant"), fresh(f"{wname}_wscale"),
                          fresh(f"{wname}_wzp"))
            new_inits.append(ob.tensor_from_array(wq, qn))
            new_inits.append(
                ob.tensor_from_array(np.float32(ws).reshape(()), sn))
            new_inits.append(
                ob.tensor_from_array(np.zeros((), np.int8), zn))
            wq_cache[key] = (qn, sn, zn)
        return wq_cache[key]

    def emit_quant_linear(src: str, wname: str, w: np.ndarray,
                          out: str, bias: str | None,
                          transposed: bool = False) -> None:
        xq, xs, xz = dql(src)
        wqn, wsn, wzn = quant_weight(wname, w, transposed)
        mm = fresh(f"{out}_i32")
        out_nodes.append(
            ob.node("MatMulInteger", [xq, wqn, xz, wzn], [mm]))
        cf = fresh(f"{out}_f32")
        out_nodes.append(ob.node("Cast", [mm], [cf], to=1))
        sc = fresh(f"{out}_scales")
        out_nodes.append(ob.node("Mul", [xs, wsn], [sc]))
        if bias is None:
            out_nodes.append(ob.node("Mul", [cf, sc], [out]))
        else:
            dq = fresh(f"{out}_dq")
            out_nodes.append(ob.node("Mul", [cf, sc], [dq]))
            out_nodes.append(ob.node("Add", [dq, bias], [out]))

    def attr_i(n: dict, name: str, default: int) -> int:
        for a in n.get("attribute", []):
            if a.get("name") == name:
                return int(a.get("i", default))
        return default

    def attr_f(n: dict, name: str, default: float) -> float:
        for a in n.get("attribute", []):
            if a.get("name") == name:
                return float(a.get("f", default))
        return default

    def emit_quant_conv(n: dict, w: np.ndarray) -> None:
        """Conv(x, W[, B]) → DQL + ConvInteger (attrs carried over) +
        Cast + Mul(combined scale) + Add(B reshaped [1,M,1...])."""
        xq, xs, xz = dql(n["input"][0])
        wqn, wsn, wzn = quant_weight(n["input"][1], w, transposed=False)
        out = n["output"][0]
        ci = fresh(f"{out}_i32")
        out_nodes.append({
            "op_type": "ConvInteger",
            "input": [xq, wqn, xz, wzn],
            "output": [ci],
            "name": f"ConvInteger_{ci}",
            "attribute": list(n.get("attribute", [])),
        })
        cf = fresh(f"{out}_f32")
        out_nodes.append(ob.node("Cast", [ci], [cf], to=1))
        sc = fresh(f"{out}_scales")
        out_nodes.append(ob.node("Mul", [xs, wsn], [sc]))
        bias_name = n["input"][2] if len(n["input"]) > 2 and \
            n["input"][2] else None
        if bias_name is None:
            out_nodes.append(ob.node("Mul", [cf, sc], [out]))
            return
        b = _weight_array(bias_name, inits, const_nodes, base_dir)
        if b is None:
            raise ValueError(
                f"Conv bias {bias_name!r} must be a static tensor")
        brs = fresh(f"{bias_name}_nchw")
        new_inits.append(ob.tensor_from_array(
            b.reshape((1, -1) + (1,) * (w.ndim - 2)), brs))
        dq = fresh(f"{out}_dq")
        out_nodes.append(ob.node("Mul", [cf, sc], [dq]))
        out_nodes.append(ob.node("Add", [dq, brs], [out]))

    for n in nodes:
        op = n.get("op_type")
        if op == "Conv" and "Conv" in op_types and len(n["input"]) >= 2:
            w = _weight_array(n["input"][1], inits, const_nodes, base_dir)
            if w is not None and w.ndim >= 3 and w.dtype == np.float32:
                emit_quant_conv(n, w)
                consumed_weights[n["input"][1]] = \
                    consumed_weights.get(n["input"][1], 0) + 1
                if len(n["input"]) > 2 and n["input"][2]:
                    consumed_weights[n["input"][2]] = \
                        consumed_weights.get(n["input"][2], 0) + 1
                continue
        if op == "MatMul" and "MatMul" in op_types and len(n["input"]) == 2:
            w = _weight_array(n["input"][1], inits, const_nodes, base_dir)
            if w is not None and w.ndim == 2 and w.dtype == np.float32:
                emit_quant_linear(n["input"][0], n["input"][1], w,
                                  n["output"][0], bias=None)
                consumed_weights[n["input"][1]] = \
                    consumed_weights.get(n["input"][1], 0) + 1
                continue
        if op == "Gemm" and "Gemm" in op_types and len(n["input"]) >= 2:
            w = _weight_array(n["input"][1], inits, const_nodes, base_dir)
            ok = (
                w is not None and w.ndim == 2 and w.dtype == np.float32
                and attr_i(n, "transA", 0) == 0
                and attr_f(n, "alpha", 1.0) == 1.0
                and attr_f(n, "beta", 1.0) == 1.0
            )
            if ok:
                transposed = bool(attr_i(n, "transB", 0))
                if transposed:
                    w = np.ascontiguousarray(w.T)
                bias = n["input"][2] if len(n["input"]) > 2 and \
                    n["input"][2] else None
                emit_quant_linear(n["input"][0], n["input"][1], w,
                                  n["output"][0], bias=bias,
                                  transposed=transposed)
                consumed_weights[n["input"][1]] = \
                    consumed_weights.get(n["input"][1], 0) + 1
                continue
        out_nodes.append(n)

    # drop float weights (and their Constant producers) that no surviving
    # node references — quantized models shouldn't carry both copies
    still_used: set[str] = set()
    for n in out_nodes:
        still_used.update(n.get("input", []))

    def gone(name: str) -> bool:
        return name in consumed_weights and name not in still_used

    g["node"] = _consolidate_external_nodes([
        n for n in out_nodes
        if not (n.get("op_type") == "Constant" and n.get("output")
                and gone(n["output"][0]))
    ], base_dir)
    g["initializer"] = _consolidate_external(
        [t for t in g.get("initializer", []) if not gone(t.get("name", ""))],
        base_dir,
    ) + new_inits
    # exports with keep_initializers_as_inputs also LIST weights in
    # graph.input — a dropped weight must leave that list too, or it
    # becomes a required runtime input
    if g.get("input"):
        g["input"] = [vi for vi in g["input"]
                      if not gone(vi.get("name", ""))]
    return schema.encode_message(raw, "ModelProto")


def quantize_dynamic_file(src_path: str, dst_path: str) -> None:
    import os
    with open(src_path, "rb") as f:
        data = f.read()
    with open(dst_path, "wb") as f:
        f.write(quantize_dynamic(data, base_dir=os.path.dirname(
            os.path.abspath(src_path))))


# ---------------------------------------------------------------------------
# Static quantization (QDQ format) — the onnxruntime `quantize_static`
# analog. Ops stay FLOAT; QuantizeLinear/DequantizeLinear pairs fake-quant
# the activations at calibrated ranges and the weights at the symmetric
# int8 grid. This is the layout real int8 VISION exports use (the repo's
# compiler folds the weight-side Q/DQ at trace time — test_qdq_model), as
# opposed to the DQL dynamic chains of the ASR exports.


def calibrate_minmax(data: bytes, batches,
                     base_dir=None) -> dict[str, tuple[float, float]]:
    """Run the float model over calibration batches and record per-tensor
    [min, max] for every activation a static quantizer would fake-quant
    (inputs/outputs of Conv/MatMul/Gemm nodes). Ranges are widened to
    include 0 (ORT MinMax calibrater convention — zero must be exactly
    representable for asymmetric u8)."""
    from ..compiler import compile_model
    from .loader import OnnxModel

    raw = schema.decode_model(data).raw()
    if raw.get("functions"):
        from .functions import inline_functions

        raw = inline_functions(raw)
    g = raw["graph"]
    inits = {t.get("name", "") for t in g.get("initializer", [])}
    # Constant-node outputs take the weight path in quantize_static —
    # exclude them like initializers so they aren't treated as activations
    static_out = inits | {
        n["output"][0] for n in g.get("node", [])
        if n.get("op_type") == "Constant" and n.get("output")
    }
    names: list[str] = []
    for n in g.get("node", []):
        if n.get("op_type") not in ("Conv", "MatMul", "Gemm"):
            continue
        # EVERY dynamic-activation input is a calibrated edge (ORT MinMax
        # calibrater records all target inputs) — a MatMul whose second
        # input is an activation (attention scores) gets both calibrated
        for t in list(n.get("input", [])) + [n["output"][0]]:
            if t and t not in static_out and t not in names:
                names.append(t)
    if not names:
        return {}
    # instrument: expose the calibration tensors as extra graph outputs
    existing = [vi.get("name", "") for vi in g.get("output", [])]
    extra = [t for t in names if t not in existing]
    g["output"] = list(g.get("output", [])) + [
        {"name": t} for t in extra
    ]
    cm = compile_model(OnnxModel.from_bytes(
        schema.encode_message(raw, "ModelProto"), base_dir=base_dir))
    ranges = {t: (0.0, 0.0) for t in names}
    order = existing + extra
    for batch in batches:
        outs = cm.run_np(**batch)
        vals = dict(zip(order, outs))
        for t in names:
            v = np.asarray(vals[t], np.float32)
            lo, hi = ranges[t]
            ranges[t] = (min(lo, float(v.min(initial=0.0))),
                         max(hi, float(v.max(initial=0.0))))
    return ranges


def _u8_qparams(rmin: float, rmax: float) -> tuple[float, int]:
    scale = (rmax - rmin) / 255.0
    if scale <= 0:
        return 1.0, 0
    zp = int(np.clip(round(-rmin / scale), 0, 255))
    return float(scale), zp


def quantize_weight_int8_per_channel(
        w: np.ndarray, axis: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel symmetric int8 grid along `axis` (ORT per_channel=True):
    scale[c] = max|W[c]|/127, zp 0."""
    mv = np.moveaxis(w, axis, 0)
    amax = np.abs(mv.reshape(mv.shape[0], -1)).max(axis=1)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    wq = np.clip(
        np.round(mv / scale.reshape((-1,) + (1,) * (w.ndim - 1))),
        -127, 127).astype(np.int8)
    return np.moveaxis(wq, 0, axis), scale


def quantize_static(data: bytes, calibration_batches,
                    op_types=("Conv", "MatMul", "Gemm"),
                    per_channel: bool = False, base_dir=None) -> bytes:
    """QDQ-format static quantization: calibrate activation ranges on the
    float model, then insert QuantizeLinear/DequantizeLinear pairs around
    every target op's activations (u8 asymmetric) and weights (pre-baked
    symmetric int8 initializers + DequantizeLinear). Ops themselves stay
    float — backends (including this repo's tracer) fold the pairs.

    calibration_batches: iterable of {input_name: np.ndarray} dicts fed to
    the float model. per_channel=True quantizes Conv weights one scale per
    output channel (DequantizeLinear axis=0, ORT per_channel analog);
    2-D MatMul/Gemm weights stay per-tensor either way."""
    for op_imp in schema.decode_model(data).raw().get("opset_import", []):
        if not op_imp.get("domain") and int(op_imp.get("version", 0)) < 10:
            raise ValueError(
                "quantize_static needs opset >= 10 (QuantizeLinear); "
                f"model declares opset {op_imp.get('version')}"
            )
    batches = list(calibration_batches)
    raw0 = schema.decode_model(data).raw()
    if raw0.get("functions"):
        # inline local functions so the QDQ insertion below sees the real
        # Conv/MatMul nodes (they live inside function bodies otherwise)
        from .functions import inline_functions

        data = schema.encode_message(inline_functions(raw0), "ModelProto")
    ranges = calibrate_minmax(data, batches, base_dir=base_dir)
    raw = schema.decode_model(data).raw()
    g = raw["graph"]
    nodes: list[dict] = list(g.get("node", []))
    inits = {t.get("name", ""): t for t in g.get("initializer", [])}
    const_nodes = {
        n["output"][0]: n for n in nodes
        if n.get("op_type") == "Constant" and n.get("output")
    }
    targets = [
        n for n in nodes
        if n.get("op_type") in op_types and len(n.get("input", [])) >= 2
    ]
    target_ids = {id(n) for n in targets}

    new_inits: list[dict] = []
    uid = [0]

    def fresh(base):
        uid[0] += 1
        return f"{base}__qs{uid[0]}"

    graph_outputs = {vi.get("name", "") for vi in g.get("output", [])}

    # activation fake-quant: tensor name -> dequantized alias. For a tensor
    # that IS a graph output, the producer is renamed t__pre and the DQ
    # takes over the public name (ORT fake-quants final activations too,
    # and the model's output signature must not change).
    dq_alias: dict[str, str] = {}
    pre_rename: dict[str, str] = {}
    qdq_nodes: dict[str, list[dict]] = {}  # producer tensor -> Q/DQ pair
    for t, (rmin, rmax) in ranges.items():
        scale, zp = _u8_qparams(rmin, rmax)
        sn, zn = fresh(f"{t}_scale"), fresh(f"{t}_zp")
        new_inits.append(ob.tensor_from_array(
            np.float32(scale).reshape(()), sn))
        new_inits.append(ob.tensor_from_array(
            np.asarray(zp, np.uint8).reshape(()), zn))
        qn = fresh(f"{t}_q")
        if t in graph_outputs:
            src = fresh(f"{t}_pre")
            pre_rename[t] = src
            dqn = t
        else:
            src, dqn = t, fresh(f"{t}_dq")
        qdq_nodes[t] = [
            ob.node("QuantizeLinear", [src, sn, zn], [qn]),
            ob.node("DequantizeLinear", [qn, sn, zn], [dqn]),
        ]
        dq_alias[t] = dqn

    wq_cache: dict[str, str] = {}

    def weight_dq(wname: str, w: np.ndarray) -> str:
        if wname not in wq_cache:
            qn = fresh(f"{wname}_quant")
            sn, zn = fresh(f"{wname}_wscale"), fresh(f"{wname}_wzp")
            dqn = fresh(f"{wname}_dq")
            if per_channel and w.ndim >= 3:
                # Conv OIHW: one scale per output channel (axis 0)
                wq, ws = quantize_weight_int8_per_channel(w, axis=0)
                new_inits.append(ob.tensor_from_array(wq, qn))
                new_inits.append(ob.tensor_from_array(ws, sn))
                new_inits.append(ob.tensor_from_array(
                    np.zeros(ws.shape, np.int8), zn))
                dq = ob.node("DequantizeLinear", [qn, sn, zn], [dqn],
                             axis=0)
            else:
                wq, ws = quantize_weight_int8(w)
                new_inits.append(ob.tensor_from_array(wq, qn))
                new_inits.append(ob.tensor_from_array(
                    np.float32(ws).reshape(()), sn))
                new_inits.append(ob.tensor_from_array(
                    np.zeros((), np.int8), zn))
                dq = ob.node("DequantizeLinear", [qn, sn, zn], [dqn])
            qdq_nodes[f"__w_{wname}"] = [dq]
            wq_cache[wname] = dqn
        return wq_cache[wname]

    consumed_weights: dict[str, int] = {}
    out_nodes: list[dict] = []
    # graph-input activations have no producer node — emit their QDQ first
    graph_inputs = {vi.get("name", "") for vi in g.get("input", [])}
    emitted: set[str] = set()
    for t in ranges:
        if t in graph_inputs:
            out_nodes.extend(qdq_nodes[t])
            emitted.add(t)

    for n in nodes:
        outs_orig = list(n.get("output", []))
        if id(n) in target_ids:
            w = _weight_array(n["input"][1], inits, const_nodes, base_dir)
            # every calibrated edge carries the fake-quant view, same as
            # the non-target consumer branch — a target whose SECOND input
            # is a dynamic activation (attention-score MatMul) must also
            # read the dequantized alias (ADVICE r4); a static weight
            # replaces ins[1] below regardless
            ins = [dq_alias.get(x, x) for x in n["input"]]
            if w is not None and w.ndim >= 2 and w.dtype == np.float32:
                ins[1] = weight_dq(n["input"][1], w)
                pair = qdq_nodes.get(f"__w_{n['input'][1]}")
                if pair:
                    out_nodes.extend(pair)
                    qdq_nodes[f"__w_{n['input'][1]}"] = []
                consumed_weights[n["input"][1]] = 1
            n = dict(n)
            n["input"] = ins
        elif any(x in dq_alias for x in n.get("input", [])):
            # non-target consumers also read the fake-quant value when one
            # exists (ORT rewires the whole edge, keeping one numeric view)
            n = dict(n)
            n["input"] = [dq_alias.get(x, x) for x in n["input"]]
        if any(t in pre_rename for t in outs_orig):
            n = dict(n)
            n["output"] = [pre_rename.get(t, t) for t in outs_orig]
        out_nodes.append(n)
        for t in outs_orig:
            if t in qdq_nodes and t not in emitted:
                out_nodes.extend(qdq_nodes[t])
                emitted.add(t)

    still_used: set[str] = set()
    for n in out_nodes:
        still_used.update(n.get("input", []))

    def gone(name: str) -> bool:
        return name in consumed_weights and name not in still_used

    g["node"] = _consolidate_external_nodes([
        n for n in out_nodes
        if not (n.get("op_type") == "Constant" and n.get("output")
                and gone(n["output"][0]))
    ], base_dir)
    g["initializer"] = _consolidate_external(
        [t for t in g.get("initializer", []) if not gone(t.get("name", ""))],
        base_dir,
    ) + new_inits
    if g.get("input"):
        g["input"] = [vi for vi in g["input"]
                      if not gone(vi.get("name", ""))]
    return schema.encode_message(raw, "ModelProto")
