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


def _weight_array(name: str, inits: dict, const_nodes: dict):
    """Resolve `name` as a static tensor: initializer or Constant node."""
    t = inits.get(name)
    if t is not None:
        return tensor_to_array(schema.Proto(t, "TensorProto"))
    n = const_nodes.get(name)
    if n is not None:
        for a in n.get("attribute", []):
            if a.get("name") == "value" and "t" in a:
                return tensor_to_array(schema.Proto(a["t"], "TensorProto"))
    return None


def quantize_weight_int8(w: np.ndarray) -> tuple[np.ndarray, float]:
    """ORT symmetric int8 grid: scale = max|W|/127, zp = 0."""
    amax = float(np.max(np.abs(w))) if w.size else 0.0
    scale = amax / 127.0 if amax > 0 else 1.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale


def quantize_dynamic(data: bytes, op_types=("MatMul", "Gemm")) -> bytes:
    """Rewrite float MatMul/Gemm (initializer weights) to the dynamic-u8 ×
    static-i8 DQL form. Returns new ModelProto bytes.

    Pass op_types=("MatMul", "Gemm", "Conv") to also rewrite Conv →
    ConvInteger (ORT's op_types_to_quantize=['Conv'] analog — opt-in, like
    ORT, because dynamic activation quantization of conv stacks costs more
    accuracy than transformer linears)."""
    raw = schema.decode_model(data).raw()
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
        b = _weight_array(bias_name, inits, const_nodes)
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
            w = _weight_array(n["input"][1], inits, const_nodes)
            if w is not None and w.ndim >= 3 and w.dtype == np.float32:
                emit_quant_conv(n, w)
                consumed_weights[n["input"][1]] = \
                    consumed_weights.get(n["input"][1], 0) + 1
                if len(n["input"]) > 2 and n["input"][2]:
                    consumed_weights[n["input"][2]] = \
                        consumed_weights.get(n["input"][2], 0) + 1
                continue
        if op == "MatMul" and "MatMul" in op_types and len(n["input"]) == 2:
            w = _weight_array(n["input"][1], inits, const_nodes)
            if w is not None and w.ndim == 2 and w.dtype == np.float32:
                emit_quant_linear(n["input"][0], n["input"][1], w,
                                  n["output"][0], bias=None)
                consumed_weights[n["input"][1]] = \
                    consumed_weights.get(n["input"][1], 0) + 1
                continue
        if op == "Gemm" and "Gemm" in op_types and len(n["input"]) >= 2:
            w = _weight_array(n["input"][1], inits, const_nodes)
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

    g["node"] = [
        n for n in out_nodes
        if not (n.get("op_type") == "Constant" and n.get("output")
                and gone(n["output"][0]))
    ]
    g["initializer"] = [
        t for t in g.get("initializer", []) if not gone(t.get("name", ""))
    ] + new_inits
    # exports with keep_initializers_as_inputs also LIST weights in
    # graph.input — a dropped weight must leave that list too, or it
    # becomes a required runtime input
    if g.get("input"):
        g["input"] = [vi for vi in g["input"]
                      if not gone(vi.get("name", ""))]
    return schema.encode_message(raw, "ModelProto")


def quantize_dynamic_file(src_path: str, dst_path: str) -> None:
    with open(src_path, "rb") as f:
        data = f.read()
    with open(dst_path, "wb") as f:
        f.write(quantize_dynamic(data))
