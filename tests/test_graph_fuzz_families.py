"""Composition fuzz across the op-family registry (VERDICT r3 #5).

The per-op suites battery-test each emitter in isolation; this fuzzer wires
RANDOM-BUT-VALID chains across families — conv/pool/matmul, reduce, gather/
scatter/topk, shape/cast/pad/slice/split, elementwise/compare/where — with
degenerate dims (1s, and 0-extent in a dedicated test), a random
static/dynamic split of the inputs (every mixed node is a fold-vs-trace
decision), and opsets {11, 13, 17, 18, 20} (axes-as-attribute vs
axes-as-input encodings). Every op output is a graph output compared
against a numpy/torch oracle, so a broken intermediate can't hide behind
downstream ops.

Reference analog: ORT-oracle verification of generated code on arbitrary
graphs (/root/reference/tests/verify_kernels_with_ort.py) — generality is
the compiler's product (/root/reference/src/compiler/generate.rs:802-997).
"""

import numpy as np
import pytest

from optest import run_graph
from lele_tpu.onnx import builder as ob

OPSETS = (11, 13, 17, 18, 20, 23)


class Ctx:
    def __init__(self, rng, opset, trial):
        self.rng = rng
        self.opset = opset
        self.trial = trial
        self.nodes = []
        self.host = {}        # name -> np value (oracle)
        self.pool = []        # float32 tensor names usable as op inputs
        self.dynamic = {}     # graph inputs
        self.static = {}      # initializers
        self.checks = []      # output names to compare
        self.n = 0

    def fresh(self, tag):
        self.n += 1
        return f"t{self.trial}_{tag}{self.n}"

    def const(self, arr, tag):
        name = self.fresh(tag)
        self.static[name] = np.asarray(arr)
        self.host[name] = np.asarray(arr)
        return name

    def new_input(self, shape, force_dynamic=False):
        arr = self.rng.standard_normal(shape).astype(np.float32)
        name = self.fresh("in")
        if not force_dynamic and self.rng.random() < 0.35:
            self.static[name] = arr
        else:
            self.dynamic[name] = arr
        self.host[name] = arr
        self.pool.append(name)
        return name

    def emit(self, op, ins, n_out=1, oracle=None, check=True, **attrs):
        outs = [self.fresh(op.lower()) for _ in range(n_out)]
        self.nodes.append(ob.node(op, ins, outs, **attrs))
        vals = oracle if isinstance(oracle, tuple) else (oracle,)
        for o, v in zip(outs, vals):
            if v is None:  # un-oracled output (e.g. TopK indices)
                continue
            self.host[o] = np.asarray(v)
            if check:
                self.checks.append(o)
            if np.asarray(v).dtype == np.float32:
                self.pool.append(o)
        return outs[0] if n_out == 1 else outs

    def pick(self, pred=lambda a: True):
        cands = [n for n in self.pool if pred(self.host[n])]
        if not cands:
            return None
        return str(self.rng.choice(cands))

    def rand_shape(self, rank=None):
        rank = rank if rank is not None else int(self.rng.integers(1, 5))
        return tuple(
            int(self.rng.choice([1, 1, 2, 3, 4, 5])) for _ in range(rank))


def _axes_form(c, op, x, axes, keepdims):
    """Emit a Reduce* in the opset-correct encoding: axes as an input
    tensor for opset>=18 (>=13 for ReduceSum), as an attribute before."""
    as_input = c.opset >= 18 or (op == "ReduceSum" and c.opset >= 13)
    red = {"ReduceSum": np.sum, "ReduceMean": np.mean, "ReduceMax": np.max,
           "ReduceMin": np.min,
           "ReduceL2": lambda a, axis, keepdims: np.sqrt(
               np.sum(a.astype(np.float64) ** 2, axis=axis,
                      keepdims=keepdims)).astype(np.float32)}[op]
    want = red(c.host[x], axis=tuple(axes), keepdims=bool(keepdims))
    want = np.asarray(want, np.float32)
    if as_input:
        ax = c.const(np.asarray(axes, np.int64), "axes")
        return c.emit(op, [x, ax], oracle=want, keepdims=keepdims)
    return c.emit(op, [x], oracle=want, keepdims=keepdims, axes=list(axes))


def _squeeze_form(c, op, x, axes, want):
    if c.opset >= 13:
        ax = c.const(np.asarray(axes, np.int64), "axes")
        return c.emit(op, [x, ax], oracle=want)
    return c.emit(op, [x], oracle=want, axes=list(axes))


# --------------------------------------------------------------------------
# generators: each returns True if it emitted something

def g_binary(c):
    ops = {"Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
           "Max": np.maximum, "Min": np.minimum}
    op = str(c.rng.choice(list(ops)))
    x = c.pick()
    xa = c.host[x]
    # same shape, or a broadcastable variant
    if c.rng.random() < 0.5 and xa.ndim:
        shp = list(xa.shape)
        shp[int(c.rng.integers(len(shp)))] = 1
        y = c.new_input(tuple(shp))
    else:
        y = c.pick(lambda a: a.shape == xa.shape) or c.new_input(xa.shape)
    c.emit(op, [x, y], oracle=ops[op](xa, c.host[y]).astype(np.float32))
    return True


def g_div_pow_mod(c):
    op = str(c.rng.choice(["Div", "Pow", "Mod"]))
    x = c.pick()
    xa = c.host[x]
    if op == "Div":
        d = c.new_input(xa.shape)
        dn = c.emit("Add", [d, c.const(np.float32(3.0), "c")],
                    oracle=c.host[d] + 3.0, check=False)  # denom >= ~1
        dn2 = c.emit("Abs", [dn], oracle=np.abs(c.host[dn]))
        c.emit("Div", [x, dn2], oracle=(xa / c.host[dn2]).astype(np.float32))
    elif op == "Pow":
        e = c.const(np.float32(2.0), "exp")
        c.emit("Pow", [x, e], oracle=(xa ** 2).astype(np.float32))
    else:
        d = c.const(np.full(xa.shape or (1,), 2.5, np.float32), "modc")
        c.emit("Mod", [x, d], fmod=1,
               oracle=np.fmod(xa, c.host[d]).astype(np.float32))
    return True


def g_unary(c):
    ops = {
        "Relu": lambda a: np.maximum(a, 0),
        "Sigmoid": lambda a: 1 / (1 + np.exp(-a.astype(np.float64))),
        "Tanh": np.tanh,
        "Neg": np.negative,
        "Abs": np.abs,
        "Floor": np.floor,
        "Ceil": np.ceil,
        "Round": np.round,  # ONNX Round IS half-to-even
        "Softplus": lambda a: np.log1p(np.exp(-np.abs(a))) + np.maximum(a, 0),
        "Erf": None,  # via torch below
        "Exp": lambda a: np.exp(np.clip(a, -10, 10)),
        "Sqrt": None,  # needs abs domain, handled below
        "Log": None,
    }
    op = str(c.rng.choice(list(ops)))
    x = c.pick()
    xa = c.host[x]
    if op == "Exp":
        xc = c.emit("Clip", [x, c.const(np.float32(-10), "lo"),
                             c.const(np.float32(10), "hi")],
                    oracle=np.clip(xa, -10, 10)) if c.opset >= 13 else \
            c.emit("Clip", [x], oracle=np.clip(xa, -10, 10),
                   min=-10.0, max=10.0)
        c.emit("Exp", [xc], oracle=np.exp(c.host[xc]).astype(np.float32))
    elif op in ("Sqrt", "Log"):
        ab = c.emit("Abs", [x], oracle=np.abs(xa))
        sh = c.emit("Add", [ab, c.const(np.float32(0.5), "c")],
                    oracle=c.host[ab] + 0.5)
        f = np.sqrt if op == "Sqrt" else np.log
        c.emit(op, [sh], oracle=f(c.host[sh].astype(np.float64)))
    elif op == "Erf":
        import torch

        c.emit("Erf", [x],
               oracle=torch.erf(torch.from_numpy(xa)).numpy())
    else:
        c.emit(op, [x], oracle=np.asarray(ops[op](xa), np.float32))
    return True


def g_activation_attrs(c):
    op = str(c.rng.choice(["LeakyRelu", "Elu", "HardSigmoid"]))
    x = c.pick()
    xa = c.host[x].astype(np.float64)
    if op == "LeakyRelu":
        al = float(c.rng.uniform(0.01, 0.3))
        want = np.where(xa >= 0, xa, al * xa)
        c.emit(op, [x], oracle=want, alpha=al)
    elif op == "Elu":
        al = float(c.rng.uniform(0.5, 1.5))
        want = np.where(xa >= 0, xa, al * (np.exp(xa) - 1))
        c.emit(op, [x], oracle=want, alpha=al)
    else:
        al, be = 0.2, 0.5
        want = np.clip(al * xa + be, 0, 1)
        c.emit(op, [x], oracle=want, alpha=al, beta=be)
    return True


def g_compare_where(c):
    x = c.pick()
    xa = c.host[x]
    y = c.pick(lambda a: a.shape == xa.shape) or c.new_input(xa.shape)
    op = str(c.rng.choice(["Greater", "Less", "Equal"]))
    f = {"Greater": np.greater, "Less": np.less, "Equal": np.equal}[op]
    cond = c.emit(op, [x, y], oracle=f(xa, c.host[y]), check=False)
    if c.rng.random() < 0.5:
        c.emit("Where", [cond, x, y],
               oracle=np.where(c.host[cond], xa, c.host[y]))
    else:
        c.emit("Cast", [cond], to=1,
               oracle=c.host[cond].astype(np.float32))
    return True


def g_reduce(c):
    x = c.pick(lambda a: a.ndim >= 1)
    if x is None:
        return False
    xa = c.host[x]
    op = str(c.rng.choice(
        ["ReduceSum", "ReduceMean", "ReduceMax", "ReduceMin", "ReduceL2"]))
    n_ax = int(c.rng.integers(1, xa.ndim + 1))
    axes = sorted(c.rng.choice(xa.ndim, size=n_ax, replace=False).tolist())
    _axes_form(c, op, x, axes, keepdims=int(c.rng.random() < 0.5))
    return True


def g_shape_ops(c):
    op = str(c.rng.choice(
        ["Transpose", "Reshape", "Flatten", "Unsqueeze", "Squeeze",
         "Identity", "Expand", "Tile"]))
    x = c.pick()
    xa = c.host[x]
    if op == "Transpose":
        perm = c.rng.permutation(xa.ndim).tolist()
        c.emit(op, [x], oracle=np.transpose(xa, perm), perm=perm)
    elif op == "Reshape":
        shp = list(xa.shape)
        c.rng.shuffle(shp)
        if shp and c.rng.random() < 0.5:
            shp[int(c.rng.integers(len(shp)))] = -1
        s = c.const(np.asarray(shp, np.int64), "shape")
        c.emit(op, [x, s], oracle=xa.reshape(shp))
    elif op == "Flatten":
        ax = int(c.rng.integers(0, xa.ndim + 1))
        want = xa.reshape(int(np.prod(xa.shape[:ax], dtype=np.int64)), -1)
        c.emit(op, [x], oracle=want, axis=ax)
    elif op == "Unsqueeze":
        ax = int(c.rng.integers(0, xa.ndim + 1))
        _squeeze_form(c, op, x, [ax], np.expand_dims(xa, ax))
    elif op == "Squeeze":
        ones = [i for i, d in enumerate(xa.shape) if d == 1]
        if not ones:
            return False
        ax = [int(c.rng.choice(ones))]
        _squeeze_form(c, op, x, ax, np.squeeze(xa, axis=tuple(ax)))
    elif op == "Identity":
        c.emit(op, [x], oracle=xa)
    elif op == "Expand":
        shp = (int(c.rng.integers(2, 4)),) + xa.shape
        s = c.const(np.asarray(shp, np.int64), "eshape")
        c.emit(op, [x, s], oracle=np.broadcast_to(xa, shp))
    else:  # Tile
        reps = [int(c.rng.choice([1, 2])) for _ in xa.shape] or [2]
        if not xa.ndim:
            return False
        r = c.const(np.asarray(reps, np.int64), "reps")
        c.emit(op, [x, r], oracle=np.tile(xa, reps))
    return True


def g_concat_split(c):
    x = c.pick(lambda a: a.ndim >= 1)
    if x is None:
        return False
    xa = c.host[x]
    ax = int(c.rng.integers(0, xa.ndim))
    if c.rng.random() < 0.5:
        others = [c.new_input(xa.shape)
                  for _ in range(int(c.rng.integers(1, 3)))]
        arrs = [xa] + [c.host[o] for o in others]
        c.emit("Concat", [x] + others,
               oracle=np.concatenate(arrs, axis=ax), axis=ax)
    else:
        d = xa.shape[ax]
        if d < 2:
            return False
        k = 2
        sizes = [d // k + (1 if i < d % k else 0) for i in range(k)]
        want = tuple(np.split(xa, np.cumsum(sizes)[:-1], axis=ax))
        if c.opset >= 13:
            s = c.const(np.asarray(sizes, np.int64), "sizes")
            c.emit("Split", [x, s], n_out=k, oracle=want, axis=ax)
        else:
            c.emit("Split", [x], n_out=k, oracle=want, axis=ax,
                   split=sizes)
    return True


def g_slice_pad(c):
    x = c.pick(lambda a: a.ndim >= 1)
    if x is None:
        return False
    xa = c.host[x]
    if c.rng.random() < 0.5:
        ax = int(c.rng.integers(0, xa.ndim))
        d = xa.shape[ax]
        st = int(c.rng.integers(0, d))
        en = int(c.rng.integers(st + 1, d + 1))
        step = int(c.rng.choice([1, 1, 2, -1]))
        sl = [slice(None)] * xa.ndim
        sl[ax] = slice(en - 1, st - 1 if st else None, -1) \
            if step == -1 else slice(st, en, step)
        want = xa[tuple(sl)]
        if want.size == 0:
            return False
        if step == -1:
            starts, ends = [en - 1], [-(2 ** 31)]
        else:
            starts, ends = [st], [en]
        ins = [x,
               c.const(np.asarray(starts, np.int64), "st"),
               c.const(np.asarray(ends, np.int64), "en"),
               c.const(np.asarray([ax], np.int64), "ax"),
               c.const(np.asarray([step], np.int64), "sp")]
        c.emit("Slice", ins, oracle=want)
    else:
        pads_b = [int(c.rng.integers(0, 2)) for _ in xa.shape]
        pads_e = [int(c.rng.integers(0, 2)) for _ in xa.shape]
        want = np.pad(xa, list(zip(pads_b, pads_e)), constant_values=0.0)
        if c.opset >= 11:
            p = c.const(np.asarray(pads_b + pads_e, np.int64), "pads")
            c.emit("Pad", [x, p], oracle=want, mode="constant")
        else:
            c.emit("Pad", [x], oracle=want, mode="constant",
                   pads=pads_b + pads_e)
    return True


def g_gather_scatter(c):
    x = c.pick(lambda a: a.ndim >= 1 and min(a.shape) >= 1)
    if x is None:
        return False
    xa = c.host[x]
    ax = int(c.rng.integers(0, xa.ndim))
    d = xa.shape[ax]
    kind = str(c.rng.choice(["Gather", "GatherElements", "ScatterElements"]))
    if kind == "Gather":
        idx = c.rng.integers(0, d, size=(int(c.rng.integers(1, 4)),))
        i = c.const(idx.astype(np.int64), "idx")
        c.emit("Gather", [x, i], oracle=np.take(xa, idx, axis=ax), axis=ax)
    elif kind == "GatherElements":
        shp = list(xa.shape)
        shp[ax] = int(c.rng.integers(1, d + 1))
        idx = c.rng.integers(0, d, size=shp)
        i = c.const(idx.astype(np.int64), "idx")
        c.emit("GatherElements", [x, i], axis=ax,
               oracle=np.take_along_axis(xa, idx, axis=ax))
    else:
        # unique indices along axis (duplicate behavior is unspecified)
        shp = list(xa.shape)
        shp[ax] = min(d, 2)
        idx = np.stack(
            [c.rng.permutation(d)[: shp[ax]]
             for _ in range(int(np.prod(shp) // shp[ax]) or 1)],
        ).reshape([s for i, s in enumerate(shp) if i != ax] + [shp[ax]])
        idx = np.moveaxis(idx, -1, ax)
        upd = c.rng.standard_normal(idx.shape).astype(np.float32)
        want = xa.copy()
        np.put_along_axis(want, idx, upd, axis=ax)
        i = c.const(idx.astype(np.int64), "idx")
        u = c.const(upd, "upd")
        c.emit("ScatterElements", [x, i, u], oracle=want, axis=ax)
    return True


def g_topk_argmax(c):
    x = c.pick(lambda a: a.ndim >= 1 and max(a.shape) >= 2)
    if x is None:
        return False
    xa = c.host[x]
    ax = int(np.argmax(xa.shape))
    if c.rng.random() < 0.5 and c.opset >= 11:
        k = int(c.rng.integers(1, xa.shape[ax] + 1))
        order = np.argsort(-xa, axis=ax, kind="stable")
        idx = np.take(order, np.arange(k), axis=ax)
        vals = np.take_along_axis(xa, idx, axis=ax)
        kk = c.const(np.asarray([k], np.int64), "k")
        c.emit("TopK", [x, kk], n_out=2, oracle=(vals, None),
               axis=ax, largest=1, sorted=1)
    else:
        want = np.argmax(xa, axis=ax)
        keep = int(c.rng.random() < 0.5)
        if keep:
            want = np.expand_dims(want, ax)
        out = c.emit("ArgMax", [x], axis=ax, keepdims=keep,
                     oracle=None, check=False)
        c.emit("Cast", [out], to=1, oracle=want.astype(np.float32))
    return True


def g_matmul_gemm(c):
    x = c.pick(lambda a: a.ndim == 2)
    if x is None:
        x = c.new_input((int(c.rng.integers(1, 5)), int(c.rng.integers(1, 5))))
    xa = c.host[x]
    m, k = xa.shape
    n = int(c.rng.integers(1, 6))
    if c.rng.random() < 0.5:
        w = c.new_input((k, n))
        c.emit("MatMul", [x, w],
               oracle=(xa.astype(np.float64) @ c.host[w]).astype(np.float32))
    else:
        ta, tb = int(c.rng.random() < 0.5), int(c.rng.random() < 0.5)
        a_shape = (k, m) if ta else (m, k)
        b_shape = (n, k) if tb else (k, n)
        a = c.new_input(a_shape)
        b = c.new_input(b_shape)
        bias = c.new_input((n,))
        alpha, beta = float(c.rng.uniform(0.5, 1.5)), float(c.rng.uniform(0.5, 1.5))
        aa = c.host[a].T if ta else c.host[a]
        bb = c.host[b].T if tb else c.host[b]
        want = alpha * (aa.astype(np.float64) @ bb) + beta * c.host[bias]
        c.emit("Gemm", [a, b, bias], oracle=want.astype(np.float32),
               alpha=alpha, beta=beta, transA=ta, transB=tb)
    return True


def g_conv_pool(c):
    import torch
    import torch.nn.functional as F

    ci = int(c.rng.integers(1, 4))
    h = int(c.rng.integers(4, 9))
    w = int(c.rng.integers(4, 9))
    x = c.new_input((1, ci, h, w))
    xa = torch.from_numpy(c.host[x])
    kind = str(c.rng.choice(
        ["Conv", "ConvDepthwise", "MaxPool", "AveragePool",
         "GlobalAveragePool"]))
    if kind in ("Conv", "ConvDepthwise"):
        kh = int(c.rng.integers(1, 4))
        kw = int(c.rng.integers(1, 4))
        stride = int(c.rng.choice([1, 2]))
        pad = int(c.rng.integers(0, 2))
        if kind == "Conv":
            co, groups = int(c.rng.integers(1, 4)), 1
            wshape = (co, ci, kh, kw)
        else:
            co, groups = ci, ci
            wshape = (ci, 1, kh, kw)
        wt = c.new_input(wshape)
        bias = c.new_input((co,))
        want = F.conv2d(
            xa, torch.from_numpy(c.host[wt]), torch.from_numpy(c.host[bias]),
            stride=stride, padding=pad, groups=groups).numpy()
        c.emit("Conv", [x, wt, bias], oracle=want,
               strides=[stride, stride], pads=[pad, pad, pad, pad],
               group=groups, kernel_shape=[kh, kw])
    elif kind in ("MaxPool", "AveragePool"):
        kk = int(c.rng.choice([2, 3]))
        stride = int(c.rng.choice([1, 2]))
        if kind == "MaxPool":
            want = F.max_pool2d(xa, kk, stride=stride).numpy()
        else:
            want = F.avg_pool2d(xa, kk, stride=stride).numpy()
        c.emit(kind, [x], oracle=want,
               kernel_shape=[kk, kk], strides=[stride, stride])
    else:
        c.emit("GlobalAveragePool", [x],
               oracle=c.host[x].mean(axis=(2, 3), keepdims=True))
    return True


def g_softmax_norm(c):
    import torch
    import torch.nn.functional as F

    x = c.pick(lambda a: a.ndim >= 1)
    if x is None:
        return False
    xa = c.host[x]
    kind = str(c.rng.choice(["Softmax", "LogSoftmax", "LayerNormalization",
                             "BatchNormalization"]))
    if kind in ("Softmax", "LogSoftmax"):
        if c.opset >= 13:
            ax = int(c.rng.integers(-xa.ndim, xa.ndim))
        else:
            ax = xa.ndim - 1  # pre-13 flattening semantics: use last axis
        t = torch.from_numpy(xa)
        want = (F.softmax(t, dim=ax) if kind == "Softmax"
                else F.log_softmax(t, dim=ax)).numpy()
        c.emit(kind, [x], oracle=want, axis=ax)
    elif kind == "LayerNormalization":
        if c.opset < 17:
            return False
        d = xa.shape[-1]
        g = c.new_input((d,))
        b = c.new_input((d,))
        want = F.layer_norm(
            torch.from_numpy(xa), (d,), torch.from_numpy(c.host[g]),
            torch.from_numpy(c.host[b]), eps=1e-5).numpy()
        c.emit(kind, [x, g, b], oracle=want, axis=-1, epsilon=1e-5)
    else:
        x4 = c.pick(lambda a: a.ndim == 4)
        if x4 is None:
            return False
        ci = c.host[x4].shape[1]
        g, b = c.new_input((ci,)), c.new_input((ci,))
        mean = c.const(c.rng.standard_normal(ci).astype(np.float32), "mean")
        var = c.const(
            np.abs(c.rng.standard_normal(ci)).astype(np.float32) + 0.5, "var")
        xx = c.host[x4]
        sh = (1, ci, 1, 1)
        want = (xx - c.host[mean].reshape(sh)) / np.sqrt(
            c.host[var].reshape(sh) + 1e-5) * c.host[g].reshape(sh) \
            + c.host[b].reshape(sh)
        c.emit("BatchNormalization", [x4, g, b, mean, var],
               oracle=want.astype(np.float32), epsilon=1e-5)
    return True


def g_cast_chain(c):
    x = c.pick()
    xa = c.host[x]
    i = c.emit("Cast", [x], to=6, oracle=None, check=False)  # f32→i32
    c.host[i] = xa.astype(np.int32)
    c.emit("Cast", [i], to=1, oracle=xa.astype(np.int32).astype(np.float32))
    return True


def g_attention_family(c):
    """Opset-23 LLM ops with random configs vs a literal numpy oracle:
    Attention (causal/mask/scale/GQA) and RotaryEmbedding (interleaved,
    partial dim)."""
    if c.opset < 23:
        return False
    rng = c.rng
    b = int(rng.integers(1, 3))
    kvh = int(rng.choice([1, 2]))
    h = kvh * int(rng.choice([1, 2]))
    lq = int(rng.integers(1, 6))
    lk = int(rng.integers(1, 6))
    d = int(rng.choice([4, 8]))
    qa = rng.standard_normal((b, h, lq, d)).astype(np.float32)
    ka = rng.standard_normal((b, kvh, lk, d)).astype(np.float32)
    va = rng.standard_normal((b, kvh, lk, d)).astype(np.float32)
    qn, kn, vn = (c.fresh("q"), c.fresh("k"), c.fresh("v"))
    for nm, ar in ((qn, qa), (kn, ka), (vn, va)):
        c.dynamic[nm] = ar
        c.host[nm] = ar

    if rng.random() < 0.5:  # RotaryEmbedding arm
        half = d // 2
        cosb = rng.standard_normal((b, lq, half)).astype(np.float32)
        sinb = rng.standard_normal((b, lq, half)).astype(np.float32)
        cn = c.const(cosb, "cos")
        sn = c.const(sinb, "sin")
        inter = bool(rng.integers(0, 2))
        x1 = qa[..., 0::2] if inter else qa[..., :half]
        x2 = qa[..., 1::2] if inter else qa[..., half:]
        cc = cosb[:, None]
        ss = sinb[:, None]
        o1, o2 = x1 * cc - x2 * ss, x1 * ss + x2 * cc
        if inter:
            want = np.stack([o1, o2], -1).reshape(qa.shape)
        else:
            want = np.concatenate([o1, o2], -1)
        c.emit("RotaryEmbedding", [qn, cn, sn],
               oracle=want.astype(np.float32), interleaved=int(inter))
        return True

    causal = bool(rng.integers(0, 2))
    use_mask = (not causal) and rng.random() < 0.5
    scale = float(rng.choice([1.0, 0.3]))
    rep = h // kvh
    kf = np.repeat(ka, rep, 1)
    vf = np.repeat(va, rep, 1)
    s = np.einsum("bhqd,bhkd->bhqk", qa, kf) * scale
    ins = [qn, kn, vn]
    if causal:
        s = np.where(np.tril(np.ones((lq, lk), bool)), s, -np.inf)
    if use_mask:
        m = (rng.standard_normal((b, 1, lq, lk)) * 2).astype(np.float32)
        ins.append(c.const(m, "mask"))
        s = s + m
    e = np.exp(s - s.max(-1, keepdims=True))
    w = e / e.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", w, vf).astype(np.float32)
    c.emit("Attention", ins, oracle=want, is_causal=int(causal), scale=scale)
    return True


GENERATORS = [
    g_binary, g_binary, g_div_pow_mod, g_unary, g_unary,
    g_activation_attrs, g_compare_where, g_reduce, g_reduce,
    g_shape_ops, g_shape_ops, g_concat_split, g_slice_pad,
    g_gather_scatter, g_topk_argmax, g_matmul_gemm,
    g_conv_pool, g_softmax_norm, g_cast_chain, g_attention_family,
]


def _run_trial(seed, opset, n_steps=9):
    rng = np.random.default_rng(seed)
    c = Ctx(rng, opset, seed)
    for _ in range(int(rng.integers(2, 4))):
        c.new_input(c.rand_shape())
    if not c.dynamic:  # a model needs at least one runtime input
        c.new_input(c.rand_shape(), force_dynamic=True)
    steps = 0
    guard = 0
    while steps < n_steps and guard < 4 * n_steps:
        guard += 1
        if GENERATORS[int(rng.integers(len(GENERATORS)))](c):
            steps += 1
    assert c.checks, "degenerate trial"
    got = run_graph(c.nodes, c.dynamic, c.checks,
                    initializers=c.static, opset=opset)
    for name, g in zip(c.checks, got):
        want = c.host[name]
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(want, np.float64),
            atol=2e-4, rtol=2e-4,
            err_msg=f"seed={seed} opset={opset} output={name}")


@pytest.mark.parametrize("opset", OPSETS)
def test_family_fuzz(opset):
    for i in range(4):
        _run_trial(1000 * opset + i, opset)


def test_zero_extent_dims():
    """0-extent tensors through shape/elementwise/concat — XLA handles
    zero-sized arrays; the tracer must not choke on them. A literal 0 in
    value_info is ambiguous on the wire (proto3 default = absent), so the
    shape arrives via input_shapes, the documented route."""
    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel

    x = np.zeros((0, 3), np.float32)
    y = np.ones((2, 3), np.float32)
    nodes = [
        ob.node("Relu", ["x"], ["r"]),
        ob.node("Concat", ["r", "y"], ["cat"], axis=0),
        ob.node("ReduceSum", ["cat"], ["s"], keepdims=0, axes=[0]),
    ]
    bs = ob.build_model_bytes(
        nodes,
        inputs=[ob.value_info("x", 1, [0, 3]), ob.vi_from_array("y", y)],
        outputs=[ob.value_info("cat", 1, []), ob.value_info("s", 1, [])],
        opset=11,
    )
    cm = compile_model(OnnxModel.from_bytes(bs), strict=True,
                       input_shapes={"x": (0, 3)})
    cat, s = cm.run_np(x=x, y=y)
    np.testing.assert_array_equal(cat, np.concatenate([x, y], axis=0))
    np.testing.assert_allclose(s, y.sum(axis=0), atol=1e-6)
