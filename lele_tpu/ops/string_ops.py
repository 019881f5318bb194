"""String-tensor ops: StringConcat, StringSplit, StringNormalizer,
RegexFullMatch (+ the TfIdfVectorizer string mode lives in tfidf_ops).

Strings have no device representation on TPU; these ops are TRACE-TIME
ONLY (fold path). That matches how string ops appear in real exports —
constant vocabulary/preprocessing islands that feed numeric tensors — and
is strictly more than the reference supports (it has no string dtype at
all: model.rs's dtype table stops at numeric types). A string reaching a
dynamic (traced) position raises with a clear message instead of emitting
garbage.

RegexFullMatch: the ONNX spec pins RE2 syntax; this implementation uses
Python `re`, a superset on the common constructs (character classes,
anchors, quantifiers, alternation). Back-references — legal in `re`,
absent in RE2 — are therefore accepted rather than rejected; no divergence
exists on patterns RE2 itself accepts, except RE2's \\C and unicode-class
spellings, which raise here.
"""

from __future__ import annotations

import re

import numpy as np

from .registry import OpContext, op


def _require_fold(ctx: OpContext, name: str):
    if not ctx.is_fold:
        raise NotImplementedError(
            f"{name} ran against a traced (device) value: string tensors "
            "exist only at trace time on TPU. Hint: string inputs must be "
            "initializers/Constants (preprocessing islands fold away)."
        )


def _obj(a) -> np.ndarray:
    out = np.asarray(a, dtype=object)
    return out


@op("StringConcat")
def string_concat(ctx: OpContext, x, y):
    _require_fold(ctx, "StringConcat")
    x, y = _obj(x), _obj(y)
    xb, yb = np.broadcast_arrays(x, y)
    out = np.empty(xb.shape, dtype=object)
    flat = out.reshape(-1)
    for i, (a, b) in enumerate(zip(xb.reshape(-1), yb.reshape(-1))):
        flat[i] = str(a) + str(b)
    return out


@op("StringSplit")
def string_split(ctx: OpContext, x):
    """Outputs: Y [..., max_tokens] padded with "", Z int64 counts."""
    _require_fold(ctx, "StringSplit")
    x = _obj(x)
    delim = ctx.attr("delimiter")
    if isinstance(delim, bytes):
        delim = delim.decode()
    maxsplit = ctx.attr("maxsplit")
    parts = []
    for s in x.reshape(-1):
        s = str(s)
        if delim:  # explicit delimiter: empty strings between delims kept
            p = s.split(delim, maxsplit) if maxsplit is not None \
                else s.split(delim)
        else:  # whitespace mode: runs collapse, no empties
            p = s.split(None, maxsplit) if maxsplit is not None \
                else s.split()
        parts.append(p)
    counts = np.asarray([len(p) for p in parts], dtype=np.int64)
    width = int(counts.max()) if len(counts) else 0
    y = np.empty((len(parts), width), dtype=object)
    y[:] = ""
    for i, p in enumerate(parts):
        y[i, : len(p)] = p
    return (
        y.reshape(*x.shape, width),
        counts.reshape(x.shape),
    )


@op("StringNormalizer")
def string_normalizer(ctx: OpContext, x):
    """Opset 10: stopword removal + case action over a [C] or [1,C] tensor.
    An emptied tensor becomes a single "" (the spec's shape floor)."""
    _require_fold(ctx, "StringNormalizer")
    x = _obj(x)
    two_d = x.ndim == 2
    if two_d and x.shape[0] != 1:
        raise ValueError(
            f"StringNormalizer input must be [C] or [1,C], got {x.shape}"
        )
    flat = [str(s) for s in x.reshape(-1)]
    action = ctx.attr("case_change_action", "NONE")
    if isinstance(action, bytes):
        action = action.decode()
    sensitive = bool(ctx.attr("is_case_sensitive", 0))
    stop = ctx.attr("stopwords") or []
    stop = [s.decode() if isinstance(s, bytes) else s for s in stop]
    if stop:
        if sensitive:
            keep = [s for s in flat if s not in set(stop)]
        else:
            low = {s.lower() for s in stop}
            keep = [s for s in flat if s.lower() not in low]
    else:
        keep = flat
    if action == "LOWER":
        keep = [s.lower() for s in keep]
    elif action == "UPPER":
        keep = [s.upper() for s in keep]
    if not keep:
        keep = [""]
    out = np.empty(len(keep), dtype=object)
    out[:] = keep
    return out.reshape(1, -1) if two_d else out


@op("RegexFullMatch")
def regex_full_match(ctx: OpContext, x):
    _require_fold(ctx, "RegexFullMatch")
    x = _obj(x)
    pattern = ctx.attr("pattern", "")
    if isinstance(pattern, bytes):
        pattern = pattern.decode()
    if re.search(r"\\C|\\p\{|\\P\{", pattern):
        raise NotImplementedError(
            "RegexFullMatch: RE2-specific escapes (\\C, \\p{...}) are not "
            "supported by this engine"
        )
    rx = re.compile(pattern)
    out = np.empty(x.shape, dtype=bool)
    flat = out.reshape(-1)
    for i, s in enumerate(x.reshape(-1)):
        flat[i] = rx.fullmatch(str(s)) is not None
    return out
