"""ONNX Loop op (carried-deps subset via lax.while_loop) — a capability the
reference lacks entirely (its compiler visits Loop bodies only for buffer
allocation, compiler/mod.rs:111-123, and has no emitter)."""

import numpy as np
import pytest

from optest import assert_close, run_graph
from lele_tpu.onnx import builder as ob

rng = np.random.default_rng(17)


def _loop_model(m_value=None, with_cond=False, dynamic_m=False):
    """y = x doubled `m` times (trip-count loop), or until sum > 100."""
    body = ob.graph(
        [
            ob.node("Add", ["v_in", "v_in"], ["v_out"]),
            ob.node("ReduceSum", ["v_out"], ["s"], keepdims=0),
            ob.node("Less", ["s", "limit"], ["cond_out"]),
        ],
        name="body",
        inputs=[
            ob.value_info("iter", 7, []),
            ob.value_info("cond_in", 9, []),
            ob.value_info("v_in", 1, [4]),
        ],
        outputs=[
            ob.value_info("cond_out", 9, []),
            ob.value_info("v_out", 1, [4]),
        ],
    )
    loop_inputs = ["M" if m_value is not None else "", "c0" if with_cond else "", "x"]
    nodes = [ob.node("Loop", loop_inputs, ["y"], body=body)]
    inits = {"limit": np.float32(100.0)}
    graph_inputs = [ob.value_info("x", 1, [4])]
    if m_value is not None:
        if dynamic_m:
            graph_inputs.append(ob.value_info("M", 7, []))
        else:
            inits["M"] = np.array(m_value, np.int64)
    if with_cond:
        inits["c0"] = np.array(True)
    return nodes, graph_inputs, inits


def test_loop_static_trip_count():
    x = np.ones(4, np.float32)
    nodes, gin, inits = _loop_model(m_value=3)
    bs = ob.build_model_bytes(nodes, gin, [ob.value_info("y", 1, [4])],
                              [ob.tensor_from_array(v, k) for k, v in inits.items()])
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.compiler import compile_model

    cm = compile_model(OnnxModel.from_bytes(bs))
    (y,) = cm.run_np(x)
    # doubling with early-exit at sum>100: 1→2→4→8 (sum 32 < 100 all 3 iters)
    assert_close(y, x * 8)


def test_loop_early_exit_condition():
    x = np.ones(4, np.float32) * 10  # sums: 80, 160 → exits after iter 1
    nodes, gin, inits = _loop_model(m_value=50, with_cond=True)
    bs = ob.build_model_bytes(nodes, gin, [ob.value_info("y", 1, [4])],
                              [ob.tensor_from_array(v, k) for k, v in inits.items()])
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.compiler import compile_model

    cm = compile_model(OnnxModel.from_bytes(bs))
    (y,) = cm.run_np(x)
    # iter0: v=20 (sum 80 <100 → continue); iter1: v=40 (sum 160 → stop)
    assert_close(y, x * 4)


def test_loop_int64max_sentinel_runs_as_while():
    """M = INT64_MAX is the exporter encoding of a pure while-loop. A raw
    int32 cast WRAPS it to -1 (loop never runs, silent wrong output); it
    must clamp so the data-dependent exit governs."""
    x = np.ones(4, np.float32) * 10  # sums: 80, 160 → exits after iter 1
    nodes, gin, inits = _loop_model(m_value=2**63 - 1, with_cond=True)
    bs = ob.build_model_bytes(nodes, gin, [ob.value_info("y", 1, [4])],
                              [ob.tensor_from_array(v, k) for k, v in inits.items()])
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.compiler import compile_model

    cm = compile_model(OnnxModel.from_bytes(bs))
    (y,) = cm.run_np(x)
    assert_close(y, x * 4)  # NOT x (never-ran) — the r3 wrap bug


def test_loop_scan_int64max_sentinel_falls_back():
    """The padded-scan path must refuse the INT64_MAX 'bound' (scanning
    2^63 steps) and take the documented no-static-bound fallback."""
    import io
    from contextlib import redirect_stderr

    body = _dyn_exit_scan_body()
    nodes = [ob.node("Loop", ["M", "", "v0"], ["v_fin", "ys"], body=body)]
    bs = ob.build_model_bytes(
        nodes, [ob.value_info("v0", 1, [2])],
        [ob.value_info("v_fin", 1, [2]), ob.value_info("ys", 1, ["n", 2])],
        [ob.tensor_from_array(np.array(2**63 - 1, np.int64), "M"),
         ob.tensor_from_array(np.float32(100.0), "lim")],
    )
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.compiler import compile_model

    with redirect_stderr(io.StringIO()):
        cm = compile_model(OnnxModel.from_bytes(bs))
    v_fin, ys = cm.run_np(np.ones(2, np.float32))
    assert np.asarray(ys).shape[0] == 0  # warned + empty, not a 2^63 scan


def test_loop_dynamic_trip_count():
    x = np.ones(4, np.float32)
    nodes, gin, inits = _loop_model(m_value=1, dynamic_m=True)
    bs = ob.build_model_bytes(nodes, gin, [ob.value_info("y", 1, [4])],
                              [ob.tensor_from_array(v, k) for k, v in inits.items()])
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.compiler import compile_model

    cm = compile_model(OnnxModel.from_bytes(bs))
    (y,) = cm.run_np(x, np.array(4, np.int64))
    assert_close(y, x * 16)
    (y,) = cm.run_np(x, np.array(2, np.int64))
    assert_close(y, x * 4)


def _dyn_exit_scan_body():
    """Body: v doubles each step, scan-out the new v, continue while
    sum(v_out) < lim."""
    return ob.graph(
        [ob.node("Add", ["v_in", "v_in"], ["v_out"]),
         ob.node("ReduceSum", ["v_out"], ["s"], keepdims=0),
         ob.node("Less", ["s", "lim"], ["cond_out"]),
         ob.node("Identity", ["v_out"], ["scan0"])],
        name="body",
        inputs=[ob.value_info("iter", 7, []), ob.value_info("cond_in", 9, []),
                ob.value_info("v_in", 1, [2])],
        outputs=[ob.value_info("cond_out", 9, []), ob.value_info("v_out", 1, [2]),
                 ob.value_info("scan0", 1, [2])],
    )


def test_loop_scan_outputs_dynamic_exit_padded():
    """Data-dependent exit + scan outputs: padded-scan design — runs to the
    static bound M with an active mask; carried values freeze at exit and
    scan rows past exit are zero."""
    nodes = [ob.node("Loop", ["M", "", "x"], ["y", "ys"], body=_dyn_exit_scan_body())]
    x = np.ones(2, np.float32)
    # doubling: sums 4, 8, 16, 32 → cond false after iter 3 (sum 32 ≥ 30)
    inits = {"M": np.array(6, np.int64), "lim": np.float32(30.0)}
    y, ys = run_graph(nodes, {"x": x}, ["y", "ys"], initializers=inits)
    assert_close(y, x * 16)
    assert ys.shape == (6, 2)
    want = np.stack([x * 2, x * 4, x * 8, x * 16, x * 0, x * 0])
    assert_close(ys, want)


def test_loop_scan_outputs_dynamic_initial_cond():
    """Graph-input initial cond (dynamic at trace time) gates iteration 0."""
    nodes = [ob.node("Loop", ["M", "c0", "x"], ["y", "ys"],
                     body=_dyn_exit_scan_body())]
    x = np.ones(2, np.float32)
    inits = {"M": np.array(3, np.int64), "lim": np.float32(1e9)}
    gin = [ob.value_info("x", 1, [2]), ob.value_info("c0", 9, [])]
    bs = ob.build_model_bytes(
        nodes, gin, [ob.value_info("y", 1, [2]), ob.value_info("ys", 1, [3, 2])],
        [ob.tensor_from_array(v, k) for k, v in inits.items()])
    from lele_tpu.onnx import OnnxModel
    from lele_tpu.compiler import compile_model

    cm = compile_model(OnnxModel.from_bytes(bs))
    y, ys = cm.run_np(x, np.array(True))
    assert_close(y, x * 8)
    assert_close(ys, np.stack([x * 2, x * 4, x * 8]))
    y, ys = cm.run_np(x, np.array(False))
    assert_close(y, x)  # never ran: carried value stays the init
    assert_close(ys, np.zeros((3, 2), np.float32))


def test_loop_scan_outputs_statically_false_cond():
    """cond statically false → zero iterations: carried values are the
    inits and scan outputs are exact empty [0, ...] (no device work)."""
    nodes = [ob.node("Loop", ["M", "c0", "x"], ["y", "ys"],
                     body=_dyn_exit_scan_body())]
    x = np.ones(2, np.float32) * 3
    inits = {"M": np.array(5, np.int64), "c0": np.array(False),
             "lim": np.float32(100.0)}
    y, ys = run_graph(nodes, {"x": x}, ["y", "ys"], initializers=inits)
    assert_close(y, x)
    assert ys.shape == (0, 2)


def test_loop_scan_outputs_no_trip_bound_falls_back():
    # no M input → no static bound for the padded scan: warned fallback
    nodes = [ob.node("Loop", ["", "c0", "x"], ["y", "ys"],
                     body=_dyn_exit_scan_body())]
    x = np.ones(2, np.float32)
    inits = {"c0": np.array(True), "lim": np.float32(100.0)}
    outs = run_graph(nodes, {"x": x}, ["y", "ys"], initializers=inits,
                     strict=False)
    assert outs[0].size == 0  # fallback empties, with a warning
    with pytest.raises(NotImplementedError):
        run_graph(nodes, {"x": x}, ["y", "ys"], initializers=inits,
                  strict=True)


def test_loop_scan_outputs_pure_for():
    """Pure for-loop (cond_out = Identity(cond_in), static M) supports scan
    outputs via lax.scan — beyond the warned fallback."""
    body = ob.graph(
        [ob.node("Add", ["v_in", "v_in"], ["v_out"]),
         ob.node("Identity", ["cond_in"], ["cond_out"]),
         ob.node("Identity", ["v_out"], ["scan0"])],
        name="body",
        inputs=[ob.value_info("iter", 7, []), ob.value_info("cond_in", 9, []),
                ob.value_info("v_in", 1, [3])],
        outputs=[ob.value_info("cond_out", 9, []), ob.value_info("v_out", 1, [3]),
                 ob.value_info("scan0", 1, [3])],
    )
    nodes = [ob.node("Loop", ["M", "", "x"], ["y", "ys"], body=body)]
    x = np.ones(3, np.float32)
    y, ys = run_graph(
        nodes, {"x": x}, ["y", "ys"],
        initializers={"M": np.array(4, np.int64)},
    )
    assert_close(y, x * 16)
    assert ys.shape == (4, 3)
    assert_close(ys, np.stack([x * 2, x * 4, x * 8, x * 16]))


def test_loop_scan_outputs_constant_true_cond():
    body = ob.graph(
        [ob.node("Constant", [], ["cond_out"], value=np.array(True)),
         ob.node("Mul", ["v_in", "two"], ["v_out"]),
         ob.node("ReduceSum", ["v_in"], ["scan0"], keepdims=0)],
        name="body",
        inputs=[ob.value_info("iter", 7, []), ob.value_info("cond_in", 9, []),
                ob.value_info("v_in", 1, [2])],
        outputs=[ob.value_info("cond_out", 9, []), ob.value_info("v_out", 1, [2]),
                 ob.value_info("scan0", 1, [])],
    )
    nodes = [ob.node("Loop", ["M", "", "x"], ["y", "sums"], body=body)]
    x = np.array([1.0, 2.0], np.float32)
    y, sums = run_graph(
        nodes, {"x": x}, ["y", "sums"],
        initializers={"M": np.array(3, np.int64), "two": np.float32(2.0)},
    )
    assert_close(y, x * 8)
    assert_close(sums, [3.0, 6.0, 12.0])


def test_scan_op_cumulative_state_and_outputs():
    """ONNX Scan: running-sum state + per-step scan output (lax.scan)."""
    body = ob.graph(
        [ob.node("Add", ["acc_in", "x_t"], ["acc_out"]),
         ob.node("Mul", ["acc_out", "two"], ["y_t"])],
        name="body",
        inputs=[ob.value_info("acc_in", 1, [3]), ob.value_info("x_t", 1, [3])],
        outputs=[ob.value_info("acc_out", 1, [3]), ob.value_info("y_t", 1, [3])],
    )
    nodes = [ob.node("Scan", ["acc0", "xs"], ["acc_final", "ys"], body=body,
                     num_scan_inputs=1)]
    xs = np.arange(12, dtype=np.float32).reshape(4, 3)
    acc0 = np.zeros(3, np.float32)
    acc_final, ys = run_graph(
        nodes, {"acc0": acc0, "xs": xs}, ["acc_final", "ys"],
        initializers={"two": np.float32(2.0)},
    )
    want_acc = xs.cumsum(0)
    assert_close(acc_final, want_acc[-1])
    assert_close(ys, want_acc * 2)


def test_scan_op_reverse_direction_and_axes():
    body = ob.graph(
        [ob.node("Add", ["s_in", "x_t"], ["s_out"]),
         ob.node("Identity", ["s_out"], ["y_t"])],
        name="body",
        inputs=[ob.value_info("s_in", 1, [2]), ob.value_info("x_t", 1, [2])],
        outputs=[ob.value_info("s_out", 1, [2]), ob.value_info("y_t", 1, [2])],
    )
    nodes = [ob.node(
        "Scan", ["s0", "xs"], ["s_final", "ys"], body=body,
        num_scan_inputs=1, scan_input_axes=[1], scan_input_directions=[1],
        scan_output_axes=[1], scan_output_directions=[1],
    )]
    xs = np.arange(10, dtype=np.float32).reshape(2, 5)  # scan over axis 1
    s0 = np.zeros(2, np.float32)
    s_final, ys = run_graph(nodes, {"s0": s0, "xs": xs}, ["s_final", "ys"])
    # reversed input: accumulate columns right-to-left
    rev = xs[:, ::-1]
    want_states = rev.cumsum(1)
    assert_close(s_final, want_states[:, -1])
    # output reversed again and stacked on axis 1 → matches right-to-left
    assert ys.shape == (2, 5)
    assert_close(ys, want_states[:, ::-1])
