"""MicroBatcher: coalescing, windows, ordering, errors (runtime/batcher.py)."""

import threading
import time

from lele_tpu.runtime.batcher import MicroBatcher


def test_concurrent_submissions_coalesce():
    def process(items):
        time.sleep(0.01)  # emulate device work
        return [x * 10 for x in items]

    b = MicroBatcher(process, max_batch=8, window_ms=40.0)
    results = {}

    def worker(i):
        results[i] = b.submit(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: i * 10 for i in range(8)}
    # 8 submissions inside one 40ms window must fuse into few batches —
    # the point of the component (exact count depends on thread timing)
    assert len(b.batch_sizes) < 8
    assert sum(b.batch_sizes) == 8
    b.close()


def test_max_batch_respected():
    seen = []

    def process(items):
        seen.append(len(items))
        return list(items)

    b = MicroBatcher(process, max_batch=3, window_ms=50.0)
    threads = [threading.Thread(target=b.submit, args=(i,)) for i in range(7)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert max(seen) <= 3
    assert sum(seen) == 7
    b.close()


def test_single_submit_returns_after_window():
    b = MicroBatcher(lambda xs: [x + 1 for x in xs], max_batch=4,
                     window_ms=5.0)
    t0 = time.perf_counter()
    assert b.submit(41) == 42
    assert time.perf_counter() - t0 < 2.0  # window, not forever
    b.close()


def test_error_propagates_to_every_waiter():
    def process(items):
        raise ValueError("boom")

    b = MicroBatcher(process, max_batch=4, window_ms=10.0)
    errors = []

    def worker(i):
        try:
            b.submit(i)
        except ValueError as e:
            errors.append(str(e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == ["boom"] * 3
    b.close()


def test_sequential_reuse_after_idle():
    b = MicroBatcher(lambda xs: [x * 2 for x in xs], max_batch=2,
                     window_ms=2.0)
    assert b.submit(1) == 2
    time.sleep(0.05)  # let the worker retire
    assert b.submit(3) == 6  # a fresh worker spins up
    b.close()


def test_closed_batcher_rejects():
    b = MicroBatcher(lambda xs: xs, max_batch=2, window_ms=2.0)
    b.close()
    try:
        b.submit(1)
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass
