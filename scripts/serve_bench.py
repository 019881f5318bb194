#!/usr/bin/env python
"""Load-test the HTTP serving daemon: concurrent ASR/TTS/vision requests,
latency percentiles + throughput, micro-batching efficacy.

The reference has no serving surface (SURVEY.md §5 — "no serving daemon");
this stack ships one (`lele_tpu/server.py` + `runtime/batcher.py`), so it
also ships the load harness that proves the micro-batcher coalesces
concurrent requests into batched device programs instead of serializing
them.

    python scripts/serve_bench.py [--port 8570] [--tiny] [--clients 8]
                                  [--requests 64] [--endpoint recognize]

Starts the daemon in-process (skip with --attach to hit an already-running
one), fires `--requests` requests from `--clients` concurrent client
threads, and prints per-endpoint p50/p95/max latency, aggregate RPS, and —
for /recognize — the device batch sizes the micro-batcher actually formed.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _wav_bytes(seconds: float = 1.0, sr: int = 16000, freq: float = 440.0,
               seed: int = 0) -> bytes:
    import io
    import wave

    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    pcm = 0.3 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(t.size)
    i16 = (np.clip(pcm, -1, 1) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(i16.tobytes())
    return buf.getvalue()


def _post(port: int, path: str, body: bytes) -> tuple[float, int]:
    import http.client

    t0 = time.perf_counter()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    resp.read()
    conn.close()
    return time.perf_counter() - t0, resp.status


def run_load(port: int, endpoint: str, clients: int, requests: int):
    if endpoint == "recognize":
        bodies = [_wav_bytes(seed=i) for i in range(min(requests, 8))]
        path = "/recognize"
    elif endpoint == "synthesize":
        bodies = [json.dumps({"text": f"load test sentence number {i}"})
                  .encode() for i in range(min(requests, 8))]
        path = "/synthesize"
    elif endpoint == "detect":
        import io

        from PIL import Image

        r = np.random.default_rng(0)
        bodies = []
        for i in range(min(requests, 4)):
            buf = io.BytesIO()
            Image.fromarray(
                (r.random((480, 640, 3)) * 255).astype(np.uint8)
            ).save(buf, format="JPEG")
            bodies.append(buf.getvalue())
        path = "/detect"
    else:
        raise SystemExit(f"unknown endpoint {endpoint!r}")

    lat: list[float] = []
    errs: list[int] = []
    lock = threading.Lock()
    work = list(range(requests))

    def client():
        while True:
            with lock:
                if not work:
                    return
                k = work.pop()
            dt, status = _post(port, path, bodies[k % len(bodies)])
            with lock:
                lat.append(dt)
                if status != 200:
                    errs.append(status)

    # warmup: one request compiles the bucket programs
    _post(port, path, bodies[0])
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    import math

    a = np.sort(np.asarray(lat))
    p95 = a[min(len(a) - 1, max(0, math.ceil(len(a) * 0.95) - 1))]
    print(f"{path}: {requests} requests / {clients} clients → "
          f"{requests / wall:.1f} req/s")
    print(f"  latency p50 {a[len(a) // 2] * 1e3:.1f} ms  "
          f"p95 {p95 * 1e3:.1f} ms  "
          f"max {a[-1] * 1e3:.1f} ms"
          + (f"  ({len(errs)} ERRORS {errs[:3]})" if errs else ""))
    return a, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8570)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model dims (CPU-friendly smoke)")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--endpoint", default="recognize",
                    choices=["recognize", "synthesize", "detect", "all",
                             "both"])
    ap.add_argument("--attach", action="store_true",
                    help="don't start a daemon; hit an existing one")
    args = ap.parse_args()

    if not args.attach:
        from lele_tpu.server import serve

        srv = threading.Thread(
            target=lambda: serve(port=args.port, tiny=args.tiny)
            .serve_forever(),
            daemon=True,
        )
        srv.start()
        # wait for readiness
        import http.client

        for _ in range(600):
            if not srv.is_alive():
                raise SystemExit(
                    "daemon thread died (port in use? see traceback above)")
            try:
                c = http.client.HTTPConnection("127.0.0.1", args.port,
                                               timeout=5)
                c.request("GET", "/healthz")
                if c.getresponse().status == 200:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        else:
            raise SystemExit("daemon did not become healthy")

    eps = {"both": ["recognize", "synthesize"],
           "all": ["recognize", "synthesize", "detect"]}.get(
        args.endpoint, [args.endpoint])
    for ep in eps:
        run_load(args.port, ep, args.clients, args.requests)
        if ep == "recognize" and not args.attach:
            from lele_tpu import server as _srv

            b = (_srv._LAST_ENGINES or {}).get("asr_batcher")
            if b is not None and b.batch_sizes:
                import collections

                hist = collections.Counter(b.batch_sizes)
                print("  micro-batcher flushes:",
                      ", ".join(f"size {s}×{n}"
                                for s, n in sorted(hist.items())),
                      "(each distinct batch size compiles once — a tail "
                      "p95 on first contact is that compile, not steady "
                      "state)")


if __name__ == "__main__":
    main()
