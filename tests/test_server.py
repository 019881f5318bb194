"""HTTP serving daemon suite: drive real requests through a live server."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from lele_tpu.serving import encode_wav


@pytest.fixture(scope="module")
def server():
    from lele_tpu.server import build_engines, serve

    httpd = serve(port=0, tiny=True)  # port 0 → ephemeral
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:  # 4xx/5xx still carry a body
        return e.code, e.read(), e.headers.get("Content-Type")


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True, "mesh": None}


def test_demo_page(server):
    """GET / serves the browser demo (web/index.html) — the UI surface
    replacing the reference's in-browser wasm demo (docs/WEB_DEMO.md).
    The page must reference every endpoint it drives."""
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        assert r.status == 200
        assert r.headers.get("Content-Type", "").startswith("text/html")
        page = r.read().decode()
    for endpoint in ("/recognize", "/detect", "/synthesize", "/healthz"):
        assert endpoint in page, endpoint


def test_recognize_endpoint(server):
    wav = encode_wav(
        (np.sin(np.arange(12000) / 9) * 0.2).astype(np.float32), 16000
    )
    status, body, _ = _post(server + "/recognize", wav)
    assert status == 200
    out = json.loads(body)
    assert "ids" in out and isinstance(out["ids"], list)


def test_detect_endpoint(server):
    import io

    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(0).random((120, 160, 3)) * 255).astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    status, body, _ = _post(server + "/detect", buf.getvalue())
    assert status == 200
    dets = json.loads(body)["detections"]
    assert isinstance(dets, list)


def test_synthesize_endpoint(server):
    status, body, ctype = _post(
        server + "/synthesize",
        json.dumps({"text": "Server test."}).encode(),
    )
    assert status == 200 and ctype == "audio/wav"
    assert body[:4] == b"RIFF"


def test_bad_requests(server):
    status, body, _ = _post(server + "/recognize", b"not a wav")
    assert status == 400
    assert "error" in json.loads(body)
    status, body, _ = _post(server + "/nope", b"")
    assert status == 404


def test_recognize_batch_endpoint(server):
    import base64

    wavs = [
        encode_wav((np.sin(np.arange(9000) / f) * 0.2).astype(np.float32), 16000)
        for f in (7.0, 11.0)
    ]
    body = json.dumps([base64.b64encode(w).decode() for w in wavs]).encode()
    status, resp, _ = _post(server + "/recognize_batch", body)
    assert status == 200
    results = json.loads(resp)["results"]
    assert len(results) == 2 and all(isinstance(r, list) for r in results)


def test_recognize_concurrent_microbatch(server):
    """Concurrent /recognize requests inside the batching window coalesce
    into batched device programs (runtime/batcher.py) and every client
    still gets its own correct-length answer."""
    import concurrent.futures

    from lele_tpu.server import _LAST_ENGINES

    wavs = [
        encode_wav((np.sin(np.arange(8000 + 800 * i) / (7 + i)) * 0.3)
                   .astype(np.float32), 16000)
        for i in range(6)
    ]
    # warm the batched program shape once so the measured burst is steady
    _post(server + "/recognize", wavs[0])
    batcher = _LAST_ENGINES["asr_batcher"]
    before = len(batcher.batch_sizes)
    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        rs = list(ex.map(lambda w: _post(server + "/recognize", w), wavs))
    for status, body, _ in rs:
        assert status == 200
        assert isinstance(json.loads(body)["ids"], list)
    flushed = batcher.batch_sizes[before:]
    assert sum(flushed) == 6
    assert len(flushed) < 6, f"no coalescing happened: {flushed}"
