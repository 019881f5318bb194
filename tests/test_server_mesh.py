"""Daemon `--mesh auto` (VERDICT r4 weak #6): the HTTP daemon's engines
built through the planner→plan_mesh dp layout — the path that was
previously gated only in tests/dryrun — with the per-request bit-equality
gate from test_serving_multidevice applied at the daemon's own engines.
Runs on the 8-virtual-device CPU mesh from conftest."""

import base64
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from lele_tpu.serving import encode_wav

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh_server():
    from lele_tpu.server import serve

    httpd = serve(port=0, tiny=True, mesh="auto")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, body):
    req = urllib.request.Request(url, data=body)
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_healthz_reports_planned_layout(mesh_server):
    with urllib.request.urlopen(mesh_server + "/healthz", timeout=30) as r:
        out = json.loads(r.read())
    assert out["ok"] is True
    # 8 devices, serving plan prefers pure dp (planner.py
    # recommend_serving_plan: zero per-step collectives)
    assert out["mesh"] == "dp8xsp1xtp1"


def test_engines_really_shard_over_data(mesh_server):
    from lele_tpu.parallel.sharding import dp_put
    from lele_tpu.server import _LAST_ENGINES

    mesh = _LAST_ENGINES["mesh"]
    assert mesh is not None and mesh.shape["data"] == 8
    (x,) = dp_put(mesh, (np.zeros((8, 4), np.float32),))
    assert len(x.addressable_shards) == 8
    # non-divisible batch replicates instead of raising (partial batches)
    (y,) = dp_put(mesh, (np.zeros((3, 4), np.float32),))
    assert y.sharding.is_fully_replicated


def test_daemon_asr_bit_equal_per_request(mesh_server):
    """(a) a request's ids are BIT-equal whether it rides the coalesced
    8-batch or sits alone in an 8-slot batch (same SPMD program, per-row
    independent math — no cross-request contamination); (b) the sharded
    engine agrees with a single-device model sharing the same params."""
    from lele_tpu.server import _LAST_ENGINES

    model = _LAST_ENGINES["asr"].model
    assert model.mesh is not None
    rng = np.random.default_rng(0)
    pcms = [rng.standard_normal(4000).astype(np.float32) * 0.1
            for _ in range(8)]
    coal = model.transcribe_batch(pcms)
    silence = np.zeros(4000, np.float32)
    for i in (0, 3, 7):
        alone = model.transcribe_batch([pcms[i]] + [silence] * 7)
        assert alone[0] == coal[i], f"request {i} batch-dependent"

    from lele_tpu.models import SenseVoiceModel

    single = SenseVoiceModel(cfg=model.cfg,
                             params=jax.device_get(model.params),
                             fbank=model.fbank)
    assert single.transcribe_batch(pcms) == coal


def test_http_recognize_batch_rides_the_mesh(mesh_server):
    wavs = [
        encode_wav((np.sin(np.arange(8000) / f) * 0.2).astype(np.float32),
                   16000)
        for f in (5.0, 7.0, 9.0, 11.0, 13.0, 15.0, 17.0, 19.0)
    ]
    body = json.dumps([base64.b64encode(w).decode() for w in wavs]).encode()
    status, resp = _post(mesh_server + "/recognize_batch", body)
    assert status == 200
    results = json.loads(resp)["results"]
    assert len(results) == 8 and all(isinstance(r, list) for r in results)


def test_http_detect_through_mesh(mesh_server):
    from lele_tpu.server import _LAST_ENGINES

    det = _LAST_ENGINES["det"]
    assert det.mesh is not None
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
            for _ in range(8)]
    outs = det.detect_batch(imgs)
    assert len(outs) == 8 and all(isinstance(o, list) for o in outs)
    # per-request gate on the detector too: same image alone in a full
    # batch → identical detections
    alone = det.detect_batch([imgs[2]] + [np.zeros_like(imgs[2])] * 7)
    assert json.dumps(alone[0]) == json.dumps(outs[2])
