import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from depthmap_tpu.frontends.api import make_server


@pytest.fixture(scope="module")
def server():
    srv = make_server("127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_version(server):
    status, body = _get(server + "/depth/version")
    assert status == 200 and "version" in body


def test_get_options(server):
    status, body = _get(server + "/depth/get_options")
    assert status == 200
    assert "model_type" in body["options"]
    assert "stereo_divergence" in body["options"]


def test_generate_no_images(server):
    status, body = _post(server + "/depth/generate",
                         {"depth_input_images": [], "options": {}})
    assert status == 422


def test_generate_roundtrip(server, rng, tmp_path):
    img = Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    status, body = _post(server + "/depth/generate", {
        "depth_input_images": [b64],
        "options": {"model_type": 6, "net_width": 64, "net_height": 64},
        "outpath": str(tmp_path),
    })
    assert status == 200, body
    assert body["info"] == "Success"
    assert len(body["images"]) == 1
    out = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
    assert out.size == (64, 64)
    assert np.asarray(out).dtype in (np.uint16, np.int32)


def test_generate_video_missing_params(server, rng):
    img = Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    status, body = _post(server + "/depth/generate/video", {
        "depth_input_images": [b64],
        "options": {"model_type": 6, "video_parameters": {}}})
    assert status == 400
    assert "Missing required parameter" in str(body["detail"])


def test_oversized_body_rejected(server):
    """A huge declared Content-Length must be refused up-front (413), not
    read into memory on the single-threaded server."""
    req = urllib.request.Request(
        server + "/depth/generate", data=b"{}",
        headers={"Content-Type": "application/json",
                 "Content-Length": str((256 << 20) + 1)}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            status, body = r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 413
    assert "bytes" in body["detail"]
