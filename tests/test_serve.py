"""Serving layer: spin up the HTTP server on a tiny random pipeline and drive it
through real HTTP requests."""

import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from diffusion_e2e_ft_tpu.cli.serve import PipelineService, serve
from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



@pytest.fixture(scope="module")
def server_url():
    pipe = MarigoldPipeline.from_random(jax.random.key(0))
    service = PipelineService(pipe, processing_res=64, denoise_steps=1)
    server = serve(service, "127.0.0.1", 0)
    service.warmup()
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def _png_bytes(h=96, w=128):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server_url):
    with urllib.request.urlopen(f"{server_url}/healthz") as r:
        assert r.status == 200
        assert json.loads(r.read())["ready"] is True


def test_depth_npy(server_url):
    req = urllib.request.Request(f"{server_url}/v1/depth", data=_png_bytes(), method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-npy"
        pred = np.load(io.BytesIO(r.read()))
    assert pred.shape == (96, 128)
    assert np.isfinite(pred).all() and pred.min() >= 0 and pred.max() <= 1


def test_normals_png_visualization(server_url):
    req = urllib.request.Request(
        f"{server_url}/v1/normals", data=_png_bytes(), method="POST",
        headers={"Accept": "image/png"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        img = Image.open(io.BytesIO(r.read()))
        assert img.size == (128, 96)


def test_bad_requests(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            urllib.request.Request(f"{server_url}/v1/depth", data=b"not an image", method="POST")
        )
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            urllib.request.Request(f"{server_url}/v1/bogus", data=_png_bytes(), method="POST")
        )
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server_url}/nope")
    assert e.value.code == 404
