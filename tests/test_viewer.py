"""Interactive viewer: HTTP round-trips against a live server.

Covers the reference's viewer role (debug/viewer.py:86-112 + the crop-box
discovery workflow, README.md:216): orbit renders through the real chunked
render path, crop-box overlay, occupancy-probed crop suggestion, and the UI
page itself.
"""
import io
import json
import urllib.request

import jax
import numpy as np
import pytest

from fruitnerf_tpu.configs import fruit_nerf_smoke
from fruitnerf_tpu.engine.trainer import init_train_state
from fruitnerf_tpu.viewer import ViewerSession, serve
from fruitnerf_tpu.viewer.server import draw_crop_box, orbit_camera


@pytest.fixture(scope="module")
def session():
    config = fruit_nerf_smoke(num_images=4)
    state = init_train_state(jax.random.PRNGKey(0), config, 4)
    return ViewerSession(state.params, config)


@pytest.fixture(scope="module")
def base_url(session):
    httpd = serve(session, port=0)  # ephemeral port
    host, port = httpd.server_address
    yield f"http://{host}:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_index_page(base_url):
    status, ctype, body = _get(base_url + "/")
    assert status == 200 and ctype == "text/html"
    assert b"/render?" in body and b"bounding-box-min" in body


def test_info(base_url, session):
    status, _, body = _get(base_url + "/info")
    info = json.loads(body)
    assert info["preset"] == session.config.preset
    assert np.asarray(info["scene_aabb"]).shape == (2, 3)


@pytest.mark.parametrize("panel", ["rgb", "semantics", "depth", "accumulation"])
def test_render_panels(base_url, panel):
    from PIL import Image

    status, ctype, body = _get(
        base_url + f"/render?theta=0.5&phi=0.4&radius=2.5&size=32&panel={panel}"
    )
    assert status == 200 and ctype == "image/png"
    img = np.asarray(Image.open(io.BytesIO(body)))
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_render_preview_mode(base_url, session):
    """preview=1 renders through the reduced-sample config (the interactive
    orbit path) and still returns a well-formed frame."""
    from PIL import Image

    assert (session.preview_config.model.num_nerf_samples
            < session.config.model.num_nerf_samples)
    assert all(
        p < f for p, f in zip(
            session.preview_config.model.num_proposal_samples,
            session.config.model.num_proposal_samples,
        )
    )
    status, ctype, body = _get(
        base_url + "/render?theta=0.5&phi=0.4&radius=2.5&size=32"
        "&panel=rgb&preview=1"
    )
    assert status == 200 and ctype == "image/png"
    img = np.asarray(Image.open(io.BytesIO(body)))
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_render_with_crop_overlay(base_url):
    from PIL import Image

    q = "theta=0.5&phi=0.4&radius=2.5&size=48&panel=rgb"
    _, _, plain = _get(base_url + f"/render?{q}")
    _, _, boxed = _get(base_url + f"/render?{q}&crop=-0.5,-0.5,-0.5,0.5,0.5,0.5")
    a = np.asarray(Image.open(io.BytesIO(plain)))
    b = np.asarray(Image.open(io.BytesIO(boxed)))
    assert (a != b).any()  # overlay drew something
    # overlay color present
    assert (b == np.array([255, 220, 40])).all(-1).any()


def test_suggest_crop_endpoint(base_url):
    status, _, body = _get(base_url + "/suggest")
    out = json.loads(body)
    assert status == 200 and "aabb" in out
    if out["aabb"] is not None:
        aabb = np.asarray(out["aabb"])
        assert aabb.shape == (2, 3)
        assert (aabb[0] <= aabb[1]).all()


def test_render_frame_mesh_matches_single(session):
    """Viewer frames with the rays sharded over the 8-device virtual mesh
    match the single-device path (multi-chip viewer interactivity)."""
    from jax.sharding import Mesh

    config = fruit_nerf_smoke(num_images=4)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sharded = ViewerSession(session.params, config, mesh=mesh)
    img1 = session.render_frame(0.5, 0.4, 2.5, 48)
    img8 = sharded.render_frame(0.5, 0.4, 2.5, 48)
    np.testing.assert_array_equal(img1, img8)


def test_draw_crop_box_in_front_only():
    img = np.zeros((64, 64, 3), np.uint8)
    cams = orbit_camera(0.3, 0.5, 2.5, 64)
    out = draw_crop_box(img, cams, np.array([[-0.4] * 3, [0.4] * 3]))
    assert (out != img).any()
    # box behind the camera draws nothing
    behind = draw_crop_box(
        img, cams, np.array([[4.0, 4.0, 4.0], [5.0, 5.0, 5.0]])
    )
    assert (behind == img).all()
