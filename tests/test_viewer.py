"""Web viewer (holoscene_tpu/viewer.py) — the GL-GUI analog: orbit renders
from gaussian and mesh artifacts, artifact dispatch, HTTP round-trip."""

import threading
import urllib.request

import numpy as np

from holoscene_tpu.viewer import (
    GaussianOrbitRenderer,
    MeshOrbitRenderer,
    make_renderer,
    serve,
)
from tests.test_gs_usdz import _fake_gaussians


def _gauss_ply(tmp_path, n=200):
    from holoscene_tpu.models.gom import write_gaussian_ply

    g = _fake_gaussians(n=n)
    # concentrate gaussians so the orbit camera sees them
    g["means"] = (g["means"] * 0.3).astype(np.float32)
    g["log_scales"] = np.full((n, 3), -2.5, np.float32)
    g["opacity_logits"] = np.full((n,), 2.0, np.float32)
    p = str(tmp_path / "g.ply")
    write_gaussian_ply(p, g)
    return p


def test_gaussian_orbit_renderer(tmp_path):
    r = GaussianOrbitRenderer(_gauss_ply(tmp_path))
    img = r.render(az=30, el=15, zoom=1.0, res=64)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    # scene content differs from the background somewhere
    assert float(np.abs(img - 0.12).max()) > 0.05
    # moving the camera changes the image
    img2 = r.render(az=120, el=15, zoom=1.0, res=64)
    assert float(np.abs(img - img2).max()) > 1e-3


def test_mesh_orbit_renderer(tmp_path):
    from holoscene_tpu.utils.mesh import Mesh, write_ply

    # unit cube
    v = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        np.float32,
    )
    f = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32,
    )
    p = str(tmp_path / "cube.ply")
    write_ply(p, Mesh(v, f))
    r = make_renderer(p)  # .ply WITH faces -> mesh renderer
    assert isinstance(r, MeshOrbitRenderer)
    img = r.render(az=40, el=25, zoom=1.0, res=64)
    assert img.shape == (64, 64, 3)
    center = img[24:40, 24:40]
    assert float(np.abs(center - 0.12).max()) > 0.05  # cube visible


def test_make_renderer_dispatch(tmp_path):
    p = _gauss_ply(tmp_path)
    assert isinstance(make_renderer(p), GaussianOrbitRenderer)


def test_http_round_trip(tmp_path):
    r = GaussianOrbitRenderer(_gauss_ply(tmp_path, n=60))
    srv = serve(r, port=0, res=48)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read()
        assert b"holoscene_tpu viewer" in page
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?az=10&el=5&zoom=1.2&res=48",
            timeout=120,
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        srv.shutdown()
