"""Web viewer tests: orbit camera geometry, frame rendering, and a real
HTTP round-trip against the threaded server (tiled renderer on CPU)."""

import io
import json
import urllib.request

import numpy as np

from wast3d_tpu.ops.rasterizer import api
from wast3d_tpu.viewer import web
from tests.test_rasterizer import _random_scene, _scene_from

TILED = api.RasterizeSettings(renderer="tiled", dup_capacity=1 << 13,
                              max_per_tile=256, chunk=16)


class TestOrbitCamera:
    def test_eye_distance_and_look_at(self):
        cam = web.orbit_camera(0.7, 0.2, 5.0, 128)
        center = np.asarray(cam.camera_center)
        assert abs(np.linalg.norm(center) - 5.0) < 1e-4
        # The target (origin) projects to the view axis: view-space x,y ~ 0.
        vt = np.asarray(cam.view_transform)
        origin_view = (np.array([0, 0, 0, 1.0]) @ vt)[:3]
        assert abs(origin_view[0]) < 1e-4 and abs(origin_view[1]) < 1e-4
        assert origin_view[2] > 0  # in front of the camera

    def test_yaw_sweep_changes_eye(self):
        eyes = [
            np.asarray(web.orbit_camera(y, 0.0, 4.0, 64).camera_center)
            for y in (0.0, 1.5, 3.0)
        ]
        assert np.linalg.norm(eyes[0] - eyes[1]) > 1.0
        assert np.linalg.norm(eyes[1] - eyes[2]) > 1.0


class TestFrame:
    def test_render_orbit_frame(self):
        s = _scene_from([[0, 0, 0]], [[1.0, 0.3, 0.1]], [[0.3] * 3],
                        [[0.9]])
        rgb = web.render_orbit_frame(s, 0.0, 0.0, 4.0, 64,
                                     settings=TILED)
        assert rgb.shape == (64, 64, 3) and rgb.dtype == np.uint8
        c = rgb[32, 32].astype(float) / 255
        assert c[0] > 0.5 and c[0] > c[2]  # red splat at center


class TestHTTP:
    def test_round_trip(self):
        from PIL import Image

        s = _random_scene(n=40, seed=3)
        srv = web.serve_scene(s, port=0, settings=TILED, background=True)
        try:
            port = srv.server_address[1]
            base = f"http://127.0.0.1:{port}"
            page = urllib.request.urlopen(f"{base}/", timeout=30).read()
            assert b"/frame?" in page
            info = json.loads(
                urllib.request.urlopen(f"{base}/info", timeout=30).read()
            )
            assert info["num_gaussians"] == 40
            raw = urllib.request.urlopen(
                f"{base}/frame?yaw=0.3&pitch=0.1&radius=4&res=64",
                timeout=120,
            ).read()
            img = Image.open(io.BytesIO(raw))
            assert img.size == (64, 64)
            try:
                urllib.request.urlopen(f"{base}/nope", timeout=30)
                raise AssertionError("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            srv.shutdown()
