"""Tests: encodings, sphere projection model, NST, camera paths, probe,
profiling/debug utilities, CLI arg parsing."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestEncodings:
    def test_embedder_dims(self):
        from wast3d_tpu.models.encodings import Embedder

        e = Embedder(input_dims=3, include_input=True, num_freqs=10)
        x = jnp.zeros((5, 3))
        out = e.embed(x)
        assert out.shape == (5, e.out_dim) == (5, 3 + 3 * 2 * 10)

    def test_nerf_encoding_values(self):
        from wast3d_tpu.models.encodings import nerf_positional_encoding

        x = jnp.zeros((2, 3))
        enc = nerf_positional_encoding(x, num_freqs=2)
        assert enc.shape == (2, 12)
        # sin(0)=0 for first half of each feature block, cos(0)=1.
        e = np.asarray(enc).reshape(2, 3, 4)
        np.testing.assert_allclose(e[..., :2], 0.0)
        np.testing.assert_allclose(e[..., 2:], 1.0)

    def test_sphere_projection_shapes(self):
        from wast3d_tpu.models.sphere_projection import SphereProjectionModel

        model = SphereProjectionModel(hidden_dim=32)
        pts = jnp.zeros((7, 3))
        params = model.init(jax.random.PRNGKey(0), pts)
        out, rot = model.apply(params, pts)
        assert out.shape == (7, 3) and rot.shape == (7, 3, 3)


class TestNST:
    def test_style_transfer_runs(self):
        from wast3d_tpu.models.nst import style_transfer

        rng = np.random.default_rng(0)
        c = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        s = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        out, losses = style_transfer(c, s, steps=5)
        assert out.shape == (32, 32, 3)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestCameraPath:
    def test_load_and_interpolate(self, tmp_path):
        # Two keyframes 90 degrees apart on a circle.
        def kf(ang):
            c = np.cos(ang); s = np.sin(ang)
            m = np.eye(4)
            m[:3, 3] = [3 * c, 0, 3 * s]
            # camera looks at origin: build axes (OpenGL convention z back)
            fwd = -m[:3, 3] / np.linalg.norm(m[:3, 3])
            up = np.array([0, 1, 0.0])
            right = np.cross(fwd, up); right /= np.linalg.norm(right)
            upv = np.cross(right, fwd)
            m[:3, 0], m[:3, 1], m[:3, 2] = right, upv, -fwd
            return {"matrix": json.dumps(list(m.T.flatten())), "fov": 50,
                    "aspect": 1, "properties": "[]"}

        path = str(tmp_path / "path.json")
        with open(path, "w") as f:
            json.dump({"keyframes": [kf(0), kf(np.pi / 2)]}, f)

        from wast3d_tpu.eval.camera_path import load_camera_path

        cams = load_camera_path(path, width=64, height=64, frames_per_segment=4)
        assert len(cams) == 5
        # Keyframe endpoints exactly on the radius; midpoints on the chord
        # (linear interpolation), so between r*cos(45 deg) and r.
        for i, cam in enumerate(cams):
            r = np.linalg.norm(np.asarray(cam.camera_center))
            if i in (0, len(cams) - 1):
                np.testing.assert_allclose(r, 3.0, atol=1e-4)
            else:
                assert 3.0 * np.cos(np.pi / 4) - 1e-3 <= r <= 3.0 + 1e-3

    def test_spiral_and_render_path(self, tmp_path):
        from tests.test_train import _mini_scene
        from wast3d_tpu.eval.camera_path import render_path, spiral_path
        from wast3d_tpu.ops.rasterizer.api import RasterizeSettings

        cams = spiral_path(np.zeros(3), radius=4.0, height_offset=0.5,
                           num_frames=3, width=32, height=32)
        scene = _mini_scene(n=20)
        paths = render_path(
            scene, cams, str(tmp_path / "frames"),
            settings=RasterizeSettings(renderer="tiled", dup_capacity=1 << 11,
                                       max_per_tile=64, chunk=16),
        )
        assert len(paths) == 3 and all(os.path.exists(p) for p in paths)


class TestProbeAndUtils:
    def test_probe_views(self, tmp_path):
        from tests.test_rasterizer import _cam
        from tests.test_train import _mini_scene
        from wast3d_tpu.eval.probe import probe_views
        from wast3d_tpu.ops.rasterizer.api import RasterizeSettings

        scene = _mini_scene(n=20)
        cams = [_cam(w=32, h=32)]
        dump = probe_views(
            scene, cams, str(tmp_path / "probe"),
            settings=RasterizeSettings(renderer="tiled", dup_capacity=1 << 11,
                                       max_per_tile=64, chunk=16),
        )
        assert os.path.exists(str(tmp_path / "probe" / "probe.npz"))
        assert dump["normals"][0].shape == (32, 32, 3)

    def test_step_timer(self):
        from wast3d_tpu.utils.profiling import StepTimer

        t = StepTimer()
        assert t.tick() is None
        import time

        time.sleep(0.01)
        assert t.tick() > 0

    def test_nan_check(self):
        from wast3d_tpu.utils.debug import nan_check

        assert nan_check({"a": jnp.ones(3)})
        with pytest.raises(FloatingPointError):
            nan_check({"a": jnp.array([1.0, np.nan])})

    def test_debug_groups_loss_converges(self):
        from wast3d_tpu.utils.debug import debug_groups_loss

        assert debug_groups_loss(steps=300) < 1e-3


class TestCLIs:
    def test_cli_help_screens(self):
        # Arg wiring smoke: every CLI parses --help without importing jax
        # heavyweights incorrectly.
        for mod in ("train", "render", "metrics", "full_eval", "stylize",
                    "save_clusters", "convert", "pipeline", "sweep"):
            res = subprocess.run(
                [sys.executable, "-m", f"wast3d_tpu.cli.{mod}", "--help"],
                capture_output=True, text=True, timeout=120,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            assert res.returncode == 0, (mod, res.stderr[-500:])
