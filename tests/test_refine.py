"""Tests: cluster teleport + image-space refinement modes."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_rasterizer import _cam
from tests.test_train import _mini_scene
from wast3d_tpu.config import OptimizationConfig
from wast3d_tpu.ops.rasterizer.api import RasterizeSettings, render
from wast3d_tpu.refine import drivers as RD
from wast3d_tpu.refine.teleport import cluster_teleport
from wast3d_tpu.train.reconstruct import init_train_state

SETTINGS = RasterizeSettings(renderer="tiled", dup_capacity=1 << 12,
                             max_per_tile=128, chunk=16)


class TestTeleport:
    def test_style_moves_to_content(self):
        content = _mini_scene(n=40, seed=0, cap=64)
        content = content.replace(xyz=content.xyz + 10.0)  # far away
        style = _mini_scene(n=40, seed=1, cap=64)
        tele, labels = cluster_teleport(content, style, num_clusters=4)
        # Active style gaussians land near the content region (~+10).
        m = np.asarray(style.mask)
        np.testing.assert_allclose(
            np.asarray(tele.xyz)[m].mean(0), np.asarray(content.xyz)[m].mean(0),
            atol=2.0,
        )
        # Dead slots untouched.
        assert float(tele.xyz[63, 0]) == float(style.xyz[63, 0])


class TestRefine:
    def _setup(self, n=30):
        scene = _mini_scene(n=n, seed=2, cap=64)
        cam = _cam(w=32, h=32)
        gt = render(cam, scene, jnp.zeros(3), settings=SETTINGS)["render"]
        cfg = OptimizationConfig(densify_from_iter=10**9)
        state = init_train_state(scene, cfg, 1.0)
        return state, [(cam, gt)], cfg

    @pytest.mark.parametrize("mode", [RD.RefineMode.IMAGE_STYLE,
                                      RD.RefineMode.CONTENT_ONLY,
                                      RD.RefineMode.NORMALS_STYLE])
    def test_modes_run_and_losses_finite(self, mode):
        state, cams, cfg = self._setup()
        rng = np.random.default_rng(0)
        style_img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        state2, losses = RD.refine(
            state, cams, mode=mode, iterations=3, style_image=style_img,
            opt_cfg=cfg, settings=SETTINGS,
        )
        assert np.isfinite(losses).all()
        assert int(state2.step) == 3
        assert np.isfinite(np.asarray(state2.scene.xyz[:30])).all()

    def test_depth_target_mode_reduces_depth_error(self):
        state, cams, cfg = self._setup()
        cam, gt = cams[0]
        out0 = render(cam, state.scene, jnp.zeros(3), settings=SETTINGS)
        target_depth = np.asarray(out0["depth"]) * 0.9  # pull scene closer
        state2, losses = RD.refine(
            state, cams, mode=RD.RefineMode.DEPTH_TARGET, iterations=25,
            target_depths=[target_depth], opt_cfg=cfg, settings=SETTINGS,
        )
        assert losses[-1] < losses[0]
