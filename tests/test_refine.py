"""Tests: cluster teleport + image-space refinement modes."""

import jax
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


class TestIntracluster:
    """get_intracluster_stats port (train_st.py:102-171) vs a direct
    numpy transcription of the reference's ragged per-cluster cdist."""

    def _ref_numpy(self, values, ids, K):
        out = []
        for k in range(K):
            g = values[ids == k]
            d = np.sqrt(
                np.maximum(
                    ((g[:, None, :] - g[None, :, :]) ** 2).sum(-1), 0
                )
            )
            out.append(d)
        return out

    def test_pairwise_matches_ragged_reference(self):
        from wast3d_tpu.refine.intracluster import (
            intracluster_pairwise_dists, pack_clusters,
        )

        rng = np.random.default_rng(0)
        n, K = 200, 7
        vals = rng.normal(size=(n, 3)).astype(np.float32)
        ids = rng.integers(0, K, size=n)
        pack = pack_clusters(ids, K)
        got = np.asarray(
            intracluster_pairwise_dists(jnp.asarray(vals), pack)
        )
        ref = self._ref_numpy(vals, ids, K)
        for k in range(K):
            m = int(pack.counts[k])
            # Rows are packed in stable (original) order.
            np.testing.assert_allclose(got[k, :m, :m], ref[k], atol=1e-5)
            assert np.all(got[k, m:] == 0) and np.all(got[k, :, m:] == 0)

    def test_loss_zero_at_gt_and_differentiable(self):
        from wast3d_tpu.refine.intracluster import (
            intracluster_pairwise_dists, intracluster_stats_loss,
            pack_clusters,
        )

        rng = np.random.default_rng(1)
        n, K = 64, 4
        vals = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        ids = rng.integers(0, K, size=n)
        pack = pack_clusters(ids, K)
        gt = intracluster_pairwise_dists(vals, pack)
        assert float(intracluster_stats_loss(vals, gt, pack)) < 1e-10
        moved = vals + 0.1 * jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32)
        )
        loss, g = jax.value_and_grad(
            lambda v: intracluster_stats_loss(v, gt, pack)
        )(moved)
        assert float(loss) > 0
        assert np.isfinite(np.asarray(g)).all() and np.any(np.asarray(g))

    def test_scene_entry_point(self):
        from tests.test_rasterizer import _random_scene
        from wast3d_tpu.refine.intracluster import get_intracluster_stats

        scene = _random_scene(n=50, seed=3)
        ids = np.random.default_rng(0).integers(0, 5, size=scene.capacity)
        out = get_intracluster_stats(scene, ids, attrbs=("xyz",))
        assert out["xyz"].shape[0] == 5
