"""Stylization stack tests: kmeans, prepare/coverage, descriptors, the
vmapped fit (convergence on a tiny synthetic pair — BASELINE config 1 at
CPU scale), merge/de-overlap, cluster npz round-trip, full pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wast3d_tpu.config import StylizeConfig
from wast3d_tpu.ops.kmeans import kmeans, kmeans_best
from wast3d_tpu.stylize import coverage, fit, merge, prepare
from wast3d_tpu.stylize.cluster import (
    StylePatch,
    export_clusters,
    load_cluster,
)


def _two_blobs(n=200, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n // 2, 3)) * 0.1 + [2, 0, 0]
    b = rng.normal(size=(n // 2, 3)) * 0.1 - [2, 0, 0]
    return np.concatenate([a, b]).astype(np.float32)


class TestKMeans:
    def test_two_blobs(self):
        pts = _two_blobs()
        centers, labels = kmeans(pts, 2, iters=20)
        # Each blob gets one center.
        c = np.sort(centers[:, 0])
        np.testing.assert_allclose(c, [-2, 2], atol=0.2)
        assert (labels[:100] == labels[0]).all()
        assert (labels[100:] == labels[100]).all()
        assert labels[0] != labels[100]

    def test_masked(self):
        pts = np.concatenate([_two_blobs(), np.full((50, 3), 100.0, np.float32)])
        mask = np.concatenate([np.ones(200, bool), np.zeros(50, bool)])
        centers, labels = kmeans(pts, 2, iters=20, mask=mask)
        assert np.abs(centers).max() < 5  # far points ignored
        assert (labels[200:] == -1).all()

    def test_best_of_n(self):
        pts = _two_blobs()
        centers, _ = kmeans_best(pts, 2, n_init=3, iters=10)
        np.testing.assert_allclose(np.sort(centers[:, 0]), [-2, 2], atol=0.2)


class TestPrepare:
    def test_remove_outliers(self):
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.normal(size=(200, 3)) * 0.1,
            np.array([[50, 0, 0], [0, 50, 0]]),
        ]).astype(np.float32)
        keep = prepare.remove_outliers(pts, kth_neighbor=10, q=0.95)
        assert 200 not in keep and 201 not in keep

    def test_density_sampling_prefers_sparse(self):
        rng = np.random.default_rng(1)
        dense = rng.normal(size=(500, 3)) * 0.01
        sparse = rng.normal(size=(50, 3)) * 0.01 + [1, 0, 0]
        pts = np.concatenate([dense, sparse]).astype(np.float32)
        idx = prepare.sample_points_by_density(pts, num_samples=200, radius=0.05)
        frac_sparse = (idx >= 500).mean()
        assert frac_sparse > 0.3  # sparse region (9% of points) oversampled

    def test_prepare_batched_matches_sequential(self):
        """The batched (lax.map over clusters) preparation path must pick
        the exact same domain indices as the per-cluster host loop."""
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(3000, 3)).astype(np.float32)
        a = prepare.prepare_scene(pts, num_clusters=6, seed=1, batched=False)
        b = prepare.prepare_scene(pts, num_clusters=6, seed=1, batched=True)
        np.testing.assert_array_equal(np.sort(a), np.sort(b))

    def test_prepare_scene_returns_indices(self):
        pts = _two_blobs(400)
        idx = prepare.prepare_scene(pts, num_clusters=2, q=0.95, kth_neighbor=10)
        assert len(idx) > 0
        assert idx.max() < 400


class TestCoverage:
    def test_cluster_radius_analytic(self):
        # Unit segment of points: inner = outer = 1 at the ends; interior
        # points have max distance >= 0.5.
        pts = np.linspace(0, 1, 11)[:, None] * np.array([[1, 0, 0]])
        inner, outer = coverage.cluster_radius(pts.astype(np.float32))
        assert outer == pytest.approx(1.0, abs=1e-5)
        assert inner == pytest.approx(0.5, abs=1e-5)

    def test_sample_circles_covers(self):
        pts = _two_blobs(300)
        circles = coverage.sample_circles(pts, r=0.5, min_points_per_cluster=10)
        covered = np.zeros(300, bool)
        for c in circles:
            covered[c] = True
        assert covered.all()
        assert len(circles) >= 2  # blobs are 4 apart, r=0.5


class TestDescriptors:
    def test_descriptor_values(self):
        # 3 collinear points spaced 1 apart: descriptors = sorted distances.
        pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0]], jnp.float32)
        cfg = StylizeConfig(global_knn=3, global_stride=1, local_knn=2)
        td = fit.compute_target_descriptors(np.asarray(pts), cfg)
        # Global: each row = distances from self to 2 nearest others.
        np.testing.assert_allclose(td.desc_global[0], [1, 2], atol=1e-6)
        np.testing.assert_allclose(td.desc_global[1], [1, 1], atol=1e-6)

    def test_descriptors_translation_invariant(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        cfg = StylizeConfig(global_knn=16, global_stride=4, local_knn=8)
        td1 = fit.compute_target_descriptors(pts, cfg)
        td2 = fit.compute_target_descriptors(pts + 5.0, cfg)
        np.testing.assert_allclose(td1.desc_global, td2.desc_global, atol=1e-4)

    def test_domain_loss_streaming_matches_dense(self):
        """The blockwise-kNN form (large domains) must equal the dense
        top-k form (small domains) — same masked-sum identity."""
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
        dom = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=64) > 0.3)
        for k in (1, 5, 20):
            ld = fit.domain_adaptation_loss(x, dom, mask, k, dense_block=4096)
            ls = fit.domain_adaptation_loss(x, dom, mask, k, dense_block=1)
            assert float(ld) == pytest.approx(float(ls), rel=1e-5)
        # row-capped variant agrees too
        ld = fit.domain_adaptation_loss(x, dom, mask, 5, x_rows=25,
                                        dense_block=4096)
        ls = fit.domain_adaptation_loss(x, dom, mask, 5, x_rows=25,
                                        dense_block=1)
        assert float(ld) == pytest.approx(float(ls), rel=1e-5)

    def test_domain_loss_masks_padding(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 3)), jnp.float32)
        dom = jnp.zeros((32, 3))
        mask_full = jnp.ones(32, bool)
        mask_half = jnp.zeros(32, bool).at[:16].set(True)
        l1 = fit.domain_adaptation_loss(x, dom, mask_full, k=4)
        l2 = fit.domain_adaptation_loss(x, dom, mask_half, k=4)
        # Identical valid geometry (all domain points at origin) -> the
        # masked version must not beaffected by padding count beyond the mean.
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        assert float(l2) > 0


class TestDeviceMaskBuild:
    def test_pair_dense_and_packbits_match_numpy(self):
        """Device-side pair-mask construction (the 16k descriptor-build
        host-bottleneck fix) must match the numpy reference builders."""
        import numpy as np

        from wast3d_tpu.stylize import fit as F

        rng = np.random.default_rng(5)
        mp, R, k = 256, 100, 9
        rows = rng.choice(mp, R, replace=False).astype(np.int32)
        idx = np.stack([
            np.concatenate([[r], rng.choice(mp, k - 1, replace=False)])
            for r in rows
        ]).astype(np.int32)
        dense_np = F._pair_dense(idx, rows, mp)
        dense_dev = np.asarray(
            F._pair_dense_dev(jnp.asarray(idx), jnp.asarray(rows), mp)
        )
        np.testing.assert_array_equal(dense_dev, dense_np)
        bits_np = F._pack_pair_bits(idx, rows, mp)
        bits_dev = np.asarray(F._packbits_dev(jnp.asarray(dense_np)))
        np.testing.assert_array_equal(bits_dev, bits_np)


class TestFit:
    def test_fit_descriptor_loss_decreases(self):
        """Tiny synthetic pair: style = small grid patch, content = ball."""
        rng = np.random.default_rng(0)
        # Style patch: 2D grid (a 'texture')
        g = np.stack(np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8)),
                     -1).reshape(-1, 2)
        patch_pts = np.concatenate([g, rng.normal(size=(64, 1)) * 0.02], 1).astype(
            np.float32) * 0.2
        # Domain ball
        dom = rng.normal(size=(100, 3)).astype(np.float32)
        dom /= np.linalg.norm(dom, axis=1, keepdims=True)
        cfg = StylizeConfig(global_knn=32, global_stride=4, local_knn=8,
                            fit_steps=150, fit_lr=5e-3, domain_knn=5)
        td = fit.compute_target_descriptors(patch_pts, cfg)
        balls = jnp.asarray(dom)[None]
        mask = jnp.ones((1, 100), bool)
        fitted = fit.fit_balls(jnp.asarray(patch_pts), td, balls, mask, cfg)
        fitted = np.asarray(fitted[0])
        assert np.isfinite(fitted).all()
        # Descriptor loss at the result must beat the (scaled) init.
        init = patch_pts * np.asarray(dom.std(0)) * 5.0 + dom.mean(0)
        d_init = np.asarray(fit.descriptors_from_indices(jnp.asarray(init), td.idx_local))
        d_fit = np.asarray(fit.descriptors_from_indices(jnp.asarray(fitted), td.idx_local))
        tgt = np.asarray(td.desc_local)
        assert ((d_fit - tgt) ** 2).mean() < 0.3 * ((d_init - tgt) ** 2).mean()
        # Attached to the domain: mean distance to nearest domain point small.
        from wast3d_tpu.ops.knn import knn_sq_dists

        d2, _ = knn_sq_dists(jnp.asarray(fitted), jnp.asarray(dom), k=1)
        assert float(jnp.sqrt(d2).mean()) < 1.0

    def test_blockwise_matches_single_block(self):
        """The streaming column-block descriptor loss (desc_block < Mp)
        must reproduce the single-block (dense) loss, gradient, and full
        fit trajectory — the correctness gate for lifting the style-patch
        size cap (VERDICT r1 weak #5)."""
        rng = np.random.default_rng(3)
        m = 300
        pts = (rng.normal(size=(m, 3)) * 0.3).astype(np.float32)
        base = dict(global_knn=24, global_stride=5, local_knn=6,
                    fit_steps=15, domain_knn=4)
        cfg1 = StylizeConfig(**base, desc_block=512)   # Mp=384, 1 block
        cfgb = StylizeConfig(**base, desc_block=128)   # Mp=384, 3 blocks
        td1 = fit.compute_target_descriptors(pts, cfg1)
        tdb = fit.compute_target_descriptors(pts, cfgb)
        assert td1.points.shape == tdb.points.shape  # same padding

        x = pts * 1.3 + (rng.normal(size=(m, 3)) * 0.05).astype(np.float32)
        xp = jnp.pad(jnp.asarray(x), ((0, td1.points.shape[0] - m), (0, 0)))
        l1, g1 = jax.value_and_grad(fit.descriptor_loss)(xp, td1, 512)
        lb, gb = jax.value_and_grad(fit.descriptor_loss)(xp, tdb, 128)
        np.testing.assert_allclose(float(l1), float(lb), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(gb),
                                   rtol=1e-4, atol=1e-7)

        dom = rng.normal(size=(64, 3)).astype(np.float32)
        balls = jnp.asarray(dom)[None]
        mask = jnp.ones((1, 64), bool)
        f1 = fit.fit_balls(jnp.asarray(pts), td1, balls, mask, cfg1)
        fb = fit.fit_balls(jnp.asarray(pts), tdb, balls, mask, cfgb)
        assert f1.shape == (1, m, 3)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(fb),
                                   rtol=1e-4, atol=1e-5)

    def test_desc_kernel_matches_streaming(self):
        """The fused Pallas descriptor-loss kernel (desc_kernel=True,
        interpreter mode on CPU) must match the streaming XLA path: loss,
        gradient, and the vmapped fit trajectory."""
        rng = np.random.default_rng(7)
        m = 2048  # >= kernel threshold
        pts = (rng.normal(size=(m, 3)) * 0.3).astype(np.float32)
        base = dict(global_knn=32, global_stride=8, local_knn=8,
                    fit_steps=4, domain_knn=4, ball_capacity=128,
                    desc_block=1024)
        cfg_s = StylizeConfig(**base)
        cfg_k = StylizeConfig(**base, desc_kernel=True,
                              pallas_interpret=True)
        td_s = fit.compute_target_descriptors(pts, cfg_s)
        td_k = fit.compute_target_descriptors(pts, cfg_k)
        assert td_k.pair_code is not None
        assert td_k.pair_code.shape == (m, m)

        x = pts * 1.2 + (rng.normal(size=(m, 3)) * 0.05).astype(np.float32)
        xp = jnp.asarray(x)
        ls, gs = jax.value_and_grad(fit.descriptor_loss)(xp, td_s, 1024)
        lk, gk = jax.value_and_grad(
            lambda p: fit.descriptor_loss(p, td_k, 1024, interpret=True)
        )(xp)
        np.testing.assert_allclose(float(lk), float(ls), rtol=1e-5)
        scale = np.abs(np.asarray(gs)).max()
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gs),
                                   atol=scale * 1e-4)

        balls = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        mask = jnp.ones((2, 128), bool)
        fs = fit.fit_balls(jnp.asarray(pts), td_s, balls, mask, cfg_s)
        fk = fit.fit_balls(jnp.asarray(pts), td_k, balls, mask, cfg_k)
        np.testing.assert_allclose(np.asarray(fk), np.asarray(fs),
                                   rtol=1e-4, atol=1e-5)

    def test_fit_batched_matches_single(self):
        rng = np.random.default_rng(1)
        patch_pts = rng.normal(size=(32, 3)).astype(np.float32) * 0.2
        dom1 = rng.normal(size=(40, 3)).astype(np.float32)
        dom2 = rng.normal(size=(40, 3)).astype(np.float32) + 2.0
        cfg = StylizeConfig(global_knn=8, global_stride=2, local_knn=4,
                            fit_steps=20, domain_knn=3)
        td = fit.compute_target_descriptors(patch_pts, cfg)
        both = fit.fit_balls(
            jnp.asarray(patch_pts), td,
            jnp.stack([jnp.asarray(dom1), jnp.asarray(dom2)]),
            jnp.ones((2, 40), bool), cfg,
        )
        one = fit.fit_balls(
            jnp.asarray(patch_pts), td, jnp.asarray(dom1)[None],
            jnp.ones((1, 40), bool), cfg,
        )
        np.testing.assert_allclose(np.asarray(both[0]), np.asarray(one[0]),
                                   atol=1e-5)


class TestMergeCluster:
    def _patch(self, n=50, seed=0):
        rng = np.random.default_rng(seed)
        return StylePatch({
            "_xyz": rng.normal(size=(n, 3)).astype(np.float32),
            "_features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
            "_features_rest": rng.normal(size=(n, 15, 3)).astype(np.float32),
            "_rotation": np.tile([[1, 0, 0, 0]], (n, 1)).astype(np.float32),
            "_scaling": rng.normal(size=(n, 3)).astype(np.float32),
            "_opacity": rng.normal(size=(n, 1)).astype(np.float32),
        })

    def test_cluster_export_roundtrip(self, tmp_path):
        from tests.test_train import _mini_scene

        scene = _mini_scene(n=60, cap=64)
        paths = export_clusters(scene, str(tmp_path), num_clusters=3, n_init=2)
        assert len(paths) == 3
        patch = load_cluster(paths[0])
        assert patch.xyz.shape[1] == 3
        # Recentered: centroid ~ 0.
        np.testing.assert_allclose(patch.xyz.mean(0), 0, atol=1e-4)
        assert patch.features_rest.shape[1:] == (15, 3)

    def test_merge_attributes(self):
        patch = self._patch(30)
        fitted = [patch.xyz + 10, patch.xyz - 10]
        out = merge.merge_patches(patch, fitted, domain=None, deoverlap=False)
        assert int(out.num_active) == 60
        sc = np.asarray(out.scaling[:30])
        np.testing.assert_allclose(sc, patch.scaling * 0.885, rtol=1e-6)
        fr = np.asarray(out.features_rest[:60])
        assert np.abs(fr).max() == 0.0  # zeroed

    def test_deoverlap_partitions(self):
        patch = self._patch(40)
        # Two balls fitted at +/- 5; domain split between the two sides.
        rng = np.random.default_rng(2)
        fitted = [patch.xyz * 0.3 + [5, 0, 0], patch.xyz * 0.3 - [5, 0, 0]]
        domain = np.concatenate([
            rng.normal(size=(50, 3)) * 0.5 + [5, 0, 0],
            rng.normal(size=(50, 3)) * 0.5 - [5, 0, 0],
        ]).astype(np.float32)
        retained = merge.find_retained_indices(domain, fitted)
        # Each patch keeps most of its own points (they sit on their side).
        assert len(retained[0]) > 30 and len(retained[1]) > 30


class TestPipeline:
    def test_end_to_end_synthetic_pair(self):
        """BASELINE config 1 (CPU scale): content sphere + style grid."""
        from tests.test_train import _mini_scene
        from wast3d_tpu.stylize.pipeline import stylize_scene

        rng = np.random.default_rng(0)
        n = 300
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        content = _mini_scene(n=n, cap=512, seed=0).replace(
            xyz=jnp.zeros((512, 3)).at[:n].set(jnp.asarray(pts))
        )
        g = np.stack(np.meshgrid(np.linspace(-1, 1, 7), np.linspace(-1, 1, 7)),
                     -1).reshape(-1, 2)
        patch = StylePatch({
            "_xyz": np.concatenate([g, np.zeros((49, 1))], 1).astype(np.float32) * 0.3,
            "_features_dc": rng.normal(size=(49, 1, 3)).astype(np.float32),
            "_features_rest": np.zeros((49, 15, 3), np.float32),
            "_rotation": np.tile([[1, 0, 0, 0]], (49, 1)).astype(np.float32),
            "_scaling": np.full((49, 3), -4.0, np.float32),
            "_opacity": np.ones((49, 1), np.float32),
        })
        cfg = StylizeConfig(
            num_content_clusters=4, global_knn=16, global_stride=4,
            local_knn=8, fit_steps=60, min_ball_points=10, domain_knn=5,
            ball_capacity=256,
        )
        out = stylize_scene(content, patch, cfg=cfg, batch_size=4, verbose=True)
        assert int(out.num_active) > 40
        xyz = np.asarray(out.xyz)[np.asarray(out.mask)]
        assert np.isfinite(xyz).all()
        # Stylized points live near the content sphere surface.
        r = np.linalg.norm(xyz, axis=1)
        assert 0.3 < np.median(r) < 3.0
