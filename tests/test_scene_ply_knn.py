"""Tests: GaussianScene pytree, PLY round-trip (reference schema), KNN ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from wast3d_tpu.scene import gaussians as G
from wast3d_tpu.scene import ply as ply_mod
from wast3d_tpu.ops import knn


def _random_scene(n=100, seed=0, deg=3):
    rng = np.random.default_rng(seed)
    k = (deg + 1) ** 2
    return G.from_arrays(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        features_rest=rng.normal(size=(n, k - 1, 3)).astype(np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32) * 0.1 - 3,
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        max_sh_degree=deg,
    )


class TestScene:
    def test_capacity_padding(self):
        s = _random_scene(100)
        assert s.capacity == 256
        assert int(s.num_active) == 100
        # Dead slots are parked far away and transparent.
        assert float(s.xyz[200, 0]) == G.DEAD_XYZ
        assert float(s.get_opacity[200, 0]) < 1e-10

    def test_activations(self):
        s = _random_scene(10)
        np.testing.assert_allclose(s.get_scaling, np.exp(np.asarray(s.scaling)), rtol=1e-5)
        norms = np.linalg.norm(np.asarray(s.get_rotation)[:10], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_params_roundtrip(self):
        s = _random_scene(10)
        p = s.params()
        s2 = s.with_params({k: v + 1.0 for k, v in p.items()})
        np.testing.assert_allclose(np.asarray(s2.xyz), np.asarray(s.xyz) + 1.0)

    def test_grow_compact(self):
        s = _random_scene(100)
        g = G.grow_capacity(s, 1024)
        assert g.capacity == 1024 and int(g.num_active) == 100
        c = G.compact(g)
        assert c.capacity == 256 and int(c.num_active) == 100
        np.testing.assert_allclose(np.asarray(c.xyz[:100]), np.asarray(s.xyz[:100]))

    def test_sh_warmup(self):
        s = _random_scene(4).replace(active_sh_degree=2)
        assert s.one_up_sh_degree().active_sh_degree == 3
        assert s.one_up_sh_degree().one_up_sh_degree().active_sh_degree == 3

    def test_from_point_cloud(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        cols = rng.uniform(size=(50, 3)).astype(np.float32)
        s = G.from_point_cloud(pts, cols)
        np.testing.assert_allclose(np.asarray(s.xyz[:50]), pts, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s.get_opacity[:50]), 0.1, rtol=1e-4)
        # Isotropic scales.
        sc = np.asarray(s.scaling[:50])
        np.testing.assert_allclose(sc[:, 0], sc[:, 1])


class TestPLY:
    def test_roundtrip(self, tmp_path):
        s = _random_scene(77)
        path = str(tmp_path / "pc.ply")
        ply_mod.save_ply(s, path)
        s2 = ply_mod.load_ply(path)
        n = 77
        for field in ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s, field))[:n], np.asarray(getattr(s2, field))[:n],
                err_msg=field,
            )
        assert s2.active_sh_degree == 3

    def test_header_schema(self, tmp_path):
        s = _random_scene(5)
        path = str(tmp_path / "pc.ply")
        ply_mod.save_ply(s, path)
        header = open(path, "rb").read().split(b"end_header")[0].decode()
        # Exact reference property list (gaussian_model.py:177-189).
        assert "format binary_little_endian 1.0" in header
        assert "element vertex 5" in header
        for name in ["x", "nz", "f_dc_2", "f_rest_0", "f_rest_44", "opacity", "scale_2", "rot_3"]:
            assert f"property float {name}" in header
        assert "f_rest_45" not in header

    def test_reads_plyfile_output(self, tmp_path):
        # Cross-check against the plyfile library if available (same lib the
        # reference uses) to prove byte-compatibility both directions.
        plyfile = pytest.importorskip("plyfile")
        s = _random_scene(13)
        path = str(tmp_path / "ours.ply")
        ply_mod.save_ply(s, path)
        pd = plyfile.PlyData.read(path)
        np.testing.assert_array_equal(
            np.stack([pd["vertex"]["x"], pd["vertex"]["y"], pd["vertex"]["z"]], 1),
            np.asarray(s.xyz)[:13],
        )


class TestKNN:
    def test_exact_small(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        d, i = knn.knn_sq_dists(jnp.asarray(pts), jnp.asarray(pts), k=4,
                                exclude_self=True, block=64)
        # Brute force reference.
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(full, np.inf)
        ref = np.sort(full, axis=1)[:, :4]
        np.testing.assert_allclose(np.asarray(d), ref, rtol=1e-4, atol=1e-5)

    def test_indices_match(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=(50, 3)).astype(np.float32)
        data = rng.normal(size=(130, 3)).astype(np.float32)
        d, i = knn.knn_sq_dists(jnp.asarray(q), jnp.asarray(data), k=1, block=32)
        full = ((q[:, None] - data[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(i[:, 0]), full.argmin(1))

    def test_data_mask(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=(10, 3)).astype(np.float32)
        data = rng.normal(size=(64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:5] = True
        d, i = knn.knn_sq_dists(jnp.asarray(q), jnp.asarray(data), k=2,
                                data_mask=jnp.asarray(mask), block=32)
        assert int(np.asarray(i).max()) < 5

    def test_mean_sq_dist_matches_brute(self):
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        out = np.asarray(knn.mean_sq_dist_to_3nn(jnp.asarray(pts), block=128))
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(full, np.inf)
        ref = np.sort(full, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    def test_nonmultiple_block(self):
        rng = np.random.default_rng(6)
        pts = rng.normal(size=(100, 3)).astype(np.float32)  # 100 not multiple of 64
        out = np.asarray(knn.mean_sq_dist_to_3nn(jnp.asarray(pts), block=64))
        assert out.shape == (100,)
        assert np.all(np.isfinite(out))


class TestKNNSortPath:
    @pytest.mark.parametrize("n,m,k", [(300, 500, 100), (513, 4100, 64)])
    def test_matches_topk_fold(self, n, m, k):
        rng = np.random.default_rng(n)
        q = rng.normal(size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(m, 3)).astype(np.float32)
        df, _ = knn.knn_sq_dists(jnp.asarray(q), jnp.asarray(d), k=k)
        ds, si = knn.knn_sq_dists_sort(jnp.asarray(q), jnp.asarray(d), k=k,
                                       row_block=256)
        np.testing.assert_allclose(np.asarray(ds), np.asarray(df),
                                   rtol=1e-5, atol=1e-5)
        # Indices agree with a numpy argsort oracle (ties measure-zero).
        d2 = ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(si),
                                      np.argsort(d2, axis=1)[:, :k])

    def test_masks_and_exclude_self(self):
        rng = np.random.default_rng(9)
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        dmask = rng.uniform(size=200) > 0.3
        qmask = rng.uniform(size=200) > 0.5
        for f in (knn.knn_sq_dists, knn.knn_sq_dists_sort):
            dd, ii = f(jnp.asarray(pts), jnp.asarray(pts), k=5,
                       query_mask=jnp.asarray(qmask),
                       data_mask=jnp.asarray(dmask), exclude_self=True)
            dd, ii = np.asarray(dd), np.asarray(ii)
            assert not np.any(ii[:, 0] == np.arange(200))
            assert np.all(dmask[ii[qmask][:, 0]])
            assert np.all(dd[~qmask] >= 1e29)
