"""Tests: Sinkhorn OT and the cluster geometry-transfer losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.ops import sinkhorn as SK
from wast3d_tpu.stylize import geom_transfer as GT


class TestSinkhorn:
    def test_identical_sets_near_zero(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        cost = float(SK.emd2_approx(x, x, epsilon=0.005, iters=300))
        # Self-transport cost ~ entropic blur only.
        spread = float(jnp.mean(SK.cost_matrix(x, x)))
        assert cost < 0.05 * spread

    def test_translation_cost(self):
        # Two identical clouds offset by t: W2^2 = |t|^2 (squared ground cost).
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        t = jnp.asarray([2.0, 0.0, 0.0])
        cost = float(SK.emd2_approx(x, x + t, epsilon=0.005, iters=300))
        assert cost == pytest.approx(4.0, rel=0.15)

    def test_marginals_satisfied(self):
        rng = np.random.default_rng(2)
        c = jnp.asarray(rng.uniform(size=(16, 24)), jnp.float32)
        cost, f, g = SK.sinkhorn(c, epsilon=0.05, iters=500)
        logP = (f[:, None] + g[None, :] - c) / 0.05
        P = jnp.exp(logP) * (1 / 16) * (1 / 24)
        np.testing.assert_allclose(np.asarray(P.sum(1)), 1 / 16, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(P.sum(0)), 1 / 24, rtol=1e-2)

    def test_differentiable(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(16, 3)) + 1.0, jnp.float32)
        g = jax.grad(lambda a: SK.emd2_approx(a, y, iters=50))(x)
        assert np.isfinite(np.asarray(g)).all()
        # Gradient should point from x toward y on average (cost decreases
        # moving x toward y): descent direction reduces mean offset.
        assert float(jnp.mean(g[:, 0])) < 0


class TestGeomTransfer:
    def _setup(self, n=64, seed=0):
        rng = np.random.default_rng(seed)
        xyz = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        rot = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
        scal = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        shape = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        shape = shape / jnp.linalg.norm(shape, axis=1, keepdims=True) * 5.0
        return xyz, rot, scal, shape

    def test_zero_at_target(self):
        xyz, rot, scal, shape = self._setup()
        t = GT.compute_targets(xyz, rot, scal, k=16)
        assert float(GT.loss_v0(xyz, rot, scal, t)) < 1e-8

    def test_translation_invariance_of_v0(self):
        xyz, rot, scal, shape = self._setup()
        t = GT.compute_targets(xyz, rot, scal, k=16)
        # xyz translation changes cross-distance quirk matrices (they mix
        # rotation coords and xyz), so only the xyz term is invariant:
        d1 = GT.attribute_distances(xyz, rot, scal)[0]
        d2 = GT.attribute_distances(xyz + 3.0, rot, scal)[0]
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=5e-3)

    def test_optimize_recovers_structure(self):
        xyz, rot, scal, shape = self._setup()
        t = GT.compute_targets(xyz, rot, scal, k=16)
        xyz0 = xyz + jnp.asarray(
            np.random.default_rng(1).normal(size=xyz.shape) * 0.3, jnp.float32
        )
        l0 = float(GT.loss_v0(xyz0, rot, scal, t))
        out = GT.optimize_cluster_geometry(
            xyz0, rot, scal, t, shape, jax.random.PRNGKey(0),
            variant="v0", steps=300, lr=1e-2,
        )
        l1 = float(GT.loss_v0(out, rot, scal, t))
        assert l1 < 0.2 * l0

    def test_v4_shape_attachment_pulls_toward_shape(self):
        xyz, rot, scal, shape = self._setup()
        far = xyz + 50.0
        near = xyz * 0.2  # near origin; shape scaled to radius 1 (5 * 0.2)
        l_far = float(GT.shape_attachment_loss(far, shape))
        l_near = float(GT.shape_attachment_loss(near, shape))
        assert l_near < l_far

    def test_v1_and_v4_finite_grads(self):
        xyz, rot, scal, shape = self._setup(n=48)
        t = GT.compute_targets(xyz, rot, scal, k=8)
        for variant in ("v1", "v4"):
            g = jax.grad(
                lambda x: (
                    GT.loss_v1(x, rot, scal, t, shape, jax.random.PRNGKey(0),
                               num_samples=32)
                    if variant == "v1"
                    else GT.loss_v4(x, rot, scal, t, shape)
                )
            )(xyz)
            assert np.isfinite(np.asarray(g)).all(), variant
