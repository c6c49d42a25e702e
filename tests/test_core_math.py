"""Unit tests for core math: SH, quaternions, covariance, cameras, LR.

These check against analytic values and closed-form identities (the
reference has no tests; SURVEY.md §4 sets this strategy)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.core import sh as sh_mod
from wast3d_tpu.core import transforms as tf
from wast3d_tpu.core import camera as cam_mod
from wast3d_tpu.core.lr import expon_lr


class TestSH:
    def test_degree0_is_constant(self):
        coeffs = jnp.zeros((5, 3, 16)).at[:, :, 0].set(1.0)
        dirs = jnp.array([[0.0, 0.0, 1.0]] * 5)
        out = sh_mod.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, sh_mod.C0, rtol=1e-6)

    def test_dc_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        coeffs = jnp.zeros((1, 3, 16)).at[:, :, 0].set(sh_mod.rgb_to_sh(rgb))
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        out = sh_mod.eval_sh_color(0, coeffs, dirs)
        np.testing.assert_allclose(out, rgb, rtol=1e-5)

    def test_degree1_analytic(self):
        # Y_1^0 ∝ z with coefficient C1 at slot 2 (reference basis layout).
        coeffs = jnp.zeros((1, 1, 16)).at[0, 0, 2].set(1.0)
        for z in (-1.0, 0.0, 1.0):
            v = np.array([0.0, 0.0, z])
            n = v / (np.linalg.norm(v) + 1e-12) if z != 0 else np.array([1.0, 0.0, 0.0])
            out = sh_mod.eval_sh(1, coeffs, jnp.asarray(n[None]))
            np.testing.assert_allclose(out[0, 0], sh_mod.C1 * n[2], atol=1e-6)

    def test_parseval_rotation_invariance(self):
        # Mean over uniform sphere directions of |f|^2 equals sum of coeff^2 / (4π)
        # — sanity that basis normalization is orthonormal-real SH.
        rng = np.random.default_rng(0)
        coeffs = jnp.asarray(rng.normal(size=(1, 1, 16)).astype(np.float32))
        dirs = rng.normal(size=(200000, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        vals = sh_mod.eval_sh(3, jnp.broadcast_to(coeffs, (200000, 1, 16)), jnp.asarray(dirs))
        mean_sq = float(jnp.mean(vals**2))
        expected = float(jnp.sum(coeffs[..., :16] ** 2)) / (4 * math.pi)
        assert abs(mean_sq - expected) / expected < 0.05

    def test_color_clamped_grad_zero(self):
        coeffs = jnp.zeros((1, 3, 16)).at[:, :, 0].set(sh_mod.rgb_to_sh(jnp.array([-0.5, 0.5, 0.5])))
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        g = jax.grad(lambda c: sh_mod.eval_sh_color(0, c, dirs).sum())(coeffs)
        # Channel 0 is clamped at 0 -> zero gradient; others carry C0.
        assert g[0, 0, 0] == 0.0
        np.testing.assert_allclose(g[0, 1, 0], sh_mod.C0, rtol=1e-6)


class TestQuat:
    def test_identity(self):
        R = tf.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_90deg_z(self):
        # 90° about z: w = cos(45°), z = sin(45°)
        s = math.sqrt(0.5)
        R = tf.quat_to_rotmat(jnp.array([[s, 0, 0, s]]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R[0], expected, atol=1e-6)

    def test_orthonormal_random(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
        R = tf.quat_to_rotmat(q)
        eye = jnp.broadcast_to(jnp.eye(3), (64, 3, 3))
        np.testing.assert_allclose(R @ jnp.swapaxes(R, 1, 2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_covariance_psd_and_eigvals(self):
        # Sigma = R diag(s^2) R^T: eigenvalues are the squared scales.
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        s = jnp.asarray(np.abs(rng.normal(size=(16, 3))).astype(np.float32) + 0.1)
        packed = tf.covariance_from_scaling_rotation(s, 1.0, q)
        cov = tf.unpack_symmetric(packed)
        eig = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=1)
        np.testing.assert_allclose(eig, np.sort(np.asarray(s) ** 2, axis=1), rtol=1e-4, atol=1e-5)

    def test_strip_unpack_roundtrip(self):
        rng = np.random.default_rng(3)
        A = rng.normal(size=(8, 3, 3))
        sym = jnp.asarray((A + A.transpose(0, 2, 1)).astype(np.float32))
        np.testing.assert_allclose(tf.unpack_symmetric(tf.strip_symmetric(sym)), sym, atol=1e-6)


class TestCamera:
    def test_view_transform_maps_eye_to_origin(self):
        cam = cam_mod.look_at_camera(
            eye=[0, 0, -5], target=[0, 0, 0], up=[0, 1, 0],
            fovx=1.0, fovy=1.0, width=64, height=64,
        )
        eye_h = jnp.array([0.0, 0.0, -5.0, 1.0])
        v = eye_h @ cam.view_transform
        np.testing.assert_allclose(v[:3], 0.0, atol=1e-5)

    def test_target_on_positive_z(self):
        cam = cam_mod.look_at_camera(
            eye=[1, 2, -5], target=[1, 2, 3], up=[0, 1, 0],
            fovx=1.0, fovy=1.0, width=64, height=64,
        )
        tgt = jnp.array([1.0, 2.0, 3.0, 1.0]) @ cam.view_transform
        np.testing.assert_allclose(tgt[0], 0.0, atol=1e-5)
        np.testing.assert_allclose(tgt[1], 0.0, atol=1e-5)
        assert tgt[2] > 0  # reference convention: depth is +z in view space

    def test_camera_center(self):
        cam = cam_mod.look_at_camera(
            eye=[3, -1, 2], target=[0, 0, 0], up=[0, 1, 0],
            fovx=1.0, fovy=1.0, width=32, height=32,
        )
        np.testing.assert_allclose(cam.camera_center, [3, -1, 2], atol=1e-5)

    def test_projection_center_point(self):
        # A point on the optical axis at depth d projects to ndc (0, 0),
        # w = d (reference P[3,2]=1 convention).
        cam = cam_mod.look_at_camera(
            eye=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0],
            fovx=0.8, fovy=0.8, width=64, height=64,
        )
        p = jnp.array([0.0, 0.0, 0.0, 1.0]) @ cam.full_proj_transform
        np.testing.assert_allclose(p[3], 4.0, rtol=1e-5)
        np.testing.assert_allclose(p[:2] / p[3], 0.0, atol=1e-6)

    def test_fov_edge_projects_to_ndc_one(self):
        # Proper-rotation look-at in a y-down (COLMAP-style) world: with
        # up=(0,-1,0) and fwd=+z, image-right is world +x, so a point at
        # x = d*tan(fov/2) lands exactly on ndc x = +1.
        fov = 0.9
        cam = cam_mod.look_at_camera(
            eye=[0, 0, 0], target=[0, 0, 1], up=[0, -1, 0],
            fovx=fov, fovy=fov, width=64, height=64,
        )
        d = 5.0
        x_edge = d * math.tan(fov / 2)
        p = jnp.array([x_edge, 0.0, d, 1.0]) @ cam.full_proj_transform
        np.testing.assert_allclose(p[0] / p[3], 1.0, rtol=1e-5)
        # Rotation must be proper (det +1) — covariances/quats assume it.
        R3 = np.asarray(cam.view_transform)[:3, :3]
        np.testing.assert_allclose(np.linalg.det(R3), 1.0, rtol=1e-5)

    def test_focal_matches_fov(self):
        cam = cam_mod.look_at_camera(
            eye=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0],
            fovx=0.8, fovy=0.6, width=640, height=480,
        )
        np.testing.assert_allclose(float(cam.focal_x), cam_mod.fov2focal(0.8, 640), rtol=1e-6)
        np.testing.assert_allclose(float(cam.focal_y), cam_mod.fov2focal(0.6, 480), rtol=1e-6)


class TestLR:
    def test_endpoints(self):
        sched = expon_lr(1e-1, 1e-3, max_steps=1000)
        np.testing.assert_allclose(float(sched(0)), 1e-1, rtol=1e-6)
        np.testing.assert_allclose(float(sched(1000)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(2000)), 1e-3, rtol=1e-6)

    def test_log_linear_midpoint(self):
        sched = expon_lr(1e-1, 1e-3, max_steps=1000)
        np.testing.assert_allclose(float(sched(500)), 1e-2, rtol=1e-5)

    def test_delay(self):
        sched = expon_lr(1.0, 1.0, lr_delay_steps=100, lr_delay_mult=0.1)
        np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 1.0, rtol=1e-5)

    def test_jit_traceable(self):
        sched = expon_lr(1e-1, 1e-3, max_steps=1000)
        val = jax.jit(sched)(jnp.int32(500))
        np.testing.assert_allclose(float(val), 1e-2, rtol=1e-5)

    def test_disabled(self):
        sched = expon_lr(0.0, 0.0)
        assert float(sched(10)) == 0.0


def test_camera_identity_does_not_change_treedef():
    """Cameras with different uid/name must share one jit treedef —
    otherwise every COLMAP viewpoint recompiles the train step
    (advisor finding r1: Camera.uid/name were static pytree fields)."""
    import jax

    from wast3d_tpu.core.camera import look_at_camera

    a = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
                       fovx=0.9, fovy=0.9, width=32, height=32,
                       uid=1, name="im_0001")
    b = look_at_camera(eye=[1, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
                       fovx=0.9, fovy=0.9, width=32, height=32,
                       uid=2, name="im_0002")
    ta = jax.tree.structure(a)
    tb = jax.tree.structure(b)
    assert ta == tb

    n_traces = 0

    @jax.jit
    def f(cam):
        nonlocal n_traces
        n_traces += 1
        return cam.camera_center * 2.0

    f(a)
    f(b)
    assert n_traces == 1
