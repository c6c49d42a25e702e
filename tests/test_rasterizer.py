"""Rasterizer tests: analytic single-splat checks, oracle<->tiled parity,
depth channel, jitter offsets, and gradient correctness (finite differences).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.core import camera as cam_mod
from wast3d_tpu.ops.rasterizer import api
from wast3d_tpu.ops.rasterizer.preprocess import preprocess
from wast3d_tpu.ops.rasterizer.oracle import render_oracle
from wast3d_tpu.ops.rasterizer.tiled import render_tiled
from wast3d_tpu.scene import gaussians as G


def _cam(w=64, h=64, fov=0.8, eye=(0, 0, -5)):
    return cam_mod.look_at_camera(
        eye=list(eye), target=[0, 0, 0], up=[0, -1, 0],
        fovx=fov, fovy=fov, width=w, height=h,
    )


def _scene_from(xyz, rgb, scale, opacity, cap=None):
    n = len(xyz)
    from wast3d_tpu.core.sh import rgb_to_sh
    from wast3d_tpu.core.transforms import inverse_sigmoid
    return G.from_arrays(
        xyz=np.asarray(xyz, np.float32),
        features_dc=np.asarray(rgb_to_sh(jnp.asarray(rgb, jnp.float32)))[:, None, :],
        features_rest=np.zeros((n, 15, 3), np.float32),
        scaling=np.log(np.asarray(scale, np.float32)),
        rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        opacity=np.asarray(inverse_sigmoid(jnp.asarray(opacity, jnp.float32))),
        capacity=cap,
    )


def _random_scene(n=200, seed=0, spread=1.2, cap=None):
    rng = np.random.default_rng(seed)
    return _scene_from(
        xyz=rng.normal(size=(n, 3)) * spread * [1, 1, 0.5],
        rgb=rng.uniform(0.1, 0.9, size=(n, 3)),
        scale=rng.uniform(0.03, 0.12, size=(n, 3)),
        opacity=rng.uniform(0.3, 0.95, size=(n, 1)),
        cap=cap,
    )


BLACK = jnp.zeros(3)
WHITE = jnp.ones(3)


class TestSingleSplat:
    def test_center_alpha(self):
        cam = _cam()
        opacity = 0.8
        color = [1.0, 0.5, 0.25]
        s = _scene_from([[0, 0, 0]], [color], [[0.3, 0.3, 0.3]], [[opacity]])
        out = api.render(cam, s, BLACK, settings=api.RasterizeSettings(renderer="oracle"))
        img = np.asarray(out["render"])
        # Projected center: pixel ((0+1)*64-1)/2 = 31.5 -> peak straddles 31/32.
        cx = img[31:33, 31:33].mean(axis=(0, 1))
        np.testing.assert_allclose(cx, np.array(color) * opacity, rtol=0.05)

    def test_background_far_pixel(self):
        cam = _cam()
        s = _scene_from([[0, 0, 0]], [[1, 0, 0]], [[0.05] * 3], [[0.9]])
        bg = jnp.array([0.2, 0.4, 0.6])
        out = api.render(cam, s, bg, settings=api.RasterizeSettings(renderer="oracle"))
        np.testing.assert_allclose(np.asarray(out["render"][0, 0]), bg, atol=1e-5)
        assert float(out["final_T"][0, 0]) == pytest.approx(1.0)

    def test_depth_channel(self):
        # Gaussian 5 units in front of the camera: expected depth at the
        # peak ~ alpha * 5 (expected-depth accumulation, forward.cu:369).
        cam = _cam(eye=(0, 0, -5))
        s = _scene_from([[0, 0, 0]], [[1, 1, 1]], [[0.3] * 3], [[0.8]])
        out = api.render(cam, s, BLACK, settings=api.RasterizeSettings(renderer="oracle"))
        d = np.asarray(out["depth"])
        np.testing.assert_allclose(d[31:33, 31:33].mean(), 0.8 * 5.0, rtol=0.05)

    def test_occlusion_order(self):
        # Front red splat (depth 4) occludes back green splat (depth 6).
        cam = _cam(eye=(0, 0, -5))
        s = _scene_from(
            [[0, 0, -1], [0, 0, 1]],
            [[1, 0, 0], [0, 1, 0]],
            [[0.4] * 3] * 2,
            [[0.99], [0.99]],
        )
        out = api.render(cam, s, BLACK, settings=api.RasterizeSettings(renderer="oracle"))
        center = np.asarray(out["render"][31:33, 31:33]).mean(axis=(0, 1))
        assert center[0] > 0.9 and center[1] < 0.1

    def test_near_cull(self):
        # Behind the camera -> nothing rendered.
        cam = _cam(eye=(0, 0, -5))
        s = _scene_from([[0, 0, -10]], [[1, 0, 0]], [[0.3] * 3], [[0.9]])
        out = api.render(cam, s, BLACK, settings=api.RasterizeSettings(renderer="oracle"))
        assert float(np.abs(np.asarray(out["render"])).max()) == 0.0
        assert not bool(out["visibility_filter"].any())


class TestTiledParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_oracle(self, seed):
        cam = _cam(w=80, h=48)
        s = _random_scene(n=150, seed=seed)
        o = api.render(cam, s, WHITE, settings=api.RasterizeSettings(renderer="oracle"))
        t = api.render(
            cam, s, WHITE,
            settings=api.RasterizeSettings(renderer="tiled", dup_capacity=1 << 14,
                                           max_per_tile=256, chunk=16),
        )
        assert not bool(t["overflow"])
        np.testing.assert_allclose(
            np.asarray(t["render"]), np.asarray(o["render"]), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(t["depth"]), np.asarray(o["depth"]), atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(t["final_T"]), np.asarray(o["final_T"]), atol=2e-3
        )

    def test_jitter_offsets_match(self):
        cam = _cam(w=32, h=32)
        s = _random_scene(n=60, seed=2)
        key = jax.random.PRNGKey(0)
        off = api.random_sampling_offsets(key, 32, 32)
        assert float(off.max()) <= 0.0 and float(off.min()) > -1.0
        o = api.render(cam, s, BLACK, sampling_offsets=off,
                       settings=api.RasterizeSettings(renderer="oracle"))
        t = api.render(cam, s, BLACK, sampling_offsets=off,
                       settings=api.RasterizeSettings(renderer="tiled",
                                                      dup_capacity=1 << 13,
                                                      max_per_tile=256, chunk=16))
        np.testing.assert_allclose(np.asarray(t["render"]), np.asarray(o["render"]),
                                   atol=2e-3)

    def test_nonsquare_nonmultiple_size(self):
        cam = _cam(w=50, h=34)  # not multiples of 16
        s = _random_scene(n=80, seed=3)
        t = api.render(cam, s, BLACK,
                       settings=api.RasterizeSettings(renderer="tiled",
                                                      dup_capacity=1 << 13,
                                                      max_per_tile=256, chunk=16))
        assert t["render"].shape == (34, 50, 3)


class TestGradients:
    def test_tiled_grad_matches_oracle_grad(self):
        cam = _cam(w=32, h=32)
        s = _random_scene(n=40, seed=4)
        target = jnp.zeros((32, 32, 3))

        def loss_fn(xyz, renderer):
            s2 = s.replace(xyz=xyz)
            settings = api.RasterizeSettings(
                renderer=renderer, dup_capacity=1 << 13, max_per_tile=256, chunk=16
            )
            out = api.render(cam, s2, BLACK, settings=settings)
            return jnp.mean((out["render"] - target) ** 2)

        g_o = jax.grad(lambda x: loss_fn(x, "oracle"))(s.xyz)
        g_t = jax.grad(lambda x: loss_fn(x, "tiled"))(s.xyz)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_o), atol=5e-5)

    def test_finite_difference_xyz(self):
        cam = _cam(w=24, h=24)
        s = _scene_from([[0.1, -0.2, 0]], [[0.9, 0.2, 0.4]], [[0.4] * 3], [[0.7]])

        def loss_fn(xyz):
            out = api.render(cam, s.replace(xyz=xyz), BLACK,
                             settings=api.RasterizeSettings(renderer="oracle"))
            return jnp.sum(out["render"] * jnp.linspace(0, 1, 24)[None, :, None])

        g = np.asarray(jax.grad(loss_fn)(s.xyz))
        eps = 1e-3
        for dim in range(3):
            e = np.zeros_like(np.asarray(s.xyz))
            e[0, dim] = eps
            f1 = float(loss_fn(s.xyz + e))
            f0 = float(loss_fn(s.xyz - e))
            fd = (f1 - f0) / (2 * eps)
            np.testing.assert_allclose(g[0, dim], fd, rtol=2e-2, atol=1e-4)

    def test_depth_grad_flows_to_xyz(self):
        # The fork's headline change: depth gradients reach means through
        # the view matrix (backward.cu:395-397). Autodiff must route it.
        cam = _cam(w=24, h=24)
        s = _scene_from([[0, 0, 0]], [[1, 1, 1]], [[0.4] * 3], [[0.8]])

        def depth_loss(xyz):
            out = api.render(cam, s.replace(xyz=xyz), BLACK,
                             settings=api.RasterizeSettings(renderer="oracle"))
            return jnp.sum(out["depth"])

        g = np.asarray(jax.grad(depth_loss)(s.xyz))
        # Moving the splat away from the camera (world z, camera at -z)
        # increases depth.
        assert abs(g[0, 2]) > 1e-3

    def test_means2d_offset_grad(self):
        cam = _cam(w=24, h=24)
        s = _random_scene(n=20, seed=5)
        zeros = jnp.zeros((s.capacity, 2))

        def loss_fn(off):
            out = api.render(cam, s, BLACK, means2d_offset=off,
                             settings=api.RasterizeSettings(renderer="oracle"))
            return jnp.sum(out["render"] * jnp.linspace(0, 1, 24)[None, :, None])

        g = np.asarray(jax.grad(loss_fn)(zeros))
        assert np.abs(g[:20]).max() > 1e-5  # live splats get screen-space grads
        assert np.abs(g[20:]).max() == 0.0  # dead slots get none

    def test_view_depth_offset_grad(self):
        # sbmdls_extra's cam_view_depth tap (sbmdls_extra/__init__.py:29):
        # zeros in, per-Gaussian expected-depth gradient out. Check grads
        # against finite differences through the depth image.
        import jax

        cam = _cam(w=24, h=24)
        s = _random_scene(n=12, seed=7)
        zeros = jnp.zeros((s.capacity,))
        weights = jnp.linspace(0.5, 1.5, 24)[None, :]

        def loss_fn(off):
            out = api.render(cam, s, BLACK, view_depth_offset=off,
                             settings=api.RasterizeSettings(renderer="oracle"))
            return jnp.sum(out["depth"] * weights)

        g = np.asarray(jax.grad(loss_fn)(zeros))
        assert np.abs(g[:12]).max() > 1e-5
        assert np.abs(g[12:]).max() == 0.0
        eps = 1e-3
        for i in [0, 5, 11]:
            e = zeros.at[i].set(eps)
            fd = (float(loss_fn(e)) - float(loss_fn(-e))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-4)
