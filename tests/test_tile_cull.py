"""Exact per-tile ellipse cull (binning.py `conics`/`opacities` args).

The cull drops (gaussian, tile) duplicates whose maximum achievable
alpha anywhere in the tile's sample box is < 1/255 — entries the blend
kernel skips at every pixel (`forward.cu:354-358`): exactly zero color /
depth / T contribution and zero gradient. Removing them shifts the
survivors across chunk boundaries, which REASSOCIATES the f32 chunk
reductions — so outputs agree to ~1 ulp (measured 1.2e-7 on renders),
not bitwise. The tolerances here are 100x below the kernels'
cross-implementation parity bars (3e-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.ops.rasterizer import api
from wast3d_tpu.ops.rasterizer import binning as bm
from tests.test_rasterizer import _cam, _scene_from, BLACK


def _aniso_scene(n=120, seed=3):
    """Strongly anisotropic splats: large rect AABBs whose corner tiles
    the exact ellipse misses — the case the cull targets."""
    rng = np.random.default_rng(seed)
    return _scene_from(
        xyz=rng.normal(size=(n, 3)) * [1.0, 1.0, 0.4],
        rgb=rng.uniform(0.1, 0.9, size=(n, 3)),
        scale=np.stack(
            [
                rng.uniform(0.2, 0.5, size=n),   # long axis
                rng.uniform(0.01, 0.03, size=n),  # thin axis
                rng.uniform(0.01, 0.03, size=n),
            ],
            axis=1,
        ),
        opacity=rng.uniform(0.2, 0.95, size=(n, 1)),
    )


def _render_grads(scene, cam, settings, jitter_key=None):
    offs = None
    if jitter_key is not None:
        offs = api.random_sampling_offsets(jitter_key, cam.height, cam.width)

    def loss(xyz, scaling, opacity):
        s = scene.replace(xyz=xyz, scaling=scaling, opacity=opacity)
        out = api.render(cam, s, BLACK, settings=settings,
                         sampling_offsets=offs)
        return (jnp.sum(out["render"] * jnp.cos(out["render"]))
                + jnp.sum(out["depth"]) * 1e-3), out

    (val, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                           has_aux=True)(
        scene.xyz, scene.scaling, scene.opacity)
    return val, out, grads


class TestTileCullExactness:
    @pytest.mark.parametrize("renderer,jitter", [
        ("tiled", False),
        ("tiled", True),
        ("pallas", False),
        ("pallas", True),
    ])
    def test_render_and_grads_identical(self, renderer, jitter):
        scene = _aniso_scene()
        cam = _cam(w=96, h=80, eye=(0, 0, -4))
        kw = dict(renderer=renderer, dup_capacity=1 << 14,
                  pallas_interpret=(renderer == "pallas"),
                  grad_reduce="segsum")
        on = api.RasterizeSettings(tile_cull=True, **kw)
        off = api.RasterizeSettings(tile_cull=False, **kw)
        key = jax.random.PRNGKey(7) if jitter else None

        v1, o1, g1 = _render_grads(scene, cam, on, key)
        v2, o2, g2 = _render_grads(scene, cam, off, key)

        np.testing.assert_allclose(np.asarray(o1["render"]),
                                   np.asarray(o2["render"]), atol=3e-5)
        np.testing.assert_allclose(np.asarray(o1["depth"]),
                                   np.asarray(o2["depth"]), atol=3e-4)
        np.testing.assert_allclose(np.asarray(o1["final_T"]),
                                   np.asarray(o2["final_T"]), atol=3e-5)
        for a, b in zip(g1, g2):
            b = np.asarray(b)
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(np.asarray(a) / scale, b / scale,
                                       atol=3e-4)

    def test_cull_reduces_duplicates(self):
        """The anisotropic scene must actually exercise the cull, and the
        culled duplicates must be exactly the ones a brute-force per-dup
        alpha-max test finds cullable."""
        scene = _aniso_scene()
        cam = _cam(w=96, h=80, eye=(0, 0, -4))
        from wast3d_tpu.ops.rasterizer.preprocess import preprocess

        prep = preprocess(
            means3d=scene.get_xyz, opacities=scene.get_opacity,
            view_transform=cam.view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center,
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=96, height=80, sh_degree=0, shs=scene.get_features,
            scales=scene.get_scaling, rotations=scene.get_rotation,
            mask=scene.mask,
        )
        common = dict(dup_capacity=1 << 14)
        b_off = bm.bin_gaussians(prep.means2d, prep.depths, prep.radii,
                                 96, 80, ext_x=prep.extent_x,
                                 ext_y=prep.extent_y, **common)
        b_on = bm.bin_gaussians(prep.means2d, prep.depths, prep.radii,
                                96, 80, ext_x=prep.extent_x,
                                ext_y=prep.extent_y,
                                conics=prep.conics,
                                opacities=prep.opacities, **common)
        n_off = int(b_off.num_duplicates)
        n_on = int(b_on.num_duplicates)
        assert n_on < n_off, (n_on, n_off)
        # The 2-key sort fallback (problems beyond uint32 packing) culls
        # identically: same totals, same per-tile ranges.
        b_2k = bm.bin_gaussians(prep.means2d, prep.depths, prep.radii,
                                96, 80, ext_x=prep.extent_x,
                                ext_y=prep.extent_y,
                                conics=prep.conics,
                                opacities=prep.opacities,
                                _force_two_key=True, **common)
        assert int(b_2k.num_duplicates) == n_on
        np.testing.assert_array_equal(np.asarray(b_2k.tile_start),
                                      np.asarray(b_on.tile_start))
        np.testing.assert_array_equal(np.asarray(b_2k.tile_end),
                                      np.asarray(b_on.tile_end))
        # tile range sums match the reported totals
        assert int(jnp.sum(b_on.tile_end - b_on.tile_start)) == n_on
        assert int(jnp.sum(b_off.tile_end - b_off.tile_start)) == n_off

        # Brute-force reference: per surviving-vs-culled duplicate, the
        # max alpha over the tile's (unjittered) pixel grid. Every culled
        # dup must be sub-threshold everywhere; margin keeps the check
        # away from the boundary the conservative slack (1e-3 in Q ~
        # 5e-4 in log-alpha) intentionally blurs.
        mx, my = np.asarray(prep.means2d).T
        A, B, C = np.asarray(prep.conics).T
        opa = np.asarray(prep.opacities)
        kept = set()
        for t in range(b_on.tile_start.shape[0]):
            s, e = int(b_on.tile_start[t]), int(b_on.tile_end[t])
            for j in range(s, e):
                kept.add((t, int(b_on.gauss_idx[j])))
        gx = -(-96 // bm.TILE)
        for t in range(b_off.tile_start.shape[0]):
            s, e = int(b_off.tile_start[t]), int(b_off.tile_end[t])
            tx, ty = t % gx, t // gx
            pxs = np.arange(tx * 16, tx * 16 + 16)
            pys = np.arange(ty * 16, ty * 16 + 16)
            PX, PY = np.meshgrid(pxs, pys)
            for j in range(s, e):
                g = int(b_off.gauss_idx[j])
                if (t, g) in kept:
                    continue
                dx, dy = PX - mx[g], PY - my[g]
                q = A[g] * dx * dx + 2 * B[g] * dx * dy + C[g] * dy * dy
                alpha_max = opa[g] * np.exp(-0.5 * q.min())
                assert alpha_max < 1.0 / 255.0, (t, g, alpha_max)
