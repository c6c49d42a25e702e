"""Pallas blend kernel tests (interpreter mode on CPU): forward and
gradient parity against the XLA tiled path and the oracle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.ops.rasterizer import api
from tests.test_rasterizer import _cam, _random_scene, _scene_from, BLACK, WHITE


# grad_reduce pinned to "segsum" (split-bf16 class, ~2^-16): these tests
# pin the KERNEL's gradient math against the tiled f32 reference at tight
# tolerance. The production default ("segsum_sortpacked") quantizes
# per-duplicate gradients to bf16 before the segment sum and has its own
# tolerance-appropriate parity tests in test_grad_reduce.py.
PALLAS = api.RasterizeSettings(
    renderer="pallas", dup_capacity=1 << 13, pallas_interpret=True,
    grad_reduce="segsum",
)
TILED = api.RasterizeSettings(
    renderer="tiled", dup_capacity=1 << 13, max_per_tile=256, chunk=16
)


class TestForwardParity:
    def test_anisotropic_low_opacity_matches_oracle(self):
        """Stress the tight tile-footprint path (preprocess extent_x/y):
        strongly anisotropic splats and near-threshold opacities must
        render identically to the per-pixel oracle (which has no tile
        structure at all) — every tile the tight AABB drops may contain
        only sub-1/255-alpha pixels."""
        from tests.test_rasterizer import _scene_from

        rng = np.random.default_rng(11)
        n = 80
        s = _scene_from(
            xyz=rng.normal(size=(n, 3)) * [1.2, 1.2, 0.5],
            rgb=rng.uniform(0.1, 0.9, size=(n, 3)),
            # 20:1 anisotropy; some opacities right at the 1/255 edge.
            scale=np.stack([
                rng.uniform(0.2, 0.4, n),
                rng.uniform(0.01, 0.02, n),
                rng.uniform(0.01, 0.4, n),
            ], 1),
            opacity=np.concatenate([
                rng.uniform(0.003, 0.02, (n // 2, 1)),
                rng.uniform(0.3, 0.95, (n - n // 2, 1)),
            ]),
        )
        cam = _cam(w=96, h=64)
        o = api.render(cam, s, BLACK,
                       settings=api.RasterizeSettings(renderer="oracle"))
        p = api.render(cam, s, BLACK, settings=PALLAS)
        assert not bool(p["overflow"])
        np.testing.assert_allclose(
            np.asarray(p["render"]), np.asarray(o["render"]), atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(p["final_T"]), np.asarray(o["final_T"]), atol=3e-3
        )

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_tiled(self, seed):
        cam = _cam(w=80, h=48)
        s = _random_scene(n=120, seed=seed)
        t = api.render(cam, s, WHITE, settings=TILED)
        p = api.render(cam, s, WHITE, settings=PALLAS)
        assert not bool(p["overflow"])
        np.testing.assert_allclose(
            np.asarray(p["render"]), np.asarray(t["render"]), atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(p["depth"]), np.asarray(t["depth"]), atol=3e-2
        )
        np.testing.assert_allclose(
            np.asarray(p["final_T"]), np.asarray(t["final_T"]), atol=3e-3
        )

    @pytest.mark.parametrize("seed", [0, 1])
    def test_fast_chain_close_to_f32(self, seed):
        """fast_chain=True (bf16 elementwise chain, fwd + bwd) is an
        approximate mode by contract: assert it stays within the bf16
        error class (~0.3% alpha -> ~1e-2 color) of the f32 chain, and
        that gradients (bf16 recompute, f32 reductions) stay close."""
        cam = _cam(w=80, h=48)
        s = _random_scene(n=120, seed=seed)
        fast = PALLAS._replace(fast_chain=True)
        p = api.render(cam, s, WHITE, settings=PALLAS)
        f = api.render(cam, s, WHITE, settings=fast)
        assert not bool(f["overflow"])
        np.testing.assert_allclose(
            np.asarray(f["render"]), np.asarray(p["render"]), atol=3e-2
        )
        np.testing.assert_allclose(
            np.asarray(f["final_T"]), np.asarray(p["final_T"]), atol=3e-2
        )

        # Smooth loss with a target far from the render: an L1 against
        # the render itself would differentiate sign(noise).
        ramp = jnp.linspace(0.0, 1.0, cam.height)[:, None, None]

        def loss(xyz, settings):
            out = api.render(cam, s.replace(xyz=xyz), WHITE,
                             settings=settings)
            return jnp.mean(out["render"] ** 2 * ramp)

        g_ref = jax.grad(loss)(s.xyz, PALLAS)
        g_fast = jax.grad(loss)(s.xyz, fast)
        scale = float(jnp.max(jnp.abs(g_ref))) + 1e-12
        d = np.abs(np.asarray(g_fast) - np.asarray(g_ref)) / scale
        # bf16 error class: per-component noise up to ~10% of the max
        # gradient on isolated splats, but no systematic bias.
        assert d.max() < 0.15, d.max()
        assert d.mean() < 5e-3, d.mean()

    @pytest.mark.parametrize("seed", [0, 3])
    def test_pack_gather_matches_fast_chain(self, seed):
        """pack_gather (serving gather of split-bf16 uint32 pairs) must
        stay within the fast tier's own error class of the plain
        fast_chain render: the only numeric difference is WHERE the bf16
        quantization of the means happens (hi+lo split before the gather
        vs one cast after recentring) — both subpixel."""
        cam = _cam(w=80, h=48)
        s = _random_scene(n=120, seed=seed)
        fast = PALLAS._replace(fast_chain=True)
        packed = PALLAS._replace(fast_chain=True, pack_gather=True)
        f = api.render(cam, s, WHITE, settings=fast)
        g = api.render(cam, s, WHITE, settings=packed)
        assert not bool(g["overflow"])
        np.testing.assert_allclose(
            np.asarray(g["render"]), np.asarray(f["render"]), atol=1.5e-2)
        np.testing.assert_allclose(
            np.asarray(g["final_T"]), np.asarray(f["final_T"]), atol=1.5e-2)
        # Depth magnitudes are O(camera distance); alpha-weight noise of
        # the tier (~1%) scales into it, so the bound is relative.
        np.testing.assert_allclose(
            np.asarray(g["depth"]), np.asarray(f["depth"]),
            rtol=3e-2, atol=3e-2)

    def test_pack_gather_requires_fast_chain(self):
        cam = _cam(w=32, h=32)
        s = _random_scene(n=16, seed=0)
        with pytest.raises(ValueError, match="fast_chain"):
            api.render(cam, s, WHITE,
                       settings=PALLAS._replace(pack_gather=True))

    def test_fast_chain_saturating_scene(self):
        """Early-exit + clamp paths under fast_chain: stacked opaque
        splats (alpha clamps at 0.99, every pixel saturates)."""
        rng = np.random.default_rng(4)
        n = 100
        s = _scene_from(
            xyz=np.concatenate(
                [rng.normal(size=(n, 2)) * 0.05,
                 np.linspace(-1, 1, n)[:, None]], axis=1),
            rgb=rng.uniform(0.2, 1.0, (n, 3)),
            scale=np.full((n, 3), 0.3),
            opacity=np.full((n, 1), 0.95),
        )
        cam = _cam(w=32, h=32)
        p = api.render(cam, s, BLACK, settings=PALLAS)
        f = api.render(cam, s, BLACK,
                       settings=PALLAS._replace(fast_chain=True))
        np.testing.assert_allclose(
            np.asarray(f["render"]), np.asarray(p["render"]), atol=3e-2
        )
        assert float(f["final_T"].min()) < 1e-3

    def test_fast_chain_anisotropic_low_opacity(self):
        """Near-threshold alphas + 20:1 anisotropy under fast_chain:
        the ALPHA_MIN skip and tight-extent paths must not blow up in
        bf16 (bounded absolute error, no NaNs)."""
        rng = np.random.default_rng(11)
        n = 80
        s = _scene_from(
            xyz=rng.normal(size=(n, 3)) * [1.2, 1.2, 0.5],
            rgb=rng.uniform(0.1, 0.9, size=(n, 3)),
            scale=np.stack([
                rng.uniform(0.2, 0.4, n),
                rng.uniform(0.01, 0.02, n),
                rng.uniform(0.01, 0.4, n),
            ], 1),
            opacity=np.concatenate([
                rng.uniform(0.003, 0.02, (n // 2, 1)),
                rng.uniform(0.3, 0.95, (n - n // 2, 1)),
            ]),
        )
        cam = _cam(w=96, h=64)
        p = api.render(cam, s, BLACK, settings=PALLAS)
        f = api.render(cam, s, BLACK,
                       settings=PALLAS._replace(fast_chain=True))
        assert np.isfinite(np.asarray(f["render"])).all()
        np.testing.assert_allclose(
            np.asarray(f["render"]), np.asarray(p["render"]), atol=3e-2
        )

    def test_with_jitter(self):
        cam = _cam(w=32, h=32)
        s = _random_scene(n=50, seed=2)
        off = api.random_sampling_offsets(jax.random.PRNGKey(0), 32, 32)
        t = api.render(cam, s, BLACK, sampling_offsets=off, settings=TILED)
        p = api.render(cam, s, BLACK, sampling_offsets=off, settings=PALLAS)
        np.testing.assert_allclose(
            np.asarray(p["render"]), np.asarray(t["render"]), atol=3e-3
        )

    def test_nonmultiple_size(self):
        cam = _cam(w=50, h=34)
        s = _random_scene(n=60, seed=3)
        p = api.render(cam, s, BLACK, settings=PALLAS)
        t = api.render(cam, s, BLACK, settings=TILED)
        assert p["render"].shape == (34, 50, 3)
        np.testing.assert_allclose(
            np.asarray(p["render"]), np.asarray(t["render"]), atol=3e-3
        )

    def test_saturating_scene_early_exit(self):
        # Many opaque splats stacked: exercises the early-termination path.
        rng = np.random.default_rng(4)
        n = 100
        s = _scene_from(
            xyz=np.concatenate(
                [rng.normal(size=(n, 2)) * 0.05, np.linspace(-1, 1, n)[:, None]],
                axis=1,
            ),
            rgb=rng.uniform(0.2, 1.0, (n, 3)),
            scale=np.full((n, 3), 0.3),
            opacity=np.full((n, 1), 0.95),
        )
        cam = _cam(w=32, h=32)
        t = api.render(cam, s, BLACK, settings=TILED)
        p = api.render(cam, s, BLACK, settings=PALLAS)
        assert float(p["final_T"].min()) < 1e-3  # saturated somewhere
        np.testing.assert_allclose(
            np.asarray(p["render"]), np.asarray(t["render"]), atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(p["final_T"]), np.asarray(t["final_T"]), atol=1e-4
        )


class TestTPULowering:
    """AOT-lower the Pallas kernels for platform='tpu' from the CPU test
    environment (jax.export traces the full pallas->Mosaic-MLIR pipeline
    without a device). Interpret-mode tests cannot catch Mosaic layout /
    dtype lowering failures — this does, before code ever reaches the
    real chip."""

    def _args(self):
        from wast3d_tpu.ops.rasterizer import pallas_blend as pb

        K = 512
        return (
            jnp.zeros((16, K + pb.G), jnp.float32),
            jnp.zeros((8, 256, 2), jnp.float32),
            jnp.zeros((8,), jnp.int32),
            jnp.full((8,), 64, jnp.int32),
        )

    @pytest.mark.parametrize("fast,dtype", [
        (False, jnp.float32),
        (True, jnp.float32),
        (True, jnp.bfloat16),  # bf16-packed fast path
    ])
    def test_blend_fwd_bwd_lower_for_tpu(self, fast, dtype):
        from jax import export

        from wast3d_tpu.ops.rasterizer import pallas_blend as pb

        packed, pixf, starts, ends = self._args()
        packed = packed.astype(dtype)

        def fwd(packed):
            acc, tfin = pb.blend(packed, pixf, starts, ends, 8, False, fast)
            return acc, tfin

        export.export(jax.jit(fwd), platforms=["tpu"])(packed)

        def loss(packed):
            acc, tfin = pb.blend(packed, pixf, starts, ends, 8, False, fast)
            return jnp.sum(acc) + jnp.sum(tfin)

        export.export(jax.jit(jax.grad(loss)), platforms=["tpu"])(packed)

    def test_desc_kernel_lowers_for_tpu(self):
        from jax import export

        from wast3d_tpu.stylize import desc_kernel as dk

        mp = 1024
        x = jnp.zeros((mp, 3), jnp.float32)
        tp = jnp.zeros((mp, 3), jnp.float32)
        code = jnp.zeros((mp, mp), jnp.uint8)

        def loss(x):
            return dk.pair_loss(x, tp, code, 1.0, 200.0)

        export.export(jax.jit(loss), platforms=["tpu"])(x)
        export.export(jax.jit(jax.grad(loss)), platforms=["tpu"])(x)

    @pytest.mark.parametrize("variant", [
        "segment_reduce_by_rank",
        "segment_reduce_by_rank_sortpayload",
        "segment_reduce_by_rank_sortpacked",
    ])
    def test_grad_reduce_lowers_for_tpu(self, variant):
        from jax import export

        from wast3d_tpu.ops.rasterizer import grad_reduce as gr

        fn = getattr(gr, variant)
        K, n1 = 2048, 257
        d = jnp.zeros((K, 10), jnp.float32)
        rank = jnp.zeros((K,), jnp.int32)
        export.export(
            jax.jit(lambda d, r: fn(d, r, n1)), platforms=["tpu"]
        )(d, rank)

    def test_blend_g256_fast_tier_lowers_for_tpu(self):
        """G=256 under the bf16 fast chain (NOTES_PERF r3s3 idea: (P,256)
        bf16 intermediates are 32 vregs again, so the wider chunk may pay
        where f32 G=256 spilled). G is a module constant read from
        WAST3D_BLEND_G at import — exercise it in a subprocess so the
        main test process keeps G=128."""
        import subprocess
        import sys as _sys

        code = (
            "import os\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import jax.numpy as jnp\n"
            "from jax import export\n"
            "from wast3d_tpu.ops.rasterizer import pallas_blend as pb\n"
            "assert pb.G == 256, pb.G\n"
            "K = 512\n"
            "packed = jnp.zeros((16, K + pb.G), jnp.bfloat16)\n"
            "pixf = jnp.zeros((8, 256, 2), jnp.float32)\n"
            "starts = jnp.zeros((8,), jnp.int32)\n"
            "ends = jnp.full((8,), 64, jnp.int32)\n"
            "def loss(p):\n"
            "    acc, tfin = pb.blend(p, pixf, starts, ends, 8, False, True)\n"
            "    return jnp.sum(acc) + jnp.sum(tfin)\n"
            "export.export(jax.jit(loss), platforms=['tpu'])(packed)\n"
            "export.export(jax.jit(jax.grad(loss)), platforms=['tpu'])(packed)\n"
            "print('G256 lowering ok')\n"
        )
        env = dict(os.environ, WAST3D_BLEND_G="256", JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [_sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "G256 lowering ok" in r.stdout

    @pytest.mark.parametrize("fast", [False, True])
    def test_blend_g256_matches_g128(self, fast, tmp_path):
        """Chunk-size independence: the same scene rendered with G=256
        (two-level _scan_dot, NSUB=2) must match G=128 to reassociation
        tolerance, forward and gradients. Guards the G>SUB inclusive
        prefix-scan path before chip-time experiments trust it."""
        import subprocess
        import sys as _sys

        out_npz = tmp_path / "g256.npz"
        code = (
            "import os\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "import sys\n"
            "sys.path.insert(0, %r)\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import jax.numpy as jnp\n"
            "import numpy as np\n"
            "from wast3d_tpu.ops.rasterizer import pallas_blend as pb\n"
            "assert pb.G == 256, pb.G\n"
            "from wast3d_tpu.ops.rasterizer import api\n"
            "from tests.test_rasterizer import _cam, _random_scene, BLACK\n"
            "scene = _random_scene(n=150, seed=5)\n"
            "cam = _cam(w=64, h=64, eye=(0, 0, -4))\n"
            "settings = api.RasterizeSettings(\n"
            "    renderer='pallas', dup_capacity=1 << 13,\n"
            "    pallas_interpret=True, grad_reduce='segsum',\n"
            "    fast_chain=%s)\n"
            "def loss(xyz):\n"
            "    out = api.render(cam, scene.replace(xyz=xyz), BLACK,\n"
            "                     settings=settings)\n"
            "    return jnp.sum(out['render'] * jnp.cos(out['render'])), out\n"
            "(l, out), g = jax.value_and_grad(loss, has_aux=True)(scene.xyz)\n"
            "np.savez(%r, render=np.asarray(out['render']),\n"
            "         depth=np.asarray(out['depth']),\n"
            "         final_T=np.asarray(out['final_T']), grad=np.asarray(g))\n"
            "print('saved')\n"
        ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             fast, str(out_npz))
        env = dict(os.environ, WAST3D_BLEND_G="256", JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [_sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-3000:]

        from wast3d_tpu.ops.rasterizer import pallas_blend as pb

        assert pb.G == 128  # parent process untouched
        from tests.test_rasterizer import _random_scene

        scene = _random_scene(n=150, seed=5)
        cam = _cam(w=64, h=64, eye=(0, 0, -4))
        settings = api.RasterizeSettings(
            renderer="pallas", dup_capacity=1 << 13,
            pallas_interpret=True, grad_reduce="segsum", fast_chain=fast)

        def loss(xyz):
            out = api.render(cam, scene.replace(xyz=xyz), jnp.zeros(3),
                             settings=settings)
            return jnp.sum(out["render"] * jnp.cos(out["render"])), out

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(scene.xyz)
        ref = np.load(out_npz)
        # fast tier: bf16 chain reassociation differs more across chunk
        # widths than the f32 chain does.
        tol = 3e-3 if fast else 3e-5
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   ref["render"], atol=tol)
        np.testing.assert_allclose(np.asarray(out["final_T"]),
                                   ref["final_T"], atol=tol)
        gref = ref["grad"]
        scale = max(np.abs(gref).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(g) / scale, gref / scale,
                                   atol=10 * tol)


class TestGradientParity:
    def _loss(self, cam, scene, settings, field="xyz"):
        target = jnp.zeros((cam.height, cam.width, 3))
        ramp = jnp.linspace(0.0, 1.0, cam.height)[:, None, None]

        def f(x):
            s2 = scene.replace(**{field: x})
            out = api.render(cam, s2, BLACK, settings=settings)
            return jnp.mean((out["render"] - target) ** 2 * ramp) + 0.1 * jnp.mean(
                out["depth"] * ramp[..., 0]
            )

        return f

    @pytest.mark.parametrize("field", ["xyz", "scaling", "opacity", "features_dc"])
    def test_grads_match_tiled(self, field):
        cam = _cam(w=32, h=32)
        s = _random_scene(n=40, seed=5)
        g_t = jax.grad(self._loss(cam, s, TILED, field))(getattr(s, field))
        g_p = jax.grad(self._loss(cam, s, PALLAS, field))(getattr(s, field))
        scale = np.abs(np.asarray(g_t)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(g_p) / scale, np.asarray(g_t) / scale, atol=2e-3,
            err_msg=field,
        )

    def test_grads_with_saturation(self):
        # Early-exit path in backward: zero grads for occluded entries.
        rng = np.random.default_rng(6)
        n = 60
        s = _scene_from(
            xyz=np.concatenate(
                [rng.normal(size=(n, 2)) * 0.05, np.linspace(-1, 1, n)[:, None]],
                axis=1,
            ),
            rgb=rng.uniform(0.2, 1.0, (n, 3)),
            scale=np.full((n, 3), 0.3),
            opacity=np.full((n, 1), 0.95),
        )
        cam = _cam(w=32, h=32)
        g_t = jax.grad(self._loss(cam, s, TILED))(s.xyz)
        g_p = jax.grad(self._loss(cam, s, PALLAS))(s.xyz)
        scale = np.abs(np.asarray(g_t)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(g_p) / scale, np.asarray(g_t) / scale, atol=3e-3
        )

    def test_finite_difference(self):
        # quad_power off: the quad path's bf16-quantized expansion
        # coefficients make the forward piecewise-flat at ~1e-3 position
        # scales, so central differences of its TINY gradients are
        # meaningless (the analytic VJP recomputes the direct form
        # either way — see RasterizeSettings.quad_power).
        cam = _cam(w=16, h=16)
        s = _scene_from([[0.1, -0.1, 0]], [[0.9, 0.3, 0.5]], [[0.4] * 3], [[0.7]])
        f = self._loss(cam, s, PALLAS._replace(quad_power=False))
        g = np.asarray(jax.grad(f)(s.xyz))
        eps = 1e-3
        for dim in range(3):
            e = np.zeros_like(np.asarray(s.xyz))
            e[0, dim] = eps
            fd = (float(f(s.xyz + e)) - float(f(s.xyz - e))) / (2 * eps)
            np.testing.assert_allclose(g[0, dim], fd, rtol=3e-2, atol=1e-5)

    def test_quad_power_matches_direct(self):
        """Exact-tier quad-form MXU power (triple-split coefficients)
        must track the direct f32 chain within the exact tier's own
        split-bf16 class on renders AND pallas-vs-pallas grads."""
        cam = _cam(w=80, h=48)
        from tests.test_pallas_blend import _random_scene  # self-import ok
        s = _random_scene(n=120, seed=2)
        on = api.render(cam, s, WHITE, settings=PALLAS)
        off = api.render(cam, s, WHITE,
                         settings=PALLAS._replace(quad_power=False))
        np.testing.assert_allclose(
            np.asarray(on["render"]), np.asarray(off["render"]), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(on["final_T"]), np.asarray(off["final_T"]), atol=2e-4)

        ramp = jnp.linspace(0.0, 1.0, cam.height)[:, None, None]

        def loss(xyz, settings):
            out = api.render(cam, s.replace(xyz=xyz), WHITE,
                             settings=settings)
            return jnp.mean(out["render"] ** 2 * ramp)

        g_on = np.asarray(jax.grad(loss)(s.xyz, PALLAS))
        g_off = np.asarray(
            jax.grad(loss)(s.xyz, PALLAS._replace(quad_power=False)))
        scale = np.abs(g_off).max() + 1e-12
        assert (np.abs(g_on - g_off) / scale).max() < 2e-3
