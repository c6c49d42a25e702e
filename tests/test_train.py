"""Training-stack tests: losses, Adam parity, densification surgery,
sphere regularizers, and an end-to-end reconstruction smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.config import OptimizationConfig, SphereConfig
from wast3d_tpu.core import camera as cam_mod
from wast3d_tpu.ops import image_losses as IL
from wast3d_tpu.ops.rasterizer import api as raster_api
from wast3d_tpu.scene import gaussians as G
from wast3d_tpu.train import densify as D
from wast3d_tpu.train import reconstruct as R
from wast3d_tpu.train.optim import make_optimizer
from wast3d_tpu.train import spheres as SP


class TestImageLosses:
    def test_ssim_identical(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 32, 3)), jnp.float32)
        assert float(IL.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_torch_reference(self):
        # Cross-check against the reference implementation run via torch (CPU).
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from math import exp

        def t_gauss(ws, sigma):
            g = torch.tensor([exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)])
            return g / g.sum()

        def t_ssim(i1, i2, ws=11):
            # reference utils/loss_utils.py:24-64 (re-derived, CHW)
            ch = i1.size(0)
            _1d = t_gauss(ws, 1.5).unsqueeze(1)
            _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
            w = _2d.expand(ch, 1, ws, ws).contiguous()
            i1, i2 = i1.unsqueeze(0), i2.unsqueeze(0)
            mu1 = F.conv2d(i1, w, padding=ws // 2, groups=ch)
            mu2 = F.conv2d(i2, w, padding=ws // 2, groups=ch)
            m1s, m2s, m12 = mu1**2, mu2**2, mu1 * mu2
            s1 = F.conv2d(i1 * i1, w, padding=ws // 2, groups=ch) - m1s
            s2 = F.conv2d(i2 * i2, w, padding=ws // 2, groups=ch) - m2s
            s12 = F.conv2d(i1 * i2, w, padding=ws // 2, groups=ch) - m12
            C1, C2 = 0.01**2, 0.03**2
            return (((2 * m12 + C1) * (2 * s12 + C2)) /
                    ((m1s + m2s + C1) * (s1 + s2 + C2))).mean().item()

        rng = np.random.default_rng(1)
        a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
        ours = float(IL.ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = t_ssim(torch.tensor(a).permute(2, 0, 1), torch.tensor(b).permute(2, 0, 1))
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(float(IL.psnr(a, b)), 20.0, rtol=1e-5)

    def test_tv(self):
        img = jnp.zeros((4, 4)).at[2:, :].set(1.0)
        # dy has one row of ones (of 3 rows) -> mean|dy| 1/3; dx = 0.
        # Reference's effective tv_loss = 0.5*(mean|dy| + mean|dx|) = 1/6.
        np.testing.assert_allclose(float(IL.tv_loss(img)), 1.0 / 6.0, rtol=1e-6)
        np.testing.assert_allclose(float(IL.tv_loss_sq(img)), 1.0 / 3.0, rtol=1e-6)


class TestAdamParity:
    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(16, 3)).astype(np.float32)
        gs = [rng.normal(size=(16, 3)).astype(np.float32) for _ in range(5)]

        # torch groups lr: use scaling group's lr 0.005
        xt = torch.tensor(x0, requires_grad=True)
        opt_t = torch.optim.Adam([xt], lr=0.005, eps=1e-15)
        for g in gs:
            opt_t.zero_grad()
            xt.grad = torch.tensor(g)
            opt_t.step()

        cfg = OptimizationConfig()
        opt = make_optimizer(cfg, spatial_lr_scale=1.0)
        params = {k: jnp.zeros((16, 3)) for k in
                  ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")}
        params["scaling"] = jnp.asarray(x0)
        state = opt.init(params)
        for g in gs:
            grads = {k: jnp.zeros_like(v) for k, v in params.items()}
            grads["scaling"] = jnp.asarray(g)
            params, state = opt.update(grads, state, params)
        np.testing.assert_allclose(
            np.asarray(params["scaling"]), xt.detach().numpy(), atol=1e-6
        )

    def test_xyz_schedule_applied(self):
        cfg = OptimizationConfig()
        opt = make_optimizer(cfg, spatial_lr_scale=2.0)
        assert float(opt.lr_fns["xyz"](0)) == pytest.approx(cfg.position_lr_init * 2.0, rel=1e-5)
        assert float(opt.lr_fns["xyz"](cfg.position_lr_max_steps)) == pytest.approx(
            cfg.position_lr_final * 2.0, rel=1e-4
        )
        assert float(opt.lr_fns["f_rest"](0)) == pytest.approx(cfg.feature_lr / 20.0)


def _mini_scene(n=20, seed=0, cap=64):
    rng = np.random.default_rng(seed)
    from wast3d_tpu.core.sh import rgb_to_sh
    from wast3d_tpu.core.transforms import inverse_sigmoid
    return G.from_arrays(
        xyz=rng.normal(size=(n, 3)).astype(np.float32) * 0.5,
        features_dc=np.asarray(rgb_to_sh(jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32)))[:, None, :],
        features_rest=np.zeros((n, 15, 3), np.float32),
        scaling=np.log(rng.uniform(0.05, 0.3, (n, 3))).astype(np.float32),
        rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        opacity=np.asarray(inverse_sigmoid(jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)), jnp.float32))),
        capacity=cap,
    )


class TestDensify:
    def _setup(self, n=20, cap=64):
        scene = _mini_scene(n=n, cap=cap)
        cfg = OptimizationConfig()
        opt = make_optimizer(cfg, 1.0)
        opt_state = opt.init(scene.params())
        stats = D.init_stats(cap)
        return scene, opt_state, stats

    def test_clone_small_high_grad(self):
        scene, opt_state, stats = self._setup()
        # All scales small (<= percent_dense * extent with extent huge);
        # give gaussian 3 a high positional gradient.
        stats = stats._replace(
            xyz_gradient_accum=stats.xyz_gradient_accum.at[3].set(1.0),
            denom=stats.denom.at[:20].set(1.0),
        )
        s2, o2, st2, dropped = D.densify_and_prune(
            scene, opt_state, stats, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.005, extent=100.0,
            max_screen_size=0.0, percent_dense=0.1,
        )
        assert int(s2.num_active) == 21  # one clone
        assert int(dropped) == 0
        # Clone landed in first free slot (index 20) with identical params.
        np.testing.assert_allclose(np.asarray(s2.xyz[20]), np.asarray(scene.xyz[3]))
        # Moments zeroed at the new slot.
        assert float(jnp.abs(o2.mu["xyz"][20]).max()) == 0.0
        # Stats reset.
        assert float(st2.xyz_gradient_accum.max()) == 0.0

    def test_split_large_high_grad(self):
        scene, opt_state, stats = self._setup()
        stats = stats._replace(
            xyz_gradient_accum=stats.xyz_gradient_accum.at[5].set(1.0),
            denom=stats.denom.at[:20].set(1.0),
        )
        # extent tiny -> gaussian 5's scale > percent_dense*extent -> split
        s2, o2, st2, dropped = D.densify_and_prune(
            scene, opt_state, stats, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.005, extent=1e-6,
            max_screen_size=0.0, percent_dense=0.1,
        )
        # Source died, 2 children born: 20 - 1 + 2 = 21
        assert int(s2.num_active) == 21
        assert not bool(s2.mask[5])
        # Children have scale / 1.6 (log-space -log(1.6)).
        for slot in (20, 21):
            assert bool(s2.mask[slot])
            np.testing.assert_allclose(
                np.asarray(s2.scaling[slot]),
                np.asarray(scene.scaling[5]) - np.log(1.6),
                rtol=1e-5,
            )

    def test_prune_transparent(self):
        scene, opt_state, stats = self._setup()
        scene = scene.replace(opacity=scene.opacity.at[7].set(-20.0))
        s2, *_ = D.densify_and_prune(
            scene, opt_state, stats, jax.random.PRNGKey(0),
            max_grad=1e9, min_opacity=0.005, extent=100.0,
            max_screen_size=0.0, percent_dense=0.1,
        )
        assert int(s2.num_active) == 19
        assert not bool(s2.mask[7])
        assert float(s2.xyz[7, 0]) == G.DEAD_XYZ  # parked

    def test_capacity_overflow_reported(self):
        scene, opt_state, stats = self._setup(n=60, cap=64)
        stats = stats._replace(
            xyz_gradient_accum=stats.xyz_gradient_accum.at[:60].set(1.0),
            denom=stats.denom.at[:60].set(1.0),
        )
        s2, _, _, dropped = D.densify_and_prune(
            scene, opt_state, stats, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.005, extent=100.0,
            max_screen_size=0.0, percent_dense=0.1,
        )
        assert int(dropped) > 0
        assert int(s2.num_active) == 64  # filled to capacity, no corruption

    def test_reset_opacity(self):
        scene, opt_state, _ = self._setup()
        s2, o2 = D.reset_opacity(scene, opt_state)
        op = np.asarray(s2.get_opacity)[np.asarray(scene.mask)]
        assert op.max() <= 0.01 + 1e-6
        assert float(jnp.abs(o2.mu["opacity"]).max()) == 0.0


class TestSpheres:
    def test_isotropy_zero_for_isotropic(self):
        scene = _mini_scene()
        iso = scene.replace(scaling=jnp.broadcast_to(scene.scaling[:, :1], scene.scaling.shape))
        assert float(SP.scaling_isotropy_loss(iso.scaling, iso.mask)) < 1e-5
        assert float(SP.scaling_isotropy_loss(scene.scaling, scene.mask)) > 1e-3

    def test_uniformity_ignores_dead_slots(self):
        scene = _mini_scene(n=20, cap=64)
        # Same log-scale for every ACTIVE gaussian -> uniformity ~ 0 even
        # though dead slots hold zeros.
        uni = scene.replace(scaling=jnp.where(scene.mask[:, None], -2.0, 123.0))
        assert float(SP.scaling_uniformity_loss(uni.scaling, uni.mask)) < 1e-4

    def test_anisotropy_hinge(self):
        scene = _mini_scene()
        iso = scene.replace(scaling=jnp.zeros_like(scene.scaling))
        assert float(SP.scaling_anisotropy_loss(iso.scaling, iso.mask, 1.3)) == 0.0

    def test_regularizer_differentiable(self):
        scene = _mini_scene()
        cfg = SphereConfig()
        g = jax.grad(lambda s: SP.sphere_regularizer(scene.replace(scaling=s), cfg))(
            scene.scaling
        )
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestEndToEnd:
    def test_reconstruction_smoke(self):
        """BASELINE config-1 style CPU smoke: random splats fit 3 views of a
        target scene; loss must fall substantially and densify must run."""
        rng = np.random.default_rng(0)
        target_scene = _mini_scene(n=30, seed=1, cap=64)
        cams = []
        settings = raster_api.RasterizeSettings(
            renderer="tiled", dup_capacity=1 << 12, max_per_tile=128, chunk=16
        )
        for i, eye in enumerate([(0, 0, -4), (3, 1, -3), (-3, -1, -3)]):
            cam = cam_mod.look_at_camera(
                eye=list(eye), target=[0, 0, 0], up=[0, -1, 0],
                fovx=0.9, fovy=0.9, width=48, height=48, uid=i,
            )
            gt = raster_api.render(cam, target_scene, jnp.zeros(3), settings=settings)["render"]
            cams.append((cam, gt))

        start_scene = _mini_scene(n=30, seed=2, cap=64)
        cfg = OptimizationConfig(
            densify_from_iter=10, densification_interval=25,
            densify_grad_threshold=5e-3, opacity_reset_interval=10_000,
        )
        state = R.init_train_state(start_scene, cfg, spatial_lr_scale=1.0)
        trainer = R.Trainer(
            state, cams, opt_cfg=cfg, settings=settings,
            cameras_extent=4.0, jitter=False,
        )
        # measure initial loss
        out0 = raster_api.render(cams[0][0], start_scene, jnp.zeros(3), settings=settings)
        l0 = float(jnp.mean(jnp.abs(out0["render"] - cams[0][1])))
        trainer.run(200, log_every=20)
        s_end = trainer.state.scene
        out1 = raster_api.render(cams[0][0], s_end, jnp.zeros(3), settings=settings)
        l1 = float(jnp.mean(jnp.abs(out1["render"] - cams[0][1])))
        assert l1 < 0.5 * l0, (l0, l1)
        assert int(trainer.state.step) == 200
        assert np.isfinite(np.asarray(s_end.xyz[np.asarray(s_end.mask)])).all()

    def test_data_device_cpu_trains(self):
        """data_device='cpu' (the reference's escape hatch for captures
        too large to pin in HBM) keeps GT on host as numpy and still
        trains identically — the jitted step just re-transfers per
        iteration."""
        target_scene = _mini_scene(n=20, seed=1, cap=64)
        settings = raster_api.RasterizeSettings(
            renderer="tiled", dup_capacity=1 << 11, max_per_tile=64, chunk=16
        )
        cam = cam_mod.look_at_camera(
            eye=[0, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
            fovx=0.9, fovy=0.9, width=32, height=32, uid=0,
        )
        gt = raster_api.render(cam, target_scene, jnp.zeros(3),
                               settings=settings)["render"]
        cfg = OptimizationConfig(densify_from_iter=10_000)
        start = _mini_scene(n=20, seed=2, cap=64)

        losses = {}
        for dd in ("tpu", "cpu"):
            trainer = R.Trainer(
                R.init_train_state(start, cfg, 1.0), [(cam, gt)],
                opt_cfg=cfg, settings=settings, cameras_extent=4.0,
                jitter=False, data_device=dd,
            )
            if dd == "cpu":
                assert isinstance(trainer.cameras[0][1], np.ndarray)
            trainer.run(5)
            losses[dd] = [h["loss"] for h in trainer.history if "loss" in h]
        np.testing.assert_allclose(losses["cpu"], losses["tpu"],
                                   rtol=1e-6, atol=1e-8)

    def test_sphere_training_shrinks_anisotropy(self):
        scene = _mini_scene(n=30, seed=3, cap=64)
        cam = cam_mod.look_at_camera(
            eye=[0, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
            fovx=0.9, fovy=0.9, width=32, height=32,
        )
        settings = raster_api.RasterizeSettings(
            renderer="tiled", dup_capacity=1 << 12, max_per_tile=128, chunk=16
        )
        gt = raster_api.render(cam, scene, jnp.zeros(3), settings=settings)["render"]
        cfg = OptimizationConfig(densify_from_iter=10**9)
        sphere_cfg = SphereConfig(lambda_isotropy=1.0, lambda_uniformity=0.1)
        state = R.init_train_state(scene, cfg, 1.0)
        iso0 = float(SP.scaling_isotropy_loss(scene.scaling, scene.mask))
        trainer = R.Trainer(state, [(cam, gt)], opt_cfg=cfg, settings=settings,
                            sphere_cfg=sphere_cfg, jitter=False)
        trainer.run(60)
        iso1 = float(SP.scaling_isotropy_loss(trainer.state.scene.scaling,
                                              trainer.state.scene.mask))
        assert iso1 < 0.5 * iso0

class TestTrainerGrowthHandling:
    """Round-2 fixes: silent overflow / dropped densify candidates must be
    surfaced and auto-handled by the host loop (advisor + verdict r1)."""

    def _tiny_setup(self, dup_capacity, cap=128, n=100):
        import wast3d_tpu.train.reconstruct as R
        from wast3d_tpu.config import OptimizationConfig
        from wast3d_tpu.core.camera import look_at_camera
        from wast3d_tpu.ops.rasterizer import api

        scene = _mini_scene(n=n, cap=cap)
        cam = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
                             fovx=0.9, fovy=0.9, width=32, height=32)
        gt = jnp.ones((32, 32, 3), jnp.float32) * 0.5
        cfg = OptimizationConfig(
            densify_from_iter=1, densify_until_iter=1000,
            densification_interval=2, opacity_reset_interval=10000,
            densify_grad_threshold=1e-9,  # everything densifies
        )
        settings = api.RasterizeSettings(
            renderer="tiled", dup_capacity=dup_capacity, max_per_tile=64,
            chunk=16,
        )
        tr = R.Trainer(
            R.init_train_state(scene, cfg, 1.0), [(cam, gt)],
            opt_cfg=cfg, settings=settings, cameras_extent=1.0,
        )
        return tr

    def test_dup_capacity_overflow_grows(self):
        # dup_capacity far too small for 100 gaussians covering the frame:
        # the trainer must detect aux["overflow"] and double dup_capacity.
        tr = self._tiny_setup(dup_capacity=16)
        tr.run(4)
        grow_events = [h for h in tr.history
                       if h.get("event") == "raster_capacity_grow"]
        assert grow_events, "overflow never surfaced/handled"
        # 32x32 frame = 4 tiles, every rect <= 4 <= phase_a_tiles: the
        # truncation is prefix-capacity, so the DUP knob must grow (not
        # the emission budget).
        assert tr.settings.dup_capacity > 16
        assert all("dup_capacity" in h for h in grow_events)

    def test_dropped_densify_grows_and_retries(self):
        # Fill below the 75% pre-grow threshold (so _maybe_grow stays
        # quiet) but with a clone/split burst larger than free capacity:
        # the first densify call must report drops -> grow + retry.
        tr = self._tiny_setup(dup_capacity=1 << 12, cap=144, n=100)
        tr.run(4)
        retry_events = [h for h in tr.history if h.get("event") == "capacity_grow_retry"]
        assert retry_events, "dropped candidates were silently discarded"
        assert tr.state.scene.capacity > 144


class TestOverflowGrowthMapping:
    """The shared schedule grows the knob that can actually clear each
    overflow cause (ADVICE r2: rect-cap overflow must not double
    phase_a_tiles forever)."""

    def _upd(self, aux, **settings_kw):
        from wast3d_tpu.ops.rasterizer.api import RasterizeSettings
        from wast3d_tpu.train.schedule import overflow_growth_update

        return overflow_growth_update(RasterizeSettings(**settings_kw), aux)

    def test_rect_overflow_grows_rect_ceiling(self):
        upd = self._upd({"overflow": True, "overflow_emit": False,
                         "overflow_rect": True})
        assert upd == {"max_tiles_per_gaussian": 1024}

    def test_emit_overflow_capped_at_rect_ceiling(self):
        # phase_a at the ceiling: doubling is a no-op; must not loop.
        upd = self._upd(
            {"overflow": True, "overflow_emit": True, "overflow_rect": False},
            renderer="pallas", phase_a_tiles=512, max_tiles_per_gaussian=512,
        )
        assert upd is None or "phase_a_tiles" not in upd

    def test_plain_overflow_grows_dup_capacity(self):
        upd = self._upd({"overflow": True, "overflow_emit": False,
                         "overflow_rect": False}, dup_capacity=1 << 10)
        assert upd == {"dup_capacity": 1 << 11}

    def test_route_overflow_grows_explicit_route_capacity(self):
        upd = self._upd(
            {"overflow": True, "overflow_emit": False,
             "overflow_rect": False, "overflow_route": True},
            route_capacity=256,
        )
        assert upd == {"route_capacity": 512}

    def test_route_overflow_auto_grows_dup(self):
        upd = self._upd(
            {"overflow": True, "overflow_emit": False,
             "overflow_rect": False, "overflow_route": True},
            dup_capacity=1 << 10, route_capacity=0,
        )
        assert upd == {"dup_capacity": 1 << 11}

    def test_no_overflow_no_update(self):
        assert self._upd({"overflow": False}) is None
