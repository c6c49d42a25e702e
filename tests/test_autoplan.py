"""Scene-adaptive emission-plan tuning (ops/rasterizer/autoplan.py).

The tuner may only change STATIC capacities — never rendered pixels or
overflow behavior on the probed cameras. Reference semantics anchor:
the CUDA pipeline sizes its buffers dynamically per frame
(`rasterizer_impl.cu:198-343`), so any feasible static plan must be
output-equivalent; these tests pin that equivalence.
"""

import jax.numpy as jnp
import numpy as np

from tests.test_train import _mini_scene
from wast3d_tpu.core.camera import look_at_camera
from wast3d_tpu.ops.rasterizer import api
from wast3d_tpu.ops.rasterizer.autoplan import (
    _padded, synthesize_plan, tune_serving_settings)


def _cams(width=128, height=128):
    return [
        look_at_camera(eye=[x, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
                       fovx=0.9, fovy=0.9, width=width, height=height)
        for x in (0.0, 1.0, -0.5)
    ]


class TestSynthesize:
    def test_budgets_hold_demand_with_margin(self):
        n = 10_000
        need = {t: max(0, int(n * 0.2) >> i)
                for i, t in enumerate(sorted({
                    s for ra in (2, 3, 4, 6, 8)
                    for s in [ra * (1 << k) for k in range(10)] if s < 64
                }))}
        # Fill every threshold the synthesizer may ask for.
        full = {}
        for ra in (2, 3, 4, 6, 8):
            s = ra
            while s < 64:
                full[s] = need.get(s, max(v for t, v in need.items()
                                          if t <= s) if need else 0)
                s *= 2
        plan = synthesize_plan(n, full, 64, band_margin=1.5)
        assert plan[0][2] is None and plan[0][0] == 0
        covered = plan[0][1]
        for start, extra, budget in plan[1:]:
            assert start == covered  # contiguous bands
            assert budget >= 1.5 * full[start] or budget >= n
            covered += extra
        assert covered >= 64  # full coverage up to the rect ceiling

    def test_prefers_smaller_padded_grid(self):
        # Zero demand everywhere: every band costs its 8-slot floor, so
        # the smallest ra wins the padded-grid tiebreak.
        full = {}
        for ra in (2, 3, 4, 6, 8):
            s = ra
            while s < 512:
                full[s] = 0
                s *= 2
        plan = synthesize_plan(200_000, full, 512, band_margin=1.5)
        ra = plan[0][1]
        assert ra == 2
        total = 200_000 * ra + sum(e * b for _, e, b in plan[1:])
        assert _padded(total) == 1 << 19


class TestTuneServing:
    def test_tuned_render_identical_and_overflow_free(self):
        scene = _mini_scene(n=300, cap=512)
        cams = _cams()
        base = api.RasterizeSettings(
            renderer="pallas", pallas_interpret=True,
            dup_capacity=1 << 14, chunk=16)
        tuned = tune_serving_settings(scene, cams, base)
        assert tuned.phase_plan, "tuner returned no explicit plan"
        assert tuned.dup_capacity <= base.dup_capacity
        bg = jnp.zeros(3)
        for cam in cams:
            o0 = api.render(cam, scene, bg, settings=base)
            o1 = api.render(cam, scene, bg, settings=tuned)
            assert not bool(o1["overflow"])
            np.testing.assert_array_equal(
                np.asarray(o0["render"]), np.asarray(o1["render"]))

    def test_tuned_plan_shrinks_static_shapes(self):
        # The mini scene's splats are small: the tuned plan's emission
        # grid and capacity must undercut the knob defaults.
        scene = _mini_scene(n=300, cap=512)
        base = api.RasterizeSettings(renderer="tiled", dup_capacity=1 << 14)
        tuned = tune_serving_settings(scene, _cams(), base)
        grid = (300 * tuned.phase_plan[0][1]
                + sum(e * b for _, e, b in tuned.phase_plan[1:]))
        default_grid = 300 * 6 + 256 * 506  # knob-default fat plan floor
        assert grid < default_grid
        assert tuned.dup_capacity < base.dup_capacity


    def test_cap_quantile_monotone_and_safe(self):
        # cap_quantile sizes dup_capacity from a quantile of the probed
        # per-camera duplicate counts: q=0 (min view) <= q=1 (worst
        # view), and a q=1 tuning stays overflow-free on every probed
        # camera (q<1 may legitimately overflow fat views - that is the
        # caller's fallback path).
        scene = _mini_scene(n=300, cap=512)
        cams = _cams()
        base = api.RasterizeSettings(
            renderer="pallas", pallas_interpret=True,
            dup_capacity=1 << 14, chunk=16)
        t_lo = tune_serving_settings(scene, cams, base, cap_quantile=0.0)
        t_med = tune_serving_settings(scene, cams, base, cap_quantile=0.5)
        t_hi = tune_serving_settings(scene, cams, base, cap_quantile=1.0)
        assert t_lo.dup_capacity <= t_med.dup_capacity <= t_hi.dup_capacity
        bg = jnp.zeros(3)
        for cam in cams:
            assert not bool(
                api.render(cam, scene, bg, settings=t_hi)["overflow"])

    def test_rect_ceiling_shrinks_to_probed_envelope(self):
        # Small splats never straddle anywhere near 512 tiles: the tuner
        # must shrink max_tiles_per_gaussian to pow2(peak*1.5) so the
        # high bands (and the floor band's slots) vanish, while renders
        # on the probed cameras stay exact and overflow-free.
        scene = _mini_scene(n=300, cap=512)
        cams = _cams()
        base = api.RasterizeSettings(
            renderer="pallas", pallas_interpret=True,
            dup_capacity=1 << 14, chunk=16)
        tuned = tune_serving_settings(scene, cams, base)
        assert tuned.max_tiles_per_gaussian < base.max_tiles_per_gaussian
        covered = tuned.phase_plan[0][1] + sum(
            e for _, e, _ in tuned.phase_plan[1:])
        assert covered >= tuned.max_tiles_per_gaussian
        o = api.render(cams[0], scene, jnp.zeros(3), settings=tuned)
        assert not bool(o["overflow"])

    def test_empty_cameras_returns_base(self):
        scene = _mini_scene(n=10, cap=16)
        base = api.RasterizeSettings()
        assert tune_serving_settings(scene, [], base) is base
