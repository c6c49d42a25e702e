"""Binning multi-phase emission: coverage, ordering, capacity semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.rasterizer import binning as bm


def _bin(means2d, depths, radii, w=800, h=800, **kw):
    return bm.bin_gaussians(
        jnp.asarray(means2d, jnp.float32), jnp.asarray(depths, jnp.float32),
        jnp.asarray(radii, jnp.int32), w, h, dup_capacity=kw.pop("cap", 0), **kw
    )


class TestPhases:
    def test_small_splats_fully_covered(self):
        rng = np.random.default_rng(0)
        n = 256
        means = rng.uniform(50, 750, (n, 2))
        radii = np.full(n, 10)  # rect <= 4 tiles
        b = _bin(means, rng.uniform(1, 5, n), radii)
        assert not bool(b.overflow)
        # Each splat lands in 1..9 tiles (r=10 can straddle 3 tile rows).
        total = int(b.num_duplicates)
        assert n <= total <= 9 * n  # r=10 spans up to 3x3 tiles

    def test_huge_splat_gets_full_rect(self):
        # One screen-filling splat among small ones: with the phase ladder
        # it covers its whole rect (up to the 512-tile ceiling).
        n = 256
        rng = np.random.default_rng(1)
        means = rng.uniform(100, 700, (n, 2))
        radii = np.full(n, 8)
        means[0] = [400, 400]
        radii[0] = 180  # rect ~ (2*180/16)^2 ~ 23x23 = 529 > 512 -> overflow
        b = _bin(means, rng.uniform(1, 5, n), radii)
        assert bool(b.overflow)  # exceeds the default ceiling -> flagged
        b2 = _bin(means, rng.uniform(1, 5, n), radii,
                  max_tiles_per_gaussian=4096)
        assert not bool(b2.overflow)
        # The big splat contributes its whole rect.
        assert int(b2.num_duplicates) >= 500

    def test_depth_order_within_tile_across_phases(self):
        # A big splat (phase B) nearer than small splats (phase A) in the
        # same tile must come FIRST in the tile's list.
        means = np.array([[100.0, 100.0], [100.0, 100.0], [104.0, 104.0]])
        radii = np.array([60, 5, 5])  # splat 0 is big (rect > 8 tiles)
        depths = np.array([1.0, 2.0, 3.0])  # big one nearest
        b = _bin(means, depths, radii, w=320, h=320)
        tile = (100 // 16) * 20 + (100 // 16)
        s, e = int(b.tile_start[tile]), int(b.tile_end[tile])
        entries = np.asarray(b.gauss_idx[s:e])
        assert list(entries) == [0, 1, 2]  # depth order preserved

    def test_capacity_prefix_slice(self):
        rng = np.random.default_rng(2)
        n = 512
        means = rng.uniform(50, 750, (n, 2))
        radii = np.full(n, 20)
        depths = rng.uniform(1, 5, n)
        full = _bin(means, depths, radii)
        total = int(full.num_duplicates)
        capped = _bin(means, depths, radii, cap=total // 2)
        assert bool(capped.overflow)
        assert capped.gauss_idx.shape[0] == total // 2
        # The retained prefix matches the uncapped result.
        np.testing.assert_array_equal(
            np.asarray(capped.gauss_idx),
            np.asarray(full.gauss_idx[: total // 2]),
        )

    def test_matches_oracle_rect_membership(self):
        # Every (gaussian, tile) pair in the lists is inside the gaussian's
        # rect, and every in-rect pair is present (no ceiling hit).
        rng = np.random.default_rng(3)
        n = 64
        means = rng.uniform(40, 280, (n, 2))
        radii = rng.integers(4, 40, n)
        depths = rng.uniform(1, 5, n)
        b = _bin(means, depths, radii, w=320, h=320)
        assert not bool(b.overflow)
        gx, gy = bm.tile_grid(320, 320)
        xmin, ymin, xmax, ymax = (np.asarray(v) for v in bm.compute_rects(
            jnp.asarray(means, jnp.float32), jnp.asarray(radii, jnp.int32), gx, gy))
        expected = set()
        for i in range(n):
            for ty in range(ymin[i], ymax[i]):
                for tx in range(xmin[i], xmax[i]):
                    expected.add((i, ty * gx + tx))
        got = set()
        starts, ends = np.asarray(b.tile_start), np.asarray(b.tile_end)
        gauss = np.asarray(b.gauss_idx)
        for t in range(gx * gy):
            for k in range(starts[t], ends[t]):
                got.add((int(gauss[k]), t))
        assert got == expected


class TestTwoKeyFallback:
    def test_two_key_sort_matches_packed(self):
        """The 2-key fallback (taken when (num_tiles+1)*N > 2^32 — the
        4M-Gaussian / config-4 regime) must produce the same sorted
        lists, ranges, and overflow flags as the packed-uint32 path."""
        rng = np.random.default_rng(9)
        n = 96
        means = rng.uniform(20, 300, (n, 2))
        radii = rng.integers(2, 50, n)
        depths = rng.uniform(1, 6, n)
        a = _bin(means, depths, radii, w=320, h=320, cap=4096)
        b = _bin(means, depths, radii, w=320, h=320, cap=4096,
                 _force_two_key=True)
        np.testing.assert_array_equal(np.asarray(a.tile_start),
                                      np.asarray(b.tile_start))
        np.testing.assert_array_equal(np.asarray(a.tile_end),
                                      np.asarray(b.tile_end))
        # Within the valid prefix, identical duplicates in identical order.
        k = int(np.asarray(a.tile_end)[-1])
        np.testing.assert_array_equal(np.asarray(a.gauss_idx)[:k],
                                      np.asarray(b.gauss_idx)[:k])
        np.testing.assert_array_equal(np.asarray(a.rank)[:k],
                                      np.asarray(b.rank)[:k])
        np.testing.assert_array_equal(np.asarray(a.tile_of_dup)[:k],
                                      np.asarray(b.tile_of_dup)[:k])
        for f in ("overflow", "overflow_emit", "overflow_dup",
                  "overflow_rect"):
            assert bool(getattr(a, f)) == bool(getattr(b, f)), f

    def test_two_key_dup_truncation(self):
        rng = np.random.default_rng(10)
        n = 64
        means = rng.uniform(40, 280, (n, 2))
        radii = rng.integers(8, 40, n)
        depths = rng.uniform(1, 5, n)
        full = _bin(means, depths, radii, w=320, h=320,
                    _force_two_key=True)
        total = int(np.asarray(full.num_duplicates))
        cut = _bin(means, depths, radii, w=320, h=320, cap=total // 2,
                   _force_two_key=True)
        assert bool(cut.overflow_dup)
        assert not bool(cut.overflow_emit)


class TestOverflowCauses:
    def test_dup_truncation_flags_dup_not_emit(self):
        rng = np.random.default_rng(5)
        n = 256
        means = rng.uniform(50, 750, (n, 2))
        radii = np.full(n, 10)  # <= 9 tiles, within default budgets
        depths = rng.uniform(1, 5, n)
        full = _bin(means, depths, radii)
        total = int(full.num_duplicates)
        capped = _bin(means, depths, radii, cap=total // 2)
        assert bool(capped.overflow_dup)
        assert not bool(capped.overflow_emit)
        assert bool(capped.overflow)

    def test_phase_budget_flags_emit_not_dup(self):
        # 512 splats ALL wanting > phase_a tiles, but the phase-B budget is
        # max(256, n//16) = 256 slots: emission truncation, no dup cap.
        rng = np.random.default_rng(6)
        n = 512
        means = rng.uniform(100, 700, (n, 2))
        radii = np.full(n, 40)  # rect ~ 6x6 = 36 tiles > phase_a 8
        depths = rng.uniform(1, 5, n)
        b = _bin(means, depths, radii)
        assert bool(b.overflow_emit)
        assert not bool(b.overflow_dup)
        assert bool(b.overflow)

    def test_trainer_grows_phase_a_on_emit_overflow(self):
        import jax.numpy as jnp

        import wast3d_tpu.train.reconstruct as R
        from tests.test_train import _mini_scene
        from wast3d_tpu.config import OptimizationConfig
        from wast3d_tpu.core.camera import look_at_camera
        from wast3d_tpu.ops.rasterizer import api

        # 300 splats each covering ~4 tiles with phase_a_tiles=1: the
        # phase-B budget (256) can't hold all 300, so overflow_emit trips
        # and the trainer must double phase_a_tiles (NOT dup_capacity).
        scene = _mini_scene(n=300, cap=512)
        cam = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
                             fovx=0.9, fovy=0.9, width=64, height=64)
        gt = jnp.ones((64, 64, 3), jnp.float32) * 0.5
        cfg = OptimizationConfig(
            densify_from_iter=1, densify_until_iter=1000,
            densification_interval=2, opacity_reset_interval=10000,
            densify_grad_threshold=1e9,  # no actual densification
        )
        settings = api.RasterizeSettings(
            renderer="tiled", dup_capacity=1 << 13, max_per_tile=512,
            chunk=16, phase_a_tiles=1,
        )
        tr = R.Trainer(R.init_train_state(scene, cfg, 1.0), [(cam, gt)],
                       opt_cfg=cfg, settings=settings, cameras_extent=1.0)
        tr.run(4)
        grow = [h for h in tr.history
                if h.get("event") == "raster_capacity_grow"]
        assert grow, "emission overflow never handled"
        assert any("phase_a_tiles" in h for h in grow)
        assert tr.settings.phase_a_tiles > 1


class TestSlotDecode:
    def test_float_decode_matches_integer_division_exhaustive(self):
        # Regression for the double-rounding bug: fl(a * fl(1/b)) floors to
        # a/b - 1 for pairs like (41, 41), (47, 47), (55, 55), (61, 61).
        # The shipped decode floor((a + 0.5) * fl(1/b)) must match a // b
        # for every reachable (slot, width): slot < 512 (the rect-tile
        # ceiling), width <= 256.
        a = jnp.arange(512, dtype=jnp.int32)[:, None]
        b = jnp.arange(1, 257, dtype=jnp.int32)[None, :]
        got = jnp.floor(
            (a.astype(jnp.float32) + 0.5) * (1.0 / b.astype(jnp.float32))
        ).astype(jnp.int32)
        want = a // b
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_width_41_emission_covers_exact_rect(self):
        # One gaussian whose rect is 41 tiles wide x 2 tall on a wide grid;
        # under the buggy decode, slot 41 (row 1, col 0) landed in row 0
        # col 41 -- a hole in tile (xmin, ymin+1) and a duplicate at
        # (xmin+41, ymin). Assert the emitted tile set IS the rect.
        w_tiles, h_tiles = 50, 4
        W, H = w_tiles * bm.TILE, h_tiles * bm.TILE
        # Center so the rect spans tiles x in [2, 43), y in [1, 3).
        cx = (2 * bm.TILE + 43 * bm.TILE) / 2.0
        cy = (1 * bm.TILE + 3 * bm.TILE) / 2.0
        r = (43 - 2) * bm.TILE / 2.0 - 1  # 41 tiles wide
        ry = (3 - 1) * bm.TILE / 2.0 - 1
        b = bm.bin_gaussians(
            jnp.array([[cx, cy]], jnp.float32), jnp.array([1.0], jnp.float32),
            jnp.array([int(r)], jnp.int32), W, H, dup_capacity=0,
            max_tiles_per_gaussian=512, phase_a_tiles=6,
            ext_x=jnp.array([r], jnp.float32), ext_y=jnp.array([ry], jnp.float32),
        )
        assert not bool(b.overflow)
        tiles = np.asarray(b.tile_of_dup)
        valid = tiles < w_tiles * h_tiles
        got = set(tiles[valid].tolist())
        want = {ty * w_tiles + tx for ty in (1, 2) for tx in range(2, 43)}
        assert got == want


class TestPhasePlanSelector:
    def test_padded_sort_size_selection(self):
        """The plan is picked by PADDED sort size (XLA TPU sort pads its
        operand to the next power of two), fewest phases as tiebreak:
        at 200k both candidates pad to 2^21 so the fat plan (fewest
        cumsum/selection phases) wins; at 1M the lean plan crosses a
        boundary (2^23 vs the fat plan's 2^24) and halves the sort."""
        from wast3d_tpu.ops.rasterizer.binning import _phase_plan

        def padded(n, plan):
            total = n * plan[0][1] + sum(e * b for _, e, b in plan[1:])
            return 1 << (total - 1).bit_length()

        p200 = _phase_plan(200_000, 6, 512, 16)
        assert padded(200_000, p200) == 1 << 21
        assert len(p200) == 4  # fat: phase A + 3 bands
        p1m = _phase_plan(1_000_000, 6, 512, 16)
        assert padded(1_000_000, p1m) == 1 << 23
        assert len(p1m) > len(p200)  # lean trades phases for sort size

    def test_full_rect_coverage_any_plan(self):
        """Every plan must cover max_tiles_per_gaussian slots exactly."""
        from wast3d_tpu.ops.rasterizer.binning import _phase_plan

        for n in (1000, 50_000, 200_000, 1_000_000, 4_000_000):
            for ra in (4, 6, 16):
                plan = _phase_plan(n, ra, 512, 16)
                assert plan[0] == (0, ra, None)
                covered = sum(e for _, e, _ in plan)
                assert covered == 512, (n, ra, plan)
                # Contiguous, non-overlapping bands.
                pos = 0
                for s, e, _ in plan:
                    assert s == pos
                    pos += e


class TestTightPlan:
    def test_tight_plan_opt_in_crosses_pad_boundaries(self):
        """The tight candidate (bands grow by +covered, floor_budget=128)
        is only taken when it strictly improves the padded sort size:
        defaults keep their proven plans, while the 1M/4M opt-in
        (ra=4, div=64, floor=128 — NOTES_PERF r4s4) crosses 2^23 -> 2^22
        and 2^25 -> 2^24 respectively."""
        from wast3d_tpu.ops.rasterizer.binning import _phase_plan

        def padded(n, plan):
            total = n * plan[0][1] + sum(e * b for _, e, b in plan[1:])
            return 1 << (total - 1).bit_length()

        # Defaults unchanged (same pads as the r3 selection).
        assert padded(200_000, _phase_plan(200_000, 6, 512, 16)) == 1 << 21
        assert padded(1_000_000, _phase_plan(1_000_000, 6, 512, 16)) == 1 << 23
        # Opt-in tight plans.
        p1m = _phase_plan(1_000_000, 4, 512, 64, floor_budget=128)
        assert padded(1_000_000, p1m) == 1 << 22
        p4m = _phase_plan(4_000_000, 4, 512, 64, floor_budget=128)
        assert padded(4_000_000, p4m) == 1 << 24
        # Coverage + contiguity hold for the tight shape too.
        for n, p in ((1_000_000, p1m), (4_000_000, p4m)):
            assert p[0] == (0, 4, None)
            assert sum(e for _, e, _ in p) == 512
            pos = 0
            for s, e, _ in p:
                assert s == pos
                pos += e
            assert p[-1][2] == 128  # floor band honors floor_budget

    def test_tight_plan_binning_matches_default(self):
        """With budgets sufficient for the scene, the tight plan produces
        the same sorted duplicate lists as the default plan (plans only
        change WHERE slots come from, never which (gaussian, tile) pairs
        exist)."""
        rng = np.random.default_rng(11)
        n = 128
        means = rng.uniform(20, 300, (n, 2))
        radii = rng.integers(2, 60, n)
        depths = rng.uniform(1, 6, n)
        a = _bin(means, depths, radii, w=320, h=320, cap=8192)
        b = _bin(means, depths, radii, w=320, h=320, cap=8192,
                 phase_a_tiles=4, big_budget_divisor=2,
                 floor_band_budget=128)
        assert not bool(a.overflow) and not bool(b.overflow)
        np.testing.assert_array_equal(np.asarray(a.tile_start),
                                      np.asarray(b.tile_start))
        np.testing.assert_array_equal(np.asarray(a.tile_end),
                                      np.asarray(b.tile_end))
        k = int(np.asarray(a.tile_end)[-1])
        np.testing.assert_array_equal(np.asarray(a.gauss_idx)[:k],
                                      np.asarray(b.gauss_idx)[:k])

    def test_tight_plan_budget_miss_flags_emit(self):
        """A scene whose straddle exceeds a tight band budget raises
        overflow_emit (the auto-grow trigger), never silent truncation."""
        rng = np.random.default_rng(12)
        n = 300
        means = rng.uniform(40, 280, (n, 2))
        radii = np.full(n, 60)  # every gaussian straddles many tiles
        depths = rng.uniform(1, 5, n)
        b = _bin(means, depths, radii, w=320, h=320, cap=0,
                 phase_a_tiles=4, big_budget_divisor=1024,
                 floor_band_budget=128)
        assert bool(b.overflow_emit)
        assert bool(b.overflow)
