"""Tile binning: duplicate Gaussians into (tile, depth)-sorted lists.

TPU-native re-design of the CUDA binning stage
(`/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:198-343`). The CUDA code radix-sorts 64-bit
[tile|depth] keys (`duplicateWithKeys`, `:70,291`); sorting wide keys and
scattering three payload buffers is exactly what's slow on TPU, so the
pipeline is restructured:

1. **Depth pre-sort** the N Gaussians once (cheap: N << #duplicates).
   After this, a duplicate's within-tile depth position is its *rank* in
   the depth order — a dense int in [0, N).
2. Emit the (tile_id, rank) duplicate grid directly — multi-phase to
   bound its size: every Gaussian gets `phase_a_tiles` slots (covers the
   overwhelmingly common small rects) and depth-ranked big-Gaussian
   subsets get progressively larger budgets.
3. **Single uint32 key sort**: key = tile_id * N + rank. (tile, rank)
   pairs are unique, so no stability or payload is needed and the sorted
   key decodes back to (tile, rank) exactly. This is ~2.5x cheaper than
   the 2-key int32 sort it replaces (measured on v5e); it applies
   whenever (num_tiles + 1) * N <= 2^32 — e.g. 1M Gaussians at 1296x832
   (4212 tiles) fits. Larger problems fall back to the 2-key sort.
4. Per-tile ranges via ONE searchsorted over the packed keys with
   needles tile*N for tile in [0, T] — starts and ends in a single pass
   (`identifyTileRanges`, `rasterizer_impl.cu:116`).

Static capacities are the XLA-shape price: Gaussians whose rect exceeds
`max_tiles_per_gaussian` tiles, or with rect > phase_a_tiles beyond the
big-subset budget, are truncated and flagged in the overflow diagnostic.
The CUDA version has no caps; callers size them so overflow stays zero.
The emission grid is static (N * phase_a_tiles + n_big * (max - phase_a),
~2x the real duplicate count); after the sort, valid entries form a prefix
and `dup_capacity` statically slices it so downstream gather/pack/blend
pay only for real duplicates (overflow flags a too-small cap).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # BLOCK_X = BLOCK_Y = 16 (config.h:16-17)


class Binning(NamedTuple):
    gauss_idx: jnp.ndarray  # [K] original gaussian index per sorted duplicate
    tile_of_dup: jnp.ndarray  # [K] tile id per sorted duplicate (num_tiles = invalid)
    tile_start: jnp.ndarray  # [T] range starts into the sorted list
    tile_end: jnp.ndarray  # [T] range ends
    num_duplicates: jnp.ndarray  # [] total emitted (pre-drop)
    overflow: jnp.ndarray  # [] bool: any duplicate dropped (any cause)
    # Cause split so hosts can grow the RIGHT knob (the CUDA path is
    # uncapped, rasterizer_impl.cu:291-305, so any truncation is a
    # regression to repair): phase-selection budget truncation (-> grow
    # phase_a_tiles), sorted-prefix truncation (total > dup_capacity
    # -> grow dup_capacity), and rect-ceiling truncation (tiles_touched >
    # max_tiles_per_gaussian -> grow max_tiles_per_gaussian; growing
    # phase_a_tiles can NEVER clear this one, so it must not be folded
    # into overflow_emit).
    overflow_emit: jnp.ndarray = None  # [] bool
    overflow_dup: jnp.ndarray = None  # [] bool
    overflow_rect: jnp.ndarray = None  # [] bool
    # Gather-avoidance pair: gauss_idx == depth_order[rank]. Consumers that
    # can pre-sort their per-gaussian data by depth_order (one N-row
    # gather) should index it with `rank` directly — materializing
    # gauss_idx costs an extra K-row gather that XLA DCEs when unused.
    depth_order: jnp.ndarray = None  # [N]
    rank: jnp.ndarray = None  # [K] index into depth order
    rank_of: jnp.ndarray = None  # [N] inverse of depth_order (gaussian -> rank)


def tile_grid(width: int, height: int) -> tuple:
    return (-(-width // TILE), -(-height // TILE))


def compute_rects(means2d, radii, grid_x: int, grid_y: int,
                  ext_x=None, ext_y=None):
    """Per-Gaussian covered tile rect; reference `getRect`
    (`auxiliary.h:46-56`). radii==0 yields an empty rect.

    ext_x/ext_y: optional tight per-axis half-extents (pixels) from
    `preprocess` (the alpha >= 1/255 ellipse AABB clipped to the 3-sigma
    box) — a strict subset of the reference's square footprint whose
    dropped pixels the blend kernel skips anyway. Defaults to the square
    of `radii`."""
    mx, my = means2d[:, 0], means2d[:, 1]
    rx = (radii if ext_x is None else ext_x).astype(jnp.float32)
    ry = (radii if ext_y is None else ext_y).astype(jnp.float32)
    xmin = jnp.clip(jnp.floor((mx - rx) / TILE), 0, grid_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor((my - ry) / TILE), 0, grid_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor((mx + rx + TILE - 1) / TILE), 0, grid_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor((my + ry + TILE - 1) / TILE), 0, grid_y).astype(jnp.int32)
    empty = (radii <= 0) | (rx <= 0) | (ry <= 0)
    xmin = jnp.where(empty, 0, xmin)
    xmax = jnp.where(empty, 0, xmax)
    ymin = jnp.where(empty, 0, ymin)
    ymax = jnp.where(empty, 0, ymax)
    return xmin, ymin, xmax, ymax


def _phase_plan(n: int, ra: int, max_tiles: int, big_budget_divisor: int,
                floor_budget: int = 256):
    """Static emission budget schedule: (slots_start, slots, budget).

    Candidate shapes, picked per problem size (all static python at
    trace time):
      - "fat": bands grow 8x wide, budgets shrink 16x (the r2 plan) —
        fewest phases, biggest grid.
      - "lean": bands double, budgets shrink 4x — ~30% smaller grid,
        one-two extra cumsum/selection phases.
      - "tight": bands grow by +covered (the band END doubles), budgets
        shrink 4x — smallest grid, strictest budgets. Considered only
        when it strictly improves the padded sort size (so default
        problem sizes keep their proven fat/lean plans); callers opting
        into it (ra=4 / div=64 / floor_budget=128 at 1M+, r4s4) must
        validate band feasibility against the scene's straddle
        distribution (tools/tile_straddle.py) or rely on the
        overflow_emit auto-grow path.
    XLA's TPU sort pads its operand to the next POWER OF TWO (measured
    r3: shrinking the grid 2.02M -> 1.45M at n=200k changed nothing —
    both pad to 2^21 — while r2's 13.25N -> 10.1N "win" was really the
    2^22 -> 2^21 crossing). So the selection metric is the padded sort
    size, with fewer phases as the tiebreak: at 200k that picks fat
    (both pad to 2^21, fat has fewer cumsums), at 1M it picks lean
    (6.8M pads to 2^23 vs fat 10.1M -> 2^24, halving the sort).
    floor_budget is the terminal band's element budget (256 default;
    128 shaves the floor band's slots — the lever that crosses 2^23 ->
    2^22 at 1M with ra=4/div=64: grid 4.17M, NOTES_PERF r4s4)."""

    def build(grow, div_factor):
        phases = [(0, ra, None)]
        covered = ra
        divisor = big_budget_divisor
        while covered < max_tiles:
            budget = max(floor_budget, min(n, n // divisor))
            if budget == floor_budget:
                extra = max_tiles - covered  # floor band: take the rest
            else:
                extra = min(max_tiles - covered, covered * grow)
            phases.append((covered, extra, budget))
            covered += extra
            divisor *= div_factor
        return phases

    def padded_grid(phases):
        total = n * phases[0][1] + sum(e * b for _, e, b in phases[1:])
        return 1 << (total - 1).bit_length()

    candidates = [build(7, 16), build(2, 4)]
    best = min(candidates, key=lambda p: (padded_grid(p), len(p)))
    tight = build(1, 4)
    if padded_grid(tight) < padded_grid(best):
        best = tight
    return best


def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
    dup_capacity: int,
    max_tiles_per_gaussian: int = 512,
    phase_a_tiles: int = 6,
    big_budget_divisor: int = 16,
    floor_band_budget: int = 256,
    ext_x: jnp.ndarray = None,
    ext_y: jnp.ndarray = None,
    conics: jnp.ndarray = None,
    opacities: jnp.ndarray = None,
    jitter_margin: float = 0.0,
    phase_plan: tuple = (),
    _force_two_key: bool = False,
    _probe: str = "",
) -> Binning:
    """Build the depth-sorted per-tile Gaussian lists.

    conics/opacities: when given, enable the exact per-tile ellipse cull:
    a duplicate whose Gaussian cannot reach alpha >= 1/255 at ANY sample
    point of the tile is skipped at every pixel by the blend kernel
    (`forward.cu:354-358`: alpha < 1/255 -> continue, leaving color,
    depth, T and all gradients untouched), so dropping it at emission is
    mathematically exact — outputs/gradients move only by f32
    reassociation noise (~1 ulp; survivors shift across blend chunk
    boundaries) — while shrinking the dynamic per-tile ranges the blend
    loops iterate over. Measured cullable fractions of
    the tight-AABB duplicates: 13% on the synthetic bench scene, ~19% on
    trained scenes (tools/cull_fraction.py). jitter_margin widens the
    tile's sample box on the low side for per-pixel jitter (offsets in
    (-1, 0], `gaussian_renderer/__init__.py:31`): pass 1.0 when
    sampling_offsets are in play, 0.0 otherwise.

    phase_plan: optional explicit emission plan — a static tuple of
    (start, extra, budget) triples replacing `_phase_plan`'s knob-derived
    schedule. The first triple must be (0, ra, None) (phase A). Scene-
    adaptive tuning (ops/rasterizer/autoplan.py) synthesizes budgets from
    the measured straddle histogram, which crosses sort-pad boundaries
    the preset knob plans cannot (e.g. 2^21 -> 2^20 at the 200k bench
    scene needs a ~38k band the presets never produce). Band semantics,
    overflow flags and the sorted key set are identical to the knob path.

    _force_two_key: test hook — exercise the 2-key sort fallback (the
    path problems > ~1M x 4212 tiles take) at small sizes."""
    n = means2d.shape[0]
    grid_x, grid_y = tile_grid(width, height)
    num_tiles = grid_x * grid_y
    # uint32 multiply-packing applies when every (tile, rank) key —
    # including the invalid sentinel tile == num_tiles — fits 32 bits.
    packable = (num_tiles + 1) * n <= (1 << 32) and not _force_two_key

    # 1. Depth pre-sort (invalid to the back). A 1-key sort with an iota
    # payload beats argsort's internal comparator on TPU. Emission then
    # runs in ORIGINAL gaussian order carrying each gaussian's depth
    # *rank* (the inverse permutation, recovered by a second small sort):
    # physically reordering means2d/radii first costs two N-row random
    # gathers (~2.1ms at 200k on v5e) vs ~0.4ms for the extra sort.
    iota = jnp.arange(n, dtype=jnp.int32)
    _, order = jax.lax.sort(
        (jnp.where(radii > 0, depths, jnp.inf), iota), dimension=0, num_keys=1
    )
    _, rank_of = jax.lax.sort((order, iota), dimension=0, num_keys=1)

    xmin, ymin, xmax, _ymax = compute_rects(means2d, radii, grid_x, grid_y,
                                            ext_x=ext_x, ext_y=ext_y)
    rect_w = xmax - xmin
    tiles_touched = rect_w * (_ymax - ymin)

    # 2. Multi-phase emission budget: every Gaussian gets `phase_a_tiles`
    # slots; progressively rarer big Gaussians (cumsum selection by
    # original index - top_k at k ~ N/16 costs tens of ms) get progressively
    # larger slot counts, up to max_tiles_per_gaussian for the rarest
    # (screen-filling splats near the camera). Bounds the emission grid at
    # ~1.5x the typical duplicate count while avoiding the visible tile
    # truncation a single small budget causes.
    if phase_plan:
        phases = [tuple(p) for p in phase_plan]
        # ValueError (not assert): a gapped or short plan silently drops
        # tiles with NO overflow flag — the validation must survive -O.
        if not (phases[0][0] == 0 and phases[0][2] is None):
            raise ValueError(f"phase_plan must start (0, ra, None): "
                             f"{phases[0]}")
        # Coverage must reach the rect ceiling: tiles beyond the plan's
        # coverage would be dropped with NO overflow flag (overflow_rect
        # only fires above max_tiles_per_gaussian).
        coverage = phases[0][1]
        for start, extra, budget in phases[1:]:
            # Bands must tile [ra, coverage) contiguously: te accumulates
            # clip(tt - start, 0, extra) per band, which sums to
            # min(tt, coverage) only without gaps or overlaps.
            if not (start == coverage and extra > 0 and budget > 0):
                raise ValueError(
                    f"phase_plan bands must tile contiguously with "
                    f"positive budgets: {phases}")
            coverage += extra
        if coverage < max_tiles_per_gaussian:
            raise ValueError(
                f"phase_plan coverage {coverage} < max_tiles_per_gaussian "
                f"{max_tiles_per_gaussian}: uncovered tiles would be "
                f"dropped unflagged")
        ra = min(phases[0][1], max_tiles_per_gaussian)
    else:
        ra = min(phase_a_tiles, max_tiles_per_gaussian)
        phases = _phase_plan(n, ra, max_tiles_per_gaussian,
                             big_budget_divisor,
                             floor_budget=floor_band_budget)

    te0 = jnp.minimum(tiles_touched, ra)
    ovf_rect = jnp.any(tiles_touched > max_tiles_per_gaussian)
    ovf_emit = jnp.zeros((), bool)
    emitted = []  # per-phase packed keys (or (tile, rank) pairs)
    culled_total = jnp.zeros((), jnp.int32)

    # Exact per-tile ellipse cull (docstring): per-Gaussian columns
    # [mx, my, A, B, C, B/C, B/A, tau] gathered alongside the rects.
    # cull iff min over the tile's sample box of
    # Q(d) = A dx^2 + 2B dx dy + C dy^2 exceeds tau = 2 ln(255 opa):
    # alpha_max = opa exp(-Qmin/2) < 1/255 (forward.cu:354 skip). The
    # 1e-3 slack keeps the decision strictly conservative against the
    # blend kernel's own f32 power evaluation (different op order,
    # ~1e-5-class differences).
    cull_data = None
    if conics is not None and opacities is not None:
        ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
        tau = 2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-12)) + 1e-3
        cull_data = jnp.stack(
            [
                means2d[:, 0], means2d[:, 1], ca, cb, cc,
                cb / jnp.maximum(cc, 1e-12), cb / jnp.maximum(ca, 1e-12),
                tau,
            ],
            axis=1,
        )

    def emission(xmin_s, ymin_s, rw_s, te_s, rank_s, r0, r_count, cd_s):
        """Keys for rect positions [r0, r0+r_count) of the selected
        (original-order) gaussians, laid out [slots, m] so lanes stay
        dense; rank_s carries each gaussian's depth rank into the key.

        The slot -> (tx, ty) decode uses float multiply-by-reciprocal
        (integer div/mod lower to long software sequences on the VPU).
        Bare fl(a * fl(1/b)) double-rounds — e.g. (a=41, b=41) lands just
        below 1.0 and floors to 0 — so we compute floor((a + 0.5) * fl(1/b)):
        (a + 0.5)/b is never an integer and its distance to the nearest
        integer is >= 0.5/b, which exceeds the total relative rounding
        error (~2^-23 per op) for a, b < 2^13. Verified exhaustively for
        a < 512, b <= 256 in tests/test_binning.py."""
        r_idx = (r0 + jnp.arange(r_count, dtype=jnp.int32))[:, None]
        rwm = jnp.maximum(rw_s, 1)[None, :]
        ty_off = jnp.floor(
            (r_idx.astype(jnp.float32) + 0.5) * (1.0 / rwm.astype(jnp.float32))
        ).astype(jnp.int32)
        tx = xmin_s[None, :] + (r_idx - ty_off * rwm)
        ty = ymin_s[None, :] + ty_off
        tile_id = ty * grid_x + tx
        valid = r_idx < te_s[None, :]
        n_culled = jnp.zeros((), jnp.int32)
        if cd_s is not None:
            # Exact tile cull. Sample box per tile: pixel centers
            # [t*16, t*16+15] widened by jitter_margin on the LOW side
            # only (offsets lie in (-1, 0]). Min of the PSD quadratic
            # over the box: 0 if the mean is inside, else the min over
            # the 4 edges (each a 1D quadratic with a clamped argmin).
            mxs, mys = cd_s[:, 0][None, :], cd_s[:, 1][None, :]
            a = cd_s[:, 2][None, :]
            b = cd_s[:, 3][None, :]
            c = cd_s[:, 4][None, :]
            boc = cd_s[:, 5][None, :]
            boa = cd_s[:, 6][None, :]
            tau_s = cd_s[:, 7][None, :]
            txf = (tx * TILE).astype(jnp.float32)
            tyf = (ty * TILE).astype(jnp.float32)
            x0 = txf - jitter_margin - mxs
            x1 = txf + (TILE - 1) - mxs
            y0 = tyf - jitter_margin - mys
            y1 = tyf + (TILE - 1) - mys

            def edge_x(cx):
                dy = jnp.clip(-boc * cx, y0, y1)
                return (a * cx + 2.0 * b * dy) * cx + c * dy * dy

            def edge_y(cy):
                dx = jnp.clip(-boa * cy, x0, x1)
                return (c * cy + 2.0 * b * dx) * cy + a * dx * dx

            qmin = jnp.minimum(
                jnp.minimum(edge_x(x0), edge_x(x1)),
                jnp.minimum(edge_y(y0), edge_y(y1)),
            )
            inside = (x0 <= 0) & (x1 >= 0) & (y0 <= 0) & (y1 >= 0)
            keep = inside | (qmin <= tau_s)
            n_culled = jnp.sum(valid & ~keep, dtype=jnp.int32)
            valid = valid & keep
        if packable:
            key = tile_id.astype(jnp.uint32) * jnp.uint32(n) + rank_s[
                None, :
            ].astype(jnp.uint32)
            inval = jnp.uint32(num_tiles * n)
            return (jnp.where(valid, key, inval).reshape(-1),), n_culled
        tile_id = jnp.where(valid, tile_id, num_tiles)
        rank2d = jnp.broadcast_to(rank_s[None, :], tile_id.shape)
        return (tile_id.reshape(-1), rank2d.reshape(-1)), n_culled

    em0, nc0 = emission(xmin, ymin, rect_w, te0, rank_of, 0, ra, cull_data)
    emitted.append(em0)
    culled_total = culled_total + nc0
    # Band selection WITHOUT scatters and with ONE single-key u32 sort
    # (r5: replaces the r4s4 two-sort design — a 2-key tiles_touched-DESC
    # sort plus its inverse-rank sort — with a single payload-free u32
    # sort; 2-key/payload sorts cost ~2.5x a bare u32 sort on v5e, and
    # the inverse rank turns out to be unnecessary). Key = band-count-
    # DESC packed with the row index: nb(g) = #bands g wants
    # (tiles_touched > start_b); key = (B - nb) * N + g. Bands are
    # nested (start_b increases), so the candidates of band b — every g
    # with nb >= b — are exactly the first count_b entries of this
    # order, and "the budget_b selected rows" is a static PREFIX SLICE
    # band_order[:budget_b]. Budget scarcity resolves by footprint
    # BUCKET (band count) then original index, instead of exact
    # tiles_touched; that changes outcomes ONLY in the overflow_emit
    # error state — when every band budget holds, the selected sets are
    # identical and the sorted key set is unchanged (keys are unique per
    # (tile, rank), so slot order never matters).
    #
    # The per-gaussian cumulative emission count te also no longer needs
    # an N-array update per band: in the non-overflow state a gaussian
    # selected in band b was selected in every earlier band, so its
    # cumulative count through band b is min(tiles_touched, band_end) —
    # computable elementwise from the GATHERED tiles_touched of the
    # budget rows. (In the flagged overflow_emit state both designs
    # emit partial rects; callers regrow or fall back either way.)
    n_bands = len(phases) - 1
    if n_bands:
        nb = jnp.zeros((n,), jnp.uint32)
        for start, _, _ in phases[1:]:
            nb = nb + (tiles_touched > start).astype(jnp.uint32)
        bkey = (jnp.uint32(n_bands) - nb) * jnp.uint32(n) + iota.astype(
            jnp.uint32
        )
        band_order = (jax.lax.sort(bkey, dimension=0) % jnp.uint32(n)).astype(
            jnp.int32
        )
    total = jnp.sum(te0) - culled_total
    for start, extra, budget in phases[1:]:
        count = jnp.sum(tiles_touched > start, dtype=jnp.int32)
        # Slot -> row table. Unfilled slots MUST be invalid (a default of
        # row 0 would re-emit row 0's rect once per empty slot when row 0
        # is itself selected): mark them -1 and zero their slot budget.
        head = band_order[: min(budget, n)]
        if head.shape[0] < budget:  # tiny scenes: floor budget > n
            head = jnp.concatenate(
                [head, jnp.full((budget - head.shape[0],), -1, jnp.int32)]
            )
        sel_idx = jnp.where(
            jnp.arange(budget, dtype=jnp.int32) < count, head, -1
        )
        slot_live = sel_idx >= 0
        sel_safe = jnp.maximum(sel_idx, 0)
        ovf_emit = ovf_emit | (count > budget)
        tt_sel = tiles_touched[sel_safe]
        te_sel = jnp.where(slot_live, jnp.minimum(tt_sel, start + extra), 0)
        total = total + jnp.sum(
            jnp.where(slot_live, jnp.clip(tt_sel - start, 0, extra), 0)
        )
        em_b, nc_b = emission(
            xmin[sel_safe], ymin[sel_safe], rect_w[sel_safe],
            te_sel, rank_of[sel_safe], start, extra,
            None if cull_data is None else cull_data[sel_safe],
        )
        emitted.append(em_b)
        culled_total = culled_total + nc_b
        total = total - nc_b
    ovf_dup = jnp.zeros((), bool)

    # _probe: measurement-only early exits (tools/perf_fwd_anatomy.py)
    # returning the raw stage product as a plain array — NOT a Binning.
    if _probe == "emit":
        return jnp.concatenate([e[0] for e in emitted])

    # 3. Sort. Valid entries sort to the FRONT (invalid carry
    # tile == num_tiles), so the emission grid's padding can be dropped
    # with a static prefix slice: downstream gather/pack/blend scale with
    # dup_capacity, not the grid. dup_capacity <= 0 keeps the full grid.
    if packable:
        keys = jnp.concatenate([e[0] for e in emitted])
        sorted_key = jax.lax.sort(keys, dimension=0)
        if _probe == "sort":
            return sorted_key
        if 0 < dup_capacity < sorted_key.shape[0]:
            ovf_dup = total > dup_capacity
            sorted_key = sorted_key[:dup_capacity]
        if _probe == "decode":
            return (sorted_key % jnp.uint32(n)).astype(jnp.int32)
        sorted_rank = (sorted_key % jnp.uint32(n)).astype(jnp.int32)
        # 4. Tile ranges: one searchsorted over the packed keys; needle
        # tile*N is <= every key of `tile` and > every key of tile-1.
        needles = jnp.arange(num_tiles + 1, dtype=jnp.uint32) * jnp.uint32(n)
        bounds = jnp.searchsorted(sorted_key, needles, side="left").astype(
            jnp.int32
        )
        if _probe == "ranges":
            return bounds + sorted_rank[:1]
        tile_start, tile_end = bounds[:-1], bounds[1:]
        sorted_tile = (sorted_key // jnp.uint32(n)).astype(jnp.int32)
    else:
        tiles_buf = jnp.concatenate([e[0] for e in emitted])
        ranks_buf = jnp.concatenate([e[1] for e in emitted])
        sorted_tile, sorted_rank = jax.lax.sort(
            (tiles_buf, ranks_buf), dimension=0, num_keys=2
        )
        if 0 < dup_capacity < sorted_tile.shape[0]:
            ovf_dup = total > dup_capacity
            sorted_tile = sorted_tile[:dup_capacity]
            sorted_rank = sorted_rank[:dup_capacity]
        tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        bounds = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(
            jnp.int32
        )
        tile_start, tile_end = bounds[:-1], bounds[1:]

    sorted_gauss = order[sorted_rank]

    return Binning(
        gauss_idx=sorted_gauss,
        tile_of_dup=sorted_tile,
        tile_start=tile_start,
        tile_end=tile_end,
        num_duplicates=total,
        overflow=ovf_emit | ovf_dup | ovf_rect,
        overflow_emit=ovf_emit,
        overflow_dup=ovf_dup,
        overflow_rect=ovf_rect,
        depth_order=order,
        rank_of=rank_of,
        rank=sorted_rank,
    )
