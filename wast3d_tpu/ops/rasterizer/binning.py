"""Tile binning: duplicate Gaussians into (tile, depth)-sorted lists.

TPU-native re-design of the CUDA binning stage
(`/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:198-343`). The CUDA code radix-sorts 64-bit
[tile|depth] keys (`duplicateWithKeys`, `:70,291`); sorting wide keys and
scattering three payload buffers is exactly what's slow on TPU, so the
pipeline is restructured:

1. **Depth pre-sort** the N Gaussians once (cheap: N << #duplicates).
2. Emit the (tile_id, depth_rank) duplicate grid directly — two-phase to
   bound its size: every Gaussian gets `phase_a_tiles` slots (covers the
   overwhelmingly common small rects) and a depth-ranked big-Gaussian
   subset gets the remaining `max_tiles_per_gaussian - phase_a_tiles`.
3. **Two-key (tile, depth-rank) int32 sort of the raw grid** — no offset
   cumsums, no scatters; the rank key restores exact within-tile depth
   order across the two emission phases.
4. Per-tile ranges via searchsorted (`identifyTileRanges`,
   `rasterizer_impl.cu:116`).

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
    overflow: jnp.ndarray  # [] bool: any duplicate dropped
    # Gather-avoidance pair: gauss_idx == depth_order[rank]. Consumers that
    # can pre-sort their per-gaussian data by depth_order (one N-row
    # gather) should index it with `rank` directly — materializing
    # gauss_idx costs an extra K-row gather that XLA DCEs when unused.
    depth_order: jnp.ndarray = None  # [N]
    rank: jnp.ndarray = None  # [K] index into depth order


def tile_grid(width: int, height: int) -> tuple:
    return (-(-width // TILE), -(-height // TILE))


def compute_rects(means2d, radii, grid_x: int, grid_y: int):
    """Per-Gaussian covered tile rect; reference `getRect`
    (`auxiliary.h:46-56`). radii==0 yields an empty rect."""
    mx, my = means2d[:, 0], means2d[:, 1]
    r = radii.astype(jnp.float32)
    xmin = jnp.clip(jnp.floor((mx - r) / TILE), 0, grid_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor((my - r) / TILE), 0, grid_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor((mx + r + TILE - 1) / TILE), 0, grid_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor((my + r + TILE - 1) / TILE), 0, grid_y).astype(jnp.int32)
    empty = radii <= 0
    xmin = jnp.where(empty, 0, xmin)
    xmax = jnp.where(empty, 0, xmax)
    ymin = jnp.where(empty, 0, ymin)
    ymax = jnp.where(empty, 0, ymax)
    return xmin, ymin, xmax, ymax


def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
    dup_capacity: int,
    max_tiles_per_gaussian: int = 512,
    phase_a_tiles: int = 8,
    big_budget_divisor: int = 16,
) -> Binning:
    """Build the depth-sorted per-tile Gaussian lists."""
    n = means2d.shape[0]
    grid_x, grid_y = tile_grid(width, height)
    num_tiles = grid_x * grid_y

    # 1. Depth pre-sort (invalid to the back).
    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf)).astype(jnp.int32)
    means2d_s = means2d[order]
    radii_s = radii[order]

    xmin, ymin, xmax, _ymax = compute_rects(means2d_s, radii_s, grid_x, grid_y)
    rect_w = xmax - xmin
    tiles_touched = rect_w * (_ymax - ymin)

    # 2. Multi-phase emission budget: every Gaussian gets `phase_a_tiles`
    # slots; progressively rarer big Gaussians (depth-ranked, cumsum
    # selection - top_k at k ~ N/16 costs tens of ms) get progressively
    # larger slot counts, up to max_tiles_per_gaussian for the rarest
    # (screen-filling splats near the camera). Bounds the emission grid at
    # ~1.5x the typical duplicate count while avoiding the visible tile
    # truncation a single small budget causes.
    ra = min(phase_a_tiles, max_tiles_per_gaussian)
    phases = [(0, ra, None)]  # (slots_start, slots, selection)
    covered = ra
    divisor = big_budget_divisor
    while covered < max_tiles_per_gaussian:
        extra = min(max_tiles_per_gaussian - covered, covered * 7)
        budget = max(256, min(n, n // divisor))
        phases.append((covered, extra, budget))
        covered += extra
        divisor *= 16

    te = jnp.minimum(tiles_touched, ra)
    overflow = jnp.any(tiles_touched > max_tiles_per_gaussian)
    grids = []

    def emission_grid(sel, r0, r_count, te_sel):
        """(tile_id, depth_rank) pairs for rect positions [r0, r0+r_count)
        of the selected (sorted-order) gaussians; invalid -> num_tiles."""
        r_idx = r0 + jnp.arange(r_count, dtype=jnp.int32)[None, :]
        rw = jnp.maximum(rect_w[sel], 1)[:, None]
        tx = xmin[sel][:, None] + r_idx % rw
        ty = ymin[sel][:, None] + r_idx // rw
        tile_id = ty * grid_x + tx
        valid = r_idx < te_sel[:, None]
        tile_id = jnp.where(valid, tile_id, num_tiles)
        rank = jnp.broadcast_to(sel[:, None], tile_id.shape)
        return tile_id.reshape(-1), rank.reshape(-1)

    all_idx = jnp.arange(n, dtype=jnp.int32)
    grids.append(emission_grid(all_idx, 0, ra, te))
    for start, extra, budget in phases[1:]:
        wants = tiles_touched > start
        prank = jnp.cumsum(wants) - 1
        selected = wants & (prank < budget)
        # Rank -> row table. Unfilled slots MUST be invalid (a default of
        # row 0 would re-emit row 0's rect once per empty slot when row 0
        # is itself selected): mark them -1 and zero their slot budget.
        sel_idx = jnp.full((budget,), -1, jnp.int32).at[
            jnp.where(selected, prank, budget)
        ].set(all_idx, mode="drop")
        slot_live = sel_idx >= 0
        sel_safe = jnp.maximum(sel_idx, 0)
        te_phase = jnp.where(
            selected, jnp.clip(tiles_touched - start, 0, extra), 0
        )
        te = te + te_phase
        overflow = overflow | jnp.any(wants & ~selected)
        te_sel = jnp.where(slot_live, te[sel_safe], 0)
        grids.append(emission_grid(sel_safe, start, extra, te_sel))
    total = jnp.sum(te)

    # 3. Sort the emission grid DIRECTLY with a (tile, depth-rank)
    # two-key sort - no offset cumsums, no scatters. The rank key restores
    # exact within-tile depth order across the emission phases.
    tiles_buf = jnp.concatenate([g[0] for g in grids])
    ranks_buf = jnp.concatenate([g[1] for g in grids])
    sorted_tile, sorted_rank = jax.lax.sort(
        (tiles_buf, ranks_buf), dimension=0, num_keys=2
    )

    # Valid entries sort to the FRONT (invalid carry tile == num_tiles), so
    # the emission grid's padding can be dropped with a static prefix
    # slice: downstream gather/pack/blend scale with dup_capacity, not the
    # grid. dup_capacity <= 0 keeps the full grid.
    if 0 < dup_capacity < sorted_tile.shape[0]:
        overflow = overflow | (total > dup_capacity)
        sorted_tile = sorted_tile[:dup_capacity]
        sorted_rank = sorted_rank[:dup_capacity]
    sorted_gauss = order[sorted_rank]

    # 4. Tile ranges.
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)

    return Binning(
        gauss_idx=sorted_gauss,
        tile_of_dup=sorted_tile,
        tile_start=tile_start,
        tile_end=tile_end,
        num_duplicates=total,
        overflow=overflow,
        depth_order=order,
        rank=sorted_rank,
    )
