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
    max_tiles_per_gaussian: int = 64,
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

    # 2. Two-phase emission budget.
    ra = min(phase_a_tiles, max_tiles_per_gaussian)
    rb = max_tiles_per_gaussian - ra
    n_big = max(256, n // big_budget_divisor)
    n_big = min(n_big, n)
    te_a = jnp.minimum(tiles_touched, ra)
    if rb > 0 and n_big > 0:
        # First-n_big big Gaussians in depth order via cumsum ranking
        # (a top_k with k ~ N/16 costs tens of ms on TPU; this is O(N)).
        wants_b = tiles_touched > ra
        brank = jnp.cumsum(wants_b) - 1
        is_big = wants_b & (brank < n_big)
        # Rank -> sorted-order index table for the phase-B emission grid.
        big_idx = jnp.zeros((n_big,), jnp.int32).at[
            jnp.where(is_big, brank, n_big)
        ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        te_b = jnp.where(is_big, jnp.clip(tiles_touched - ra, 0, rb), 0)
    else:
        big_idx = jnp.zeros((1,), jnp.int32)
        is_big = jnp.zeros((n,), bool)
        te_b = jnp.zeros((n,), jnp.int32)
    total = jnp.sum(te_a) + jnp.sum(te_b)

    overflow = (
        jnp.any((tiles_touched > ra) & ~is_big)
        | jnp.any(tiles_touched > max_tiles_per_gaussian)
    )

    def emission_grid(sel, r0, r_count):
        """(tile_id, depth_rank) pairs for rect positions [r0, r0+r_count)
        of the selected (sorted-order) gaussians; invalid -> num_tiles."""
        r_idx = r0 + jnp.arange(r_count, dtype=jnp.int32)[None, :]
        rw = jnp.maximum(rect_w[sel], 1)[:, None]
        tx = xmin[sel][:, None] + r_idx % rw
        ty = ymin[sel][:, None] + r_idx // rw
        tile_id = ty * grid_x + tx
        valid = r_idx < (te_a[sel] + te_b[sel])[:, None]
        tile_id = jnp.where(valid, tile_id, num_tiles)
        rank = jnp.broadcast_to(sel[:, None], tile_id.shape)
        return tile_id.reshape(-1), rank.reshape(-1)

    # 3. Sort the emission grid DIRECTLY with a (tile, depth-rank)
    # two-key sort — no cumsum offsets, no scatters. The rank key restores
    # exact within-tile depth order even across the phase-A/B segments.
    all_idx = jnp.arange(n, dtype=jnp.int32)
    tile_a, rank_a = emission_grid(all_idx, 0, ra)
    if rb > 0 and n_big > 0:
        tile_b, rank_b = emission_grid(big_idx, ra, rb)
        tiles_buf = jnp.concatenate([tile_a, tile_b])
        ranks_buf = jnp.concatenate([rank_a, rank_b])
    else:
        tiles_buf, ranks_buf = tile_a, rank_a
    sorted_tile, sorted_rank = jax.lax.sort(
        (tiles_buf, ranks_buf), dimension=0, num_keys=2
    )

    # Valid entries sort to the FRONT (invalid carry tile == num_tiles), so
    # the emission grid's 2x padding can be dropped with a static prefix
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
