"""Tile binning: duplicate Gaussians into (tile, depth)-sorted lists.

TPU-native re-design of the CUDA binning stage
(`/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:198-343`): where the CUDA code does
InclusiveSum -> duplicateWithKeys -> cub radix sort -> identifyTileRanges
with dynamically-sized buffers, we build the same [tile|depth] key list at
**static capacity** with XLA primitives:

- per-Gaussian tile rects from screen radius (`getRect`, `auxiliary.h:46-56`),
- exclusive-cumsum offsets + masked scatter to emit up to `max_tiles_per_gaussian`
  duplicates per Gaussian into a `dup_capacity`-sized buffer,
- a single `lax.sort` on a packed int64 [tile_id << 32 | depth_bits] key
  (positive-float depth bits are order-preserving as int32),
- per-tile ranges by `searchsorted`.

Static capacities are the XLA-shape price: Gaussians whose rect exceeds
`max_tiles_per_gaussian` tiles, or duplicates beyond `dup_capacity`, are
dropped (counted in the returned overflow diagnostics). The CUDA version
has no such caps; callers size them so overflow is zero in practice.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # BLOCK_X = BLOCK_Y = 16 (config.h:16-17)


class Binning(NamedTuple):
    gauss_idx: jnp.ndarray  # [K] gaussian index per sorted duplicate
    tile_of_dup: jnp.ndarray  # [K] tile id per sorted duplicate (num_tiles = invalid)
    tile_start: jnp.ndarray  # [T] range starts into the sorted list
    tile_end: jnp.ndarray  # [T] range ends
    num_duplicates: jnp.ndarray  # [] total emitted (pre-drop)
    overflow: jnp.ndarray  # [] bool: any duplicate dropped


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
) -> Binning:
    """Build the depth-sorted per-tile Gaussian lists."""
    n = means2d.shape[0]
    grid_x, grid_y = tile_grid(width, height)
    num_tiles = grid_x * grid_y

    xmin, ymin, xmax, ymax = compute_rects(means2d, radii, grid_x, grid_y)
    rect_w = xmax - xmin
    tiles_touched = rect_w * (ymax - ymin)
    tiles_emitted = jnp.minimum(tiles_touched, max_tiles_per_gaussian)

    offsets = jnp.cumsum(tiles_emitted) - tiles_emitted  # exclusive
    total = offsets[-1] + tiles_emitted[-1]
    overflow_rect = jnp.any(tiles_touched > max_tiles_per_gaussian)
    overflow_cap = total > dup_capacity

    # Emit (gaussian, r) pairs, r indexing the rect row-major.
    r_idx = jnp.arange(max_tiles_per_gaussian, dtype=jnp.int32)[None, :]  # [1,R]
    rw = jnp.maximum(rect_w, 1)[:, None]
    tile_x = xmin[:, None] + r_idx % rw
    tile_y = ymin[:, None] + r_idx // rw
    tile_id = tile_y * grid_x + tile_x  # [N,R]
    pair_valid = r_idx < tiles_emitted[:, None]
    pos = offsets[:, None] + r_idx  # [N,R]
    pos = jnp.where(pair_valid & (pos < dup_capacity), pos, dup_capacity)

    # Scatter into capacity buffers ('drop' mode ignores pos == dup_capacity).
    flat_pos = pos.reshape(-1)
    flat_tile = tile_id.reshape(-1)
    flat_gauss = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], tile_id.shape
    ).reshape(-1)
    tiles_buf = jnp.full((dup_capacity,), num_tiles, jnp.int32)
    gauss_buf = jnp.zeros((dup_capacity,), jnp.int32)
    depth_buf = jnp.full((dup_capacity,), jnp.float32(jnp.finfo(jnp.float32).max))
    tiles_buf = tiles_buf.at[flat_pos].set(flat_tile, mode="drop")
    gauss_buf = gauss_buf.at[flat_pos].set(flat_gauss, mode="drop")
    depth_buf = depth_buf.at[flat_pos].set(
        jnp.broadcast_to(depths[:, None], tile_id.shape).reshape(-1), mode="drop"
    )

    # Lexicographic (tile, depth) sort — the cub radix-sort-on-packed-keys
    # equivalent (`rasterizer_impl.cu:70,305`). Positive float32 depth bits
    # compare correctly as int32 (sign bit clear), avoiding an int64 key.
    depth_bits = jax.lax.bitcast_convert_type(depth_buf, jnp.int32)
    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tiles_buf, depth_bits, gauss_buf), dimension=0, num_keys=2
    )

    # Tile ranges (`identifyTileRanges`, `rasterizer_impl.cu:116`).
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)

    return Binning(
        gauss_idx=sorted_gauss,
        tile_of_dup=sorted_tile,
        tile_start=tile_start,
        tile_end=tile_end,
        num_duplicates=total,
        overflow=overflow_rect | overflow_cap,
    )
