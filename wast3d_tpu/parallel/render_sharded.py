"""Exact tile-partitioned multi-chip rendering (BASELINE config 4).

The round-1 sharded path let XLA all-gather every shard's preprocessed
Gaussians and re-ran binning + blending REPLICATED on each device —
correct, but zero compute scaling. This module is the real design, the
point-cloud analogue of tile-parallel distributed splatting:

  1. Each shard preprocesses and bins ONLY its own N/P Gaussians
     (against the global tile grid) — perfectly balanced, no comms.
  2. The screen's tile rows are partitioned contiguously across the
     `model` axis; every duplicate is routed to its tile's owner with
     ONE `all_to_all` over ICI (payload: tile, depth, packed row).
  3. The owner 2-key sorts (tile, depth) its received duplicates —
     this exactly re-establishes global front-to-back order inside
     every tile, so compositing is EXACT, not a depth-slab
     approximation — and runs the Pallas blend on its tile strip.
  4. The output image lives sharded over `model` (strip per shard);
     the loss all-gathers strips (an image-sized, not scene-sized,
     collective).

Cost model per frame at N=4M, P=8 (v5p-8): preprocess+bin N/P locally;
all_to_all moves ~dups/P * 48B per link (~tens of MB over ICI, sub-ms);
sort + blend scale with the shard's received duplicates. Every stage is
O(N/P) or O(dups/P) — true model-parallel rendering, unlike the
replicated fallback.

Everything is jax-differentiable: all_to_all transposes to the reverse
all_to_all, the sort/gather transpose to deterministic scatters, the
blend has its custom VJP. Reference context: the CUDA pipeline this
generalizes is single-GPU (`rasterizer_impl.cu:198-343`); SURVEY §2.7
mandates the multi-chip design be mesh-native.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wast3d_tpu.ops.rasterizer import pallas_blend as pb
from wast3d_tpu.ops.rasterizer.api import RasterizeSettings
from wast3d_tpu.ops.rasterizer.binning import TILE, bin_gaussians, tile_grid
from wast3d_tpu.ops.rasterizer.preprocess import preprocess
from wast3d_tpu.ops.rasterizer.tiled import _tile_pixel_coords


def padded_grid(width: int, height: int, num_shards: int):
    """Global tile grid with grid_y padded to a multiple of num_shards so
    every shard owns an equal, contiguous strip of tile rows."""
    grid_x, grid_y = tile_grid(width, height)
    grid_y_pad = -(-grid_y // num_shards) * num_shards
    return grid_x, grid_y_pad


def _shard_render(
    xyz, features, scaling, rotation, opacity, mask, cam_arrays, bg_color,
    m2d_offset,
    *, num_shards, width, height, sh_degree, settings: RasterizeSettings,
):
    """Per-shard body (runs under shard_map over 'model')."""
    view_t, full_proj_t, cam_center, tan_fovx, tan_fovy = cam_arrays
    grid_x, grid_y_pad = padded_grid(width, height, num_shards)
    height_pad = grid_y_pad * TILE
    num_tiles = grid_x * grid_y_pad
    t_loc = num_tiles // num_shards
    me = jax.lax.axis_index("model")

    # NB: preprocess projects with the REAL image height — the strip
    # padding only widens the tile grid (extra empty tile rows), it must
    # not change the camera.
    prep = preprocess(
        xyz, jax.nn.sigmoid(opacity)[:, 0], view_t, full_proj_t, cam_center,
        tan_fovx, tan_fovy, width, height,
        sh_degree=sh_degree, shs=features,
        scales=jnp.exp(scaling),
        rotations=rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True),
        mask=mask,
    )
    # The densification grad tap (api.render's means2d_offset): zeros in
    # the forward pass, its cotangent is the per-Gaussian screen-space
    # positional gradient (shard-local rows — no collective).
    prep = prep._replace(means2d=prep.means2d + m2d_offset)

    # 1. LOCAL binning against the GLOBAL grid. bin_gaussians sorts by
    # (tile, local depth rank); the cross-shard depth merge happens after
    # routing (step 3).
    dup_local = max(settings.dup_capacity // num_shards, 1 << 10)
    b = bin_gaussians(
        prep.means2d, prep.depths, prep.radii, width, height_pad,
        dup_capacity=dup_local,
        max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
        phase_a_tiles=settings.phase_a_tiles,
        big_budget_divisor=settings.big_budget_divisor,
        floor_band_budget=settings.floor_band_budget,
        ext_x=prep.extent_x, ext_y=prep.extent_y,
        conics=prep.conics if settings.tile_cull else None,
        opacities=prep.opacities if settings.tile_cull else None,
    )
    K = b.gauss_idx.shape[0]
    live = jnp.arange(K) < b.tile_end[-1]  # valid prefix of the sorted list

    packed_g = jnp.stack(
        [
            prep.means2d[:, 0], prep.means2d[:, 1],
            prep.conics[:, 0], prep.conics[:, 1], prep.conics[:, 2],
            prep.opacities, prep.depths,
            prep.colors[:, 0], prep.colors[:, 1], prep.colors[:, 2],
        ],
        axis=1,
    )  # [nloc, 10]
    rows = packed_g[b.gauss_idx] * live[:, None]  # [K, 10], tail zeroed
    payload = jnp.concatenate(
        [
            jnp.where(live, b.tile_of_dup, num_tiles)[:, None].astype(
                jnp.float32),
            jnp.where(live, prep.depths[b.gauss_idx], jnp.inf)[:, None],
            rows,
        ],
        axis=1,
    )  # [K, 12]; tile exact in f32 (num_tiles << 2^24)

    # 2. Bucket by destination shard. The list is tile-sorted and tile
    # strips are contiguous, so destinations form contiguous segments.
    bounds = jnp.searchsorted(
        b.tile_of_dup, jnp.arange(num_shards + 1, dtype=jnp.int32) * t_loc
    ).astype(jnp.int32)
    cap = settings.route_capacity if settings.route_capacity > 0 else max(
        dup_local // max(num_shards // 2, 1), 256
    )
    idx = bounds[:-1, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = idx < bounds[1:, None]
    overflow_route = jnp.any(bounds[1:] - bounds[:-1] > cap)
    sentinel = jnp.concatenate(
        [jnp.array([num_tiles], jnp.float32), jnp.array([jnp.inf]),
         jnp.zeros(10)]
    )
    bucket = jnp.where(
        valid[:, :, None], payload[jnp.minimum(idx, K - 1)], sentinel
    )  # [P, cap, 12]

    recv = jax.lax.all_to_all(bucket, "model", split_axis=0, concat_axis=0,
                              tiled=True)  # [P, cap, 12]
    flat = recv.reshape(num_shards * cap, 12)

    # 3. Re-establish exact global front-to-back order inside my tiles:
    # 2-key (local tile, depth) sort, then one gather of the rows.
    tile_local = jnp.clip(
        flat[:, 0].astype(jnp.int32) - me * t_loc, 0, t_loc
    )
    iota = jnp.arange(flat.shape[0], dtype=jnp.int32)
    s_tile, _s_depth, order = jax.lax.sort(
        (tile_local, flat[:, 1], iota), dimension=0, num_keys=2
    )
    rows_sorted = flat[order, 2:]  # [Kr, 10]
    tb = jnp.searchsorted(
        s_tile, jnp.arange(t_loc + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    starts, ends = tb[:-1], tb[1:]

    # 4. Blend my tile strip. Means are recentred on the owning tile's
    # pixel origin with tile-LOCAL pixel coords, matching the single-chip
    # pallas path (see pallas_path.py — keeps in-kernel coordinate
    # magnitudes small).
    pt = rows_sorted.T  # [10, Kr]
    g_tile = s_tile + me * t_loc
    rox = (g_tile % grid_x).astype(jnp.float32) * TILE
    roy = (g_tile // grid_x).astype(jnp.float32) * TILE
    pt = jnp.concatenate(
        [pt[0:1] - rox[None], pt[1:2] - roy[None], pt[2:]], axis=0
    )
    if settings.fast_chain:
        pt = pt.astype(jnp.bfloat16)  # see pallas_path.py bf16 packing
    packed = jnp.pad(pt, ((0, pb.NROWS - pt.shape[0]), (0, pb.G)))
    px, py = _tile_pixel_coords(grid_x, grid_y_pad)  # [T_global, P]
    t_org = jnp.arange(px.shape[0], dtype=jnp.int32)
    px = px - ((t_org % grid_x) * TILE).astype(jnp.float32)[:, None]
    py = py - ((t_org // grid_x) * TILE).astype(jnp.float32)[:, None]
    px = jax.lax.dynamic_slice_in_dim(px, me * t_loc, t_loc, 0)
    py = jax.lax.dynamic_slice_in_dim(py, me * t_loc, t_loc, 0)
    pixf = jnp.stack([px, py], axis=-1)
    # quad MXU power: strip path has no jitter (integer pixel coords).
    acc, tfin = pb.blend(packed, pixf, starts, ends, t_loc,
                         settings.pallas_interpret, settings.fast_chain,
                         settings.quad_power)
    color_t = acc[:, :, pb.R_R:pb.R_B2 + 1]
    color_t = color_t + tfin[..., None] * bg_color[None, None, :]
    depth_t = acc[:, :, pb.R_DEPTH]

    rows_strip = t_loc // grid_x  # tile rows per shard

    def untile(x, ch):
        img = x.reshape(rows_strip, grid_x, TILE, TILE, ch)
        img = img.transpose(0, 2, 1, 3, 4)
        return img.reshape(rows_strip * TILE, grid_x * TILE, ch)[:, :width]

    strip = untile(color_t, 3)  # [H_pad/P, width, 3]
    depth_strip = untile(depth_t[..., None], 1)[..., 0]
    tfin_strip = untile(tfin[..., None], 1)[..., 0]
    def _any(flag):
        return jax.lax.pmax(flag.astype(jnp.int32), "model").astype(bool)

    overflow = _any(b.overflow | overflow_route)
    return (strip, depth_strip, tfin_strip, prep.radii, overflow,
            _any(b.overflow_emit), _any(b.overflow_rect),
            _any(overflow_route))


def render_tile_sharded(
    camera,
    scene,
    bg_color: jnp.ndarray,
    mesh: Mesh,
    settings: RasterizeSettings = RasterizeSettings(),
    means2d_offset: Optional[jnp.ndarray] = None,
) -> dict:
    """Render with Gaussians sharded over `model` and the image tile-strip
    partitioned across shards. Returns the api.render dict; `render` /
    `depth` / `final_T` come back H-padded to the strip multiple and
    sharded over `model` on axis 0 (crop with [:camera.height] after any
    sharded loss). `radii` / `visibility_filter` stay model-sharded.
    `means2d_offset` ([capacity, 2] zeros, model-sharded) is the
    screen-space gradient tap, as in api.render."""
    num_shards = mesh.shape["model"]
    width, height = camera.width, camera.height
    _, grid_y_pad = padded_grid(width, height, num_shards)
    height_pad = grid_y_pad * TILE

    cam_arrays = (camera.view_transform, camera.full_proj_transform,
                  camera.camera_center, camera.tan_fovx, camera.tan_fovy)

    fn = functools.partial(
        _shard_render, num_shards=num_shards, width=width, height=height,
        sh_degree=int(scene.active_sh_degree), settings=settings,
    )
    if means2d_offset is None:
        means2d_offset = jnp.zeros((scene.capacity, 2), jnp.float32)
    shard = P("model")
    rep = P()
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(shard, shard, shard, shard, shard, shard, rep, rep, shard),
        out_specs=(shard, shard, shard, shard, rep, rep, rep, rep),
        check_vma=False,
    )
    strip, depth, tfin, radii, overflow, ovf_emit, ovf_rect, ovf_route = (
        mapped(
            scene.xyz, scene.get_features, scene.scaling, scene.rotation,
            scene.opacity, scene.mask, cam_arrays, bg_color, means2d_offset,
        )
    )
    return {
        "render": strip,  # [height_pad, width, 3] sharded over model
        "depth": depth,
        "final_T": tfin,
        "radii": radii,
        "visibility_filter": radii > 0,
        "overflow": overflow,
        "overflow_emit": ovf_emit,
        "overflow_rect": ovf_rect,
        # Route-bucket truncation is its own cause: with an explicit
        # settings.route_capacity the host must grow THAT knob (growing
        # dup_capacity would never clear it); with auto sizing the bucket
        # derives from dup_capacity (see `cap` above) so dup growth works.
        "overflow_route": ovf_route,
        "height_pad": height_pad,
    }
