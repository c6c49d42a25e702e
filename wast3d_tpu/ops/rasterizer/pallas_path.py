"""Pallas render path: binning + gather + packed blend kernel + untile.

Production single-chip render path. Same inputs/outputs as
`tiled.render_tiled` but the per-tile blend runs in the Pallas kernel
(`pallas_blend.py`) with exact ragged ranges and early termination instead
of the XLA path's uniform max_per_tile padding.

Differentiability: preprocess -> gather -> pack stays in XLA autodiff
(the gather's transpose is the deterministic per-Gaussian scatter-add);
the blend has a custom VJP backed by the backward kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from wast3d_tpu.ops.rasterizer import pallas_blend as pb
from wast3d_tpu.ops.rasterizer.binning import TILE, bin_gaussians, tile_grid
from wast3d_tpu.ops.rasterizer.preprocess import Preprocessed
from wast3d_tpu.ops.rasterizer.tiled import RenderOutput, _tile_pixel_coords


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sorted_gather(source, safe_rank, grad_reduce):
    """Depth-ordered rows -> sorted-duplicate rows; the K-row gather whose
    autodiff transpose (a K->N scatter-add over `safe_rank`) is the train
    step's single most expensive XLA op (~16 ms at 856k dups on v5e).
    `grad_reduce` selects the backward implementation (measured step
    times in RasterizeSettings doc):
      - "segsum_sortpacked": rank sort carrying bf16-packed gradient
        pairs as uint32 payloads + streaming kernel (the DEFAULT).
      - "segsum_sortpayload": same with f32 payloads.
      - "segsum": rank sort + K-row gather + streaming kernel.
      - "scatter": XLA scatter-add (bit-exact reference semantics).
      - "none" / "sortgather": measurement-only ablations (WRONG grads)
        used to cost the reduction in situ (NOTES_PERF.md traps)."""
    return source[safe_rank]


def _sg_fwd(source, safe_rank, grad_reduce):
    return source[safe_rank], (safe_rank, source.shape[0])


def _sg_bwd(grad_reduce, res, d_sorted):
    safe_rank, n1 = res
    C = d_sorted.shape[1]
    if grad_reduce == "none":
        # Measurement only: drop the reduction but keep a data dependence.
        d_source = jnp.zeros((n1, C), d_sorted.dtype).at[0, 0].add(
            d_sorted[0, 0]
        )
    elif grad_reduce == "sortgather":
        # Measurement only: pay the rank sort + K-row gather, skip the
        # segment reduction (strided sum keeps the dependence).
        k = safe_rank.shape[0]
        _, perm = jax.lax.sort(
            (safe_rank, jnp.arange(k, dtype=jnp.int32)), num_keys=1
        )
        g = d_sorted[perm]
        d_source = jnp.zeros((n1, C), d_sorted.dtype).at[0].add(
            jnp.sum(g[::257], axis=0)
        )
    elif grad_reduce == "segsum":
        from wast3d_tpu.ops.rasterizer.grad_reduce import segment_reduce_by_rank

        d_source = segment_reduce_by_rank(
            d_sorted, safe_rank, n1,
            interpret=jax.default_backend() == "cpu",
        )
    elif grad_reduce == "segsum_sortpayload":
        from wast3d_tpu.ops.rasterizer.grad_reduce import (
            segment_reduce_by_rank_sortpayload,
        )

        d_source = segment_reduce_by_rank_sortpayload(
            d_sorted, safe_rank, n1,
            interpret=jax.default_backend() == "cpu",
        )
    elif grad_reduce == "segsum_sortpacked":
        from wast3d_tpu.ops.rasterizer.grad_reduce import (
            segment_reduce_by_rank_sortpacked,
        )

        d_source = segment_reduce_by_rank_sortpacked(
            d_sorted, safe_rank, n1,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        d_source = jnp.zeros((n1, C), d_sorted.dtype).at[safe_rank].add(
            d_sorted
        )
    return d_source, None


_sorted_gather.defvjp(_sg_fwd, _sg_bwd)


@partial(
    jax.jit,
    static_argnames=("width", "height", "dup_capacity",
                     "max_tiles_per_gaussian", "interpret",
                     "phase_a_tiles", "big_budget_divisor",
                     "floor_band_budget", "phase_plan", "grad_reduce",
                     "fast_chain", "tile_cull", "pack_gather", "quad_power"),
)
def render_pallas(
    prep: Preprocessed,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    sampling_offsets: Optional[jnp.ndarray] = None,
    dup_capacity: int = 1 << 18,
    max_tiles_per_gaussian: int = 512,
    interpret: bool = False,
    phase_a_tiles: int = 6,
    big_budget_divisor: int = 16,
    floor_band_budget: int = 256,
    phase_plan: tuple = (),
    grad_reduce: str = "scatter",
    fast_chain: bool = False,
    tile_cull: bool = True,
    pack_gather: bool = False,
    quad_power: bool = True,
) -> RenderOutput:
    grid_x, grid_y = tile_grid(width, height)
    num_tiles = grid_x * grid_y
    P = TILE * TILE

    binning = bin_gaussians(
        prep.means2d, prep.depths, prep.radii, width, height,
        dup_capacity=dup_capacity, max_tiles_per_gaussian=max_tiles_per_gaussian,
        phase_a_tiles=phase_a_tiles, big_budget_divisor=big_budget_divisor,
        floor_band_budget=floor_band_budget, phase_plan=phase_plan,
        ext_x=prep.extent_x, ext_y=prep.extent_y,
        conics=prep.conics if tile_cull else None,
        opacities=prep.opacities if tile_cull else None,
        jitter_margin=1.0 if sampling_offsets is not None else 0.0,
    )
    K = binning.rank.shape[0]
    safe_rank_full = jnp.where(
        jnp.arange(K, dtype=jnp.int32) < binning.tile_end[-1],
        binning.rank, prep.means2d.shape[0],
    )
    ox = (binning.tile_of_dup % grid_x).astype(jnp.float32) * TILE
    oy = (binning.tile_of_dup // grid_x).astype(jnp.float32) * TILE
    if pack_gather:
        if not fast_chain:
            raise ValueError("pack_gather requires fast_chain (bf16 tier)")
        # Serving-only fast gather: split-bf16 pack per Gaussian FIRST
        # (N-sized, elementwise), gather 6 uint32 (24 B) per duplicate
        # instead of 10 f32 (40 B) — the random K-row gather is
        # HBM-latency-bound, so bytes/row is the lever. Means travel as
        # hi+lo bf16 halves: hi - tile_origin is exact in f32 (both
        # integer-grid magnitudes), + lo restores the subpixel part, so
        # the final bf16 recentred coordinate has the same error class
        # as the fast_chain cast in the f32 path below. uint32 bitcast
        # is NOT differentiable — autodiff through this branch raises
        # (by design: serving only).
        mx, my = prep.means2d[:, 0], prep.means2d[:, 1]
        mx_hi = mx.astype(jnp.bfloat16)
        my_hi = my.astype(jnp.bfloat16)
        cols = jnp.stack(
            [mx_hi.astype(jnp.float32), mx - mx_hi.astype(jnp.float32),
             my_hi.astype(jnp.float32), my - my_hi.astype(jnp.float32),
             prep.conics[:, 0], prep.conics[:, 1], prep.conics[:, 2],
             prep.opacities, prep.depths,
             prep.colors[:, 0], prep.colors[:, 1], prep.colors[:, 2]],
            axis=1).astype(jnp.bfloat16)  # [N,12]
        packed_u32 = jax.lax.bitcast_convert_type(
            cols.reshape(-1, 6, 2), jnp.uint32)  # [N,6]
        src = jnp.concatenate(
            [packed_u32[binning.depth_order],
             jnp.zeros((1, 6), jnp.uint32)])
        rows = jax.lax.bitcast_convert_type(
            src[safe_rank_full], jnp.bfloat16).reshape(-1, 12)  # [K,12]
        mxl = (rows[:, 0].astype(jnp.float32) - ox
               + rows[:, 1].astype(jnp.float32)).astype(jnp.bfloat16)
        myl = (rows[:, 2].astype(jnp.float32) - oy
               + rows[:, 3].astype(jnp.float32)).astype(jnp.bfloat16)
        pt = jnp.concatenate([mxl[None], myl[None], rows[:, 4:].T], axis=0)
        packed = jnp.pad(pt, ((0, pb.NROWS - pt.shape[0]), (0, pb.G)))
        return _blend_untile(
            packed, binning, width, height, grid_x, grid_y, num_tiles, P,
            bg_color, sampling_offsets, interpret, fast_chain, quad_power)
    # Pack per-Gaussian rows once (elementwise), then ONE gather into sorted
    # order + transpose — instead of six separate gathers.
    packed_g = jnp.stack(
        [
            prep.means2d[:, 0], prep.means2d[:, 1],
            prep.conics[:, 0], prep.conics[:, 1], prep.conics[:, 2],
            prep.opacities, prep.depths,
            prep.colors[:, 0], prep.colors[:, 1], prep.colors[:, 2],
        ],
        axis=1,
    )  # [N,10]
    n = packed_g.shape[0]
    # Two-hop gather: one cheap N-row reorder into depth order, then the
    # K-row gather by rank (saves a separate K-row int gather of gauss_idx
    # — random K-row gathers cost ~7.6ms/M-rows on v5e). Invalid tail
    # entries (sorted past the last real tile) are never inside any
    # [start, end) so the kernel ignores them, but they must not poison
    # via NaN: redirect their rank to an all-zero sentinel row instead of
    # masking the (much larger) packed output after the fact.
    source = jnp.concatenate(
        [packed_g[binning.depth_order], jnp.zeros((1, 10), jnp.float32)]
    )  # [N+1,10], row n = sentinel zeros
    sorted_rows = _sorted_gather(source, safe_rank_full, grad_reduce)  # [K,10]
    # Recentre means on the OWNING tile's pixel origin (each duplicate
    # belongs to exactly one tile) and hand the kernel tile-LOCAL pixel
    # coords: dx = mx - px is invariant, but the kernel now only ever
    # sees coordinates of magnitude <= tile size + splat extent instead
    # of full image coordinates — which is what makes a reduced-precision
    # (bf16) in-kernel chain viable (bf16 on a ~1000px coordinate is a
    # +-2px position error; on a recentred one it is subpixel).
    pt = sorted_rows.T  # [10,K]
    pt = jnp.concatenate(
        [pt[0:1] - ox[None], pt[1:2] - oy[None], pt[2:]], axis=0
    )
    if fast_chain:
        # bf16-packed kernel data: recentring (above) happens in f32
        # first, so the quantization error is on tile-LOCAL coordinates
        # (subpixel), not on image coordinates. Halves the pack
        # transpose + kernel DMA bytes and deletes the in-kernel casts.
        pt = pt.astype(jnp.bfloat16)
    packed = jnp.pad(pt, ((0, pb.NROWS - pt.shape[0]), (0, pb.G)))  # [16,K+G]
    return _blend_untile(
        packed, binning, width, height, grid_x, grid_y, num_tiles, P,
        bg_color, sampling_offsets, interpret, fast_chain, quad_power)


def _blend_untile(packed, binning, width, height, grid_x, grid_y, num_tiles,
                  P, bg_color, sampling_offsets, interpret, fast_chain,
                  quad_power=True):
    """Shared tail: per-tile pixel coords (+ jitter), blend kernel,
    background composite, untile to image layout."""
    px, py = _tile_pixel_coords(grid_x, grid_y)  # [T,P]
    t_org = jnp.arange(num_tiles, dtype=jnp.int32)
    px = px - ((t_org % grid_x) * TILE).astype(jnp.float32)[:, None]
    py = py - ((t_org // grid_x) * TILE).astype(jnp.float32)[:, None]
    if sampling_offsets is not None:
        pad_h, pad_w = grid_y * TILE, grid_x * TILE
        off = jnp.zeros((pad_h, pad_w, 2), jnp.float32)
        off = off.at[:height, :width].set(sampling_offsets)
        off = off.reshape(grid_y, TILE, grid_x, TILE, 2).transpose(0, 2, 1, 3, 4)
        off = off.reshape(num_tiles, P, 2)
        px = px + off[..., 0]
        py = py + off[..., 1]
    pixf = jnp.stack([px, py], axis=-1)  # [T,P,2]

    # quad: MXU power path needs integer pixel coords (no jitter).
    # Exact tier uses the triple-split (2^-24) variant, fast the
    # double-split — both tighter than their chain's own class.
    acc, tfin = pb.blend(
        packed, pixf, binning.tile_start, binning.tile_end, num_tiles,
        interpret, fast_chain, quad_power and sampling_offsets is None,
    )
    color_t = acc[:, :, pb.R_R:pb.R_B2 + 1]  # [T,P,3]
    depth_t = acc[:, :, pb.R_DEPTH]  # [T,P]
    color_t = color_t + tfin[..., None] * bg_color[None, None, :]

    def untile(x, ch):
        img = x.reshape(grid_y, grid_x, TILE, TILE, ch).transpose(0, 2, 1, 3, 4)
        return img.reshape(grid_y * TILE, grid_x * TILE, ch)[:height, :width]

    return RenderOutput(
        color=untile(color_t, 3),
        depth=untile(depth_t[..., None], 1)[..., 0],
        final_T=untile(tfin[..., None], 1)[..., 0],
        overflow=binning.overflow,
        overflow_emit=binning.overflow_emit,
        overflow_rect=binning.overflow_rect,
    )
