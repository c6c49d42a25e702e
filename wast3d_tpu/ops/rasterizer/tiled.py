"""Tiled differentiable rasterizer: sorted per-tile alpha compositing.

The production render path (XLA version; a Pallas kernel specializes the
inner blend further — see `pallas_blend.py`). Replaces `renderCUDA`
forward/backward (`/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:262-390`, `backward.cu:414-640`) with a
formulation XLA differentiates automatically:

The CUDA kernel walks each tile's depth-sorted list sequentially per
pixel, maintaining transmittance T with early exit. We compute the same
compositing weights w_i = alpha_i * T_i in closed form per fixed-size
chunk: within a chunk, T is an exclusive cumprod of (1 - alpha) scaled by
the carry transmittance, so the color/depth accumulation becomes a
(pixels x chunk) @ (chunk x channels) **matmul — MXU work** — instead of a
serial loop. The early-termination rule (stop before the Gaussian that
would push T < 1e-4, `forward.cu:357-362`) becomes a monotone `done` mask.

Gradient notes: the backward pass is XLA autodiff of this graph. The
gather of per-Gaussian data into sorted order transposes to a scatter-add
— the deterministic, sort-order-independent equivalent of the CUDA
backward's atomicAdd accumulation (`backward.cu:552`).

Static-capacity semantics vs CUDA (documented, sized to not bind):
per-tile lists are truncated at `max_per_tile` entries.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from wast3d_tpu.ops.rasterizer.binning import TILE, Binning, bin_gaussians, tile_grid
from wast3d_tpu.ops.rasterizer.oracle import ALPHA_MAX, ALPHA_MIN, T_EPS
from wast3d_tpu.ops.rasterizer.preprocess import Preprocessed


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # [H,W,3]
    depth: jnp.ndarray  # [H,W]
    final_T: jnp.ndarray  # [H,W]
    overflow: jnp.ndarray  # [] bool (any capacity exceeded)
    # Cause split (see binning.Binning): emission-budget truncation
    # (phase budget / tiled per-tile cap -> grow phase_a_tiles /
    # max_per_tile), rect-ceiling truncation (-> grow
    # max_tiles_per_gaussian), dup_capacity otherwise.
    overflow_emit: jnp.ndarray = None  # [] bool
    overflow_rect: jnp.ndarray = None  # [] bool


def _tile_pixel_coords(grid_x: int, grid_y: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel centers for each (tile, pixel) pair; [T, P] each, P = TILE*TILE."""
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    tx, ty = t % grid_x, t // grid_x
    p = jnp.arange(TILE * TILE, dtype=jnp.int32)
    px_in, py_in = p % TILE, p // TILE
    px = tx[:, None] * TILE + px_in[None, :]
    py = ty[:, None] * TILE + py_in[None, :]
    return px.astype(jnp.float32), py.astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("width", "height", "dup_capacity", "max_per_tile", "chunk",
                     "max_tiles_per_gaussian", "phase_a_tiles",
                     "big_budget_divisor", "floor_band_budget", "phase_plan",
                     "tile_cull"),
)
def render_tiled(
    prep: Preprocessed,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    sampling_offsets: Optional[jnp.ndarray] = None,
    dup_capacity: int = 1 << 18,
    max_per_tile: int = 1024,
    chunk: int = 32,
    max_tiles_per_gaussian: int = 512,
    phase_a_tiles: int = 6,
    big_budget_divisor: int = 16,
    floor_band_budget: int = 256,
    phase_plan: tuple = (),
    tile_cull: bool = True,
) -> RenderOutput:
    """Rasterize preprocessed Gaussians. All capacities static."""
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

    # Gather per-duplicate data into sorted order once ([K, ...]); the
    # in-chunk gathers below then read contiguous-ish slices of these.
    g = binning.gauss_idx
    s_mx = prep.means2d[g, 0]
    s_my = prep.means2d[g, 1]
    s_conic = prep.conics[g]
    s_color = prep.colors[g]
    s_opac = prep.opacities[g]
    s_depth = prep.depths[g]

    px, py = _tile_pixel_coords(grid_x, grid_y)  # [T,P]
    if sampling_offsets is not None:
        # offsets are per *image* pixel [H,W,2]; arrange to tile layout with
        # zero padding outside the image.
        pad_h, pad_w = grid_y * TILE, grid_x * TILE
        off = jnp.zeros((pad_h, pad_w, 2), jnp.float32)
        off = off.at[:height, :width].set(sampling_offsets)
        off = off.reshape(grid_y, TILE, grid_x, TILE, 2).transpose(0, 2, 1, 3, 4)
        off = off.reshape(num_tiles, P, 2)
        px = px + off[..., 0]
        py = py + off[..., 1]

    n_chunks = max_per_tile // chunk
    start = binning.tile_start
    end = binning.tile_end
    K = s_mx.shape[0]

    def body(carry, c):
        T_run, done, color_acc, depth_acc = carry
        idx = start[:, None] + c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_range = idx < end[:, None]
        idx_c = jnp.minimum(idx, K - 1)

        mx = s_mx[idx_c]  # [T,Gc]
        my = s_my[idx_c]
        conic = s_conic[idx_c]  # [T,Gc,3]
        opac = s_opac[idx_c]
        colors = s_color[idx_c]  # [T,Gc,3]
        depths = s_depth[idx_c]

        dx = mx[:, None, :] - px[:, :, None]  # [T,P,Gc]
        dy = my[:, None, :] - py[:, :, None]
        a, b_, cc = (conic[..., i][:, None, :] for i in range(3))
        power = -0.5 * (a * dx * dx + cc * dy * dy) - b_ * dx * dy
        alpha = jnp.minimum(
            ALPHA_MAX, opac[:, None, :] * jnp.exp(jnp.clip(power, -50.0, 0.0))
        )
        skip = (power > 0.0) | (alpha < ALPHA_MIN) | ~in_range[:, None, :]
        alpha = jnp.where(skip, 0.0, alpha)

        one_m = 1.0 - alpha
        cp = jnp.cumprod(one_m, axis=-1)
        T_prev = T_run[..., None] * jnp.concatenate(
            [jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1
        )
        test_T = T_prev * one_m
        newly_done = jnp.cumsum((test_T < T_EPS).astype(jnp.int32), axis=-1) > 0
        done_g = done[..., None] | newly_done
        w = jnp.where(done_g, 0.0, alpha * T_prev)  # [T,P,Gc]

        color_acc = color_acc + jax.lax.dot_general(
            w, colors, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [T,P,3]
        depth_acc = depth_acc + jnp.einsum("tpg,tg->tp", w, depths)

        contributed = jnp.where(done_g, 0.0, alpha)
        T_run = T_run * jnp.prod(1.0 - contributed, axis=-1)
        done = done_g[..., -1]
        return (T_run, done, color_acc, depth_acc), None

    init = (
        jnp.ones((num_tiles, P), jnp.float32),
        jnp.zeros((num_tiles, P), bool),
        jnp.zeros((num_tiles, P, 3), jnp.float32),
        jnp.zeros((num_tiles, P), jnp.float32),
    )
    # Remat the chunk body: without it, reverse-mode saves the (T, P, chunk)
    # alpha/weight intermediates for every chunk step (GBs at scale); with
    # it, the backward recomputes them per chunk — same trade the CUDA
    # backward makes by re-walking the sorted list (backward.cu:414).
    (T_run, done, color_acc, depth_acc), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks)
    )

    color_acc = color_acc + T_run[..., None] * bg_color[None, None, :]

    # Truncation diagnostic: any tile longer than max_per_tile.
    tile_trunc = jnp.any(end - start > max_per_tile)
    overflow = binning.overflow | tile_trunc
    overflow_emit = binning.overflow_emit | tile_trunc

    def untile(x, ch):
        img = x.reshape(grid_y, grid_x, TILE, TILE, ch).transpose(0, 2, 1, 3, 4)
        img = img.reshape(grid_y * TILE, grid_x * TILE, ch)
        return img[:height, :width]

    color = untile(color_acc, 3)
    depth = untile(depth_acc[..., None], 1)[..., 0]
    final_T = untile(T_run[..., None], 1)[..., 0]
    return RenderOutput(color=color, depth=depth, final_T=final_T,
                        overflow=overflow, overflow_emit=overflow_emit,
                        overflow_rect=binning.overflow_rect)
