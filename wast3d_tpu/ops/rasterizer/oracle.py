"""Oracle renderer: exact but slow per-pixel splatting, O(N·H·W).

Test-only reference implementation of the compositing semantics of
`renderCUDA` (`/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:262-390`):

- per-pixel jittered sample position pixf = pix + offset (`:287-290`),
- alpha = min(0.99, opacity * exp(power)), skipped when power > 0 or
  alpha < 1/255 (`:346-356`),
- front-to-back order by view depth; compositing stops *before* the
  Gaussian whose inclusion would push transmittance below 1e-4 (`:357-362`),
- expected depth D += depth * alpha * T (the fork's addition, `:369`),
- final color = C + T_final * bg (`:386`).

With tile_cull=True (default) the oracle also replicates the 3-sigma
screen-rect tile cull, making it bit-comparable to the production tiled
path; tile_cull=False composites every Gaussian at every pixel (the
mathematically exact footprint).

Fully differentiable by JAX autodiff (masks become exact subgradients,
matching the reference's hand-written backward)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from wast3d_tpu.ops.rasterizer.binning import TILE, compute_rects, tile_grid
from wast3d_tpu.ops.rasterizer.preprocess import Preprocessed

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _sort_by_depth(prep: Preprocessed) -> Preprocessed:
    order = jnp.argsort(jnp.where(prep.valid, prep.depths, jnp.inf))
    return Preprocessed(*(jnp.take(x, order, axis=0) for x in prep))


def render_oracle(
    prep: Preprocessed,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    sampling_offsets: Optional[jnp.ndarray] = None,
    row_block: int = 16,
    tile_cull: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite all Gaussians at every pixel.

    tile_cull=True replicates the CUDA/tiled-path semantics where a
    Gaussian only touches pixels of tiles inside its 3-sigma screen rect
    (`getRect`, auxiliary.h:46-56); False composites the true footprint.

    Returns (color [H,W,3], depth [H,W], final_T [H,W])."""
    prep = _sort_by_depth(prep)
    n = prep.means2d.shape[0]

    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # [H,W]
    tx = (px / TILE).astype(jnp.int32)  # tile of the *integer* pixel
    ty = (py / TILE).astype(jnp.int32)
    if sampling_offsets is not None:
        px = px + sampling_offsets[..., 0]
        py = py + sampling_offsets[..., 1]
    gx, gy = tile_grid(width, height)
    xmin, ymin, xmax, ymax = compute_rects(prep.means2d, prep.radii, gx, gy)

    conic = prep.conics
    alpha_gate = prep.valid & (prep.radii > 0)

    def row_fn(carry, pix_xy):
        pxr, pyr, txr, tyr = pix_xy  # [B,W]
        dx = prep.means2d[:, 0][None, None, :] - pxr[..., None]  # [B,W,N]
        dy = prep.means2d[:, 1][None, None, :] - pyr[..., None]
        if tile_cull:
            in_rect = (
                (txr[..., None] >= xmin) & (txr[..., None] < xmax)
                & (tyr[..., None] >= ymin) & (tyr[..., None] < ymax)
            )
        else:
            in_rect = True
        power = (
            -0.5 * (conic[:, 0] * dx * dx + conic[:, 2] * dy * dy)
            - conic[:, 1] * dx * dy
        )
        # Clamp before exp so far-away/dead Gaussians keep finite gradients
        # (semantics unchanged: power>0 is skipped, exp(-50) < ALPHA_MIN).
        alpha = jnp.minimum(
            ALPHA_MAX, prep.opacities * jnp.exp(jnp.clip(power, -50.0, 0.0))
        )
        skip = (power > 0.0) | (alpha < ALPHA_MIN) | ~alpha_gate | ~in_rect
        alpha = jnp.where(skip, 0.0, alpha)

        # Transmittance before each Gaussian (exclusive cumprod, front to back).
        one_m = 1.0 - alpha
        cp = jnp.cumprod(one_m, axis=-1)
        T_prev = jnp.concatenate(
            [jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1
        )
        # Early termination: the reference stops before compositing the
        # Gaussian that would drop T below 1e-4 (forward.cu:357-362).
        test_T = T_prev * one_m
        done = jnp.cumsum((test_T < T_EPS).astype(jnp.int32), axis=-1) > 0
        w = jnp.where(done, 0.0, alpha * T_prev)  # [B,W,N]

        color = jnp.einsum("bwn,nc->bwc", w, prep.colors)
        depth = jnp.einsum("bwn,n->bw", w, prep.depths)
        # Final transmittance = T after the last composited Gaussian.
        contributed = jnp.where(done, 0.0, alpha)
        final_T = jnp.prod(1.0 - contributed, axis=-1)
        color = color + final_T[..., None] * bg_color[None, None, :]
        return carry, (color, depth, final_T)

    # Pad rows to a block multiple; extra rows render (cheap) and are cropped.
    pad = (-height) % row_block
    hp = height + pad
    if pad:
        px = jnp.pad(px, ((0, pad), (0, 0)), constant_values=-1e4)
        py = jnp.pad(py, ((0, pad), (0, 0)), constant_values=-1e4)
        tx = jnp.pad(tx, ((0, pad), (0, 0)))
        ty = jnp.pad(ty, ((0, pad), (0, 0)))
    nrow_blocks = hp // row_block
    px_b = px.reshape(nrow_blocks, row_block, width)
    py_b = py.reshape(nrow_blocks, row_block, width)
    tx_b = tx.reshape(nrow_blocks, row_block, width)
    ty_b = ty.reshape(nrow_blocks, row_block, width)
    _, (color, depth, final_T) = jax.lax.scan(row_fn, None, (px_b, py_b, tx_b, ty_b))
    return (
        color.reshape(hp, width, 3)[:height],
        depth.reshape(hp, width)[:height],
        final_T.reshape(hp, width)[:height],
    )
