"""Sharded image losses for the tile-strip training step.

`make_tile_sharded_train_step` renders the image strip-partitioned over
the `model` axis (parallel/render_sharded.py). Running the photometric
loss at jit level on that sharded render makes XLA all-gather the full
image once per windowed-SSIM op: 33 image-sized all-gathers, 427 MB/step
at 1296x832 — N-independent, and ~44% of the step's total collective
bytes (runs/sharded4m/sharded_4m.json, r4 audit). On DCN-connected or
large meshes that becomes the wall.

The SSIM window is 11 taps (sigma 1.5), so the ONLY cross-strip data the
loss actually needs is a 5-row halo on each side of every strip: this
module computes the exact same (1-l)*L1 + l*(1-SSIM) with two
`ppermute` halo exchanges (~5*W*3 floats each way, ~0.3 MB total at
1296-wide, a ~1000x cut vs the all-gathers) and a scalar `psum`.

Exactness: the jit-level loss crops the strip to [:H] and SSIM
zero-pads at the image edges (`ops/image_losses._depthwise_blur`). Here
rows >= H are masked to zero, edge devices receive zero halos (ppermute
with no source yields zeros), and the per-device partial sums divide by
the SAME H*W*C denominators — identical math, different summation order
(fp reassociation only; tests pin 1e-6-class agreement on a CPU mesh).

The reference computes this loss on one GPU on an unsharded image
(`/root/reference/train.py:96-98`, `utils/loss_utils.py:24-64`); there
is no CUDA analogue of the halo structure because there is no sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wast3d_tpu.ops.image_losses import _gaussian_window

_HALO = 5  # (11-tap window) // 2


def _blur_rows_valid(x: jnp.ndarray, window: jnp.ndarray, rp: int):
    """Vertical 11-tap blur of a halo-extended strip [rp+10, W, C] ->
    [rp, W, C] (the 'valid' rows, which equal the same-padded blur of the
    full image restricted to this strip)."""
    return sum(window[i] * jax.lax.dynamic_slice_in_dim(x, i, rp, 0)
               for i in range(window.shape[0]))


def _blur_cols_same(x: jnp.ndarray, window: jnp.ndarray):
    """Horizontal same-(zero-)padded blur on [rp, W, C] — row-local."""
    k = window.shape[0]
    r = k // 2
    w = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)))
    return sum(window[i] * jax.lax.dynamic_slice_in_dim(xp, i, w, 1)
               for i in range(k))


def _halo_extend(x: jnp.ndarray, num_shards: int, axis_name: str):
    """Prepend/append the neighbouring strips' edge rows: [rp, W, C] ->
    [rp+2*HALO, W, C]. Devices at the image edges receive zeros (exactly
    the same-padding the unsharded blur applies)."""
    down = [(i, i + 1) for i in range(num_shards - 1)]  # to next strip
    up = [(i + 1, i) for i in range(num_shards - 1)]    # to previous strip
    from_above = jax.lax.ppermute(x[-_HALO:], axis_name, down)
    from_below = jax.lax.ppermute(x[:_HALO], axis_name, up)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def _partial_loss(strip, gt_strip, *, height, num_shards, lambda_dssim,
                  axis_name="model"):
    """Per-shard body: exact (1-l)*L1 + l*(1-SSIM) via halo exchange."""
    rp = strip.shape[0]
    me = jax.lax.axis_index(axis_name)
    row0 = me * rp
    # Rows beyond the true image height are tile-grid padding (they render
    # as background, NOT zero): mask them out of every sum, exactly like
    # the jit-level loss's [:H] crop.
    valid = (row0 + jnp.arange(rp)) < height  # [rp]
    x = strip * valid[:, None, None]
    y = gt_strip * valid[:, None, None]

    denom = jnp.float32(height * x.shape[1] * x.shape[2])
    l1_part = jnp.sum(jnp.abs(x - y)) / denom

    # Halo-extend the two IMAGES only; the five blurred quantities are
    # elementwise products of the extended arrays, so no further comms.
    xe = _halo_extend(x, num_shards, axis_name)
    ye = _halo_extend(y, num_shards, axis_name)
    w = _gaussian_window()

    def blur(a):
        return _blur_cols_same(_blur_rows_valid(a, w, rp), w)

    mu1, mu2 = blur(xe), blur(ye)
    s11 = blur(xe * xe) - mu1 * mu1
    s22 = blur(ye * ye) - mu2 * mu2
    s12 = blur(xe * ye) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2)
    )
    ssim_part = jnp.sum(ssim_map * valid[:, None, None]) / denom

    l1 = jax.lax.psum(l1_part, axis_name)
    ssim_v = jax.lax.psum(ssim_part, axis_name)
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)


def photometric_loss_sharded(
    render_strip: jnp.ndarray,
    gt: jnp.ndarray,
    mesh: Mesh,
    height: int,
    lambda_dssim: float = 0.2,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Photometric loss on a strip-sharded render.

    render_strip: [height_pad, W, 3] sharded over `axis_name` on axis 0
    (render_tile_sharded output). gt: [H, W, 3] (replicated; padded and
    row-split here — a local slice per device, no collective). Returns a
    replicated scalar, differentiable through the halo exchange."""
    num_shards = mesh.shape[axis_name]
    height_pad = render_strip.shape[0]
    rp = height_pad // num_shards
    if rp < _HALO:
        raise ValueError(
            f"strip of {rp} rows < halo {_HALO}: the single-neighbour "
            f"halo exchange needs >= {_HALO} rows per shard")
    gt_pad = jnp.pad(
        jnp.asarray(gt, render_strip.dtype),
        ((0, height_pad - gt.shape[0]), (0, 0), (0, 0)))

    fn = functools.partial(
        _partial_loss, height=height, num_shards=num_shards,
        lambda_dssim=lambda_dssim, axis_name=axis_name)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )(render_strip, gt_pad)
