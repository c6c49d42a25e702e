"""Depth-map utilities: depth -> normals, blur.

Replaces the reference's kornia usage
(`/root/reference/train_st_normals.py:112-146`, `test_depth.py:85-93`:
`kornia.geometry.depth.depth_to_normals(depth, K)`): normals from the
gradient of the back-projected 3D point map. Pure jnp, differentiable —
the depth->normals->style-loss chain backpropagates into Gaussian means
through the rasterizer's depth channel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _spatial_gradient(x: jnp.ndarray) -> tuple:
    """Central-difference gradients (replicate edges), [H,W] -> (dx, dy)."""
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    dx = 0.5 * (xp[1:-1, 2:] - xp[1:-1, :-2])
    dy = 0.5 * (xp[2:, 1:-1] - xp[:-2, 1:-1])
    return dx, dy


def depth_to_3d(depth: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """[H,W] depth -> [H,W,3] camera-space points (pinhole K)."""
    h, w = depth.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def depth_to_normals(depth: jnp.ndarray, fx, fy, cx=None, cy=None) -> jnp.ndarray:
    """[H,W] depth -> [H,W,3] unit normals (camera space).

    Normal = normalize(dP/du x dP/dv) of the back-projected point map —
    the same construction kornia uses. Defaults cx/cy to the center."""
    h, w = depth.shape
    cx = (w - 1) / 2.0 if cx is None else cx
    cy = (h - 1) / 2.0 if cy is None else cy
    pts = depth_to_3d(depth, fx, fy, cx, cy)
    du = jnp.stack(
        [_spatial_gradient(pts[..., c])[0] for c in range(3)], axis=-1
    )
    dv = jnp.stack(
        [_spatial_gradient(pts[..., c])[1] for c in range(3)], axis=-1
    )
    n = jnp.cross(du, dv)
    # rsqrt with epsilon INSIDE keeps gradients finite where n == 0
    # (flat/background regions); a plain norm+eps normalization produces
    # NaN gradients there (0/0 in the norm's VJP).
    inv = jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return n * inv


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int = None) -> jnp.ndarray:
    """Separable Gaussian blur on [H,W] (the reference's depth-target
    smoothing, `notebooks/13.Optimize_guassians_depth.ipynb` cell 35)."""
    if radius is None:
        radius = max(1, int(3 * sigma))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2 * sigma**2))
    k = k / k.sum()
    img4 = img[None, :, :, None]
    kc = k[:, None, None, None]
    kr = k[None, :, None, None]
    dn = jax.lax.conv_dimension_numbers(img4.shape, kc.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(img4, kc, (1, 1), "SAME", dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(out, kr, (1, 1), "SAME", dimension_numbers=dn)
    return out[0, :, :, 0]
