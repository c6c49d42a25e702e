"""Per-Gaussian rasterization preprocess: project, EWA cov2D, conic, cull.

Behavioral parity with `preprocessCUDA` and helpers
(`/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:74-256`,
`auxiliary.h:41-56,139-164`):

- near-cull at view z <= 0.2 (`in_frustum`, `auxiliary.h:154`),
- perspective-divide with +1e-7 w guard (`forward.cu:199`),
- EWA 2D covariance with the 1.3*tan_fov frustum clamp and +0.3 pixel
  dilation (`computeCov2D`, `forward.cu:74-113`),
- conic from the 2x2 inverse; screen radius = ceil(3 sqrt(lambda_max))
  with the 0.1 discriminant floor (`forward.cu:229-232`),
- ndc2Pix pixel mapping ((v+1)*S - 1)/2 (`auxiliary.h:41-44`),
- SH -> RGB with +0.5 offset and clamp (`computeColorFromSH`).

This stage is embarrassingly parallel over N and is left to XLA (pure jnp):
it fuses into one pass over the Gaussian arrays, and under a sharded
Gaussian axis it runs fully locally per chip. Differentiable end-to-end by
autodiff — including the depth channel's path back to means through the
view matrix, which the reference implements by hand
(`backward.cu:395-397`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from wast3d_tpu.core.sh import eval_sh_color
from wast3d_tpu.core.transforms import covariance_from_scaling_rotation

NEAR_CULL_Z = 0.2
COV2D_DILATION = 0.3


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N,...])."""

    means2d: jnp.ndarray  # [N,2] pixel coords
    depths: jnp.ndarray  # [N] view-space z
    conics: jnp.ndarray  # [N,3] inverse 2D covariance (A, B, C)
    colors: jnp.ndarray  # [N,3] RGB
    opacities: jnp.ndarray  # [N]
    radii: jnp.ndarray  # [N] int32 screen radius (0 = culled)
    valid: jnp.ndarray  # [N] bool


def preprocess(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    view_transform: jnp.ndarray,
    full_proj_transform: jnp.ndarray,
    camera_center: jnp.ndarray,
    tan_fovx: jnp.ndarray,
    tan_fovy: jnp.ndarray,
    width: int,
    height: int,
    sh_degree: int = 0,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
) -> Preprocessed:
    """Project N Gaussians into a camera. scales/rotations are the
    *activated* values (exp / normalized), as the reference rasterizer
    receives them (`gaussian_renderer/__init__.py:71-77`)."""
    n = means3d.shape[0]
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    p_hom = jnp.concatenate([means3d, jnp.ones((n, 1), means3d.dtype)], axis=1)
    p_view = p_hom @ view_transform[:, :3]  # [N,3]
    depths = p_view[:, 2]

    p_clip = p_hom @ full_proj_transform  # [N,4]
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    p_proj = p_clip[:, :3] * p_w[:, None]

    # ndc2Pix (auxiliary.h:41-44)
    mean_x = ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5
    mean_y = ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5
    means2d = jnp.stack([mean_x, mean_y], axis=1)

    # 3D covariance (packed symmetric 6-vector).
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = covariance_from_scaling_rotation(scales, scaling_modifier, rotations)

    # EWA projection (computeCov2D). Clamp view-space x/y to the dilated
    # frustum before building the Jacobian.
    tz = depths
    tx = jnp.clip(p_view[:, 0] / tz, -1.3 * tan_fovx, 1.3 * tan_fovx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -1.3 * tan_fovy, 1.3 * tan_fovy) * tz

    # J rows: d(pix)/d(view). W: world->view rotation. Our view_transform is
    # stored transposed, so the rotation is view_transform[:3,:3] acting on
    # row vectors; cov transforms as M Sigma M^T with M = J @ W.
    W = view_transform[:3, :3].T  # [3,3] world->view rotation, column-vector form
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J [N,2,3]
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1),
            jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    M = J @ W  # [N,2,3]
    xx, xy, xz, yy, yz, zz = (cov3d[:, i] for i in range(6))
    Vrk = jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )
    cov2d = M @ Vrk @ jnp.swapaxes(M, -1, -2)  # [N,2,2]
    cxx = cov2d[:, 0, 0] + COV2D_DILATION
    cxy = cov2d[:, 0, 1]
    cyy = cov2d[:, 1, 1] + COV2D_DILATION

    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conics = jnp.stack([cyy / det_safe, -cxy / det_safe, cxx / det_safe], axis=1)

    # Screen radius from eigenvalues (forward.cu:229-232).
    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # Tile-rect coverage test replicated at pixel granularity for the
    # "touches zero area" cull (getRect semantics live in binning.py).
    valid = depths > NEAR_CULL_Z
    valid = valid & (det > 0.0)
    if mask is not None:
        valid = valid & mask

    # Colors.
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        dirs = means3d - camera_center[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        colors = eval_sh_color(sh_degree, jnp.swapaxes(shs, 1, 2), dirs)

    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    return Preprocessed(
        means2d=means2d,
        depths=depths,
        conics=conics,
        colors=colors,
        opacities=opacities.reshape(n),
        radii=radii,
        valid=valid,
    )
