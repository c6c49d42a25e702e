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

import jax
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
    # Tight per-axis tile-coverage half-extents (pixels): the AABB of the
    # alpha >= 1/255 ellipse intersected with the 3-sigma box. Defaults
    # make Preprocessed(...) constructible without them (tests).
    extent_x: jnp.ndarray = None  # [N] int32
    extent_y: jnp.ndarray = None  # [N] int32


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

    x, y, z = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    V = view_transform  # [4,4] transposed storage: p_view = p_hom @ V
    vx = x * V[0, 0] + y * V[1, 0] + z * V[2, 0] + V[3, 0]
    vy = x * V[0, 1] + y * V[1, 1] + z * V[2, 1] + V[3, 1]
    vz = x * V[0, 2] + y * V[1, 2] + z * V[2, 2] + V[3, 2]
    depths = vz

    Pm = full_proj_transform
    cx = x * Pm[0, 0] + y * Pm[1, 0] + z * Pm[2, 0] + Pm[3, 0]
    cy = x * Pm[0, 1] + y * Pm[1, 1] + z * Pm[2, 1] + Pm[3, 1]
    cw = x * Pm[0, 3] + y * Pm[1, 3] + z * Pm[2, 3] + Pm[3, 3]
    p_w = 1.0 / (cw + 1e-7)
    # ndc2Pix (auxiliary.h:41-44)
    mean_x = ((cx * p_w + 1.0) * width - 1.0) * 0.5
    mean_y = ((cy * p_w + 1.0) * height - 1.0) * 0.5
    means2d = jnp.stack([mean_x, mean_y], axis=1)

    # 3D covariance Sigma = R S S^T R^T, fully componentwise (batched 3x3
    # matmuls are MXU-hostile; elementwise chains fuse on the VPU).
    if cov3d_precomp is not None:
        sxx, sxy, sxz, syy, syz, szz = (cov3d_precomp[:, i] for i in range(6))
    else:
        qw, qx, qy, qz = (rotations[:, i] for i in range(4))
        sx, sy, sz = (scaling_modifier * scales[:, i] for i in range(3))
        r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
        r01 = 2.0 * (qx * qy - qw * qz)
        r02 = 2.0 * (qx * qz + qw * qy)
        r10 = 2.0 * (qx * qy + qw * qz)
        r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
        r12 = 2.0 * (qy * qz - qw * qx)
        r20 = 2.0 * (qx * qz - qw * qy)
        r21 = 2.0 * (qy * qz + qw * qx)
        r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
        # L = R diag(s); Sigma = L L^T
        l00, l01, l02 = r00 * sx, r01 * sy, r02 * sz
        l10, l11, l12 = r10 * sx, r11 * sy, r12 * sz
        l20, l21, l22 = r20 * sx, r21 * sy, r22 * sz
        sxx = l00 * l00 + l01 * l01 + l02 * l02
        sxy = l00 * l10 + l01 * l11 + l02 * l12
        sxz = l00 * l20 + l01 * l21 + l02 * l22
        syy = l10 * l10 + l11 * l11 + l12 * l12
        syz = l10 * l20 + l11 * l21 + l12 * l22
        szz = l20 * l20 + l21 * l21 + l22 * l22

    # EWA projection (computeCov2D): clamp view x/y to the dilated frustum.
    tz = depths
    inv_z = 1.0 / tz
    tx = jnp.clip(vx * inv_z, -1.3 * tan_fovx, 1.3 * tan_fovx) * tz
    ty = jnp.clip(vy * inv_z, -1.3 * tan_fovy, 1.3 * tan_fovy) * tz
    inv_z2 = inv_z * inv_z

    # J rows (d pix / d view); W = world->view rotation (V[:3,:3] rows are
    # its columns in this storage). M = J @ W, cov2d = M Sigma M^T.
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    # W[r][c] = V[c, r] (see the matrix convention note in core/camera.py)
    m00 = j00 * V[0, 0] + j02 * V[0, 2]
    m01 = j00 * V[1, 0] + j02 * V[1, 2]
    m02 = j00 * V[2, 0] + j02 * V[2, 2]
    m10 = j11 * V[0, 1] + j12 * V[0, 2]
    m11 = j11 * V[1, 1] + j12 * V[1, 2]
    m12 = j11 * V[2, 1] + j12 * V[2, 2]
    # t = M Sigma (2x3), cov2d = t M^T (2x2 symmetric)
    t00 = m00 * sxx + m01 * sxy + m02 * sxz
    t01 = m00 * sxy + m01 * syy + m02 * syz
    t02 = m00 * sxz + m01 * syz + m02 * szz
    t10 = m10 * sxx + m11 * sxy + m12 * sxz
    t11 = m10 * sxy + m11 * syy + m12 * syz
    t12 = m10 * sxz + m11 * syz + m12 * szz
    cxx = t00 * m00 + t01 * m01 + t02 * m02 + COV2D_DILATION
    cxy = t00 * m10 + t01 * m11 + t02 * m12
    cyy = t10 * m10 + t11 * m11 + t12 * m12 + COV2D_DILATION

    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conics = jnp.stack([cyy / det_safe, -cxy / det_safe, cxx / det_safe], axis=1)

    # Screen radius from eigenvalues (forward.cu:229-232). `radii` keeps
    # the reference's 3-sigma-of-lambda-max semantics (visibility filter,
    # max_radii2D densification stats).
    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # Tight per-axis tile-coverage extents ("SnugBox"-style; the CUDA
    # path covers the square of the 3-sigma-max circle, getRect
    # auxiliary.h:46-56). A pixel contributes iff
    # opa * exp(power) >= 1/255, i.e. lies in the ellipse
    # q^T Sigma2D^-1 q <= 2*tau with tau = ln(255 * min(opa, 0.99));
    # its AABB half-extents are sqrt(2 tau * Sigma_xx/yy). Intersecting
    # with the reference's 3-sigma box (min) makes the covered pixel set
    # a SUPERSET of every contributing pixel the reference covers while
    # dropping tiles whose pixels the blend kernel skips via
    # alpha < 1/255 anyway — output-exact, ~30-40% fewer duplicates on
    # anisotropic / low-opacity splats. +1 pixel absorbs jitter offsets
    # and float rounding.
    tau = jnp.log(255.0 * jnp.clip(opacities.reshape(n), 0.0, 0.99))
    tau = jnp.maximum(tau, 0.0)  # opa <= 1/255 -> empty footprint
    no_pix = opacities.reshape(n) * 255.0 <= 1.0
    ext_x = jnp.minimum(radius_f, jnp.ceil(
        jnp.sqrt(2.0 * tau * jnp.maximum(cxx, 0.0)) + 1.0))
    ext_y = jnp.minimum(radius_f, jnp.ceil(
        jnp.sqrt(2.0 * tau * jnp.maximum(cyy, 0.0)) + 1.0))
    ext_x = jnp.where(no_pix, 0.0, ext_x)
    ext_y = jnp.where(no_pix, 0.0, ext_y)

    valid = depths > NEAR_CULL_Z
    valid = valid & (det > 0.0)
    if mask is not None:
        valid = valid & mask

    # Colors.
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        dx = x - camera_center[0]
        dy = y - camera_center[1]
        dz = z - camera_center[2]
        inv_n = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-20)
        dirs = jnp.stack([dx * inv_n, dy * inv_n, dz * inv_n], axis=1)
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
        extent_x=jnp.where(valid, ext_x, 0.0).astype(jnp.int32),
        extent_y=jnp.where(valid, ext_y, 0.0).astype(jnp.int32),
    )
