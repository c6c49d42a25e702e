"""Quaternion / covariance / activation math for Gaussian scenes.

Behavioral parity with `/root/reference/utils/general_utils.py:64-110`
(build_rotation, build_scaling_rotation, strip_symmetric) and the CUDA
`computeCov3D` (`cuda_rasterizer/forward.cu:118-152`). All functions are
batched over the leading axis and are pure jnp — XLA fuses them into the
rasterizer preprocess.

Convention: quaternions are (w, x, y, z) with w first, matching the
reference's `rot[:, 0] = 1` identity init (`scene/gaussian_model.py:136-137`).
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """logit; reference `inverse_sigmoid` (`utils/general_utils.py:18`)."""
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """[N,4] (w,x,y,z) quaternions -> [N,3,3] rotation matrices.

    Matches reference `build_rotation` (`utils/general_utils.py:78-99`),
    which normalizes first. The CUDA `computeCov3D` skips normalization
    (`forward.cu:127`) because the python side already normalized; pass
    `normalize=False` to reproduce that path.
    """
    if normalize:
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): reference `build_scaling_rotation`
    (`utils/general_utils.py:101-110`). s is the *activated* scale [N,3]."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]  # right-multiply by diag(s)


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, scaling_modifier: float, rotation: jnp.ndarray
) -> jnp.ndarray:
    """Sigma = L L^T as a [N,6] packed symmetric matrix.

    Matches `build_covariance_from_scaling_rotation` + `strip_symmetric`
    (`scene/gaussian_model.py:27-31`, `utils/general_utils.py:64-76`).
    Packing order: (xx, xy, xz, yy, yz, zz).
    """
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] symmetric -> [N,6] upper triangle (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """[N,6] (xx, xy, xz, yy, yz, zz) -> [N,3,3] symmetric."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )
