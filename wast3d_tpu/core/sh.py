"""Real spherical-harmonics evaluation for view-dependent Gaussian color.

Behavioral parity with the reference's hardcoded SH basis
(`/root/reference/utils/sh_utils.py:57-118` and the in-kernel copy at
`submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:20-71`):
degrees 0..3 are used by the renderer (degree 4 terms exist only in the
python util and are unused by the pipeline); the renderer adds +0.5 and
clamps to >= 0 after basis evaluation (`forward.cu:63-70`).

Lineage: the hardcoded real-SH polynomial (constants and the nested
per-degree basis) originates in the BSD-licensed PlenOctree code
(sxyu/svox, `svox/renderer.py`), which every 3DGS codebase — including
the reference — carries verbatim. The math is canonical; there is no
meaningfully different way to write it.

TPU notes: evaluation is a fully-vectorized polynomial over [N, 3]
directions — pure VPU work that XLA fuses into the surrounding
preprocess. The degree is a static Python int so each active degree
compiles its own (cheap) specialization; SH warm-up changes degree only
a handful of times over a run.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis contraction.

    Args:
      deg: static int in [0, 4]; only the first (deg+1)^2 coefficients are read.
      sh: [..., C, K] coefficients with K >= (deg+1)^2 (channel-major, matching
        the reference's `shs_view` layout).
      dirs: [..., 3] unit view directions.

    Returns:
      [..., C] the basis contraction (no +0.5 offset, no clamp — see
      `eval_sh_color`).
    """
    if not (0 <= deg <= 4):
        raise ValueError(f"SH degree must be in [0,4], got {deg}")
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4]
                + C2[1] * yz * sh[..., 5]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                + C2[3] * xz * sh[..., 7]
                + C2[4] * (xx - yy) * sh[..., 8]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9]
                    + C3[1] * xy * z * sh[..., 10]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13]
                    + C3[5] * z * (xx - yy) * sh[..., 14]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15]
                )
                if deg > 3:
                    result = (
                        result
                        + C4[0] * xy * (xx - yy) * sh[..., 16]
                        + C4[1] * yz * (3.0 * xx - yy) * sh[..., 17]
                        + C4[2] * xy * (7.0 * zz - 1.0) * sh[..., 18]
                        + C4[3] * yz * (7.0 * zz - 3.0) * sh[..., 19]
                        + C4[4] * (zz * (35.0 * zz - 30.0) + 3.0) * sh[..., 20]
                        + C4[5] * xz * (7.0 * zz - 3.0) * sh[..., 21]
                        + C4[6] * (xx - yy) * (7.0 * zz - 1.0) * sh[..., 22]
                        + C4[7] * xz * (xx - 3.0 * yy) * sh[..., 23]
                        + C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)) * sh[..., 24]
                    )
    return result


def eval_sh_color(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> RGB as the rasterizer does it: basis + 0.5, clamped at 0.

    Matches `computeColorFromSH` (`forward.cu:20-71`). The clamp's subgradient
    (zero where clamped) is what the reference's hand-written backward encodes
    with its `clamped` flags (`backward.cu` SH path); JAX autodiff through
    `jnp.maximum` reproduces it exactly.
    """
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term (+0.5 offset): reference `RGB2SH`."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """Reference `SH2RGB`."""
    return sh * C0 + 0.5
