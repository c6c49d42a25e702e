"""Image-space losses: L1/L2, windowed SSIM, PSNR, total variation.

Behavioral parity with `/root/reference/utils/loss_utils.py:18-64,213-215`
and `utils/image_utils.py:14-19`: SSIM uses an 11-tap Gaussian window with
sigma 1.5, per-channel depthwise convolution with same-padding, constants
C1 = 0.01^2, C2 = 0.03^2. Images here are [H, W, C] (reference is CHW).

XLA fuses these straight into the training step; the SSIM convolutions are
small depthwise convs the TPU runs on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """20 * log10(1 / sqrt(mse)); reference `psnr` (`image_utils.py:16-19`)."""
    m = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _depthwise_blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable same-(zero-)padded Gaussian filter on [H, W, C].

    Implemented as unrolled shift-and-add (11 slices per axis) instead of a
    grouped convolution: this environment's TPU backend miscompiles the
    feature_group_count conv VJP (finite differences showed wrong-sign
    SSIM gradients on TPU while CPU was exact), and slicing/add VJPs are
    trivially correct on every backend. XLA fuses the unrolled adds."""
    k = window.shape[0]
    r = k // 2
    h, w = img.shape[0], img.shape[1]
    x = jnp.pad(img, ((r, r), (0, 0), (0, 0)))
    out = sum(window[i] * jax.lax.dynamic_slice_in_dim(x, i, h, 0)
              for i in range(k))
    x = jnp.pad(out, ((0, 0), (r, r), (0, 0)))
    out = sum(window[i] * jax.lax.dynamic_slice_in_dim(x, i, w, 1)
              for i in range(k))
    return out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM; reference `ssim`/`_ssim` (`loss_utils.py:24-64`)."""
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_blur(img1, w)
    mu2 = _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, w) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def tv_loss(img: jnp.ndarray) -> jnp.ndarray:
    """Total variation, absolute-value form: the reference defines tv_loss
    twice and the SECOND definition wins (`loss_utils.py:208-215`):
    0.5 * (mean|dy| + mean|dx|). Applies over the last two spatial dims of
    [H, W] or [H, W, C]-style arrays (we treat the first two as spatial)."""
    dy = img[1:, :] - img[:-1, :]
    dx = img[:, 1:] - img[:, :-1]
    return 0.5 * (jnp.mean(jnp.abs(dy)) + jnp.mean(jnp.abs(dx)))


def tv_loss_sq(img: jnp.ndarray) -> jnp.ndarray:
    """Squared-difference TV (the reference's shadowed first definition,
    `loss_utils.py:213-215` pre-override): mean dy^2 + mean dx^2."""
    dy = img[1:, :] - img[:-1, :]
    dx = img[:, 1:] - img[:, :-1]
    return jnp.mean(dy**2) + jnp.mean(dx**2)


def photometric_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                     lambda_dssim: float = 0.2) -> jnp.ndarray:
    """(1-λ) L1 + λ (1 - SSIM): the 3DGS reconstruction loss
    (`train.py:96-98`)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )
