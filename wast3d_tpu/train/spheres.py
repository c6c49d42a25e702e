"""Sphere-regularizer losses for style-scene training.

Parity with the reference style-reconstruction scripts:
- `train_spheres.py:107-127`: isotropy = mean over Gaussians of the
  (unbiased) std of the 3 log-scales; uniformity = mean over dims of the
  (unbiased) std across Gaussians. Weights 1e-1 / 1e-2.
- `train_spheres_anisotropic.py:97-145`: anisotropy hinge on the
  max/min ratio of *sigmoid*(log-scale) with threshold r (1.3), weight
  1e-1; plus an (unhinged L2) min-scale target pulling min sigmoid scale
  to 1, weight 5e-1. The `_simple` variant (`:109-130`) drops the
  min-scale term (set lambda_min_scale = 0).

Capacity-padding note: all statistics are computed over the *active* mask
only — dead slots must not contaminate population stds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wast3d_tpu.scene.gaussians import GaussianScene


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def scaling_isotropy_loss(scaling_log: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean_i std_dims(log-scale_i), unbiased std (torch default)."""
    mean_d = jnp.mean(scaling_log, axis=1, keepdims=True)
    var = jnp.sum((scaling_log - mean_d) ** 2, axis=1) / (scaling_log.shape[1] - 1)
    return _masked_mean(jnp.sqrt(var + 1e-12), mask)


def scaling_uniformity_loss(scaling_log: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean_dims std_i(log-scale[:, d]) over active Gaussians, unbiased."""
    m = mask.astype(scaling_log.dtype)[:, None]
    n = jnp.maximum(jnp.sum(m), 2.0)
    mean_i = jnp.sum(scaling_log * m, axis=0) / n
    var = jnp.sum(((scaling_log - mean_i) ** 2) * m, axis=0) / (n - 1.0)
    return jnp.mean(jnp.sqrt(var + 1e-12))


def scaling_anisotropy_loss(
    scaling_log: jnp.ndarray, mask: jnp.ndarray, ratio: float = 1.3
) -> jnp.ndarray:
    """mean(max(residue, r) - r), residue = max(sig(s))/(min(sig(s))+eps)."""
    sig = jax.nn.sigmoid(scaling_log)
    residue = jnp.max(sig, axis=-1) / (jnp.min(sig, axis=-1) + 1e-6)
    return _masked_mean(jnp.maximum(residue, ratio) - ratio, mask)


def scaling_min_val_loss(scaling_log: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sqrt(mean((1 - min(sig(s)))^2)) — the unhinged-L2 variant the
    reference settled on (`train_spheres_anisotropic.py:124-128`)."""
    sig_min = jnp.min(jax.nn.sigmoid(scaling_log), axis=-1)
    return jnp.sqrt(_masked_mean((1.0 - sig_min) ** 2, mask) + 1e-12)


def sphere_regularizer(scene: GaussianScene, cfg) -> jnp.ndarray:
    """Combined sphere loss per SphereConfig (see `wast3d_tpu.config`)."""
    s, m = scene.scaling, scene.mask
    loss = jnp.float32(0.0)
    if cfg.anisotropic:
        loss = loss + cfg.lambda_anisotropy * scaling_anisotropy_loss(
            s, m, cfg.anisotropy_ratio
        )
        if cfg.lambda_min_scale:
            loss = loss + cfg.lambda_min_scale * scaling_min_val_loss(s, m)
    else:
        loss = loss + cfg.lambda_isotropy * scaling_isotropy_loss(s, m)
        loss = loss + cfg.lambda_uniformity * scaling_uniformity_loss(s, m)
    return loss
