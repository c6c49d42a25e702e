"""Cluster geometry transfer: distance-preservation + OT losses.

Equivalents of the reference's `aux_optimize_cluster_D*.py` ladder —
the precursor experiments to the notebook-11 pipeline, kept for full
capability parity:

- v0 (`aux_optimize_cluster_D.py:172-175`): full-matrix distance
  preservation over xyz / rotation / scaling cdist matrices.
- v1 (`aux_optimize_cluster_D_W_distance.py:253-282`): k-NN-masked (k=10)
  L1 residuals + a true OT term (`ot.emd2` on 100 sampled points against
  a sphere shape scaled by the target's mean radius) — the OT term here
  is the Sinkhorn approximation (`ops/sinkhorn.py`).
- v4 (`aux_optimize_cluster_D_W_distance4.py:254-283`): squared xyz
  residuals (unmasked) + masked rotation/scaling residuals + the
  shape-attachment term: mean sq distance of each point to its 20 NNs in
  the (1/5-scaled) shape points, weight 3e2.

Reference quirk preserved: the 'rotation'/'scaling' distance matrices are
cross-distances AGAINST THE XYZ coordinates —
  D_rotation = cdist(rot[:, :3], xyz) + cdist(rot[:, 1:], xyz)
  D_scaling  = cdist(scaling, xyz)
(`aux_optimize_cluster_D_W_distance4.py:74-78,254-257`).

All losses are pure jnp on fixed shapes, optimized with the same
hand-rolled Adam scan as the ball fitter.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.knn import pairwise_sq_dists
from wast3d_tpu.ops.sinkhorn import emd2_approx

_BIG = 1e30


def _cdist(a, b):
    return jnp.sqrt(jnp.maximum(pairwise_sq_dists(a, b), 1e-24))


class GeomTargets(NamedTuple):
    d_xyz: jnp.ndarray  # [N,N]
    d_rotation: jnp.ndarray
    d_scaling: jnp.ndarray
    knn_mask: jnp.ndarray  # [N,N] float k-NN mask on target xyz distances


def attribute_distances(xyz, rotation, scaling):
    """The reference's three distance matrices (quirk included)."""
    d_xyz = _cdist(xyz, xyz)
    d_rot = _cdist(rotation[:, :-1], xyz) + _cdist(rotation[:, 1:], xyz)
    d_scal = _cdist(scaling, xyz)
    return d_xyz, d_rot, d_scal


def compute_targets(xyz, rotation, scaling, k: int = 100) -> GeomTargets:
    d_xyz, d_rot, d_scal = attribute_distances(xyz, rotation, scaling)
    neg_topk, _ = jax.lax.top_k(-d_xyz, min(k, d_xyz.shape[1]))
    kth = -neg_topk[:, -1:]
    mask = (d_xyz <= kth).astype(jnp.float32)
    return GeomTargets(d_xyz, d_rot, d_scal, mask)


def loss_v0(xyz, rotation, scaling, targets: GeomTargets) -> jnp.ndarray:
    """Full-matrix squared residuals (`aux_optimize_cluster_D.py:172-175`)."""
    d_xyz, d_rot, d_scal = attribute_distances(xyz, rotation, scaling)
    return (
        jnp.mean((d_xyz - targets.d_xyz) ** 2)
        + jnp.mean((d_rot - targets.d_rotation) ** 2)
        + jnp.mean((d_scal - targets.d_scaling) ** 2)
    )


def shape_attachment_loss(xyz, shape_points, k: int = 20,
                          shape_scale: float = 0.2) -> jnp.ndarray:
    """mean(sq(D_to_shape) * 20-NN mask); shape points scaled by 1/5
    (`aux_optimize_cluster_D_W_distance4.py:268-274`)."""
    d = _cdist(xyz, shape_points * shape_scale)
    neg_topk, _ = jax.lax.top_k(-d, min(k, d.shape[1]))
    kth = -neg_topk[:, -1:]
    mask = (d <= kth).astype(jnp.float32)
    return jnp.mean(jnp.square(d) * mask)


def loss_v4(xyz, rotation, scaling, targets: GeomTargets,
            shape_points, w_shape: float = 3e2) -> jnp.ndarray:
    """v4 composite (`aux_optimize_cluster_D_W_distance4.py:254-283`)."""
    d_xyz, d_rot, d_scal = attribute_distances(xyz, rotation, scaling)
    m = targets.knn_mask
    return (
        jnp.mean((d_xyz - targets.d_xyz) ** 2)
        + jnp.mean(((d_rot - targets.d_rotation) ** 2) * m)
        + jnp.mean(((d_scal - targets.d_scaling) ** 2) * m)
        + w_shape * shape_attachment_loss(xyz, shape_points)
    )


def loss_v1(xyz, rotation, scaling, targets: GeomTargets,
            shape_points, key, num_samples: int = 100,
            target_mean_radius: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """v1: masked L1 residuals + sampled OT to the scaled shape
    (`aux_optimize_cluster_D_W_distance.py:253-282`)."""
    d_xyz, d_rot, d_scal = attribute_distances(xyz, rotation, scaling)
    m = targets.knn_mask
    l1 = (
        jnp.mean(jnp.abs(d_xyz - targets.d_xyz) * m)
        + jnp.mean(jnp.abs(d_rot - targets.d_rotation) * m)
        + jnp.mean(jnp.abs(d_scal - targets.d_scaling) * m)
    )
    k1, k2 = jax.random.split(key)
    idx_a = jax.random.permutation(k1, xyz.shape[0])[:num_samples]
    idx_b = jax.random.permutation(k2, shape_points.shape[0])[:num_samples]
    if target_mean_radius is None:
        target_mean_radius = jnp.float32(1.0)
    emd = emd2_approx(xyz[idx_a], shape_points[idx_b] * target_mean_radius)
    return l1 + emd


@partial(jax.jit, static_argnames=("variant", "steps", "num_samples"))
def optimize_cluster_geometry(
    xyz0: jnp.ndarray,
    rotation: jnp.ndarray,
    scaling: jnp.ndarray,
    targets: GeomTargets,
    shape_points: jnp.ndarray,
    key: jax.Array,
    variant: str = "v4",
    steps: int = 1000,
    lr: float = 1.6e-4,
    num_samples: int = 100,
    target_mean_radius: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Optimize cluster xyz against a frozen target's distance structure.
    (The reference drives this with its full training-loop Adam on the
    xyz group; rotation/scaling stay frozen inputs here as its losses
    only differentiate xyz in practice.)"""

    def loss_fn(x, k):
        if variant == "v0":
            return loss_v0(x, rotation, scaling, targets)
        if variant == "v1":
            return loss_v1(x, rotation, scaling, targets, shape_points, k,
                           num_samples, target_mean_radius)
        return loss_v4(x, rotation, scaling, targets, shape_points)

    def step(carry, _):
        x, mu, nu, t, k = carry
        k, sub = jax.random.split(k)
        loss, g = jax.value_and_grad(loss_fn)(x, sub)
        t = t + 1
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * g * g
        x = x - lr * (mu / (1 - 0.9 ** t)) / (
            jnp.sqrt(nu / (1 - 0.999 ** t)) + 1e-15
        )
        return (x, mu, nu, t, k), loss

    init = (xyz0, jnp.zeros_like(xyz0), jnp.zeros_like(xyz0),
            jnp.float32(0.0), key)
    (x, *_), losses = jax.lax.scan(step, init, None, length=steps)
    return x
