"""GaussianScene: the parametric 3D Gaussian scene as a JAX pytree.

TPU-native re-design of the reference `GaussianModel`
(`/root/reference/scene/gaussian_model.py:24-407`). Same logical state —
per-Gaussian learnable tensors xyz / features_dc / features_rest /
scaling (log) / rotation (quat, w-first) / opacity (logit) with the same
activations (`gaussian_model.py:26-41`) — but:

- **Capacity padding instead of dynamic N.** XLA requires static shapes, so
  the arrays are allocated at a fixed `capacity` with a per-slot validity
  `mask`; densify/clone/split/prune (reference `:349-403`) become masked
  scatter updates at unchanged shape (see `train/densify.py`). Re-bucketing
  to a larger capacity happens rarely, at the Python level.
- **Struct-of-arrays pytree**: works directly with jax.grad / optax /
  jax.sharding (the Gaussian axis is the `model` sharding axis for
  multi-chip scenes).
- Dead slots are parked at `DEAD_XYZ` (far away) with opacity logit
  `DEAD_OPACITY` (sigmoid ~ 0) so they are culled/invisible even if a
  consumer forgets to mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from wast3d_tpu.core.sh import num_sh_coeffs, rgb_to_sh
from wast3d_tpu.core.transforms import (
    covariance_from_scaling_rotation,
    inverse_sigmoid,
)

DEAD_XYZ = 1e8  # parking position for invalid slots
DEAD_OPACITY = -30.0  # sigmoid(-30) ~ 1e-13: invisible


@struct.dataclass
class GaussianScene:
    """Capacity-padded Gaussian scene. Valid entries are mask==True."""

    xyz: jnp.ndarray  # [C, 3]
    features_dc: jnp.ndarray  # [C, 1, 3] (reference layout :142)
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray  # [C, 3] log-space
    rotation: jnp.ndarray  # [C, 4] unnormalized quat (w,x,y,z)
    opacity: jnp.ndarray  # [C, 1] logit
    mask: jnp.ndarray  # [C] bool validity
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ---- shape helpers -------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.mask)

    # ---- activations (reference `setup_functions`, :26-41) -------------
    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)

    @property
    def get_xyz(self) -> jnp.ndarray:
        return self.xyz

    @property
    def get_features(self) -> jnp.ndarray:
        """[C, K, 3] concatenated SH coefficients (reference :108-111)."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    @property
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """[C, 6] packed world covariance (reference :117-118)."""
        return covariance_from_scaling_rotation(
            self.get_scaling, scaling_modifier, self.get_rotation
        )

    # ---- SH warm-up (reference `oneupSHdegree`, :120-122) --------------
    def one_up_sh_degree(self) -> "GaussianScene":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self

    # ---- param pytree for optax ---------------------------------------
    def params(self) -> dict:
        """The six learnable leaves, keyed by the reference's optimizer
        group names (`gaussian_model.py:154-161`)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.features_dc,
            "f_rest": self.features_rest,
            "opacity": self.opacity,
            "scaling": self.scaling,
            "rotation": self.rotation,
        }

    def with_params(self, p: dict) -> "GaussianScene":
        return self.replace(
            xyz=p["xyz"],
            features_dc=p["f_dc"],
            features_rest=p["f_rest"],
            opacity=p["opacity"],
            scaling=p["scaling"],
            rotation=p["rotation"],
        )


def _round_capacity(n: int, multiple: int = 256) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def empty_scene(capacity: int, max_sh_degree: int = 3) -> GaussianScene:
    k = num_sh_coeffs(max_sh_degree)
    return GaussianScene(
        xyz=jnp.full((capacity, 3), DEAD_XYZ, jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=jnp.zeros((capacity, 3), jnp.float32),
        rotation=jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.full((capacity, 1), DEAD_OPACITY, jnp.float32),
        mask=jnp.zeros((capacity,), bool),
        active_sh_degree=0,
        max_sh_degree=max_sh_degree,
    )


def from_arrays(
    xyz: np.ndarray,
    features_dc: np.ndarray,
    features_rest: np.ndarray,
    scaling: np.ndarray,
    rotation: np.ndarray,
    opacity: np.ndarray,
    max_sh_degree: int = 3,
    active_sh_degree: Optional[int] = None,
    capacity: Optional[int] = None,
) -> GaussianScene:
    """Pack raw (numpy or jnp) per-Gaussian arrays into a padded scene."""
    n = xyz.shape[0]
    cap = capacity if capacity is not None else _round_capacity(n)
    if cap < n:
        raise ValueError(f"capacity {cap} < n {n}")
    scene = empty_scene(cap, max_sh_degree)
    sl = slice(0, n)
    scene = scene.replace(
        xyz=scene.xyz.at[sl].set(jnp.asarray(xyz, jnp.float32)),
        features_dc=scene.features_dc.at[sl].set(jnp.asarray(features_dc, jnp.float32)),
        features_rest=scene.features_rest.at[sl].set(jnp.asarray(features_rest, jnp.float32)),
        scaling=scene.scaling.at[sl].set(jnp.asarray(scaling, jnp.float32)),
        rotation=scene.rotation.at[sl].set(jnp.asarray(rotation, jnp.float32)),
        opacity=scene.opacity.at[sl].set(jnp.asarray(opacity, jnp.float32)),
        mask=scene.mask.at[sl].set(True),
        active_sh_degree=(
            active_sh_degree if active_sh_degree is not None else 0
        ),
    )
    return scene


def from_point_cloud(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int = 3,
    capacity: Optional[int] = None,
    knn_mean_sq_dist: Optional[np.ndarray] = None,
) -> GaussianScene:
    """Initialize from an SfM/random point cloud: reference
    `create_from_pcd` (`gaussian_model.py:124-147`): DC features from RGB,
    rest zero; isotropic log-scale = log(sqrt(mean sq dist to 3 NNs)),
    identity rotations, opacity logit of 0.1."""
    from wast3d_tpu.ops.knn import mean_sq_dist_to_3nn

    n = points.shape[0]
    if knn_mean_sq_dist is None:
        knn_mean_sq_dist = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(points, jnp.float32)))
    dist2 = np.maximum(np.asarray(knn_mean_sq_dist), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)
    f_dc = np.asarray(rgb_to_sh(jnp.asarray(colors, jnp.float32)))[:, None, :]
    k = num_sh_coeffs(max_sh_degree)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opac = np.asarray(inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32)))
    return from_arrays(
        xyz=points,
        features_dc=f_dc,
        features_rest=np.zeros((n, k - 1, 3), np.float32),
        scaling=scales,
        rotation=rots,
        opacity=opac,
        max_sh_degree=max_sh_degree,
        capacity=capacity,
    )


def compact(scene: GaussianScene) -> GaussianScene:
    """Drop dead slots (host-side; used at checkpoint/interchange
    boundaries only — the reference instead resizes every densify,
    `gaussian_model.py:291-305`)."""
    m = np.asarray(scene.mask)
    idx = np.nonzero(m)[0]
    return from_arrays(
        xyz=np.asarray(scene.xyz)[idx],
        features_dc=np.asarray(scene.features_dc)[idx],
        features_rest=np.asarray(scene.features_rest)[idx],
        scaling=np.asarray(scene.scaling)[idx],
        rotation=np.asarray(scene.rotation)[idx],
        opacity=np.asarray(scene.opacity)[idx],
        max_sh_degree=scene.max_sh_degree,
        active_sh_degree=scene.active_sh_degree,
        capacity=_round_capacity(len(idx)),
    )


def grow_capacity(scene: GaussianScene, new_capacity: int) -> GaussianScene:
    """Re-bucket to a larger capacity (recompiles consumers once per bucket)."""
    if new_capacity <= scene.capacity:
        return scene
    bigger = empty_scene(new_capacity, scene.max_sh_degree)
    sl = slice(0, scene.capacity)
    return bigger.replace(
        xyz=bigger.xyz.at[sl].set(scene.xyz),
        features_dc=bigger.features_dc.at[sl].set(scene.features_dc),
        features_rest=bigger.features_rest.at[sl].set(scene.features_rest),
        scaling=bigger.scaling.at[sl].set(scene.scaling),
        rotation=bigger.rotation.at[sl].set(scene.rotation),
        opacity=bigger.opacity.at[sl].set(scene.opacity),
        mask=bigger.mask.at[sl].set(scene.mask),
        active_sh_degree=scene.active_sh_degree,
    )
