"""Style-scene clustering + cluster export (.npz patches).

Equivalent of `/root/reference/aux_save_clusters_clean.py:31-183`: K-means
(n_init=20, max_iter=100) over the Gaussian positions, each cluster
re-centered to its centroid, all six attribute arrays dumped to
`cluster_{i}.npz` with the reference's key names (`_xyz`, `_features_dc`,
`_features_rest`, `_rotation`, `_scaling`, `_opacity`) so patches are
interchangeable between the two pipelines.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from wast3d_tpu.ops.kmeans import kmeans_best
from wast3d_tpu.scene.gaussians import GaussianScene

NPZ_KEYS = ("_xyz", "_features_dc", "_features_rest", "_rotation",
            "_scaling", "_opacity")


def cluster_scene(
    scene: GaussianScene, num_clusters: int, n_init: int = 20,
    iters: int = 100, seed: int = 0,
):
    """K-means over active Gaussian positions. Returns (centers [K,3],
    labels [capacity] with -1 for dead slots)."""
    mask = np.asarray(scene.mask)
    centers, labels = kmeans_best(
        np.asarray(scene.xyz), num_clusters, n_init=n_init, iters=iters,
        seed=seed, mask=mask,
    )
    return centers, labels


def export_clusters(
    scene: GaussianScene, output_dir: str, num_clusters: int,
    n_init: int = 20, seed: int = 0,
) -> List[str]:
    """Cluster + dump per-cluster npz files (recentered xyz)."""
    os.makedirs(output_dir, exist_ok=True)
    centers, labels = cluster_scene(scene, num_clusters, n_init=n_init, seed=seed)
    arrays = {
        "_xyz": np.asarray(scene.xyz),
        "_features_dc": np.asarray(scene.features_dc),
        "_features_rest": np.asarray(scene.features_rest),
        "_rotation": np.asarray(scene.rotation),
        "_scaling": np.asarray(scene.scaling),
        "_opacity": np.asarray(scene.opacity),
    }
    paths = []
    for i in range(num_clusters):
        idx = np.nonzero(labels == i)[0]
        out = {k: v[idx] for k, v in arrays.items()}
        out["_xyz"] = out["_xyz"] - centers[i][None, :]  # recenter (:156)
        path = os.path.join(output_dir, f"cluster_{i}.npz")
        np.savez(path, **out)
        paths.append(path)
    return paths


class StylePatch:
    """A loaded style cluster: recentered points + attributes."""

    def __init__(self, arrays: dict):
        self.xyz = np.asarray(arrays["_xyz"], np.float32)
        self.features_dc = np.asarray(arrays["_features_dc"], np.float32)
        self.features_rest = np.asarray(arrays["_features_rest"], np.float32)
        self.rotation = np.asarray(arrays["_rotation"], np.float32)
        self.scaling = np.asarray(arrays["_scaling"], np.float32)
        self.opacity = np.asarray(arrays["_opacity"], np.float32)

    def __len__(self):
        return len(self.xyz)

    def select(self, idx: np.ndarray) -> "StylePatch":
        return StylePatch({
            "_xyz": self.xyz[idx],
            "_features_dc": self.features_dc[idx],
            "_features_rest": self.features_rest[idx],
            "_rotation": self.rotation[idx],
            "_scaling": self.scaling[idx],
            "_opacity": self.opacity[idx],
        })


def load_cluster(path: str) -> StylePatch:
    """Load a cluster npz (reference notebook 11 cell 10)."""
    return StylePatch(dict(np.load(path)))
