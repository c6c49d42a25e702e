"""Cluster teleport: arrange style Gaussians along the content scene.

Equivalent of `init_content_gaussian` (`/root/reference/train_st.py:73-100`)
and the non-optimizing `train3.py:96-140` variant: K-means both scenes
(K=500), then translate each style Gaussian by (content cluster center -
its own cluster center), pairing style cluster i with content cluster i
(the reference relies on this arbitrary index pairing).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.kmeans import kmeans
from wast3d_tpu.scene.gaussians import GaussianScene


def cluster_teleport(
    content: GaussianScene,
    style: GaussianScene,
    num_clusters: int = 500,
    seed: int = 0,
) -> Tuple[GaussianScene, np.ndarray]:
    """Returns (teleported style scene, style cluster labels)."""
    cnt_mask = np.asarray(content.mask)
    stl_mask = np.asarray(style.mask)
    cnt_centers, _ = kmeans(
        np.asarray(content.xyz), num_clusters, iters=100, seed=seed,
        mask=cnt_mask,
    )
    stl_centers, stl_labels = kmeans(
        np.asarray(style.xyz), num_clusters, iters=100, seed=seed + 1,
        mask=stl_mask,
    )
    labels = np.where(stl_labels >= 0, stl_labels, 0)
    shift = cnt_centers[labels] - stl_centers[labels]
    new_xyz = np.asarray(style.xyz) + np.where(stl_mask[:, None], shift, 0.0)
    return style.replace(xyz=jnp.asarray(new_xyz)), stl_labels
