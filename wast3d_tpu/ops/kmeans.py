"""K-means clustering: k-means++ seeding + jitted Lloyd iterations.

Replaces the reference's sklearn KMeans usage (content/style clustering:
`/root/reference/aux_save_clusters_clean.py:44-45`, notebook 11 cell 5,
`train_st.py:83-90`) with a TPU-native implementation: assignment is the
blockwise matmul-form distance (MXU) and the update is a segment-sum —
both inside one `lax.scan`. Supports masked (capacity-padded) inputs.

n_init restarts (sklearn's n_init=20 in `aux_save_clusters_clean.py:44`)
are supported by `kmeans_best` which keeps the lowest-inertia run.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.knn import pairwise_sq_dists

_BIG = 1e30


def kmeans_pp_init(
    points: np.ndarray, k: int, rng: np.random.Generator,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Host-side k-means++ seeding (sequential by nature)."""
    pts = np.asarray(points)
    if mask is not None:
        pts = pts[np.asarray(mask)]
    n = len(pts)
    centers = np.empty((k, pts.shape[1]), pts.dtype)
    centers[0] = pts[rng.integers(n)]
    d2 = ((pts - centers[0]) ** 2).sum(1)
    for i in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        centers[i] = pts[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((pts - centers[i]) ** 2).sum(1))
    return centers


@partial(jax.jit, static_argnames=("iters",))
def lloyd(
    points: jnp.ndarray,
    init_centers: jnp.ndarray,
    iters: int = 100,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lloyd's iterations. Returns (centers [K,D], labels [N], inertia []).

    Invalid points (mask False) take label -1 and do not move centers."""
    n = points.shape[0]
    valid = jnp.ones(n, bool) if mask is None else mask
    w = valid.astype(jnp.float32)[:, None]

    def step(centers, _):
        d2 = pairwise_sq_dists(points, centers)  # [N,K]
        labels = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(labels, centers.shape[0], dtype=jnp.float32) * w
        sums = jax.lax.dot_general(
            one_hot, points, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K,D]
        counts = jnp.sum(one_hot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, init_centers, None, length=iters)
    d2 = pairwise_sq_dists(points, centers)
    labels = jnp.where(valid, jnp.argmin(d2, axis=1), -1)
    inertia = jnp.sum(jnp.where(valid, jnp.min(d2, axis=1), 0.0))
    return centers, labels, inertia


def kmeans(
    points, k: int, iters: int = 100, seed: int = 0,
    mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One seeded run. Returns (centers, labels) as numpy."""
    rng = np.random.default_rng(seed)
    init = kmeans_pp_init(np.asarray(points), k, rng, mask)
    centers, labels, _ = lloyd(
        jnp.asarray(points, jnp.float32), jnp.asarray(init, jnp.float32),
        iters, None if mask is None else jnp.asarray(mask),
    )
    return np.asarray(centers), np.asarray(labels)


def kmeans_best(
    points, k: int, n_init: int = 20, iters: int = 100, seed: int = 0,
    mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Best of n_init seeded runs by inertia (sklearn n_init semantics)."""
    rng = np.random.default_rng(seed)
    best = None
    pts_j = jnp.asarray(points, jnp.float32)
    mask_j = None if mask is None else jnp.asarray(mask)
    for _ in range(n_init):
        init = kmeans_pp_init(np.asarray(points), k, rng, mask)
        centers, labels, inertia = lloyd(pts_j, jnp.asarray(init, jnp.float32),
                                         iters, mask_j)
        inertia = float(inertia)
        if best is None or inertia < best[0]:
            best = (inertia, np.asarray(centers), np.asarray(labels))
    return best[1], best[2]
