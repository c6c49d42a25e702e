"""Ball coverage of the content domain.

Equivalent of notebook 11 cells 20-22: `get_cluster_radius` (largest
inner/outer diameter of the style patch) and the greedy `sample_circles`
cover — pick the first uncovered point, take everything within radius r
(doubling r until at least `min_points_per_cluster` points land inside),
repeat. Greedy + sequential, so it runs on host (O(seconds), SURVEY §7
hard-part #5); distances come from the blockwise kernels.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.knn import pairwise_sq_dists


def _cpu():
    # Greedy host-side geometry: CPU backend avoids per-shape TPU compiles.
    return jax.default_device(jax.local_devices(backend="cpu")[0])


def cluster_radius(points: np.ndarray, block: int = 4096) -> tuple:
    """(inner_diameter, outer_diameter): min/max over points of the max
    pairwise distance (notebook 11 cell 20)."""
    n = len(points)
    max_d2 = np.zeros(n)
    with _cpu():
        pts = jnp.asarray(points, jnp.float32)
        for start in range(0, n, block):
            d2 = np.asarray(pairwise_sq_dists(pts[start:start + block], pts))
            max_d2[start:start + block] = d2.max(axis=1)
    max_d = np.sqrt(max_d2)
    return float(max_d.min()), float(max_d.max())


def sample_circles(
    points: np.ndarray, r: float, min_points_per_cluster: int = 40,
    block: int = 4096,
) -> List[np.ndarray]:
    """Greedy ball cover (notebook 11 cell 21). Returns per-ball index
    arrays (balls overlap; union covers all points)."""
    n = len(points)
    covered = np.zeros(n, dtype=bool)
    circles = []
    with _cpu():
        pts = jnp.asarray(points, jnp.float32)
    while not covered.all():
        q_idx = int(np.argmin(covered))
        with _cpu():
            d2_row = np.asarray(pairwise_sq_dists(pts[q_idx:q_idx + 1], pts))[0]
        r_ = r
        inside = np.zeros(0, np.int64)
        while len(inside) < min_points_per_cluster:
            inside = np.nonzero(d2_row <= r_ * r_)[0]
            r_ *= 2
        covered[inside] = True
        circles.append(inside)
    return circles


def filter_circles(circles: List[np.ndarray], min_points: int = 21) -> List[np.ndarray]:
    """Drop tiny balls (cell 22: `len(x) > 21`)."""
    return [c for c in circles if len(c) > min_points]
