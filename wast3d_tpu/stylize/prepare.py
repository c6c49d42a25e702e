"""Content-scene preparation: clustering, outlier removal, density subsample.

Equivalent of notebook 11 cells 5-6 (`prepare_scene`, `remove_outliers`,
`sample_points_by_density`) of
`/root/reference/notebooks/11.fit_cluster_to_the_full_scene.ipynb`:

- K-means over content positions (per-cluster processing bounds the O(n^2)
  neighborhood math),
- outlier removal: drop points whose k-th-NN distance exceeds the q
  quantile (k=30, q notebook default 0.925; the full-scene run uses 0.975),
- inverse-density subsampling: sample ~1/10 of each cluster's points with
  probability inversely proportional to the neighbor count within
  `radius` (computed, like the reference, against every 10th point).

The per-cluster distance work uses the blockwise KNN kernels — no N x N
materialization beyond a cluster.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.kmeans import kmeans
from wast3d_tpu.ops.knn import knn_sq_dists, pairwise_sq_dists


def _cpu():
    """Host-side prep math runs on the CPU backend: per-bucket shapes would
    each cost tens of seconds of (remote) TPU compilation for milliseconds
    of compute."""
    return jax.default_device(jax.local_devices(backend="cpu")[0])


def _bucket(n: int, minimum: int = 64) -> int:
    """Next power-of-two bucket: per-cluster calls share jit compilations
    instead of recompiling for every cluster size (a per-cluster-shape
    recompile storm costs minutes on TPU)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_points(points: np.ndarray, cap: int):
    pad = cap - len(points)
    padded = np.pad(points.astype(np.float32), ((0, pad), (0, 0)))
    mask = np.zeros(cap, bool)
    mask[: len(points)] = True
    return padded, mask


def remove_outliers(points: np.ndarray, kth_neighbor: int = 30,
                    q: float = 0.925) -> np.ndarray:
    """Indices of points whose kth-NN distance is below the q quantile."""
    n = len(points)
    k = min(kth_neighbor, n)
    padded, mask = _pad_points(np.asarray(points), _bucket(n))
    with _cpu():
        d2, _ = knn_sq_dists(jnp.asarray(padded), jnp.asarray(padded), k=k,
                             query_mask=jnp.asarray(mask),
                             data_mask=jnp.asarray(mask))
    kth = np.sqrt(np.asarray(d2)[:n, k - 1])
    thresh = np.quantile(kth, q)
    return np.nonzero(kth < thresh)[0]


def sample_points_by_density(
    points: np.ndarray, num_samples: Optional[int] = None,
    radius: float = 0.05, seed: int = 0,
) -> np.ndarray:
    """Inverse-density sampling (vs every-10th-point neighbor counts)."""
    n = len(points)
    padded, mask = _pad_points(np.asarray(points), _bucket(n))
    with _cpu():
        pts = jnp.asarray(padded)
        cols = pts[::10]
        col_mask = jnp.asarray(mask)[::10]
        d2 = pairwise_sq_dists(pts, cols)
        counts = np.asarray(
            jnp.sum((d2 <= radius * radius) & col_mask[None, :], axis=1)
        )[:n]
    inv = 1.0 / (counts + 1.0)
    probs = inv / inv.sum()
    if num_samples is None:
        num_samples = n // 10
    rng = np.random.default_rng(seed)
    return rng.choice(n, size=num_samples, replace=True, p=probs)


def _batched_kth_nn(pts_b: jnp.ndarray, mask_b: jnp.ndarray, k: int):
    """[C, cap, 3] padded clusters -> [C, cap] kth-NN distance (masked).
    `lax.map` keeps peak memory at ONE cluster's blockwise KNN while a
    single compile covers every cluster (per-cluster-shape jits would
    each cost tens of seconds on the remote TPU compiler)."""

    def one(args):
        pts, msk = args
        d2, _ = knn_sq_dists(pts, pts, k=k, query_mask=msk, data_mask=msk)
        return jnp.sqrt(d2[:, k - 1])

    return jax.lax.map(one, (pts_b, mask_b))


def _batched_density_counts(pts_b: jnp.ndarray, mask_b: jnp.ndarray,
                            radius: float):
    """[C, cap, 3] compacted clean clusters -> [C, cap] neighbor counts
    within `radius` against every 10th point (reference semantics)."""

    def one(args):
        pts, msk = args
        cols = pts[::10]
        col_mask = msk[::10]
        d2 = pairwise_sq_dists(pts, cols)
        return jnp.sum((d2 <= radius * radius) & col_mask[None, :], axis=1)

    return jax.lax.map(one, (pts_b, mask_b))


def prepare_scene(
    points: np.ndarray, num_clusters: int = 40,
    num_samples: Optional[int] = None, radius: float = 0.05,
    q: float = 0.925, kth_neighbor: int = 30, seed: int = 0,
    batched: Optional[bool] = None,
) -> np.ndarray:
    """Clean + subsample the content scene. Returns indices into `points`
    of the retained 'domain' points (notebook 11 `prepare_scene`).

    batched=True runs the per-cluster O(n^2) stages as ONE batched TPU
    program over all clusters (two `lax.map` passes) instead of the
    sequential per-cluster host loop — the loop costs ~200s at 1M points
    / 80 clusters where the batched path is seconds (+ one cached
    compile). Default: batched on TPU backends for >= 200k points.
    Semantics match the sequential path (same masks, same per-cluster
    quantile and rng)."""
    points = np.asarray(points, np.float32)
    _, labels = kmeans(points, num_clusters, iters=100, seed=seed)
    if batched is None:
        batched = (len(points) >= 200_000
                   and jax.default_backend() == "tpu")
    if not batched:
        kept: List[np.ndarray] = []
        for lbl in range(num_clusters):
            cluster_idx = np.nonzero(labels == lbl)[0]
            if len(cluster_idx) < 2:
                continue
            non_outliers = remove_outliers(points[cluster_idx], kth_neighbor, q)
            clean_idx = cluster_idx[non_outliers]
            if len(clean_idx) < 2:
                continue
            sampled = sample_points_by_density(
                points[clean_idx], num_samples=num_samples, radius=radius,
                seed=seed,
            )
            kept.append(clean_idx[sampled])
        return np.concatenate(kept) if kept else np.zeros(0, np.int64)

    # ---- batched path ----
    cluster_indices = [np.nonzero(labels == lbl)[0]
                       for lbl in range(num_clusters)]
    cluster_indices = [ci for ci in cluster_indices if len(ci) >= 2]
    if not cluster_indices:
        return np.zeros(0, np.int64)
    cap = _bucket(max(len(ci) for ci in cluster_indices))
    C = len(cluster_indices)
    pts_b = np.zeros((C, cap, 3), np.float32)
    mask_b = np.zeros((C, cap), bool)
    for i, ci in enumerate(cluster_indices):
        pts_b[i, : len(ci)] = points[ci]
        mask_b[i, : len(ci)] = True

    k = min(kth_neighbor, cap)
    kth_b = np.asarray(
        _batched_kth_nn(jnp.asarray(pts_b), jnp.asarray(mask_b), k)
    )

    # Host: per-cluster quantile keep + compaction (cheap).
    clean_lists: List[np.ndarray] = []
    for i, ci in enumerate(cluster_indices):
        if len(ci) <= k:
            # Tiny cluster: the batched k exceeds its size (masked kth is
            # inf) — use the exact per-cluster path (trivial cost).
            clean = ci[remove_outliers(points[ci], kth_neighbor, q)]
        else:
            kth = kth_b[i, : len(ci)]
            thresh = np.quantile(kth, q)
            clean = ci[np.nonzero(kth < thresh)[0]]
        if len(clean) >= 2:
            clean_lists.append(clean)
    if not clean_lists:
        return np.zeros(0, np.int64)
    cap2 = _bucket(max(len(ci) for ci in clean_lists))
    C2 = len(clean_lists)
    pts2 = np.zeros((C2, cap2, 3), np.float32)
    mask2 = np.zeros((C2, cap2), bool)
    for i, ci in enumerate(clean_lists):
        pts2[i, : len(ci)] = points[ci]
        mask2[i, : len(ci)] = True
    counts_b = np.asarray(
        _batched_density_counts(jnp.asarray(pts2), jnp.asarray(mask2), radius)
    )

    kept = []
    for i, ci in enumerate(clean_lists):
        n = len(ci)
        counts = counts_b[i, :n]
        inv = 1.0 / (counts + 1.0)
        probs = inv / inv.sum()
        ns = n // 10 if num_samples is None else num_samples
        rng = np.random.default_rng(seed)
        kept.append(ci[rng.choice(n, size=ns, replace=True, p=probs)])
    return np.concatenate(kept) if kept else np.zeros(0, np.int64)
