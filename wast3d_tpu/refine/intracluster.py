"""Intracluster pairwise-distance statistics and loss.

Port of the reference's `get_intracluster_stats`
(`/root/reference/train_st.py:102-171`) and the intracluster loss it
feeds (`train_st.py:305-318`, gated off upstream behind `if False`): for
each cluster, the pairwise L2-distance matrix of a per-Gaussian attribute
within that cluster; the loss is the per-cluster mean squared deviation
of the predicted matrix from a GT matrix, averaged over clusters (weight
1e0 per attribute upstream).

TPU design: the reference loops Python-side over clusters producing a
ragged list of [m_k, m_k] tensors — shape-dynamic and host-bound. Here
clusters are packed once into a static [K, cap] member-index grid (mask
for rag), and all K pairwise matrices are computed in one vmapped
matmul-form distance batch: [K, cap, cap] with invalid pairs masked. The
loss contracts that batch without ever materializing per-cluster Python
objects, so it jits into the training step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.knn import pairwise_sq_dists


class ClusterPack(NamedTuple):
    """Static packing of ragged cluster membership."""

    member_idx: jnp.ndarray  # [K, cap] indices into the value rows
    member_mask: jnp.ndarray  # [K, cap] bool
    counts: jnp.ndarray  # [K] true member counts (pre-truncation)


def pack_clusters(cluster_ids: np.ndarray, num_clusters: int,
                  cap: Optional[int] = None) -> ClusterPack:
    """Group row indices by cluster id (host-side, once per scene).

    cluster_ids: [N] ints in [0, num_clusters) (the reference uses
    1-based ids, `train_st.py:142`; callers convert). cap defaults to the
    largest cluster, rounded up to a multiple of 8 (sublane tile)."""
    ids = np.asarray(cluster_ids)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    starts = np.searchsorted(sorted_ids, np.arange(num_clusters))
    ends = np.searchsorted(sorted_ids, np.arange(num_clusters) + 1)
    counts = (ends - starts).astype(np.int32)
    if cap is None:
        cap = max(8, int(-(-int(counts.max(initial=1)) // 8) * 8))
    idx = np.zeros((num_clusters, cap), np.int32)
    msk = np.zeros((num_clusters, cap), bool)
    for k in range(num_clusters):
        m = min(int(counts[k]), cap)
        idx[k, :m] = order[starts[k]:starts[k] + m]
        msk[k, :m] = True
    return ClusterPack(jnp.asarray(idx), jnp.asarray(msk),
                       jnp.asarray(counts))


@jax.jit
def intracluster_pairwise_dists(values: jnp.ndarray,
                                pack: ClusterPack) -> jnp.ndarray:
    """All-cluster pairwise L2 distance matrices.

    values: [N, d] attribute rows (e.g. xyz, features_dc flattened).
    Returns [K, cap, cap] with masked pairs = 0 — the batch equivalent of
    the reference's `torch.cdist(group, group)` per cluster
    (`train_st.py:155`)."""
    v = values.reshape(values.shape[0], -1)
    grouped = v[pack.member_idx]  # [K, cap, d]
    d2 = jax.vmap(pairwise_sq_dists)(grouped, grouped)
    pair_mask = pack.member_mask[:, :, None] & pack.member_mask[:, None, :]
    # 1e-24 floor: sqrt'(0) is inf and the diagonal is exactly 0 — the
    # clamp keeps the (zero) diagonal gradient finite under autodiff.
    return jnp.sqrt(jnp.maximum(d2, 1e-24)) * pair_mask


@jax.jit
def intracluster_stats_loss(values: jnp.ndarray, gt_dists: jnp.ndarray,
                            pack: ClusterPack) -> jnp.ndarray:
    """Reference intracluster loss (`train_st.py:308-313`): per cluster,
    mean over the full cap x cap matrix of squared (pred - GT) distance
    deviations restricted to valid pairs, averaged over clusters."""
    pred = intracluster_pairwise_dists(values, pack)
    pair_mask = (
        pack.member_mask[:, :, None] & pack.member_mask[:, None, :]
    ).astype(jnp.float32)
    sq = (pred - gt_dists * pair_mask) ** 2
    per_cluster = jnp.sum(sq, axis=(1, 2)) / jnp.maximum(
        jnp.sum(pair_mask, axis=(1, 2)), 1.0
    )
    return jnp.mean(per_cluster)


def get_intracluster_stats(scene, cluster_ids: np.ndarray,
                           attrbs: tuple = ("xyz",),
                           num_clusters: Optional[int] = None,
                           cap: Optional[int] = None) -> dict:
    """Reference-shaped entry point (`train_st.py:102`): dict attribute ->
    [K, cap, cap] pairwise-distance batch (masked instead of ragged)."""
    ids = np.asarray(cluster_ids)
    if num_clusters is None:
        num_clusters = int(ids.max()) + 1
    pack = pack_clusters(ids, num_clusters, cap)
    out = {}
    for attr in attrbs:
        values = jnp.asarray(getattr(scene, attr))
        out[attr] = intracluster_pairwise_dists(values, pack)
    return out
