"""Blockwise exact k-nearest-neighbor ops for point clouds.

TPU-native replacement for the reference's CUDA `simple-knn` submodule
(`/root/reference/submodules/simple-knn/simple_knn.cu:185-220`, Morton-sort
approximate 3-NN used only for scale init, `scene/gaussian_model.py:134`)
and for the many `torch.cdist(...).topk(...)` hotspots in the stylization
losses (`aux_optimize_cluster_D_W_distance4.py:74-84,254-257`, notebook 11
cell 28).

Design: never materialize the N×M distance matrix. Distances are computed
block-by-block via the ||a||² + ||b||² - 2ab^T expansion — the cross term
is a matmul that rides the MXU — and a running top-k is folded across
column blocks with `jax.lax.scan`. Memory is O(N·(k + block)), compute is
exact (unlike the reference's Morton approximation).

All shapes are static; callers pad to the block multiple. Invalid entries
(capacity padding) are masked to +inf distance.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e30


def _pad_rows(x: jnp.ndarray, multiple: int, value: float = 0.0) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=value)


def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,D]x[M,D] -> [N,M] squared euclidean distances (matmul form)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jnp.maximum(a2 + b2.T - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("k", "row_block", "exclude_self"))
def knn_sq_dists_sort(
    query: jnp.ndarray,
    data: jnp.ndarray,
    k: int,
    query_mask: Optional[jnp.ndarray] = None,
    data_mask: Optional[jnp.ndarray] = None,
    exclude_self: bool = False,
    row_block: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`knn_sq_dists` via a full per-row sort instead of a folded top-k.

    Same contract and exact results. Wins when k is LARGE: the top-k fold
    costs O(k·M) VPU selection work per query row, while the bitonic sort
    network is O(M log²M) with dense lane utilization — at the stylization
    descriptor build (M=16k, k=100 local / k=2000 global) this is the
    difference between ~60 s and ~2 s of build time (NOTES_PERF.md §4).
    Memory is O(row_block · M); query rows are processed in sequential
    blocks by `lax.map`.
    """
    n, m = query.shape[0], data.shape[0]
    d2 = jnp.sum(data * data, axis=-1)
    dmask = jnp.ones((m,), bool) if data_mask is None \
        else data_mask.astype(bool)
    col_idx = jnp.arange(m, dtype=jnp.int32)

    q = _pad_rows(query, row_block)
    nb = q.shape[0] // row_block
    q_b = q.reshape(nb, row_block, -1)
    rowid_b = jnp.arange(nb * row_block, dtype=jnp.int32).reshape(
        nb, row_block
    )

    def body(inp):
        qb, rows = inp
        q2 = jnp.sum(qb * qb, axis=-1, keepdims=True)
        cross = jax.lax.dot_general(
            qb, data, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = jnp.maximum(q2 + d2[None, :] - 2.0 * cross, 0.0)
        d = jnp.where(dmask[None, :], d, _BIG)
        if exclude_self:
            d = jnp.where(col_idx[None, :] == rows[:, None], _BIG, d)
        sd, si = jax.lax.sort(
            (d, jnp.broadcast_to(col_idx[None, :], d.shape)),
            dimension=1, num_keys=1,
        )
        return sd[:, :k], si[:, :k]

    best_d, best_i = jax.lax.map(body, (q_b, rowid_b))
    best_d = best_d.reshape(-1, k)[:n]
    best_i = best_i.reshape(-1, k)[:n]
    if query_mask is not None:
        best_d = jnp.where(query_mask[:, None], best_d, _BIG)
    return best_d, best_i


@partial(jax.jit, static_argnames=("k", "block", "exclude_self"))
def knn_sq_dists(
    query: jnp.ndarray,
    data: jnp.ndarray,
    k: int,
    query_mask: Optional[jnp.ndarray] = None,
    data_mask: Optional[jnp.ndarray] = None,
    exclude_self: bool = False,
    block: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k smallest squared distances (and indices) from each query to data.

    Args:
      query: [N, D]; data: [M, D].
      query_mask/data_mask: optional validity masks; invalid data points
        never appear as neighbors, invalid queries return _BIG.
      exclude_self: drop the (i == j) pair — requires query is data.
      block: column block size (static).

    Returns: (dists [N, k] ascending, indices [N, k] into data).
    """
    n, m = query.shape[0], data.shape[0]
    data_p = _pad_rows(data, block)
    mp = data_p.shape[0]
    dmask = jnp.arange(mp) < m
    if data_mask is not None:
        dmask = dmask & _pad_rows(data_mask.astype(bool), block, False)
    num_blocks = mp // block
    data_b = data_p.reshape(num_blocks, block, -1)
    dmask_b = dmask.reshape(num_blocks, block)

    q2 = jnp.sum(query * query, axis=-1, keepdims=True)

    def body(carry, inp):
        best_d, best_i = carry
        cols, cmask, start = inp
        c2 = jnp.sum(cols * cols, axis=-1)
        cross = jax.lax.dot_general(
            query, cols, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        d = jnp.maximum(q2 + c2[None, :] - 2.0 * cross, 0.0)
        d = jnp.where(cmask[None, :], d, _BIG)
        col_idx = start + jnp.arange(block)[None, :]
        if exclude_self:
            d = jnp.where(col_idx == jnp.arange(n)[:, None], _BIG, d)
        # Fold into running top-k (top_k finds largest -> negate).
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(col_idx, d.shape)], axis=1)
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((n, k), _BIG, jnp.float32),
        jnp.zeros((n, k), jnp.int32),
    )
    starts = jnp.arange(num_blocks) * block
    (best_d, best_i), _ = jax.lax.scan(body, init, (data_b, dmask_b, starts))
    if query_mask is not None:
        best_d = jnp.where(query_mask[:, None], best_d, _BIG)
    return best_d, best_i


def mean_sq_dist_to_3nn(
    points: jnp.ndarray, mask: Optional[jnp.ndarray] = None, block: int = 2048
) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest other points, per point —
    drop-in for the reference's `distCUDA2` (`simple-knn/spatial.cu:11-25`),
    but exact rather than Morton-approximate."""
    d, _ = knn_sq_dists(points, points, k=3, query_mask=mask, data_mask=mask,
                        exclude_self=True, block=block)
    return jnp.mean(d, axis=-1)
