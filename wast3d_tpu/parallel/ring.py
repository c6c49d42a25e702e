"""Ring-sharded neighborhood math: KNN over a device mesh.

SURVEY §5's long-context analogue: the workload's scaling dimension is
N = #Gaussians, and the O(N^2) neighborhood ops (KNN for scale init and
descriptors, cdist losses) are the pieces that outgrow one chip's HBM.
This module applies ring-attention's communication pattern to point
clouds: both query and data shard over the `model` axis; each step every
device computes its query-rows x resident-column-block distances and
folds a running top-k, then the column block rotates one hop around the
ring via `ppermute` (riding ICI). After `num_devices` steps every query
row has seen every column exactly once — O(N^2 / D) compute and
O(N / D) resident memory per device, no N x N materialization anywhere.

Inside each hop the local block runs the same blockwise matmul-form
distance kernel as the single-chip path (`ops/knn.py`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wast3d_tpu.ops.knn import _BIG


def _fold_topk(best_d, best_i, d, col_idx, k):
    cat_d = jnp.concatenate([best_d, d], axis=1)
    cat_i = jnp.concatenate([best_i, col_idx], axis=1)
    neg_top, pos = jax.lax.top_k(-cat_d, k)
    return -neg_top, jnp.take_along_axis(cat_i, pos, axis=1)


def ring_knn_sq_dists(
    query: jnp.ndarray,
    data: jnp.ndarray,
    k: int,
    mesh: Mesh,
    exclude_self: bool = False,
    query_valid: Optional[jnp.ndarray] = None,
    data_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN with both point sets sharded over mesh axis 'model'.

    query [N,D] / data [M,D] must have leading dims divisible by the
    model-axis size. Returns (dists [N,k], global indices [N,k]) with the
    same semantics as ops.knn.knn_sq_dists.
    """
    n_dev = mesh.shape["model"]
    m = data.shape[0]
    m_local = m // n_dev

    if query_valid is None:
        query_valid = jnp.ones(query.shape[0], bool)
    if data_valid is None:
        data_valid = jnp.ones(m, bool)

    def shard_fn(q, qv, cols0, cv0):
        axis = jax.lax.axis_index("model")
        nloc = q.shape[0]
        # Global row offset of this shard's queries (for exclude_self).
        row_idx = jnp.arange(nloc)[:, None] + axis * nloc

        def body(carry, step):
            best_d, best_i, cols, cv = carry
            # The resident block originated on shard (axis - step) % n_dev.
            src = jnp.mod(axis - step, n_dev)
            q2 = jnp.sum(q * q, axis=1, keepdims=True)
            c2 = jnp.sum(cols * cols, axis=1)
            cross = jax.lax.dot_general(
                q, cols, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d = jnp.maximum(q2 + c2[None, :] - 2.0 * cross, 0.0)
            d = jnp.where(cv[None, :], d, _BIG)
            col_idx = jnp.arange(m_local)[None, :] + src * m_local
            col_idx = jnp.broadcast_to(col_idx, d.shape)
            if exclude_self:
                d = jnp.where(col_idx == row_idx, _BIG, d)
            best_d, best_i = _fold_topk(best_d, best_i, d, col_idx, k)
            # Rotate the column block one hop (ICI neighbor exchange).
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            cols = jax.lax.ppermute(cols, "model", perm)
            cv = jax.lax.ppermute(cv, "model", perm)
            return (best_d, best_i, cols, cv), None

        # Initial accumulators must carry the 'model' varying type to match
        # the loop outputs under shard_map's typed axes.
        init = (
            jax.lax.pcast(jnp.full((nloc, k), _BIG, jnp.float32), "model", to="varying"),
            jax.lax.pcast(jnp.zeros((nloc, k), jnp.int32), "model", to="varying"),
            cols0,
            cv0,
        )
        (best_d, best_i, _, _), _ = jax.lax.scan(
            body, init, jnp.arange(n_dev)
        )
        best_d = jnp.where(qv[:, None], best_d, _BIG)
        return best_d, best_i

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("model"), P("model"), P("model"), P("model")),
            out_specs=(P("model"), P("model")),
        )
    )
    return fn(query, query_valid, data, data_valid)


def ring_mean_sq_dist_to_3nn(
    points: jnp.ndarray, mesh: Mesh, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Sharded `distCUDA2` equivalent for beyond-HBM scenes (4M+ splats,
    BASELINE config 4)."""
    d, _ = ring_knn_sq_dists(points, points, k=3, mesh=mesh,
                             exclude_self=True, query_valid=valid,
                             data_valid=valid)
    return jnp.mean(d, axis=-1)
