"""Entropic optimal transport: log-domain Sinkhorn as a fixed-iteration scan.

TPU-native replacement for the reference's POT usage — `ot.emd2` on
sampled point subsets (`/root/reference/aux_optimize_cluster_D_W_distance.py:259-271`)
and the `ot.stochastic.loss_dual_entropic` prototype
(`notebooks/test_EMD_local_stats.ipynb` cells 6, 21). Exact network-simplex
EMD is a sequential pivoting algorithm (hostile to XLA); the standard
TPU-friendly substitute is entropic regularization with a small epsilon:
log-domain Sinkhorn iterations are a fixed-length `lax.scan` of
row/column log-sum-exp reductions — fully differentiable (gradients flow
through the iterates, matching POT's emd2 gradient-through-plan
semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cost_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean cost (POT `ot.dist` default)."""
    from wast3d_tpu.ops.knn import pairwise_sq_dists

    return pairwise_sq_dists(x, y)


@partial(jax.jit, static_argnames=("iters",))
def sinkhorn(
    cost: jnp.ndarray,
    a: Optional[jnp.ndarray] = None,
    b: Optional[jnp.ndarray] = None,
    epsilon: float = 0.01,
    iters: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Log-domain Sinkhorn.

    Args:
      cost: [n, m] cost matrix.
      a/b: marginals (default uniform).
    Returns (transport_cost, f, g): the entropic OT cost <P, C> and the
    dual potentials."""
    n, m = cost.shape
    loga = jnp.log(jnp.full((n,), 1.0 / n) if a is None else a)
    logb = jnp.log(jnp.full((m,), 1.0 / m) if b is None else b)

    def step(carry, _):
        f, g = carry
        # f_i = -eps * LSE_j((g_j + logb_j - C_ij) / eps)
        f = -epsilon * jax.nn.logsumexp((g[None, :] + epsilon * logb[None, :] - cost) / epsilon, axis=1)
        g = -epsilon * jax.nn.logsumexp((f[:, None] + epsilon * loga[:, None] - cost) / epsilon, axis=0)
        return (f, g), None

    (f, g), _ = jax.lax.scan(
        step, (jnp.zeros(n), jnp.zeros(m)), None, length=iters
    )
    # Transport plan in log domain; cost = sum P * C.
    logP = (f[:, None] + g[None, :] - cost) / epsilon + loga[:, None] + logb[None, :]
    P = jnp.exp(logP)
    return jnp.sum(P * cost), f, g


def emd2_approx(
    x: jnp.ndarray, y: jnp.ndarray, epsilon: float = 0.01, iters: int = 200
) -> jnp.ndarray:
    """Differentiable stand-in for POT `ot.emd2(uniform, uniform, dist(x,y))`
    (squared-euclidean ground cost, uniform marginals)."""
    c = cost_matrix(x, y)
    # Scale-aware epsilon: entropic blur proportional to the cost scale.
    scale = jax.lax.stop_gradient(jnp.mean(c) + 1e-12)
    cost, _, _ = sinkhorn(c / scale, epsilon=epsilon, iters=iters)
    return cost * scale
