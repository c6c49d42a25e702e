"""W2-style patch fitting: NN-distance descriptors + vmapped ball optimize.

The WaSt-3D core (notebook 11 cell 28 of
`/root/reference/notebooks/11.fit_cluster_to_the_full_scene.ipynb`):
for each coverage ball of the content domain, optimize a copy of the
style patch so that its nearest-neighbor-distance descriptors match the
patch's (distance preservation = the W2 transfer) while staying attached
to the domain ball. Reference behavior reproduced exactly:

- descriptors: for a point, the distances from it to its k-1 nearest
  neighbors, with the neighbor INDICES frozen from the original style
  patch (`get_descriptors`); two scales: global (k=2000, every 20th
  point) and local (k=100, all points);
- domain attachment: mean over the full |X| x |domain| matrix of
  squared distance masked to each X-point's 20 domain NNs
  (`get_loss_domain_adaptation`);
- init: style points * domain_std * 5 + domain_mean;
- Adam(lr=1e-3), 1000 steps, loss weights 1e0 / 2e2 / 3e1.

TPU re-design: the reference fits balls **sequentially** (its outer loop,
cell 28; SURVEY §3.4 calls this the single most valuable parallelization
target). Here every ball is fitted **simultaneously**: `jax.vmap` over a
[B, Dcap] capacity-padded ball batch, the whole 1000-step Adam loop one
`lax.scan` under jit. Descriptor gathers and the cdist are batched
matmul/gather work on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.config import StylizeConfig
from wast3d_tpu.ops.knn import knn_sq_dists, pairwise_sq_dists

_BIG = 1e30


class TargetDescriptors(NamedTuple):
    idx_global: jnp.ndarray  # [Mg, kg] frozen NN indices (strided points)
    desc_global: jnp.ndarray  # [Mg, kg-1]
    idx_local: jnp.ndarray  # [M, kl]
    desc_local: jnp.ndarray  # [M, kl-1]
    # Dense reformulation (what the fit loop actually consumes): the
    # descriptor losses are exactly
    #   sum_ij W_ij (D_ij - T_ij)^2,  D = cdist(points, points)
    # with W the per-pair weight folding both descriptor scales and their
    # means' normalizations, and T the frozen target distances. D is one
    # MXU matmul and the residual is dense VPU work — no per-step gathers
    # (random gathers cost ~7.6ms per million rows on v5e and dominated
    # the original index-based formulation).
    pair_weight: jnp.ndarray = None  # [M, M]
    pair_target: jnp.ndarray = None  # [M, M]


def descriptors_from_indices(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x [R,k] -> [R,k-1]: distances from each row's own point
    (index 0 = self) to its k-1 neighbors (reference `get_descriptors`)."""
    nns = points[idx]  # [R,k,3]
    return jnp.linalg.norm(nns[:, 1:] - nns[:, :1], axis=-1)


def _pair_mask(idx: jnp.ndarray, rows: jnp.ndarray, m: int) -> jnp.ndarray:
    """[R,k] frozen NN indices (col 0 = self) -> dense [m,m] 0/1 mask of
    the (row_point, neighbor) pairs the descriptor compares."""
    mask = jnp.zeros((m, m), jnp.float32)
    r = jnp.broadcast_to(rows[:, None], idx[:, 1:].shape)
    return mask.at[r, idx[:, 1:]].add(1.0)


def compute_target_descriptors(
    target_points: np.ndarray, cfg: StylizeConfig = StylizeConfig()
) -> TargetDescriptors:
    """Frozen NN structure + descriptors of the style patch (index form
    for inspection/tests, dense pair weight/target form for the fit)."""
    pts = jnp.asarray(target_points, jnp.float32)
    m = pts.shape[0]
    kg = min(cfg.global_knn, m)
    kl = min(cfg.local_knn, m)
    # exclude_self=False: the nearest neighbor of a point is itself, which
    # the reference relies on (descriptor row 0 = self).
    _, idx_g = knn_sq_dists(pts, pts, k=kg)
    _, idx_l = knn_sq_dists(pts, pts, k=kl)
    idx_g = idx_g[:: cfg.global_stride]
    desc_g = descriptors_from_indices(pts, idx_g)
    desc_l = descriptors_from_indices(pts, idx_l)

    rows_g = jnp.arange(m, dtype=jnp.int32)[:: cfg.global_stride]
    rows_l = jnp.arange(m, dtype=jnp.int32)
    mask_g = _pair_mask(idx_g, rows_g, m)
    mask_l = _pair_mask(idx_l, rows_l, m)
    # Fold the loss weights and the descriptor means' denominators so the
    # dense loss equals w_g*mean((desc_g-t)^2) + w_l*mean((desc_l-t)^2).
    weight = (
        cfg.w_global * mask_g / desc_g.size + cfg.w_local * mask_l / desc_l.size
    )
    target = jnp.sqrt(jnp.maximum(pairwise_sq_dists(pts, pts), 1e-24))
    return TargetDescriptors(idx_g, desc_g, idx_l, desc_l,
                             pair_weight=weight, pair_target=target)


def domain_adaptation_loss(
    x: jnp.ndarray, domain: jnp.ndarray, domain_mask: jnp.ndarray, k: int
) -> jnp.ndarray:
    """Reference `get_loss_domain_adaptation`: squared distances masked to
    each point's k domain-NNs, meaned over the FULL |X| x |domain_valid|
    matrix (the unmasked entries count in the denominator)."""
    d2 = pairwise_sq_dists(x, domain)
    d2_masked = jnp.where(domain_mask[None, :], d2, _BIG)
    # kth smallest via top_k (full row sorts are ~100x more work).
    neg_topk, _ = jax.lax.top_k(-d2_masked, k)
    kth = -neg_topk[:, k - 1 : k]
    nn_mask = (d2_masked <= kth).astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(domain_mask), 1)
    return jnp.sum(d2 * nn_mask * domain_mask[None, :]) / (x.shape[0] * n_valid)


def domain_coverage_loss(
    fitted_points: jnp.ndarray, domain: jnp.ndarray,
    domain_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Mean over domain points of squared distance to the nearest fitted
    point — pulls patches to COVER the domain (the reference's
    `loss_domain_coverage`, `visualize_and_fit_multiple_clusters.ipynb`
    cells 13-20; off by default like notebook 11)."""
    d2 = pairwise_sq_dists(domain, fitted_points)
    m = domain_mask.astype(jnp.float32)
    return jnp.sum(jnp.min(d2, axis=1) * m) / jnp.maximum(jnp.sum(m), 1.0)


def _fit_loss(points, target: TargetDescriptors, domain, domain_mask, cfg):
    # Dense masked distance-matrix matching (see TargetDescriptors): both
    # descriptor scales in ONE matmul + elementwise residual.
    d = jnp.sqrt(jnp.maximum(pairwise_sq_dists(points, points), 1e-24))
    loss_desc = jnp.sum(target.pair_weight * (d - target.pair_target) ** 2)
    loss_d = domain_adaptation_loss(points, domain, domain_mask, cfg.domain_knn)
    loss = loss_desc + cfg.w_domain * loss_d
    if getattr(cfg, "w_coverage", 0.0):
        loss = loss + cfg.w_coverage * domain_coverage_loss(
            points, domain, domain_mask
        )
    return loss


@partial(jax.jit, static_argnames=("cfg",))
def fit_balls(
    target_points: jnp.ndarray,  # [M,3] style patch (recentered)
    target_desc: TargetDescriptors,
    domain_points: jnp.ndarray,  # [B, Dcap, 3] padded ball batches
    domain_mask: jnp.ndarray,  # [B, Dcap]
    cfg: StylizeConfig = StylizeConfig(),
) -> jnp.ndarray:
    """Fit a style-patch copy into every ball simultaneously.

    Returns fitted points [B, M, 3]."""

    def fit_one(domain, mask):
        m = mask.astype(jnp.float32)[:, None]
        n = jnp.maximum(jnp.sum(m), 2.0)
        mean = jnp.sum(domain * m, axis=0) / n
        var = jnp.sum(((domain - mean) ** 2) * m, axis=0) / (n - 1.0)
        std = jnp.sqrt(var)
        # Park padded domain points at the ball mean so they are inert.
        domain_c = jnp.where(mask[:, None], domain, mean)
        points0 = target_points * std * 5.0 + mean

        # Hand-rolled Adam over the point cloud (reference Adam(lr=1e-3)).
        def step(carry, _):
            pts, mu, nu, t = carry
            loss, g = jax.value_and_grad(_fit_loss)(
                pts, target_desc, domain_c, mask, cfg
            )
            t = t + 1
            mu = 0.9 * mu + 0.1 * g
            nu = 0.999 * nu + 0.001 * g * g
            mh = mu / (1 - 0.9 ** t)
            nh = nu / (1 - 0.999 ** t)
            pts = pts - cfg.fit_lr * mh / (jnp.sqrt(nh) + 1e-8)
            return (pts, mu, nu, t), loss

        init = (points0, jnp.zeros_like(points0), jnp.zeros_like(points0),
                jnp.float32(0.0))
        (pts, _, _, _), losses = jax.lax.scan(step, init, None,
                                              length=cfg.fit_steps)
        return pts, losses

    fitted, losses = jax.vmap(fit_one)(domain_points, domain_mask)
    return fitted


def pad_balls(
    points: np.ndarray, circles: List[np.ndarray], capacity: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-size ball index sets into [B, capacity] padded
    arrays. Balls larger than capacity are subsampled (with a note that
    callers should size capacity to avoid this)."""
    B = len(circles)
    out = np.zeros((B, capacity, 3), np.float32)
    mask = np.zeros((B, capacity), bool)
    rng = np.random.default_rng(0)
    for i, idx in enumerate(circles):
        if len(idx) > capacity:
            idx = rng.choice(idx, size=capacity, replace=False)
        out[i, : len(idx)] = points[idx]
        mask[i, : len(idx)] = True
    return out, mask


def fit_all_balls(
    target_points: np.ndarray,
    domain_points: np.ndarray,
    circles: List[np.ndarray],
    cfg: StylizeConfig = StylizeConfig(),
    batch_size: int = 8,
) -> List[np.ndarray]:
    """Host driver: pad balls, fit in vmapped batches, return per-ball
    fitted point arrays [M, 3] (the reference's sequential
    `optimize_all_by_clusters`, parallelized)."""
    target_desc = compute_target_descriptors(target_points, cfg)
    tp = jnp.asarray(target_points, jnp.float32)
    cap = min(cfg.ball_capacity, max(len(c) for c in circles))
    balls, mask = pad_balls(np.asarray(domain_points, np.float32), circles, cap)
    results = []
    for s in range(0, len(circles), batch_size):
        batch = jnp.asarray(balls[s : s + batch_size])
        bm = jnp.asarray(mask[s : s + batch_size])
        # Pad the batch dim so every call shares one compilation.
        pad = batch_size - batch.shape[0]
        if pad:
            batch = jnp.pad(batch, ((0, pad), (0, 0), (0, 0)))
            bm = jnp.pad(bm, ((0, pad), (0, 0)))
            bm = bm.at[-pad:, 0].set(True)  # keep stats finite
        fitted = fit_balls(tp, target_desc, batch, bm, cfg)
        fitted = np.asarray(fitted)
        for b in range(min(batch_size, len(circles) - s)):
            results.append(fitted[b])
    return results
