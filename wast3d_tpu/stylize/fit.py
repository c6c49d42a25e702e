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
`lax.scan` under jit.

Descriptor loss formulation (the scaling story): both descriptor scales
are exactly
    sum_ij W_ij (D_ij - T_ij)^2,   D = cdist(points, points)
with W the per-pair weight folding both scales' means and T the frozen
target distances. W is extremely sparse (<= local_knn + global_knn
entries per row) and 0/1-valued per scale, so it is stored as two
BIT-PACKED masks ([Mp, Mp/8] uint8, 16 MB each at M = 16k, vs 1 GB for
the dense f32 matrix), and T is recomputed from the frozen style points
(one extra matmul). The loss streams over COLUMN BLOCKS of the distance
matrix inside a `lax.scan` whose per-block body is `jax.checkpoint`ed —
peak memory is O(M * block) regardless of M, never the [M, M] the
reference materializes (`torch.cdist`, notebook 11 cell 28), so patches
of 16k+ points fit on-chip. Blocks are matmuls (MXU) + a bit-decode and
masked residual (VPU).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.config import StylizeConfig
from wast3d_tpu.ops.knn import (knn_sq_dists, knn_sq_dists_sort,
                                pairwise_sq_dists)

_BIG = 1e30


class TargetDescriptors(NamedTuple):
    """Frozen NN structure of the style patch.

    Index forms (inspection/tests) + the streaming form the fit consumes:
    padded points, bit-packed pair masks, and folded loss coefficients.
    """

    idx_global: jnp.ndarray  # [Mg, kg] frozen NN indices (strided points)
    desc_global: jnp.ndarray  # [Mg, kg-1]
    idx_local: jnp.ndarray  # [M, kl]
    desc_local: jnp.ndarray  # [M, kl-1]
    points: jnp.ndarray  # [Mp, 3] padded style points (T_ij recomputed)
    bits_global: jnp.ndarray  # [Mp, Mp//8] uint8, little-endian bit j of
    #   byte b = pair (row, col 8b+j) belongs to the global descriptor
    bits_local: jnp.ndarray  # [Mp, Mp//8]
    coef_global: jnp.ndarray  # w_global / desc_global.size
    coef_local: jnp.ndarray  # w_local / desc_local.size
    # Optional dense pair-code matrix [Mp, Mp] uint8 (bitsG + 2*bitsL) for
    # the fused Pallas loss kernel (cfg.desc_kernel; costs Mp^2 bytes).
    pair_code: Optional[jnp.ndarray] = None


def descriptors_from_indices(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x [R,k] -> [R,k-1]: distances from each row's own point
    (index 0 = self) to its k-1 neighbors (reference `get_descriptors`)."""
    nns = points[idx]  # [R,k,3]
    return jnp.linalg.norm(nns[:, 1:] - nns[:, :1], axis=-1)


def padded_patch_size(m: int, block: int) -> int:
    """Static padded size: one lane-aligned block when the patch fits,
    else a whole number of `block`-wide column blocks."""
    if m <= block:
        return -(-m // 128) * 128
    return -(-m // block) * block


def _pair_dense(idx: np.ndarray, rows: np.ndarray, mp: int) -> np.ndarray:
    """[R,k] frozen NN indices (col 0 = self) -> [mp, mp] dense 0/1 mask
    of the (row_point, neighbor) pairs the descriptor compares.
    kNN indices are distinct within a row, so the mask is exactly 0/1."""
    dense = np.zeros((mp, mp), np.uint8)
    r = np.repeat(np.asarray(rows), idx.shape[1] - 1)
    dense[r, np.asarray(idx[:, 1:]).ravel()] = 1
    return dense


def _pack_pair_bits(idx: np.ndarray, rows: np.ndarray, mp: int) -> np.ndarray:
    """Bit-packed form of `_pair_dense` ([mp, mp//8], little-endian)."""
    return np.packbits(_pair_dense(idx, rows, mp), axis=1, bitorder="little")


@partial(jax.jit, static_argnames=("mp",))
def _pair_dense_dev(idx: jnp.ndarray, rows: jnp.ndarray, mp: int) -> jnp.ndarray:
    """Device-side `_pair_dense`: [R,k] frozen NN indices (col 0 = self)
    -> [mp, mp] uint8 0/1 pair mask (one scatter of R*(k-1) ones)."""
    r = jnp.repeat(rows, idx.shape[1] - 1)
    c = idx[:, 1:].reshape(-1)
    return jnp.zeros((mp, mp), jnp.uint8).at[r, c].set(1, mode="drop")


@jax.jit
def _packbits_dev(dense: jnp.ndarray) -> jnp.ndarray:
    """Device-side np.packbits(axis=1, bitorder='little'):
    [R, C] u8 0/1 -> [R, C//8] u8."""
    r, c = dense.shape
    w = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, None, :]
    return jnp.sum(dense.reshape(r, c // 8, 8) * w, axis=-1, dtype=jnp.uint8)


def _unpack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[R, C//8] uint8 -> [R, C] f32 (little-endian bit order)."""
    b = bits.astype(jnp.int32)
    out = (b[:, :, None] >> jnp.arange(8, dtype=jnp.int32)[None, None, :]) & 1
    return out.reshape(b.shape[0], -1).astype(jnp.float32)


def compute_target_descriptors(
    target_points: np.ndarray, cfg: StylizeConfig = StylizeConfig()
) -> TargetDescriptors:
    """Frozen NN structure + descriptors of the style patch."""
    pts = jnp.asarray(target_points, jnp.float32)
    m = pts.shape[0]
    kg = min(cfg.global_knn, m)
    kl = min(cfg.local_knn, m)
    # exclude_self=False: the nearest neighbor of a point is itself, which
    # the reference relies on (descriptor row 0 = self). The global
    # descriptor only uses every `global_stride`-th row — stride the
    # QUERIES (identical indices, 20x less top-k work at the default
    # stride; the reference computes the full cdist then strides,
    # notebook 11 cell 28).
    # Large-k exact kNN goes through the per-row-sort path: the top-k
    # fold is O(k·M) VPU work per row and dominated the 16k-patch build
    # (~60 s); the sort path is ~2 s (knn_sq_dists_sort doc).
    knn_big = knn_sq_dists_sort if max(kg, kl) >= 64 else knn_sq_dists
    _, idx_g = knn_big(pts[:: cfg.global_stride], pts, k=kg)
    _, idx_l = knn_big(pts, pts, k=kl)
    desc_g = descriptors_from_indices(pts, idx_g)
    desc_l = descriptors_from_indices(pts, idx_l)

    mp = padded_patch_size(m, cfg.desc_block)
    # Kernel path needs a real TPU (or explicit interpret mode for tests);
    # small patches stay on the streaming XLA path, which wins below 2048.
    backend_ok = (jax.default_backend() == "tpu"
                  or bool(getattr(cfg, "pallas_interpret", False)))
    use_kernel = (bool(getattr(cfg, "desc_kernel", False)) and mp >= 2048
                  and backend_ok)
    if use_kernel:
        from wast3d_tpu.stylize import desc_kernel as dk

        mp = -(-mp // dk.BC) * dk.BC  # kernel block alignment
    rows_g = jnp.arange(m, dtype=jnp.int32)[:: cfg.global_stride]
    rows_l = jnp.arange(m, dtype=jnp.int32)
    # Mask/pack construction runs ON DEVICE: at 16k the dense masks are
    # 268 MB each — the old host-numpy build plus the pair_code tunnel
    # transfer dominated the descriptor build wall time.
    dense_g = _pair_dense_dev(idx_g, rows_g, mp)
    dense_l = _pair_dense_dev(idx_l, rows_l, mp)
    pair_code = None
    if use_kernel:
        pair_code = dense_g + 2 * dense_l  # [mp, mp] u8
    bits_g = _packbits_dev(dense_g)
    bits_l = _packbits_dev(dense_l)
    pts_pad = jnp.pad(pts, ((0, mp - m), (0, 0)))
    return TargetDescriptors(
        idx_g, desc_g, idx_l, desc_l,
        points=pts_pad,
        bits_global=bits_g,
        bits_local=bits_l,
        coef_global=jnp.float32(cfg.w_global / desc_g.size),
        coef_local=jnp.float32(cfg.w_local / desc_l.size),
        pair_code=pair_code,
    )


def dense_pair_terms(target: TargetDescriptors):
    """One-time dense [Mp, Mp] (W, T) for the single-block fast path.

    W/T are Adam-loop invariants; decoding bits and recomputing target
    distances inside every step costs ~3x the step's elementwise work at
    small M (measured 1000 -> 269 ball-steps/s on v5e), so when the dense
    matrices fit they are hoisted out of the optimization scan."""
    w = target.coef_global * _unpack_bits(target.bits_global) \
        + target.coef_local * _unpack_bits(target.bits_local)
    t = jnp.sqrt(jnp.maximum(
        pairwise_sq_dists(target.points, target.points), 1e-24))
    return w, t


def descriptor_loss(
    points_pad: jnp.ndarray, target: TargetDescriptors, block: int,
    dense_wt=None, interpret: bool = False,
) -> jnp.ndarray:
    """sum_ij W_ij (D_ij - T_ij)^2 streamed over column blocks.

    points_pad: [Mp, 3] padded to target.points' shape (padded rows carry
    no mask bits, so they contribute nothing). dense_wt: optional
    precomputed `dense_pair_terms` (single-block path only)."""
    mp = points_pad.shape[0]

    if target.pair_code is not None:
        # Fused Pallas kernel path (desc_kernel.py): everything in VMEM,
        # no [Mp, block] HBM slab round-trips.
        from wast3d_tpu.stylize import desc_kernel as dk

        return dk.pair_loss(
            points_pad, target.points, target.pair_code,
            target.coef_global, target.coef_local, interpret,
        )

    def block_term(x, xb, tb, bg, bl):
        d = jnp.sqrt(jnp.maximum(pairwise_sq_dists(x, xb), 1e-24))
        t = jnp.sqrt(jnp.maximum(
            pairwise_sq_dists(target.points, tb), 1e-24))
        w = target.coef_global * _unpack_bits(bg) \
            + target.coef_local * _unpack_bits(bl)
        return jnp.sum(w * (d - t) ** 2)

    if mp <= block:
        if dense_wt is not None:
            w, t = dense_wt
            d = jnp.sqrt(jnp.maximum(
                pairwise_sq_dists(points_pad, points_pad), 1e-24))
            return jnp.sum(w * (d - t) ** 2)
        return block_term(points_pad, points_pad, target.points,
                          target.bits_global, target.bits_local)

    nb = mp // block
    cb = block // 8
    xb = points_pad.reshape(nb, block, 3)
    tb = target.points.reshape(nb, block, 3)
    bg = jnp.moveaxis(target.bits_global.reshape(mp, nb, cb), 1, 0)
    bl = jnp.moveaxis(target.bits_local.reshape(mp, nb, cb), 1, 0)

    def body(acc, inp):
        # checkpoint: recompute the [Mp, block] distance slabs in the
        # VJP instead of storing nb of them (that would be [Mp, Mp]).
        return acc + jax.checkpoint(block_term)(points_pad, *inp), None

    loss, _ = jax.lax.scan(body, jnp.float32(0.0), (xb, tb, bg, bl))
    return loss


def domain_adaptation_loss(
    x: jnp.ndarray, domain: jnp.ndarray, domain_mask: jnp.ndarray, k: int,
    x_rows: Optional[int] = None, dense_block: int = 4096,
) -> jnp.ndarray:
    """Reference `get_loss_domain_adaptation`: squared distances masked to
    each point's k domain-NNs, meaned over the FULL |X| x |domain_valid|
    matrix (the unmasked entries count in the denominator).

    x_rows: count only the first x_rows rows (capacity-padded callers);
    the denominator |X| stays x_rows to match the reference.

    Two equal formulations (the masked sum = sum of each row's k smallest
    valid squared distances): a dense [X, D] top-k when the domain fits
    one block — 4.3x faster than the streaming kNN at typical ball sizes
    (measured 1158 vs 268 ball-steps/s on v5e; the kNN pays for padding,
    the running-top-k concat, and its gather VJP) — and the streaming
    blockwise kNN beyond, which keeps memory O(|X| * block)."""
    n_rows = x.shape[0] if x_rows is None else x_rows
    row_live = jnp.arange(x.shape[0]) < n_rows
    n_valid = jnp.maximum(jnp.sum(domain_mask), 1)
    if domain.shape[0] <= dense_block:
        d2 = pairwise_sq_dists(x, domain)
        d2m = jnp.where(domain_mask[None, :], d2, _BIG)
        neg_topk, _ = jax.lax.top_k(-d2m, min(k, domain.shape[0]))
        kth = -neg_topk[:, -1:]
        nn_mask = (d2m <= kth).astype(jnp.float32)
        d2 = d2 * nn_mask * domain_mask[None, :] * row_live[:, None]
        return jnp.sum(d2) / (n_rows * n_valid)
    d, _ = knn_sq_dists(x, domain, k=min(k, domain.shape[0]),
                        data_mask=domain_mask)
    d = jnp.where(d > _BIG * 0.5, 0.0, d)  # rows with < k valid neighbors
    d = jnp.where(row_live[:, None], d, 0.0)
    return jnp.sum(d) / (n_rows * n_valid)


def domain_coverage_loss(
    fitted_points: jnp.ndarray, domain: jnp.ndarray,
    domain_mask: jnp.ndarray, x_rows: Optional[int] = None,
) -> jnp.ndarray:
    """Mean over domain points of squared distance to the nearest fitted
    point — pulls patches to COVER the domain (the reference's
    `loss_domain_coverage`, `visualize_and_fit_multiple_clusters.ipynb`
    cells 13-20; off by default like notebook 11)."""
    d2 = pairwise_sq_dists(domain, fitted_points)
    if x_rows is not None:
        col_live = jnp.arange(fitted_points.shape[0]) < x_rows
        d2 = jnp.where(col_live[None, :], d2, _BIG)
    m = domain_mask.astype(jnp.float32)
    return jnp.sum(jnp.min(d2, axis=1) * m) / jnp.maximum(jnp.sum(m), 1.0)


def _fit_loss(points_pad, m_true, target: TargetDescriptors, domain,
              domain_mask, cfg, dense_wt=None):
    loss_desc = descriptor_loss(points_pad, target, cfg.desc_block,
                                dense_wt=dense_wt,
                                interpret=getattr(cfg, "pallas_interpret",
                                                  False))
    loss_d = domain_adaptation_loss(points_pad, domain, domain_mask,
                                    cfg.domain_knn, x_rows=m_true)
    loss = loss_desc + cfg.w_domain * loss_d
    if getattr(cfg, "w_coverage", 0.0):
        loss = loss + cfg.w_coverage * domain_coverage_loss(
            points_pad, domain, domain_mask, x_rows=m_true
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
    m = target_points.shape[0]
    mp = target_desc.points.shape[0]
    tp_pad = jnp.pad(jnp.asarray(target_points, jnp.float32),
                     ((0, mp - m), (0, 0)))
    # Hoist the Adam-loop-invariant dense (W, T) when one block suffices
    # (ball-independent: computed once, shared across the vmap).
    dense_wt = dense_pair_terms(target_desc) if mp <= cfg.desc_block else None

    def fit_one(domain, mask):
        mk = mask.astype(jnp.float32)[:, None]
        n = jnp.maximum(jnp.sum(mk), 2.0)
        mean = jnp.sum(domain * mk, axis=0) / n
        var = jnp.sum(((domain - mean) ** 2) * mk, axis=0) / (n - 1.0)
        std = jnp.sqrt(var)
        # Park padded domain points at the ball mean so they are inert.
        domain_c = jnp.where(mask[:, None], domain, mean)
        points0 = tp_pad * std * 5.0 + mean

        # Hand-rolled Adam over the point cloud (reference Adam(lr=1e-3)).
        def step(carry, _):
            pts, mu, nu, t = carry
            loss, g = jax.value_and_grad(_fit_loss)(
                pts, m, target_desc, domain_c, mask, cfg, dense_wt
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
    return fitted[:, :m]


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
    mesh=None,
) -> List[np.ndarray]:
    """Host driver: pad balls, fit in vmapped batches, return per-ball
    fitted point arrays [M, 3] (the reference's sequential
    `optimize_all_by_clusters`, parallelized).

    With a `mesh`, the ball axis additionally shards across every mesh
    device (each ball's fit is independent — the reference's outer loop,
    SURVEY.md §3.4): descriptors/patch replicate, each device fits
    batch_size/n_devices balls per dispatch. This is the single-style
    scale-out of the BASELINE north star (v5p-8 fits 8 ball batches at
    once); the style-axis analogue for sweeps lives in stylize/sweep.py."""
    target_desc = compute_target_descriptors(target_points, cfg)
    tp = jnp.asarray(target_points, jnp.float32)
    cap = min(cfg.ball_capacity, max(len(c) for c in circles))
    balls, mask = pad_balls(np.asarray(domain_points, np.float32), circles, cap)

    place_batch = lambda x: x
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = int(mesh.devices.size)
        # Every device must own an equal slab of the ball axis.
        batch_size = max(batch_size, nd)
        batch_size += (-batch_size) % nd
        ball_sh = NamedSharding(mesh, P(("data", "model")))
        rep = NamedSharding(mesh, P())
        place_batch = lambda x: jax.device_put(x, ball_sh)
        tp = jax.device_put(tp, rep)
        target_desc = jax.tree.map(lambda x: jax.device_put(x, rep),
                                   target_desc)

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
        batch, bm = place_batch(batch), place_batch(bm)
        if mesh is not None:
            with mesh:
                fitted = fit_balls(tp, target_desc, batch, bm, cfg)
        else:
            fitted = fit_balls(tp, target_desc, batch, bm, cfg)
        fitted = np.asarray(fitted)
        for b in range(min(batch_size, len(circles) - s)):
            results.append(fitted[b])
    return results
