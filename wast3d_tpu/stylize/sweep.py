"""Data-parallel style sweep: one content scene x S style patches.

BASELINE config 5 — a capability the reference does not have (its shell
scripts run independent single-GPU jobs per style,
`scripts/train_style_scenes.sh:20,26`). Here the sweep is a single jitted
program: the style axis shards over the mesh's `data` axis, each device
fitting its styles' balls concurrently (and vmapping over balls within).

All patches are subsampled to a common point count so the descriptor
tensors stack; content preparation and ball coverage run once per style
on the host (patch radii differ).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wast3d_tpu.config import StylizeConfig
from wast3d_tpu.scene.gaussians import GaussianScene
from wast3d_tpu.stylize import coverage, fit, merge, prepare
from wast3d_tpu.stylize.cluster import StylePatch
from wast3d_tpu.stylize.pipeline import clean_style_patch


def fit_balls_sweep(
    targets: jnp.ndarray,  # [S, M, 3]
    descs: fit.TargetDescriptors,  # leaves stacked with leading S
    balls: jnp.ndarray,  # [S, B, Dcap, 3]
    mask: jnp.ndarray,  # [S, B, Dcap]
    cfg: StylizeConfig,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """vmap the ball fitter over the style axis; shard styles over 'data'
    when a mesh is given. Returns [S, B, M, 3]."""
    f = jax.vmap(partial(fit.fit_balls, cfg=cfg))
    if mesh is None:
        return f(targets, descs, balls, mask)
    sh = NamedSharding(mesh, P("data"))
    place = lambda x: jax.device_put(x, sh)
    targets = place(targets)
    descs = jax.tree.map(place, descs)
    balls = place(balls)
    mask = place(mask)
    with mesh:
        return jax.jit(f)(targets, descs, balls, mask)


def stylize_sweep(
    content: GaussianScene,
    style_patches: List[StylePatch],
    cfg: StylizeConfig = StylizeConfig(),
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    max_style_points: int = 16384,
    verbose: bool = False,
) -> List[GaussianScene]:
    """Stylize one content scene with every style patch. Returns one
    stylized scene per style."""
    rng = np.random.default_rng(seed)
    mask = np.asarray(content.mask)
    content_xyz = np.asarray(content.xyz)[mask]
    domain_idx = prepare.prepare_scene(
        content_xyz, num_clusters=cfg.num_content_clusters,
        q=cfg.outlier_quantile, kth_neighbor=cfg.outlier_knn, seed=seed,
    )
    domain = content_xyz[domain_idx]

    # Clean + equalize patch sizes.
    patches = [clean_style_patch(p) for p in style_patches]
    m_common = min(min(len(p) for p in patches), max_style_points)
    patches = [
        p.select(rng.choice(len(p), size=m_common, replace=False))
        for p in patches
    ]

    # Per-style coverage (radii differ); pad to a common ball count.
    circles_per_style = []
    for p in patches:
        _, d_outer = coverage.cluster_radius(p.xyz)
        circ = coverage.filter_circles(
            coverage.sample_circles(domain, r=d_outer * cfg.ball_radius_factor,
                                    min_points_per_cluster=cfg.min_ball_points),
            min_points=max(1, cfg.min_ball_points // 2),
        )
        circles_per_style.append(circ)
    b_max = max(len(c) for c in circles_per_style)
    d_cap = min(cfg.ball_capacity,
                max(max(len(i) for i in c) for c in circles_per_style))

    S = len(patches)
    balls = np.zeros((S, b_max, d_cap, 3), np.float32)
    bmask = np.zeros((S, b_max, d_cap), bool)
    for s, circ in enumerate(circles_per_style):
        b, m = fit.pad_balls(domain, circ, d_cap)
        balls[s, : len(circ)] = b
        bmask[s, : len(circ)] = m
        # Empty ball rows: keep one valid point so stats stay finite.
        bmask[s, len(circ):, 0] = True

    targets = jnp.asarray(np.stack([p.xyz for p in patches]))
    descs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[fit.compute_target_descriptors(p.xyz, cfg) for p in patches],
    )
    if verbose:
        print(f"sweep: {S} styles x {b_max} balls x {m_common} patch pts")

    fitted = fit_balls_sweep(
        targets, descs, jnp.asarray(balls), jnp.asarray(bmask), cfg, mesh
    )
    fitted = np.asarray(fitted)  # [S, B, M, 3]

    outputs = []
    for s, (patch, circ) in enumerate(zip(patches, circles_per_style)):
        fitted_list = [fitted[s, b] for b in range(len(circ))]
        outputs.append(
            merge.merge_patches(patch, fitted_list, domain=domain, cfg=cfg,
                                max_sh_degree=content.max_sh_degree)
        )
    return outputs
