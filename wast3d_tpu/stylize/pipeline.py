"""End-to-end scene-to-scene stylization: the WaSt-3D pipeline.

Orchestrates the full notebook-11 flow
(`/root/reference/notebooks/11.fit_cluster_to_the_full_scene.ipynb`):

  1. content scene -> cleaned 'domain' point set (prepare.py),
  2. style patch load + outlier clean (cluster.py / cell 10),
  3. ball coverage of the domain (coverage.py, r = 0.45 * outer diameter),
  4. vmapped W2 descriptor fit of a patch copy per ball (fit.py),
  5. merge + Voronoi de-overlap into a stylized GaussianScene (merge.py).

The reference runs steps 4's balls sequentially on one GPU; here they run
as vmapped batches on the TPU (the headline speedup), host work is only
the greedy cover and K-means seeding.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from wast3d_tpu.config import StylizeConfig
from wast3d_tpu.scene.gaussians import GaussianScene
from wast3d_tpu.stylize import coverage, fit, merge, prepare
from wast3d_tpu.stylize.cluster import StylePatch, load_cluster


def clean_style_patch(patch: StylePatch, kth: int = 30, q: float = 0.925) -> StylePatch:
    """Outlier-clean the style patch (notebook 11 cell 10)."""
    keep = prepare.remove_outliers(patch.xyz, kth_neighbor=kth, q=q)
    return patch.select(keep)


def stylize_scene(
    content: GaussianScene,
    style_patch: StylePatch,
    cfg: StylizeConfig = StylizeConfig(),
    seed: int = 0,
    batch_size: int = 8,
    verbose: bool = False,
    max_style_points: Optional[int] = 16384,
    mesh=None,
) -> GaussianScene:
    """Content scene + style patch -> stylized scene.

    Memory note: the descriptor loss streams over column blocks
    (`fit.descriptor_loss`), so per-step HBM is
    O(batch * M * cfg.desc_block) + two [Mp, Mp/8] bit masks — a 16k
    patch at batch 8 / block 2048 peaks ~1 GB; shrink `batch_size` or
    `cfg.desc_block` before subsampling the patch."""
    t0 = time.time()
    mask = np.asarray(content.mask)
    content_xyz = np.asarray(content.xyz)[mask]

    # 1. domain preparation
    domain_idx = prepare.prepare_scene(
        content_xyz, num_clusters=cfg.num_content_clusters,
        q=cfg.outlier_quantile, kth_neighbor=cfg.outlier_knn, seed=seed,
    )
    domain = content_xyz[domain_idx]

    # 2. style patch clean (+ optional subsample to bound descriptor cost)
    patch = clean_style_patch(style_patch)
    if max_style_points and len(patch) > max_style_points:
        rng = np.random.default_rng(seed)
        patch = patch.select(
            rng.choice(len(patch), size=max_style_points, replace=False)
        )

    # 3. coverage
    _, d_outer = coverage.cluster_radius(patch.xyz)
    circles = coverage.sample_circles(
        domain, r=d_outer * cfg.ball_radius_factor,
        min_points_per_cluster=cfg.min_ball_points,
    )
    # Reference cell 22 drops balls with <= 21 points (about half the
    # growth minimum of 40); scale with the configured minimum.
    circles = coverage.filter_circles(
        circles, min_points=max(1, cfg.min_ball_points // 2)
    )
    if verbose:
        print(f"domain {len(domain)} pts, {len(circles)} balls, "
              f"patch {len(patch)} pts ({time.time() - t0:.1f}s)")

    # 4. vmapped fit (ball axis shards over the mesh when one is given)
    fitted = fit.fit_all_balls(
        patch.xyz, domain, circles, cfg=cfg, batch_size=batch_size,
        mesh=mesh,
    )
    if verbose:
        print(f"fit done ({time.time() - t0:.1f}s)")

    # 5. merge + de-overlap
    out = merge.merge_patches(
        patch, fitted, domain=domain, cfg=cfg,
        max_sh_degree=content.max_sh_degree,
    )
    if verbose:
        print(f"stylized scene: {int(out.num_active)} gaussians "
              f"({time.time() - t0:.1f}s total)")
    return out


def stylize_from_files(
    content_ply: str, style_cluster_npz: str, output_ply: str,
    cfg: StylizeConfig = StylizeConfig(), **kwargs,
) -> GaussianScene:
    """File-level convenience: content PLY + style cluster npz -> PLY."""
    from wast3d_tpu.scene.ply import load_ply, save_ply

    content = load_ply(content_ply)
    patch = load_cluster(style_cluster_npz)
    out = stylize_scene(content, patch, cfg=cfg, **kwargs)
    save_ply(out, output_ply)
    return out
