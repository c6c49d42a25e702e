"""Merge fitted patches into a scene + Voronoi de-overlap.

Equivalent of notebook 11 cells 36-39:
- merge: concatenate every ball's fitted point set; each inherits the
  style patch's per-point attributes with `features_rest` zeroed and the
  log-scaling multiplied by `merge_scale_factor` (0.885) (cell 36);
- de-overlap (`find_overlapping_gaussians`, cell 38): assign each domain
  point to its nearest patch centroid (a Voronoi partition of the
  domain); a fitted point is retained iff its nearest domain point's
  Voronoi cell belongs to its own patch.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from wast3d_tpu.config import StylizeConfig
from wast3d_tpu.ops.knn import knn_sq_dists
from wast3d_tpu.scene.gaussians import GaussianScene, from_arrays
from wast3d_tpu.stylize.cluster import StylePatch


def find_retained_indices(
    domain: np.ndarray, fitted_list: List[np.ndarray]
) -> List[np.ndarray]:
    """Voronoi retain (cell 38). Returns per-patch index arrays."""
    centroids = np.stack([f.mean(axis=0) for f in fitted_list], axis=0)
    dom = jnp.asarray(domain, jnp.float32)
    _, dom_to_centroid = knn_sq_dists(dom, jnp.asarray(centroids, jnp.float32), k=1)
    dom_to_centroid = np.asarray(dom_to_centroid)[:, 0]
    retained = []
    for patch_idx, fitted in enumerate(fitted_list):
        _, nn_dom = knn_sq_dists(jnp.asarray(fitted, jnp.float32), dom, k=1)
        nn_dom = np.asarray(nn_dom)[:, 0]
        retained.append(np.nonzero(dom_to_centroid[nn_dom] == patch_idx)[0])
    return retained


def merge_patches(
    patch: StylePatch,
    fitted_list: List[np.ndarray],
    domain: np.ndarray = None,
    cfg: StylizeConfig = StylizeConfig(),
    deoverlap: bool = True,
    max_sh_degree: int = 3,
) -> GaussianScene:
    """Build the stylized GaussianScene from fitted ball point sets."""
    if deoverlap and domain is not None and len(fitted_list) > 1:
        retained = find_retained_indices(domain, fitted_list)
    else:
        retained = [np.arange(len(f)) for f in fitted_list]

    xyz, f_dc, f_rest, rot, scal, opac = [], [], [], [], [], []
    for fitted, keep in zip(fitted_list, retained):
        if len(keep) == 0:
            continue
        xyz.append(np.asarray(fitted)[keep])
        f_dc.append(patch.features_dc[keep])
        f_rest.append(np.zeros_like(patch.features_rest[keep]))  # cell 36: *0
        rot.append(patch.rotation[keep])
        scal.append(patch.scaling[keep] * cfg.merge_scale_factor)  # cell 36
        opac.append(patch.opacity[keep])

    return from_arrays(
        xyz=np.concatenate(xyz),
        features_dc=np.concatenate(f_dc),
        features_rest=np.concatenate(f_rest),
        scaling=np.concatenate(scal),
        rotation=np.concatenate(rot),
        opacity=np.concatenate(opac),
        max_sh_degree=max_sh_degree,
    )
