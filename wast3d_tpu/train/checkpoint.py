"""Checkpoint save/restore (orbax) + PLY export scheduling.

Replaces the reference's pickled `(capture(), iteration)` tuple
(`/root/reference/scene/gaussian_model.py:61-93`, `train.py:154-156`)
with an orbax checkpoint holding the SAME logical contents:
the six parameter tensors, validity mask, SH degrees, densification
stats, Adam moments + step count, spatial_lr_scale, and the iteration —
so training resumes bit-exact. The PLY interchange format
(`scene/ply.py`) stays the cross-tool artifact, written under
`point_cloud/iteration_{i}/point_cloud.ply` exactly like the reference
(`scene/__init__.py:85-87`).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from wast3d_tpu.scene.gaussians import GaussianScene
from wast3d_tpu.scene.ply import save_ply
from wast3d_tpu.train.densify import DensifyStats
from wast3d_tpu.train.optim import AdamState
from wast3d_tpu.train.reconstruct import TrainState


def _to_pytree(state: TrainState, spatial_lr_scale: float) -> dict:
    return {
        "scene": {
            "xyz": state.scene.xyz,
            "features_dc": state.scene.features_dc,
            "features_rest": state.scene.features_rest,
            "scaling": state.scene.scaling,
            "rotation": state.scene.rotation,
            "opacity": state.scene.opacity,
            "mask": state.scene.mask,
        },
        "meta": {
            "active_sh_degree": state.scene.active_sh_degree,
            "max_sh_degree": state.scene.max_sh_degree,
            "spatial_lr_scale": spatial_lr_scale,
            "step": state.step,
        },
        "opt": {"mu": state.opt_state.mu, "nu": state.opt_state.nu,
                "count": state.opt_state.count},
        "stats": {
            "xyz_gradient_accum": state.stats.xyz_gradient_accum,
            "denom": state.stats.denom,
            "max_radii2d": state.stats.max_radii2d,
        },
    }


def save_checkpoint(path: str, state: TrainState, spatial_lr_scale: float = 1.0) -> None:
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, _to_pytree(state, spatial_lr_scale), force=True)


def load_checkpoint(path: str) -> Tuple[TrainState, float]:
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    tree = ckpt.restore(path)
    sc = tree["scene"]
    meta = tree["meta"]
    scene = GaussianScene(
        xyz=sc["xyz"], features_dc=sc["features_dc"],
        features_rest=sc["features_rest"], scaling=sc["scaling"],
        rotation=sc["rotation"], opacity=sc["opacity"],
        mask=np.asarray(sc["mask"]).astype(bool),
        active_sh_degree=int(meta["active_sh_degree"]),
        max_sh_degree=int(meta["max_sh_degree"]),
    )
    state = TrainState(
        scene=scene,
        opt_state=AdamState(mu=dict(tree["opt"]["mu"]), nu=dict(tree["opt"]["nu"]),
                            count=tree["opt"]["count"]),
        stats=DensifyStats(
            xyz_gradient_accum=tree["stats"]["xyz_gradient_accum"],
            denom=tree["stats"]["denom"],
            max_radii2d=tree["stats"]["max_radii2d"],
        ),
        step=tree["meta"]["step"],
    )
    return state, float(meta["spatial_lr_scale"])


def save_point_cloud(model_path: str, iteration: int, scene: GaussianScene) -> str:
    """Reference `Scene.save` layout (`scene/__init__.py:85-87`)."""
    out = os.path.join(model_path, "point_cloud", f"iteration_{iteration}",
                       "point_cloud.ply")
    save_ply(scene, out)
    return out


def find_max_iteration(model_path: str) -> Optional[int]:
    """Reference `searchForMaxIteration` (`utils/system_utils.py:17-28`)."""
    pc_dir = os.path.join(model_path, "point_cloud")
    if not os.path.isdir(pc_dir):
        return None
    iters = [
        int(d.split("_")[-1]) for d in os.listdir(pc_dir) if d.startswith("iteration_")
    ]
    return max(iters) if iters else None
