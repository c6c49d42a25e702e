"""Batch rendering of train/test camera sets to image files.

Equivalent of `/root/reference/render.py:24-65` (`render_set` /
`render_sets`): loads a trained scene (PLY at the requested iteration),
renders every view, and writes `renders/NNNNN.png` + `gt/NNNNN.png`
under `<model_path>/<split>/ours_<iteration>/`.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.core.camera import Camera
from wast3d_tpu.ops.rasterizer import api as raster_api
from wast3d_tpu.scene.gaussians import GaussianScene
from wast3d_tpu.scene.ply import load_ply
from wast3d_tpu.train.checkpoint import find_max_iteration


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)).save(path)


def render_set(
    model_path: str,
    name: str,
    iteration: int,
    cameras: List[Tuple[Camera, Optional[jnp.ndarray]]],
    scene: GaussianScene,
    bg_color: jnp.ndarray,
    settings: raster_api.RasterizeSettings = raster_api.RasterizeSettings(),
    save_depth: bool = False,
) -> str:
    base = os.path.join(model_path, name, f"ours_{iteration}")
    render_dir = os.path.join(base, "renders")
    gt_dir = os.path.join(base, "gt")
    render_fn = jax.jit(
        lambda cam, sc: raster_api.render(cam, sc, bg_color, settings=settings)
    )
    for idx, (cam, gt) in enumerate(cameras):
        out = render_fn(cam, scene)
        save_image(os.path.join(render_dir, f"{idx:05d}.png"), out["render"])
        if gt is not None:
            save_image(os.path.join(gt_dir, f"{idx:05d}.png"), gt)
        if save_depth:
            d = np.asarray(out["depth"])
            dn = (d - d.min()) / (np.ptp(d) + 1e-9)
            save_image(os.path.join(base, "depth", f"{idx:05d}.png"),
                       np.stack([dn] * 3, -1))
    return base


def render_sets(
    model_path: str,
    source_path: str,
    iteration: int = -1,
    skip_train: bool = False,
    skip_test: bool = False,
    white_background: bool = False,
    resolution: int = -1,
    settings: raster_api.RasterizeSettings = raster_api.RasterizeSettings(),
) -> None:
    """Reference `render_sets` (`render.py:37-55`)."""
    from wast3d_tpu.scene.datasets import build_cameras, load_scene_info

    if iteration == -1:
        iteration = find_max_iteration(model_path)
    ply = os.path.join(model_path, "point_cloud", f"iteration_{iteration}",
                       "point_cloud.ply")
    scene = load_ply(ply)
    info = load_scene_info(source_path, white_background=white_background,
                           eval_split=True)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    if not skip_train:
        render_set(model_path, "train", iteration,
                   build_cameras(info.train_cameras, resolution), scene, bg, settings)
    if not skip_test and info.test_cameras:
        render_set(model_path, "test", iteration,
                   build_cameras(info.test_cameras, resolution), scene, bg, settings)
