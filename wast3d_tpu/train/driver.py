"""End-to-end scene training driver: the `train.py` entry point.

Equivalent of `/root/reference/train.py:31-244` (and, with sphere_cfg,
of `train_spheres.py` / `train_spheres_anisotropic.py`): load dataset,
init Gaussians from the SfM/random point cloud, run the reconstruction
loop with densification, save PLYs at `save_iterations`, checkpoints at
`checkpoint_iterations`, and report test/train PSNR at save points
(the reference's `training_report`, `train.py:180-215`).

Logging goes to `<model_path>/log.jsonl` (losses, PSNR, counts) and a
`cfg_args` file is written for reference-CLI interoperability.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.utils.cache import enable as _enable_cache

_enable_cache()

from wast3d_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    SphereConfig,
    save_cfg_args,
)
from wast3d_tpu.ops.image_losses import psnr
from wast3d_tpu.ops.rasterizer import api as raster_api
from wast3d_tpu.scene import from_point_cloud
from wast3d_tpu.scene.datasets import build_cameras, load_scene_info
from wast3d_tpu.train import checkpoint as ckpt_mod
from wast3d_tpu.train.reconstruct import Trainer, init_train_state


def train_scene(
    source_path: str,
    model_path: str,
    images: str = "images",
    resolution: int = -1,
    iterations: int = 30_000,
    eval_split: bool = False,
    white_background: bool = False,
    sh_degree: int = 3,
    save_iterations: Optional[List[int]] = None,
    checkpoint_iterations: Optional[List[int]] = None,
    start_checkpoint: Optional[str] = None,
    opt_cfg: Optional[OptimizationConfig] = None,
    sphere_cfg: Optional[SphereConfig] = None,
    settings: Optional[raster_api.RasterizeSettings] = None,
    seed: int = 0,
    quiet: bool = False,
    log_every: int = 100,
    gui=None,
    jitter: bool = True,
    data_device: str = "tpu",
):
    """Train one scene. Returns the final Trainer (with .state)."""
    save_iterations = sorted(set(save_iterations or [7_000, 30_000]))
    checkpoint_iterations = sorted(set(checkpoint_iterations or []))
    opt_cfg = opt_cfg or OptimizationConfig(iterations=iterations)
    # Production default: the Pallas kernel path with generous duplicate
    # capacity; the XLA 'tiled' path is the test/CPU fallback.
    settings = settings or raster_api.RasterizeSettings(
        renderer="pallas", dup_capacity=1 << 21
    )

    info = load_scene_info(source_path, images, white_background, eval_split)
    cameras_extent = info.nerf_normalization["radius"]
    train_cams = build_cameras(info.train_cameras, resolution)
    test_cams = build_cameras(info.test_cameras, resolution)

    n_init = len(info.point_cloud.points)
    scene = from_point_cloud(
        np.asarray(info.point_cloud.points, np.float32),
        np.asarray(info.point_cloud.colors, np.float32),
        max_sh_degree=sh_degree,
        # 2x headroom delays the first capacity-growth recompile.
        capacity=-(-2 * n_init // 256) * 256,
    )
    state = init_train_state(scene, opt_cfg, spatial_lr_scale=cameras_extent)
    start_iter = 0
    if start_checkpoint:
        state, _ = ckpt_mod.load_checkpoint(start_checkpoint)
        start_iter = int(state.step)

    os.makedirs(model_path, exist_ok=True)
    save_cfg_args(
        ModelConfig(
            sh_degree=sh_degree, source_path=os.path.abspath(source_path),
            model_path=model_path, images=images, resolution=resolution,
            white_background=white_background, eval=eval_split,
        ),
        model_path,
    )
    log_path = os.path.join(model_path, "log.jsonl")
    log_f = open(log_path, "a")

    trainer = Trainer(
        state, train_cams, opt_cfg=opt_cfg, settings=settings,
        spatial_lr_scale=cameras_extent, cameras_extent=cameras_extent,
        sphere_cfg=sphere_cfg, seed=seed, white_background=white_background,
        gui=gui, jitter=jitter, data_device=data_device,
    )
    # Stream schedule events (losses, capacity growth) to log.jsonl as
    # they happen — long runs are otherwise opaque until a milestone.
    trainer.history_sink = lambda e: (
        log_f.write(json.dumps(e) + "\n"), log_f.flush())

    bg = trainer.bg_color
    render_j = jax.jit(
        lambda cam, sc: raster_api.render(cam, sc, bg, settings=settings)["render"]
    )

    def report(it):
        entry = {"iter": it, "n_active": int(trainer.state.scene.num_active),
                 "t": time.time()}
        for split, cams in (("test", test_cams), ("train", train_cams[:5])):
            if not cams:
                continue
            psnrs = []
            for cam, gt in cams[:8]:
                img = render_j(cam, trainer.state.scene)
                psnrs.append(float(psnr(img, gt)))
            entry[f"psnr_{split}"] = float(np.mean(psnrs))
        if not quiet:
            print(f"[{it}] " + json.dumps(entry))
        log_f.write(json.dumps(entry) + "\n")
        log_f.flush()

    milestones = sorted(
        set([it for it in save_iterations if start_iter < it <= iterations]
            + [it for it in checkpoint_iterations if start_iter < it <= iterations]
            + [iterations])
    )
    t0 = time.time()
    prev = start_iter
    for target in milestones:
        trainer.run(target - prev, log_every=log_every)
        prev = target
        if target in save_iterations or target == iterations:
            ckpt_mod.save_point_cloud(model_path, target, trainer.state.scene)
            report(target)
        if target in checkpoint_iterations:
            ckpt_mod.save_checkpoint(
                os.path.join(model_path, f"chkpnt{target}"),
                trainer.state, cameras_extent,
            )
    if not quiet:
        steps = iterations - start_iter
        dt = time.time() - t0
        print(f"Training complete: {steps} iters in {dt:.1f}s "
              f"({steps / max(dt, 1e-9):.2f} it/s)")
    # Unbind the sink BEFORE closing: a returned trainer may keep
    # training interactively, and a closed-file sink raises at the
    # first logged event (round-3 advisor finding).
    trainer.history_sink = None
    log_f.close()
    return trainer
