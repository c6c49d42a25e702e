"""Sharded reconstruction training: dp over cameras x model over Gaussians.

The reusable multi-chip training step (the graft-entry dryrun uses this
module). The reference has no distributed training at all (SURVEY §2.7);
this is the TPU-native scale-out for BASELINE config 4 (4M splats over a
v5p-8):

- Scene/optimizer rows shard over the `model` axis (NamedSharding on the
  capacity axis); XLA inserts the all-gathers the binning sort needs and
  psums for the replicated loss.
- A per-step camera batch shards over `data`; gradients are averaged
  across the batch (vmap + mean, psum inserted by XLA).
- Densification stays a single jitted call on the sharded state (masked
  scatters are row-local except the free-slot cumsum).

Use `make_sharded_train_step(...)` once per (mesh, resolution, config),
then drive it from a host loop like train.reconstruct.Trainer.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wast3d_tpu.config import OptimizationConfig, SphereConfig
from wast3d_tpu.ops.image_losses import photometric_loss
from wast3d_tpu.ops.rasterizer import api as raster_api
from wast3d_tpu.parallel.mesh import shard_train_state
from wast3d_tpu.train import reconstruct as R
from wast3d_tpu.train.optim import make_optimizer
from wast3d_tpu.train.spheres import sphere_regularizer


def shard_camera_batch(mesh: Mesh, cameras, gt_images):
    """Stack per-view pytrees and place them on the data axis."""
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)
    gt_batch = jnp.stack([jnp.asarray(g) for g in gt_images])
    sh = NamedSharding(mesh, P("data"))
    return (
        jax.tree.map(lambda x: jax.device_put(x, sh), cam_batch),
        jax.device_put(gt_batch, sh),
    )


def make_sharded_train_step(
    mesh: Mesh,
    opt_cfg: OptimizationConfig,
    settings: raster_api.RasterizeSettings,
    spatial_lr_scale: float = 1.0,
    sphere_cfg: Optional[SphereConfig] = None,
):
    """Returns train_step(state, cam_batch, gt_batch, bg) -> (state, loss).

    cam_batch/gt_batch carry a leading batch axis sharded over 'data';
    the scene inside `state` is sharded over 'model' (use
    parallel.mesh.shard_train_state)."""
    opt = make_optimizer(opt_cfg, spatial_lr_scale)

    @jax.jit
    def train_step(state: R.TrainState, cam_batch, gt_batch, bg_color):
        scene = state.scene
        params = scene.params()

        def loss_one(p, camera, gt):
            s = scene.with_params(p)
            out = raster_api.render(camera, s, bg_color, settings=settings)
            loss = photometric_loss(out["render"], gt, opt_cfg.lambda_dssim)
            if sphere_cfg is not None:
                loss = loss + sphere_regularizer(s, sphere_cfg)
            return loss

        def loss_fn(p):
            losses = jax.vmap(lambda c, g: loss_one(p, c, g))(cam_batch, gt_batch)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        step = state.step + 1
        new_params, new_opt = opt.update(grads, state.opt_state, params, step)
        return (
            R.TrainState(scene.with_params(new_params), new_opt, state.stats, step),
            loss,
        )

    return train_step


def init_sharded(scene, opt_cfg: OptimizationConfig, mesh: Mesh,
                 spatial_lr_scale: float = 1.0) -> R.TrainState:
    state = R.init_train_state(scene, opt_cfg, spatial_lr_scale)
    return shard_train_state(state, mesh)
