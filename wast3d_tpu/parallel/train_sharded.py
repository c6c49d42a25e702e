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
- FULL single-device step parity: per-view pixel jitter offsets,
  per-Gaussian densification stats (positional-grad accumulator / seen
  counter / max screen radius, reduced over the camera batch), and the
  binning overflow flag all flow exactly as in train.reconstruct; the
  `ShardedTrainer` host loop runs the same densify / opacity-reset /
  capacity-growth schedule on the sharded state (densify's masked
  scatters are row-local; XLA handles the free-slot cumsum collectives).

Use `make_sharded_train_step(...)` once per (mesh, resolution, config),
then drive it with `ShardedTrainer` (or any host loop).
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
from wast3d_tpu.train import densify as densify_mod
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
    jitter: bool = True,
):
    """Returns train_step(state, cam_batch, gt_batch, bg, key)
    -> (state, aux).

    cam_batch/gt_batch carry a leading batch axis sharded over 'data';
    the scene inside `state` is sharded over 'model' (use
    parallel.mesh.shard_train_state). aux carries loss / overflow /
    num_active like the single-device step."""
    opt = make_optimizer(opt_cfg, spatial_lr_scale)

    @jax.jit
    def train_step(state: R.TrainState, cam_batch, gt_batch, bg_color, key):
        scene = state.scene
        params = scene.params()
        B, H, W = gt_batch.shape[0], gt_batch.shape[1], gt_batch.shape[2]
        m2d_zero = jnp.zeros((B, scene.capacity, 2), jnp.float32)
        if jitter:
            offs = jax.vmap(
                lambda k: raster_api.random_sampling_offsets(k, H, W)
            )(jax.random.split(key, B))
        else:
            offs = jnp.zeros((B, 0, 0, 2), jnp.float32)

        def loss_one(p, m2d, camera, gt, off):
            s = scene.with_params(p)
            out = raster_api.render(
                camera, s, bg_color, settings=settings,
                sampling_offsets=off if jitter else None,
                means2d_offset=m2d,
            )
            loss = photometric_loss(out["render"], gt, opt_cfg.lambda_dssim)
            if sphere_cfg is not None:
                loss = loss + sphere_regularizer(s, sphere_cfg)
            return loss, (out["radii"], out["visibility_filter"],
                          out["overflow"], out["overflow_emit"],
                          out["overflow_rect"])

        def loss_fn(p, m2d):
            losses, aux = jax.vmap(
                lambda m, c, g, o: loss_one(p, m, c, g, o)
            )(m2d, cam_batch, gt_batch, offs)
            return jnp.mean(losses), aux

        (loss, (radii_b, vis_b, ovf_b, ovfe_b, ovfr_b)), (g_params, g_m2d) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, m2d_zero
            )
        )
        step = state.step + 1
        new_params, new_opt = opt.update(g_params, state.opt_state, params,
                                         step)
        new_stats = densify_mod.add_stats_batch(
            state.stats, g_m2d, radii_b, vis_b, W, H
        )
        aux = {
            "loss": loss,
            "overflow": jnp.any(ovf_b),
            "overflow_emit": jnp.any(ovfe_b),
            "overflow_rect": jnp.any(ovfr_b),
            "num_active": scene.num_active,
        }
        return (
            R.TrainState(scene.with_params(new_params), new_opt, new_stats,
                         step),
            aux,
        )

    return train_step


def make_tile_sharded_train_step(
    mesh: Mesh,
    opt_cfg: OptimizationConfig,
    settings: raster_api.RasterizeSettings,
    spatial_lr_scale: float = 1.0,
    sphere_cfg: Optional[SphereConfig] = None,
    sharded_loss: bool = True,
):
    """BASELINE config-4 training step: one camera, Gaussians AND the
    rendered image tile-strip partitioned over `model` via
    parallel.render_sharded — every stage is O(N/P) or O(dups/P), unlike
    make_sharded_train_step whose api.render lets XLA all-gather the
    scene per device. This is the step that scales to 4M splats on a
    v5p-8 (the workload the reference's single-GPU rasterizer cannot
    express at all, `rasterizer_impl.cu:198-343`).

    Per-step collectives: ONE duplicate-routing all_to_all (O(dups/P)
    per link) + its reverse in the backward, two 5-row ppermute halo
    exchanges for the strip-sharded SSIM (parallel/losses.py; replaces
    the 33 image-sized all-gathers / 427 MB the jit-level loss cost in
    the r4 audit) and the psum of the scalar loss — no scene-sized OR
    image-sized collective anywhere. Gradients, Adam, and densification
    stats stay row-local on each shard. sharded_loss=False restores the
    jit-level loss for A/B.

    Parity scope: pixel jitter is not threaded through the strip path
    (bench/serving measure jitter-off; training parity tests pin the
    single-device step). Returns train_step(state, camera, gt, bg) ->
    (state, aux)."""
    opt = make_optimizer(opt_cfg, spatial_lr_scale)

    from wast3d_tpu.parallel.render_sharded import render_tile_sharded

    @jax.jit
    def train_step(state: R.TrainState, camera, gt, bg_color):
        scene = state.scene
        params = scene.params()
        H, W = gt.shape[0], gt.shape[1]
        m2d_zero = jnp.zeros((scene.capacity, 2), jnp.float32)
        m2d_zero = jax.lax.with_sharding_constraint(
            m2d_zero, NamedSharding(mesh, P("model")))

        def loss_fn(p, m2d):
            s = scene.with_params(p)
            out = render_tile_sharded(camera, s, bg_color, mesh, settings,
                                      means2d_offset=m2d)
            if sharded_loss:
                from wast3d_tpu.parallel.losses import (
                    photometric_loss_sharded)

                loss = photometric_loss_sharded(
                    out["render"], gt, mesh, H, opt_cfg.lambda_dssim)
            else:
                loss = photometric_loss(out["render"][:H], gt,
                                        opt_cfg.lambda_dssim)
            if sphere_cfg is not None:
                loss = loss + sphere_regularizer(s, sphere_cfg)
            return loss, out

        (loss, out), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d_zero)
        step = state.step + 1
        new_params, new_opt = opt.update(g_params, state.opt_state, params,
                                         step)
        new_stats = densify_mod.add_stats(
            state.stats, g_m2d, out["radii"], out["visibility_filter"], W, H)
        aux = {
            "loss": loss,
            "overflow": out["overflow"],
            "overflow_emit": out["overflow_emit"],
            "overflow_rect": out["overflow_rect"],
            "overflow_route": out["overflow_route"],
            "num_active": scene.num_active,
        }
        return (
            R.TrainState(scene.with_params(new_params), new_opt, new_stats,
                         step),
            aux,
        )

    return train_step


def init_sharded(scene, opt_cfg: OptimizationConfig, mesh: Mesh,
                 spatial_lr_scale: float = 1.0) -> R.TrainState:
    state = R.init_train_state(scene, opt_cfg, spatial_lr_scale)
    return shard_train_state(state, mesh)


class ShardedTrainer:
    """Host loop for sharded training with the reference's densification
    schedule (`/root/reference/train.py:137-147`): SH warm-up, densify /
    prune every `densification_interval`, opacity resets, dup-capacity and
    row-capacity growth — the same blocks `train.reconstruct.Trainer`
    runs, applied to a model-sharded TrainState.

    One ShardedTrainer iteration consumes `batch` cameras (one per `data`
    mesh slot); with batch == 1 it reproduces the single-device
    trajectory (see tests/test_parallel.py)."""

    def __init__(
        self,
        state: R.TrainState,
        cameras,
        mesh: Mesh,
        opt_cfg: OptimizationConfig = OptimizationConfig(),
        settings: raster_api.RasterizeSettings = raster_api.RasterizeSettings(),
        bg_color=None,
        spatial_lr_scale: float = 1.0,
        cameras_extent: float = 1.0,
        sphere_cfg: Optional[SphereConfig] = None,
        seed: int = 0,
        white_background: bool = False,
        jitter: bool = True,
        grow_threshold: float = 0.75,
    ):
        self.state = state
        self.cameras = cameras
        self.mesh = mesh
        self.batch = mesh.shape["data"]
        self.opt_cfg = opt_cfg
        self.settings = settings
        self.bg_color = (
            bg_color if bg_color is not None
            else (jnp.ones(3) if white_background else jnp.zeros(3))
        )
        self.spatial_lr_scale = spatial_lr_scale
        self.cameras_extent = cameras_extent
        self.sphere_cfg = sphere_cfg
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.default_rng(seed)
        self.jitter = jitter
        self.grow_threshold = grow_threshold
        self._camera_order = []
        self.history = []
        self._it = int(self.state.step)
        self._white_bg = bool(np.all(np.asarray(self.bg_color) == 1.0))
        self._step_fn = make_sharded_train_step(
            mesh, opt_cfg, settings, spatial_lr_scale, sphere_cfg, jitter
        )

    def _next_batch(self):
        cams, gts = [], []
        for _ in range(self.batch):
            if not self._camera_order:
                self._camera_order = list(
                    self.rng.permutation(len(self.cameras))
                )
            c, g = self.cameras[self._camera_order.pop()]
            cams.append(c)
            gts.append(g)
        return shard_camera_batch(self.mesh, cams, gts)

    def _reshard(self):
        self.state = shard_train_state(self.state, self.mesh)

    def _grow(self):
        from wast3d_tpu.scene.gaussians import grow_capacity
        from wast3d_tpu.train.optim import AdamState

        scene = self.state.scene
        model = self.mesh.shape["model"]
        new_cap = scene.capacity * 4
        new_cap = -(-new_cap // model) * model  # keep shardable
        scene = grow_capacity(scene, new_cap)

        def pad_rows(t):
            pad = new_cap - t.shape[0]
            return jnp.pad(t, [(0, pad)] + [(0, 0)] * (t.ndim - 1))

        opt = AdamState(
            mu=jax.tree.map(pad_rows, self.state.opt_state.mu),
            nu=jax.tree.map(pad_rows, self.state.opt_state.nu),
            count=self.state.opt_state.count,
        )
        stats = densify_mod.DensifyStats(
            *(pad_rows(t) for t in self.state.stats)
        )
        self.state = R.TrainState(scene, opt, stats, self.state.step)
        self._reshard()

    def _maybe_grow(self):
        scene = self.state.scene
        fill = float(np.asarray(scene.num_active)) / scene.capacity
        if fill > self.grow_threshold:
            self._grow()

    # --- schedule-driver hooks (see train/schedule.py contract) ---
    def _pre_step(self, it: int):
        pass

    def _do_step(self, it: int):
        cam_batch, gt_batch = self._next_batch()
        self.key, k = jax.random.split(self.key)
        self.state, aux = self._step_fn(
            self.state, cam_batch, gt_batch, self.bg_color, k
        )
        return aux

    def _on_settings_change(self):
        self._step_fn = make_sharded_train_step(
            self.mesh, self.opt_cfg, self.settings,
            self.spatial_lr_scale, self.sphere_cfg, self.jitter,
        )

    def run(self, iterations: int, log_every: int = 0):
        from wast3d_tpu.train.schedule import run_schedule

        with self.mesh:
            return run_schedule(self, iterations, log_every)
