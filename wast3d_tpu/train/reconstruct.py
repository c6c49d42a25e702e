"""Photometric 3DGS reconstruction: the `train.py` loop, TPU-native.

Reference: `/root/reference/train.py:31-156` — per iteration: pick a random
camera, render, (1-λ)L1 + λ(1-SSIM) loss, backward, densification stats,
periodic densify/prune + opacity reset, Adam step with xyz LR schedule, SH
degree warm-up every 1000 iters.

TPU design:
- ONE jitted `train_step` does render + loss + grads + Adam + stats. All
  tensor inputs (scene pytree, optimizer/stat states, the GT image) are
  explicit arguments — never closure constants (required for correctness
  on the axon backend, and the right thing under sharding anyway).
- Densify/prune/opacity-reset are separate jitted calls invoked on the
  reference's schedule by the host loop (they are O(capacity) and rare).
- Capacity growth happens on the host between steps when fill > 75%,
  re-bucketing the whole train state (amortized recompile).
- The sphere regularizers of `train_spheres*.py` plug in via
  `sphere_cfg` (see train/spheres.py) — same step, one extra loss term.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.config import OptimizationConfig, SphereConfig
from wast3d_tpu.core.camera import Camera
from wast3d_tpu.ops.image_losses import photometric_loss
from wast3d_tpu.ops.rasterizer import api as raster_api
from wast3d_tpu.scene.gaussians import GaussianScene, grow_capacity
from wast3d_tpu.train import densify as densify_mod
from wast3d_tpu.train.optim import AdamState, make_optimizer
from wast3d_tpu.train.spheres import sphere_regularizer


class TrainState(NamedTuple):
    scene: GaussianScene
    opt_state: AdamState
    stats: densify_mod.DensifyStats
    step: jnp.ndarray  # [] int32


def init_train_state(scene: GaussianScene, opt_cfg: OptimizationConfig,
                     spatial_lr_scale: float) -> TrainState:
    opt = make_optimizer(opt_cfg, spatial_lr_scale)
    return TrainState(
        scene=scene,
        opt_state=opt.init(scene.params()),
        stats=densify_mod.init_stats(scene.capacity),
        step=jnp.int32(0),
    )


@functools.partial(
    jax.jit,
    static_argnames=("opt_cfg", "sphere_cfg", "settings", "width", "height",
                     "spatial_lr_scale", "jitter"),
)
def train_step(
    state: TrainState,
    camera: Camera,
    gt_image: jnp.ndarray,
    bg_color: jnp.ndarray,
    key: jax.Array,
    opt_cfg: OptimizationConfig,
    settings: raster_api.RasterizeSettings,
    width: int,
    height: int,
    spatial_lr_scale: float = 1.0,
    sphere_cfg: Optional[SphereConfig] = None,
    jitter: bool = True,
) -> Tuple[TrainState, dict]:
    """One reconstruction step. Returns (new_state, aux) where aux carries
    loss, psnr proxies, radii/visibility (host logging)."""
    opt = make_optimizer(opt_cfg, spatial_lr_scale)
    scene = state.scene
    params = scene.params()
    m2d_zero = jnp.zeros((scene.capacity, 2), jnp.float32)
    offsets = (
        raster_api.random_sampling_offsets(key, height, width) if jitter else None
    )

    def loss_fn(p, m2d):
        s = scene.with_params(p)
        out = raster_api.render(
            camera, s, bg_color, settings=settings,
            sampling_offsets=offsets, means2d_offset=m2d,
        )
        loss = photometric_loss(out["render"], gt_image, opt_cfg.lambda_dssim)
        if sphere_cfg is not None:
            loss = loss + sphere_regularizer(s, sphere_cfg)
        return loss, out

    (loss, out), (g_params, g_m2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, m2d_zero)

    step = state.step + 1
    new_params, new_opt = opt.update(g_params, state.opt_state, params, step)
    new_stats = densify_mod.add_stats(
        state.stats, g_m2d, out["radii"], out["visibility_filter"], width, height
    )
    new_scene = scene.with_params(new_params)
    aux = {
        "loss": loss,
        "radii": out["radii"],
        "visibility": out["visibility_filter"],
        "overflow": out["overflow"],
        "overflow_emit": out["overflow_emit"],
        "overflow_rect": out["overflow_rect"],
        "num_active": scene.num_active,
    }
    return TrainState(new_scene, new_opt, new_stats, step), aux


densify_and_prune_jit = jax.jit(
    densify_mod.densify_and_prune,
    static_argnames=("max_grad", "min_opacity", "extent", "max_screen_size",
                     "percent_dense", "prune_big_screen"),
)
reset_opacity_jit = jax.jit(densify_mod.reset_opacity)


class Trainer:
    """Host-side training driver replicating `train.py`'s schedule.

    Cameras: list of (Camera, gt_image) with equal resolution per call
    group (different resolutions each get their own jit specialization)."""

    def __init__(
        self,
        state: TrainState,
        cameras,
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
        gui=None,
        data_device: str = "tpu",
    ):
        self.state = state
        # Pin GT images on device once: feeding host numpy GT into the
        # jitted step re-transfers W*H*3*4 bytes every iteration (7.7 MB
        # at 800^2) — ruinous over the axon tunnel and wasted PCIe on a
        # real host. ~60 views fit HBM easily (460 MB at 800^2).
        # data_device="cpu" keeps GT on host (the reference's
        # `--data_device cpu` escape hatch for captures with hundreds of
        # high-res views that would otherwise pin many GB of HBM).
        if data_device == "cpu":
            self.cameras = [
                (cam, None if gt is None else np.asarray(gt))
                for cam, gt in cameras
            ]
        else:
            self.cameras = [
                (cam, None if gt is None else jax.device_put(jnp.asarray(gt)))
                for cam, gt in cameras
            ]
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
        self.gui = gui  # optional viewer.network_gui.NetworkGUI
        self._camera_order = []
        self.history = []
        self._it = int(self.state.step)  # host-side mirror (device reads
        # cost a ~30ms tunnel round-trip each on this TPU)
        self._white_bg = bool(np.all(np.asarray(self.bg_color) == 1.0))

    def _next_camera(self):
        """Random-without-replacement camera stack (reference
        `train.py:80-84` pops from a shuffled copy)."""
        if not self._camera_order:
            self._camera_order = list(self.rng.permutation(len(self.cameras)))
        return self.cameras[self._camera_order.pop()]

    def _maybe_grow(self):
        scene = self.state.scene
        fill = float(np.asarray(scene.num_active)) / scene.capacity
        if fill > self.grow_threshold:
            self._grow()

    def _grow(self):
        # Grow 4x: every new capacity recompiles the train step, which
        # costs minutes on the remote TPU compiler - amortize hard.
        scene = self.state.scene
        new_cap = scene.capacity * 4
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
        self.state = TrainState(scene, opt, stats, self.state.step)

    # --- schedule-driver hooks (see train/schedule.py contract) ---
    def _pre_step(self, it: int):
        if self.gui is not None:
            # Serve one live-view frame per iteration (reference polls
            # the GUI socket at the top of the loop, train.py:57-70).
            from wast3d_tpu.viewer.network_gui import serve_scene

            serve_scene(self.gui, self.state.scene, settings=self.settings,
                        bg_color=self.bg_color)

    def _do_step(self, it: int):
        cam, gt = self._next_camera()
        self.key, k = jax.random.split(self.key)
        self.state, aux = train_step(
            self.state, cam, gt, self.bg_color, k,
            opt_cfg=self.opt_cfg, settings=self.settings,
            width=cam.width, height=cam.height,
            spatial_lr_scale=self.spatial_lr_scale,
            sphere_cfg=self.sphere_cfg, jitter=self.jitter,
        )
        return aux

    def _on_settings_change(self):
        pass  # train_step re-specializes on the new static settings

    def run(self, iterations: int, log_every: int = 0):
        from wast3d_tpu.train.schedule import run_schedule

        return run_schedule(self, iterations, log_every)
