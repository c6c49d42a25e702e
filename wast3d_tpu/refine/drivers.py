"""Image-space refinement: VGG content/style/TV and depth/normal losses.

One configurable driver replacing the reference's family of ~70%-identical
scripts (SURVEY §2.4) — each variant is a named RefineMode with the exact
loss wiring and weights of its script:

- IMAGE_STYLE (`train_st.py:283-323`): VGG content on layers [2,3] vs the
  GT render (x1e1), Gram style on layers [0,1] vs a (random) style image
  (x1e-3), TV (x1e3).
- CONTENT_ONLY (`train_cont_loss.py:107-110`): VGG content (x1e-3) +
  TV (x1e0).
- NORMALS_STYLE (`train_st_normals.py:112-152`): photometric L1/DSSIM +
  VGG content layers [1,2,3] (x1e0) + TV (x1e2) + Gram style on the
  min-max-normalized depth->normals image, layers [0,1] (x1e-3).
- DEPTH_TARGET (`notebooks/13.Optimize_guassians_depth.ipynb` cell 42,
  `train_st_depth_hotdog.py:218-247`): MSE of rendered depth to a
  Gaussian-blurred target depth (x0.1) + photometric term.
- RELIEF (`train_st_normals_sphere3.py:192-216`): RGB MSE + depth-target
  MSE + TV on image and inverted depth (the 2.5D relief experiments).

All tensor inputs (GT/style images, target depths) are jit arguments.
Gradients reach Gaussian means through the rasterizer's depth channel
(the fork's `dL_dcamViewDepth` path, `backward.cu:552`, here by autodiff).
"""

from __future__ import annotations

import enum
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.config import OptimizationConfig
from wast3d_tpu.core.camera import Camera
from wast3d_tpu.ops import vgg as vgg_mod
from wast3d_tpu.ops.depth import depth_to_normals
from wast3d_tpu.ops.image_losses import l1_loss, photometric_loss, tv_loss
from wast3d_tpu.ops.rasterizer import api as raster_api
from wast3d_tpu.scene.gaussians import GaussianScene
from wast3d_tpu.train.optim import make_optimizer
from wast3d_tpu.train.reconstruct import TrainState


class RefineMode(str, enum.Enum):
    IMAGE_STYLE = "image_style"
    CONTENT_ONLY = "content_only"
    NORMALS_STYLE = "normals_style"
    DEPTH_TARGET = "depth_target"
    RELIEF = "relief"


class RefineWeights(NamedTuple):
    content: float = 0.0
    style: float = 0.0
    tv: float = 0.0
    photometric: float = 0.0
    depth: float = 0.0
    content_layers: tuple = (2, 3)
    style_layers: tuple = (0, 1)


MODE_WEIGHTS = {
    RefineMode.IMAGE_STYLE: RefineWeights(content=1e1, style=1e-3, tv=1e3),
    RefineMode.CONTENT_ONLY: RefineWeights(content=1e-3, tv=1e0),
    RefineMode.NORMALS_STYLE: RefineWeights(
        content=1e0, style=1e-3, tv=1e2, photometric=1.0,
        content_layers=(1, 2, 3),
    ),
    RefineMode.DEPTH_TARGET: RefineWeights(photometric=1.0, depth=0.1),
    RefineMode.RELIEF: RefineWeights(photometric=1.0, depth=1.0, tv=1e0),
}


@partial(
    jax.jit,
    static_argnames=("mode", "settings", "opt_cfg", "width", "height"),
)
def refine_step(
    state: TrainState,
    camera: Camera,
    gt_image: jnp.ndarray,
    style_image: Optional[jnp.ndarray],
    target_depth: Optional[jnp.ndarray],
    vgg_params: dict,
    bg_color: jnp.ndarray,
    mode: RefineMode,
    settings: raster_api.RasterizeSettings,
    opt_cfg: OptimizationConfig,
    width: int,
    height: int,
):
    """One refinement step. style_image / target_depth may be None
    depending on mode (static through jit via the mode argument)."""
    w = MODE_WEIGHTS[RefineMode(mode)]
    opt = make_optimizer(opt_cfg, 1.0)
    scene = state.scene
    params = scene.params()

    def loss_fn(p):
        s = scene.with_params(p)
        out = raster_api.render(camera, s, bg_color, settings=settings)
        img = out["render"]
        loss = jnp.float32(0.0)
        aux = {}
        if w.photometric:
            loss += w.photometric * photometric_loss(img, gt_image,
                                                     opt_cfg.lambda_dssim)
        if w.content or (w.style and mode != RefineMode.NORMALS_STYLE):
            feats = vgg_mod.get_features(vgg_params, img)
        if w.content:
            gt_feats = vgg_mod.get_features(vgg_params, gt_image)
            loss += w.content * vgg_mod.content_loss(
                gt_feats, feats, w.content_layers
            )
        if w.style and mode == RefineMode.NORMALS_STYLE:
            # Style on the normal map (min-max normalized to [0,1]).
            fx = width / (2.0 * jnp.tan(camera.fovx * 0.5))
            fy = height / (2.0 * jnp.tan(camera.fovy * 0.5))
            normals = depth_to_normals(out["depth"], fx, fy)
            nmin, nmax = jnp.min(normals), jnp.max(normals)
            normals01 = (normals - nmin) / (nmax - nmin + 1e-6)
            n_feats = vgg_mod.get_features(vgg_params, normals01)
            s_feats = vgg_mod.get_features(vgg_params, style_image)
            loss += w.style * vgg_mod.style_loss(s_feats, n_feats, w.style_layers)
        elif w.style:
            s_feats = vgg_mod.get_features(vgg_params, style_image)
            loss += w.style * vgg_mod.style_loss(s_feats, feats, w.style_layers)
        if w.tv:
            loss += w.tv * tv_loss(img)
            if mode == RefineMode.RELIEF:
                # TV on the inverted depth too (train_st_normals_sphere3).
                d = out["depth"]
                loss += w.tv * tv_loss(jnp.max(d) - d)
        if w.depth and target_depth is not None:
            loss += w.depth * jnp.mean((out["depth"] - target_depth) ** 2)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    step = state.step + 1
    new_params, new_opt = opt.update(grads, state.opt_state, params, step)
    return (
        TrainState(scene.with_params(new_params), new_opt, state.stats, step),
        loss,
    )


def refine(
    state: TrainState,
    cameras,
    mode: RefineMode,
    iterations: int,
    style_image: Optional[np.ndarray] = None,
    target_depths: Optional[list] = None,
    opt_cfg: OptimizationConfig = OptimizationConfig(),
    settings: raster_api.RasterizeSettings = raster_api.RasterizeSettings(),
    bg_color: Optional[jnp.ndarray] = None,
    vgg_weights_path: Optional[str] = None,
    seed: int = 0,
):
    """Host loop over random cameras (the train_st* skeleton)."""
    vgg_params = vgg_mod.load_weights(vgg_weights_path)
    vgg_params = {k: jnp.asarray(v) for k, v in vgg_params.items()}
    bg = bg_color if bg_color is not None else jnp.zeros(3)
    style_j = None if style_image is None else jnp.asarray(style_image, jnp.float32)
    rng = np.random.default_rng(seed)
    order = []
    losses = []
    for it in range(iterations):
        if not order:
            order = list(rng.permutation(len(cameras)))
        ci = order.pop()
        cam, gt = cameras[ci]
        tgt_d = None if target_depths is None else jnp.asarray(target_depths[ci])
        state, loss = refine_step(
            state, cam, gt, style_j, tgt_d, vgg_params, bg,
            mode=RefineMode(mode), settings=settings, opt_cfg=opt_cfg,
            width=cam.width, height=cam.height,
        )
        losses.append(float(loss))
    return state, losses
