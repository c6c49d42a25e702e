"""nerfstudio drop-in Model shim.

TPU-native counterpart of the reference's nerfstudio integration
(`/root/reference/submodules/gaussian_splatting.py:30-256`): a trained
WaSt3D/3DGS point cloud rendered inside the nerfstudio viewer. The
reference subclasses `nerfstudio.models.base_model.Model`, loads the
highest-iteration `point_cloud.ply`, converts each viewer camera
(OpenGL/Blender c2w) to a rasterizer camera, renders, and returns
rgb + inverse depth + a normals-from-depth visualization.

nerfstudio is not installed in this environment, so the module is split:

- Standalone, fully tested here: `ns_c2w_to_camera` (the ns2gs camera
  conversion, `gaussian_splatting.py:134-162`), `depth_to_normals` (the
  kornia call at `:119`, reimplemented in JAX), and
  `render_viewer_outputs` (the output dict of
  `get_outputs_for_camera_ray_bundle`, `:101-132`).
- Gated: `make_model_classes()` imports nerfstudio and builds the
  `ModelConfig` / `Model` subclasses around those functions; it raises a
  clear ImportError when nerfstudio is absent.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from wast3d_tpu.core.camera import Camera, make_camera
from wast3d_tpu.ops.rasterizer import api
from wast3d_tpu.scene.datasets import focal2fov
from wast3d_tpu.train.checkpoint import find_max_iteration


def ns_c2w_to_camera(
    c2w: np.ndarray,
    fx: float,
    fy: float,
    width: int,
    height: int,
    orientation_transform: np.ndarray | None = None,
) -> Camera:
    """nerfstudio camera -> rasterizer camera
    (`gaussian_splatting.py:134-162`): pad c2w to 4x4, optional reorient,
    flip the OpenGL y/z columns to COLMAP, invert, store R transposed."""
    c2w = np.concatenate(
        [np.asarray(c2w, np.float64), np.array([[0, 0, 0, 1.0]])], axis=0
    )
    if orientation_transform is not None:
        c2w = np.asarray(orientation_transform, np.float64) @ c2w
    c2w[:3, 1:3] *= -1
    w2c = np.linalg.inv(c2w)
    R = np.transpose(w2c[:3, :3])
    T = w2c[:3, 3]
    return make_camera(
        R=R.astype(np.float32),
        t=T.astype(np.float32),
        fovx=focal2fov(fx, width),
        fovy=focal2fov(fy, height),
        width=int(width),
        height=int(height),
    )


def camera_intrinsics(camera: Camera) -> jnp.ndarray:
    """Pinhole K the reference builds inline (`gaussian_splatting.py:113-117`)."""
    fx = 0.5 * camera.width / np.tan(0.5 * float(camera.fovx))
    fy = 0.5 * camera.height / np.tan(0.5 * float(camera.fovy))
    return jnp.asarray(
        [[fx, 0, 0.5 * camera.width],
         [0, fy, 0.5 * camera.height],
         [0, 0, 1.0]], jnp.float32,
    )


def depth_to_normals(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Normals from a depth map (JAX port of the kornia call at
    `gaussian_splatting.py:119`): unproject to camera-space points,
    central-difference the point grid, normalize the cross product.
    Returns (H, W, 3) unit normals."""
    H, W = depth.shape
    uu = jnp.arange(W, dtype=jnp.float32)[None, :]
    vv = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (uu - K[0, 2]) / K[0, 0] * depth
    y = (vv - K[1, 2]) / K[1, 1] * depth
    pts = jnp.stack([x, y, depth], axis=-1)  # (H,W,3)

    def central(p, axis):
        lead = jnp.take(p, jnp.r_[1:p.shape[axis], p.shape[axis] - 1],
                        axis=axis)
        lag = jnp.take(p, jnp.r_[0, 0:p.shape[axis] - 1], axis=axis)
        return 0.5 * (lead - lag)

    dpdv = central(pts, 0)  # d/dy (rows)
    dpdu = central(pts, 1)  # d/dx (cols)
    n = jnp.cross(dpdu, dpdv)
    # Orient toward the camera (-z in camera space), kornia's convention.
    n = jnp.where(n[..., 2:3] > 0, -n, n)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


def render_viewer_outputs(scene, camera: Camera, bg_color,
                          settings: api.RasterizeSettings | None = None):
    """The reference's viewer output dict
    (`gaussian_splatting.py:101-132`): clamped rgb as "rgb1", inverse
    depth (near-plane clamp depth<2 -> 1e10 first), and the
    normals-from-depth visualization as "rgb"."""
    settings = settings or api.RasterizeSettings(renderer="pallas")
    out = api.render(camera, scene, jnp.asarray(bg_color, jnp.float32),
                     settings=settings)
    depth = out["depth"]
    K = camera_intrinsics(camera)
    normal_vis = (depth_to_normals(depth, K) + 1.0) / 2.0
    depth = jnp.where(depth < 2.0, 1e10, depth)
    return {
        "rgb1": jnp.clip(out["render"], a_max=1.0),
        "depth": (1.0 / depth)[..., None],
        "rgb": normal_vis,
    }


def make_model_classes():
    """Build (WaSt3DSplattingModelConfig, WaSt3DSplattingModel) against an
    installed nerfstudio. Mirrors `GaussianSplattingModelConfig` /
    `GaussianSplatting` (`gaussian_splatting.py:30-132`); raises
    ImportError with install guidance when nerfstudio is missing."""
    try:
        import torch  # noqa: F401
        from dataclasses import dataclass, field
        from typing import Type

        from nerfstudio.models.base_model import Model, ModelConfig
    except ImportError as e:  # pragma: no cover - env has no nerfstudio
        raise ImportError(
            "nerfstudio is required for the viewer Model shim: "
            "pip install nerfstudio, then call make_model_classes() again. "
            "The conversion/rendering math it wraps (ns_c2w_to_camera, "
            "render_viewer_outputs) works without it."
        ) from e

    from wast3d_tpu.scene.ply import load_ply

    @dataclass
    class WaSt3DSplattingModelConfig(ModelConfig):
        _target: Type = field(default_factory=lambda: WaSt3DSplattingModel)
        background_color: str = "black"
        sh_degree: int = 3

    class WaSt3DSplattingModel(Model):
        """nerfstudio Model serving a trained WaSt3D point cloud through
        the TPU rasterizer."""

        def __init__(self, config, scene_box, num_train_data,
                     model_path=None, load_iteration=-1,
                     orientation_transform=None, **kwargs):
            self.model_path = model_path
            self.load_iteration = load_iteration
            self.orientation_transform = (
                None if orientation_transform is None
                else np.asarray(orientation_transform)
            )
            self.bg_color = (
                [0.0, 0.0, 0.0] if config.background_color == "black"
                else [1.0, 1.0, 1.0]
            )
            super().__init__(config, scene_box, num_train_data, **kwargs)

        def populate_modules(self):
            super().populate_modules()
            if self.load_iteration == -1:
                self.load_iteration = find_max_iteration(self.model_path)
            self.gaussian_scene = load_ply(
                os.path.join(
                    self.model_path, "point_cloud",
                    f"iteration_{self.load_iteration}", "point_cloud.ply",
                ),
                max_sh_degree=self.config.sh_degree,
            )

        @torch.no_grad()
        def get_outputs_for_camera_ray_bundle(self, camera_ray_bundle):
            ns_cam = camera_ray_bundle.camera
            cam = ns_c2w_to_camera(
                ns_cam.camera_to_worlds.cpu().numpy(),
                float(ns_cam.fx), float(ns_cam.fy),
                int(ns_cam.width), int(ns_cam.height),
                orientation_transform=self.orientation_transform,
            )
            outs = render_viewer_outputs(
                self.gaussian_scene, cam, self.bg_color
            )
            dev = camera_ray_bundle.origins.device
            return {
                k: torch.from_numpy(np.asarray(v)).to(dev)
                for k, v in outs.items()
            }

    return WaSt3DSplattingModelConfig, WaSt3DSplattingModel
