"""Camera model: view/projection matrices and the Camera pytree.

Behavioral parity with `/root/reference/scene/cameras.py:17-70` and
`/root/reference/utils/graphics_utils.py:38-77`. Matrix convention follows
the reference exactly: matrices are stored *transposed* so points transform
as row vectors, `p_view = (p_hom @ view_transform)[..., :3]` — this matches
the CUDA `transformPoint4x3/4x4` access pattern (`auxiliary.h:58-77`) and
keeps saved camera JSONs interchangeable.

The Camera is a flax.struct pytree: image sizes are static aux data (XLA
needs static output shapes), everything else is arrays so a list of cameras
with equal resolution can be stacked and vmapped over (batch rendering).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
) -> np.ndarray:
    """4x4 world->view matrix; reference `getWorld2View2`
    (`utils/graphics_utils.py:38-49`). R is the COLMAP-convention rotation
    (world axes in camera frame, stored transposed), t the translation;
    translate/scale re-center the scene (nerf++ normalization)."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
    return np.linalg.inv(c2w).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection; reference `getProjectionMatrix`
    (`utils/graphics_utils.py:51-71`). Note the reference's (non-standard)
    z row: P[2,2] = zfar/(zfar-znear), P[2,3] = -zfar*znear/(zfar-znear)."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@struct.dataclass
class Camera:
    """A render viewpoint. Matrices are stored transposed (row-vector
    convention), matching the reference's `world_view_transform` /
    `full_proj_transform` (`scene/cameras.py:54-57`)."""

    view_transform: jnp.ndarray  # [4,4] world->view, transposed
    full_proj_transform: jnp.ndarray  # [4,4] world->clip, transposed
    camera_center: jnp.ndarray  # [3]
    fovx: jnp.ndarray  # scalar
    fovy: jnp.ndarray  # scalar
    znear: jnp.ndarray  # scalar
    zfar: jnp.ndarray  # scalar
    # Static fields (aux data): shapes must be known at trace time.
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    # Optional ground-truth image [H,W,3] in [0,1] for training.
    image: Optional[jnp.ndarray] = None
    # NOTE: camera identity (uid / image name, reference
    # `scene/cameras.py:27-30`) is deliberately NOT on this pytree. Static
    # aux fields participate in the treedef, so a per-camera uid would give
    # every viewpoint a distinct treedef and recompile every jitted
    # render/train step once per camera (hundreds of multi-minute TPU
    # compiles on a real COLMAP scene). Identity lives host-side in
    # `scene/datasets.py:CameraInfo` (uid/image_name), which callers keep
    # alongside the Camera list they build from it.

    @property
    def tan_fovx(self) -> jnp.ndarray:
        return jnp.tan(self.fovx * 0.5)

    @property
    def tan_fovy(self) -> jnp.ndarray:
        return jnp.tan(self.fovy * 0.5)

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    image: Optional[np.ndarray] = None,
    znear: float = 0.01,
    zfar: float = 100.0,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
    uid: int = 0,
    name: str = "",
) -> Camera:
    """Build a Camera like the reference `Camera.__init__`
    (`scene/cameras.py:17-57`): znear/zfar default 0.01/100, transposed
    matrix products, camera center from the inverse view transform.

    `uid`/`name` are accepted for reference-API parity but are NOT stored
    on the returned pytree (they would poison the jit treedef — see the
    Camera docstring); callers needing identity keep it host-side."""
    w2v = world_to_view(R, t, translate, scale)
    view_t = w2v.T
    proj_t = projection_matrix(znear, zfar, fovx, fovy).T
    full_proj_t = view_t @ proj_t
    cam_center = np.linalg.inv(w2v)[:3, 3]
    img = None
    if image is not None:
        img = jnp.asarray(np.clip(np.asarray(image, dtype=np.float32), 0.0, 1.0))
    return Camera(
        view_transform=jnp.asarray(view_t),
        full_proj_transform=jnp.asarray(full_proj_t),
        camera_center=jnp.asarray(cam_center.astype(np.float32)),
        fovx=jnp.float32(fovx),
        fovy=jnp.float32(fovy),
        znear=jnp.float32(znear),
        zfar=jnp.float32(zfar),
        width=int(width),
        height=int(height),
        image=img,
    )


def look_at_camera(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    **kwargs,
) -> Camera:
    """Convenience constructor for tests/synthetic scenes: build R, t from a
    look-at specification (camera +z looks at the target, matching the
    reference's view-space convention where depth is +z, `forward.cu:250`)."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, dtype=np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Rows of world->cam rotation are the camera axes.
    Rcw = np.stack([right, down, fwd], axis=0)
    # Reference convention: stored R is C2W rotation (R = Rcw.T), t is W2C translation.
    t = -Rcw @ eye
    return make_camera(R=Rcw.T, t=t, fovx=fovx, fovy=fovy, width=width, height=height, **kwargs)
