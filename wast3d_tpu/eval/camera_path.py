"""Camera-path loading + interpolation + video-frame rendering.

Covers the reference's viewing/video story: nerfstudio-style keyframe
paths (`/root/reference/scripts/camera_path_{hotdog,sphere}.json`,
consumed via the nerfstudio shims per `scripts/useful_commands.sh:17-37`)
and the spiral render paths of the nerfstudio dataset readers
(`submodules/dataset_readers.py:446,789`). Frames render through the
standard rasterizer; writing PNG sequences is the video artifact
(assembly to mp4 is a host ffmpeg concern, out of compute scope).
"""

from __future__ import annotations

import json
import math
import os
from typing import List, Optional

import numpy as np

from wast3d_tpu.core.camera import Camera, make_camera


def _c2w_to_camera(c2w: np.ndarray, fov_deg: float, width: int, height: int,
                   uid: int = 0) -> Camera:
    """Column-major nerfstudio keyframe matrix -> Camera. The keyframe
    frame is OpenGL-style (camera looks along -z, y up): flip to the
    COLMAP convention like the Blender loader does."""
    c2w = c2w.copy()
    c2w[:3, 1:3] *= -1
    w2c = np.linalg.inv(c2w)
    R = w2c[:3, :3].T
    T = w2c[:3, 3]
    fov = math.radians(fov_deg)
    return make_camera(R=R, t=T, fovx=fov, fovy=fov, width=width, height=height,
                       uid=uid)


def load_camera_path(path: str, width: int = 800, height: int = 800,
                     frames_per_segment: int = 24) -> List[Camera]:
    """Load a keyframe JSON and interpolate `frames_per_segment` cameras
    per segment (linear position, slerp-free matrix orthonormalization)."""
    with open(path) as f:
        data = json.load(f)
    keyframes = []
    fovs = []
    for kf in data["keyframes"]:
        m = np.array(json.loads(kf["matrix"]), dtype=np.float64).reshape(4, 4).T
        keyframes.append(m)
        fovs.append(float(kf.get("fov", 50.0)))
    cams = []
    uid = 0
    for i in range(len(keyframes) - 1):
        a, b = keyframes[i], keyframes[i + 1]
        for t in np.linspace(0, 1, frames_per_segment, endpoint=False):
            m = (1 - t) * a + t * b
            # Re-orthonormalize the rotation block (SVD projection).
            u, _, vt = np.linalg.svd(m[:3, :3])
            m[:3, :3] = u @ vt
            fov = (1 - t) * fovs[i] + t * fovs[i + 1]
            cams.append(_c2w_to_camera(m, fov, width, height, uid))
            uid += 1
    cams.append(_c2w_to_camera(keyframes[-1], fovs[-1], width, height, uid))
    return cams


def spiral_path(
    center: np.ndarray, radius: float, height_offset: float,
    num_frames: int = 120, fov: float = 0.8, width: int = 800,
    height: int = 800, revolutions: float = 2.0,
) -> List[Camera]:
    """Spiral orbit around a scene center (the LLFF/DTU spiral of the
    nerfstudio shims)."""
    from wast3d_tpu.core.camera import look_at_camera

    cams = []
    for i in range(num_frames):
        t = i / num_frames
        ang = 2 * math.pi * revolutions * t
        eye = center + np.array([
            radius * math.cos(ang),
            height_offset * math.sin(2 * math.pi * t),
            radius * math.sin(ang),
        ])
        cams.append(
            look_at_camera(eye=eye, target=center, up=[0, -1, 0],
                           fovx=fov, fovy=fov, width=width, height=height,
                           uid=i)
        )
    return cams


def render_path(
    scene, cameras: List[Camera], out_dir: str, bg_color=None,
    settings=None, save_depth: bool = False,
) -> List[str]:
    """Render a camera path to numbered PNGs (the video frames)."""
    import jax
    import jax.numpy as jnp

    from wast3d_tpu.eval.render_sets import save_image
    from wast3d_tpu.ops.rasterizer import api

    bg = bg_color if bg_color is not None else jnp.zeros(3)
    settings = settings or api.RasterizeSettings()
    render_fn = jax.jit(
        lambda cam, sc: api.render(cam, sc, bg, settings=settings)
    )
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, cam in enumerate(cameras):
        out = render_fn(cam, scene)
        p = os.path.join(out_dir, f"{i:05d}.png")
        save_image(p, out["render"])
        paths.append(p)
        if save_depth:
            d = np.asarray(out["depth"])
            dn = (d - d.min()) / (np.ptp(d) + 1e-9)
            save_image(os.path.join(out_dir, f"{i:05d}_depth.png"),
                       np.stack([dn] * 3, -1))
    return paths
