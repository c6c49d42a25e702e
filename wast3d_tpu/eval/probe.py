"""Render probe: dump RGB / depth / normals artifacts for N views.

Equivalent of `/root/reference/test_depth.py:66-143`: render a handful of
views of a trained scene and save RGB, normalized depth, and
depth-derived normals as images plus a raw .npz — the reference's manual
QA artifact (SURVEY §4: visual checks stand in for tests there; here it
complements the automated suite as the human-inspectable artifact).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.eval.render_sets import save_image
from wast3d_tpu.ops.depth import depth_to_normals
from wast3d_tpu.ops.rasterizer import api


def probe_views(
    scene,
    cameras: List,
    out_dir: str,
    bg_color=None,
    settings: Optional[api.RasterizeSettings] = None,
    max_views: int = 10,
) -> dict:
    bg = bg_color if bg_color is not None else jnp.zeros(3)
    settings = settings or api.RasterizeSettings()
    os.makedirs(out_dir, exist_ok=True)
    render_fn = jax.jit(lambda cam, sc: api.render(cam, sc, bg, settings=settings))
    dump = {"rgb": [], "depth": [], "normals": []}
    for i, cam in enumerate(cameras[:max_views]):
        if isinstance(cam, tuple):
            cam = cam[0]
        out = render_fn(cam, scene)
        rgb = np.asarray(out["render"])
        depth = np.asarray(out["depth"])
        fx = cam.width / (2.0 * float(jnp.tan(cam.fovx * 0.5)))
        fy = cam.height / (2.0 * float(jnp.tan(cam.fovy * 0.5)))
        normals = np.asarray(depth_to_normals(jnp.asarray(depth), fx, fy))
        save_image(os.path.join(out_dir, f"rgb_{i:03d}.png"), rgb)
        dn = (depth - depth.min()) / (np.ptp(depth) + 1e-9)
        save_image(os.path.join(out_dir, f"depth_{i:03d}.png"), np.stack([dn] * 3, -1))
        save_image(os.path.join(out_dir, f"normals_{i:03d}.png"), (normals + 1) / 2)
        dump["rgb"].append(rgb)
        dump["depth"].append(depth)
        dump["normals"].append(normals)
    np.savez(os.path.join(out_dir, "probe.npz"),
             **{k: np.stack(v) for k, v in dump.items() if v})
    return dump
