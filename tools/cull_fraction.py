#!/usr/bin/env python
"""Estimate the per-tile exact-ellipse cull fraction (CPU, numpy).

For each emitted (gaussian, tile) duplicate, test whether ANY sample
point in the tile can reach alpha >= 1/255: min over the tile's pixel
box of the conic quadratic Q(d) = A dx^2 + 2B dx dy + C dy^2 vs the
threshold 2*ln(255*opa). Duplicates failing the test contribute nothing
to output or gradients (the blend kernel skips every pixel), so binning
can drop them exactly — shrinking the dynamic per-tile ranges the blend
kernels iterate over. This script predicts that win before building it:
prints the fraction of duplicates cullable on (a) the synthetic bench
scene and (b) a trained scene checkpoint.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def cull_stats(pre, w, h, jitter_margin=1.0):
    """pre: Preprocessed (numpy-converted). Returns (n_dups, n_cull)."""
    TILE = 16
    gx, gy = -(-w // TILE), -(-h // TILE)
    mx, my = pre.means2d[:, 0], pre.means2d[:, 1]
    A, B, C = pre.conics[:, 0], pre.conics[:, 1], pre.conics[:, 2]
    opa = pre.opacities
    rx = pre.extent_x.astype(np.float32)
    ry = pre.extent_y.astype(np.float32)
    radii = pre.radii
    xmin = np.clip(np.floor((mx - rx) / TILE), 0, gx).astype(np.int64)
    ymin = np.clip(np.floor((my - ry) / TILE), 0, gy).astype(np.int64)
    xmax = np.clip(np.floor((mx + rx + TILE - 1) / TILE), 0, gx).astype(np.int64)
    ymax = np.clip(np.floor((my + ry + TILE - 1) / TILE), 0, gy).astype(np.int64)
    live = (radii > 0) & (rx > 0) & (ry > 0)
    xmin, xmax = np.where(live, xmin, 0), np.where(live, xmax, 0)
    ymin, ymax = np.where(live, ymin, 0), np.where(live, ymax, 0)
    rw = xmax - xmin
    tt = rw * (ymax - ymin)

    # Emit per-dup arrays (slot-major like the real emission).
    idx = np.repeat(np.arange(len(mx)), tt)
    slot = np.concatenate([np.arange(t) for t in tt]) if len(tt) else np.zeros(0, np.int64)
    rwm = np.maximum(rw[idx], 1)
    ty = ymin[idx] + slot // rwm
    tx = xmin[idx] + slot % rwm

    # Tile pixel box, including the jitter margin (pixf = pix + off,
    # off in (-1, 0]).
    x0 = tx * TILE - jitter_margin - mx[idx]
    x1 = tx * TILE + (TILE - 1) - mx[idx]
    y0 = ty * TILE - jitter_margin - my[idx]
    y1 = ty * TILE + (TILE - 1) - my[idx]
    a, b, c = A[idx], B[idx], C[idx]

    inside = (x0 <= 0) & (0 <= x1) & (y0 <= 0) & (0 <= y1)

    def edge_x(cx):  # dx fixed at cx, minimize over dy in [y0, y1]
        dy = np.clip(-b * cx / np.maximum(c, 1e-12), y0, y1)
        return a * cx * cx + 2 * b * cx * dy + c * dy * dy

    def edge_y(cy):
        dx = np.clip(-b * cy / np.maximum(a, 1e-12), x0, x1)
        return a * dx * dx + 2 * b * cy * dx + c * cy * cy

    qmin = np.minimum(
        np.minimum(edge_x(x0), edge_x(x1)),
        np.minimum(edge_y(y0), edge_y(y1)),
    )
    qmin = np.where(inside, 0.0, qmin)
    tau = 2.0 * np.log(np.maximum(255.0 * opa[idx], 1e-12))
    cull = qmin > tau
    return len(idx), int(cull.sum())


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer.preprocess import preprocess
    from wast3d_tpu.scene import gaussians as G

    import bench as bench_mod

    def run(scene, w, h, name, eye=(0, 0, -3)):
        cam = look_at_camera(
            eye=list(eye), target=[0, 0, 0], up=[0, -1, 0],
            fovx=0.9, fovy=0.9, width=w, height=h,
        )
        pre = preprocess(
            means3d=scene.get_xyz,
            opacities=scene.get_opacity,
            view_transform=cam.view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center,
            tan_fovx=cam.tan_fovx,
            tan_fovy=cam.tan_fovy,
            width=w, height=h,
            sh_degree=scene.active_sh_degree,
            shs=scene.get_features,
            scales=scene.get_scaling,
            rotations=scene.get_rotation,
            mask=scene.mask,
        )
        pre_np = jax.tree_util.tree_map(np.asarray, pre)
        n, cull = cull_stats(pre_np, w, h)
        print(f"{name}: dups={n} cullable={cull} ({100.0*cull/max(n,1):.1f}%)")

    n = int(os.environ.get("BENCH_N", 200_000))
    scene = bench_mod._build(n, cap=n)
    run(scene, 800, 800, f"bench synthetic {n}")

    for ply, res, eye in [
        ("runs/qgate/model/point_cloud/iteration_7000/point_cloud.ply",
         400, (0.0, 0.0, -4.0)),
        ("runs/qgate_r3_800/model/point_cloud/iteration_7000/point_cloud.ply",
         800, (0.0, 0.0, -4.0)),
    ]:
        if os.path.exists(ply):
            from wast3d_tpu.scene.ply import load_ply

            sc = load_ply(ply)
            run(sc, res, res, f"trained {ply.split('/')[1]}", eye=eye)


if __name__ == "__main__":
    main()
