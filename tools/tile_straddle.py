#!/usr/bin/env python
"""tiles_touched straddle histograms + phase-plan feasibility (CPU).

The binning emission uses a STATIC phase plan (binning._phase_plan):
phase A gives every gaussian `ra` slots, then exponentially wider bands
with shrinking element budgets cover the tail. The u32 sort pads to the
next power of two of the TOTAL static grid, so the plan choice sets the
sort cost — the single largest piece of the forward at 200k (r4s2
anatomy: binning ~8.2 ms of 20.8).

This tool measures, per scene/camera, the fraction of live gaussians
with tiles_touched > k, then checks every (phase_a_tiles, divisor)
candidate plan for band-budget feasibility and reports its padded sort
grid. Run it before touching phase-plan defaults: r4 found 78% of bench
gaussians straddle exactly 4 tiles (16x16 tiles vs ~2-tile radii), so
ra=3 is globally dead, while ra=4 feasibility is scene-dependent.

Usage: PYTHONPATH=/root/repo python tools/tile_straddle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

TILE = 16
KS = (2, 3, 4, 5, 6, 8, 12, 16, 28)


def tiles_touched(pre, w, h):
    gx, gy = -(-w // TILE), -(-h // TILE)
    mx, my = pre.means2d[:, 0], pre.means2d[:, 1]
    rx = pre.extent_x.astype(np.float32)
    ry = pre.extent_y.astype(np.float32)
    radii = pre.radii
    xmin = np.clip(np.floor((mx - rx) / TILE), 0, gx)
    ymin = np.clip(np.floor((my - ry) / TILE), 0, gy)
    xmax = np.clip(np.floor((mx + rx + TILE - 1) / TILE), 0, gx)
    ymax = np.clip(np.floor((my + ry + TILE - 1) / TILE), 0, gy)
    live = (radii > 0) & (rx > 0) & (ry > 0)
    tt = np.where(live, (xmax - xmin) * (ymax - ymin), 0)
    return tt.astype(np.int64)


def plan_report(n, tt_list, max_tiles=512):
    """Feasibility of each candidate plan vs measured straddle counts.

    A plan is feasible for a scene iff every band's element budget
    covers the count of gaussians needing slots past the band start
    (binning.py band overflow condition), across ALL sampled cameras.
    """
    from wast3d_tpu.ops.rasterizer.binning import _phase_plan

    rows = []
    for ra in (3, 4, 5, 6, 8):
        for div in (8, 16, 32, 64, 128):
            for floor in (256, 128):
                phases = _phase_plan(n, ra, max_tiles, div,
                                     floor_budget=floor)
                total = n * phases[0][1] + sum(
                    e * b for _, e, b in phases[1:])
                padded = 1 << (total - 1).bit_length()
                ok = True
                worst = ""
                for tt in tt_list:
                    for start, _extra, budget in phases[1:]:
                        need = int((tt > start).sum())
                        if need > budget:
                            ok = False
                            worst = (f" band>{start}: need {need} > "
                                     f"budget {budget}")
                            break
                    if not ok:
                        break
                rows.append((ra, div, floor, total, padded, ok, worst))
    print(f"  plan candidates (n={n}):")
    for ra, div, floor, total, padded, ok, worst in rows:
        print(f"    ra={ra} div={div} floor={floor}: grid={total} pad=2^"
              f"{padded.bit_length()-1} feasible={ok}{worst}")


def run_scene(scene, w, h, name, eyes):
    import jax

    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer.preprocess import preprocess

    n = scene.xyz.shape[0]
    tt_list = []
    for eye in eyes:
        cam = look_at_camera(eye=list(eye), target=[0, 0, 0], up=[0, -1, 0],
                             fovx=0.9, fovy=0.9, width=w, height=h)
        pre = preprocess(
            means3d=scene.get_xyz, opacities=scene.get_opacity,
            view_transform=cam.view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center,
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=w, height=h, sh_degree=scene.active_sh_degree,
            shs=scene.get_features, scales=scene.get_scaling,
            rotations=scene.get_rotation, mask=scene.mask,
        )
        pre_np = jax.tree_util.tree_map(np.asarray, pre)
        tt = tiles_touched(pre_np, w, h)
        tt_list.append(tt)
        live = int((tt > 0).sum())
        dups = int(tt.sum())
        fr = {k: 100.0 * float((tt > k).sum()) / n for k in KS}
        print(f"{name} eye={eye}: live={live} dups={dups} "
              f"({dups / n:.2f}N) | >k% of n: "
              + " ".join(f">{k}:{fr[k]:.2f}" for k in KS))
    plan_report(n, tt_list)
    return tt_list


def main():
    import bench as bench_mod

    n = int(os.environ.get("BENCH_N", 200_000))
    res = os.environ.get("BENCH_RES", "800x800")
    w, h = (int(x) for x in res.split("x"))
    scene = bench_mod._build(n, cap=n)
    run_scene(scene, w, h, f"bench {n} {res}",
              [(0, 0, -3), (0.8, 0.4, -2.8), (0, 0, -4)])
    del scene

    if os.environ.get("STRADDLE_1M", "1") == "1":
        scene = bench_mod._build(1_000_000, cap=1_000_000)
        run_scene(scene, 1296, 832, "bench 1M 1296x832",
                  [(0, 0, -3), (0.8, 0.4, -2.8)])
        del scene

    ply = os.environ.get(
        "STRADDLE_PLY",
        "runs/qgate_r4_800_30k/model/point_cloud/iteration_30000/"
        "point_cloud.ply")
    if os.path.exists(ply):
        from wast3d_tpu.scene.ply import load_ply
        scene = load_ply(ply)
        run_scene(scene, 800, 800, f"trained {os.path.basename(ply)}",
                  [(0, 0, -4), (2.0, 1.0, -3.4), (0, 0.5, -3)])


if __name__ == "__main__":
    main()
