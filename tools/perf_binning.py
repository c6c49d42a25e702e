#!/usr/bin/env python
"""Binning-internal stage split, in situ (NOTES_PERF traps apply).

Differences full binning against variants with the big emission-grid
sort (and then searchsorted) replaced by identity at TRACE time — wrong
results, true timings. The depth pre-sorts (N-sized) are left intact:
they're measured separately by perf_fwd_anatomy's +depth_presort leg.

    python tools/perf_binning.py [--n 1000000] [--res 1296x832]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", default="1296x832")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cap-mult", type=int, default=4)
    ap.add_argument("--cull", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench as bench_mod
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import binning as B
    from wast3d_tpu.ops.rasterizer.preprocess import preprocess

    n = args.n
    w, h = (int(x) for x in args.res.split("x"))
    scene = bench_mod._build(n, cap=n)
    cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=0.9, fovy=0.9, width=w, height=h)
    cam_args = (cam.view_transform, cam.full_proj_transform,
                cam.camera_center, cam.tan_fovx, cam.tan_fovy)
    dup_capacity = args.cap_mult * n

    def prep_of(scene, cam_args):
        view_t, proj_t, center, tfx, tfy = cam_args
        return preprocess(
            scene.xyz, jax.nn.sigmoid(scene.opacity)[:, 0], view_t, proj_t,
            center, tfx, tfy, w, h,
            sh_degree=int(scene.active_sh_degree), shs=scene.get_features,
            scales=jnp.exp(scene.scaling),
            rotations=scene.rotation
            / jnp.linalg.norm(scene.rotation, axis=-1, keepdims=True),
            mask=scene.mask,
        )

    def ks(x):
        return jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32))

    grid_n = None  # static emission-grid size, captured on first trace

    real_sort = jax.lax.sort
    real_ss = jnp.searchsorted

    def sort_skip_big(*a, **k):
        ops = a[0] if isinstance(a[0], (tuple, list)) else a[0]
        size = (ops[0] if isinstance(ops, (tuple, list)) else ops).shape[0]
        if grid_n is not None and size >= grid_n:
            return ops  # identity: skip the emission-grid sort only
        return real_sort(*a, **k)

    def ss_skip(sorted_arr, needles, **k):
        return jnp.zeros(needles.shape, jnp.int32)

    def bin_of(p):
        return B.bin_gaussians(
            p.means2d, p.depths, p.radii, w, h, dup_capacity=dup_capacity,
            ext_x=p.extent_x, ext_y=p.extent_y,
            conics=p.conics if args.cull else None,
            opacities=p.opacities if args.cull else None,
        )

    def full(scene, cam_args):
        p = prep_of(scene, cam_args)
        b = bin_of(p)
        return (ks(b.rank) + ks(b.tile_start) + ks(b.tile_of_dup)
                + ks(p.colors) + ks(p.conics))

    # Find the static grid size from the phase plan.
    phases = B._phase_plan(n, 6, 512, 16)
    grid_n = n * phases[0][1] + sum(e * b for _, e, b in phases[1:])
    print(f"emission grid = {grid_n} (pad 2^{(1 << (grid_n - 1).bit_length()).bit_length() - 1})")

    results = {}

    def timed(name, fn, patch_sort=False, patch_ss=False):
        jl_sort, jnp_ss = jax.lax.sort, jnp.searchsorted
        try:
            if patch_sort:
                jax.lax.sort = sort_skip_big
            if patch_ss:
                jnp.searchsorted = ss_skip
            f = jax.jit(fn)
            out = f(scene, cam_args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(scene, cam_args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters * 1e3
        finally:
            jax.lax.sort = jl_sort
            jnp.searchsorted = jnp_ss
        results[name] = round(dt, 2)
        print(f"{name:>28}: {dt:8.2f} ms", flush=True)

    timed("full_binning", full)
    timed("no_grid_sort", full, patch_sort=True)
    timed("no_grid_sort_no_search", full, patch_sort=True, patch_ss=True)
    timed("no_search", full, patch_ss=True)
    import json
    print(json.dumps({"n": n, "res": args.res, "cull": args.cull,
                      "stages_ms": results}))


if __name__ == "__main__":
    main()
