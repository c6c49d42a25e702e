#!/usr/bin/env python
"""Forward-frame stage anatomy, measured in situ (NOTES_PERF.md traps:
stages are timed as differences between progressively-truncated FULL
programs, each ending in an order-dependent strided-sum keepalive; bare
micro-benchmarks of a lone sort/gather pipeline away to ~0 over the
tunnel).

Stages: preprocess | depth-presort | emission grids | u32 sort | ranges
| gather+pack | blend | untile — plus tile-cull A/B and exact-vs-fast
chains. This decides where the remaining forward milliseconds live
(VERDICT r4: headline 25.97 MPix/s exact / 31.4 fast at 200k/800^2,
target >= 60).

    python tools/perf_fwd_anatomy.py [--n 200000] [--res 800x800]
        [--iters 30] [--cap-mult 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--res", default="800x800")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cap-mult", type=float, default=4)
    ap.add_argument("--plan", default="default",
                    help="default | tight (ra=4/div=64/floor=128) | tuned "
                         "(autoplan.tune_serving_settings)")
    ap.add_argument("--ply", default=None,
                    help="anatomy of a trained PLY scene instead of the "
                         "synthetic bench scene (uses the qgate radius-4 "
                         "camera)")
    ap.add_argument("--plan-literal", default=None,
                    help="python literal dict {'phase_plan': ..., "
                         "'max_tiles': int, 'dup_capacity': int} — use a "
                         "precomputed tuned plan (workaround for the "
                         "in-process autoplan hang over the tunnel, see "
                         "NOTES_PERF r5)")
    args = ap.parse_args()

    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import api, pallas_blend as pb
    from wast3d_tpu.ops.rasterizer.binning import (
        TILE, bin_gaussians, tile_grid)
    from wast3d_tpu.ops.rasterizer.preprocess import preprocess

    w, h = (int(x) for x in args.res.split("x"))
    if args.ply:
        from wast3d_tpu.scene import ply as ply_mod
        scene = ply_mod.load_ply(args.ply)
        n = int(scene.xyz.shape[0])
        eye = [0, 0, -4]
    else:
        n = args.n
        scene = bench_mod._build(n, cap=n)
        eye = [0, 0, -3]
    cam = look_at_camera(eye=eye, target=[0, 0, 0], up=[0, -1, 0],
                         fovx=0.9, fovy=0.9, width=w, height=h)
    bg = jnp.zeros(3)
    dup_capacity = int(args.cap_mult * n)
    plan_kw = ({} if args.plan in ("default", "tuned") else
               dict(phase_a_tiles=4, big_budget_divisor=64,
                    floor_band_budget=128))
    interp = bool(os.environ.get("WAST3D_FORCE_CPU"))  # CPU smoke only
    if interp:
        jax.config.update("jax_platforms", "cpu")
    settings = api.RasterizeSettings(
        renderer="pallas", dup_capacity=dup_capacity, chunk=32,
        pallas_interpret=interp, **plan_kw)
    if args.plan_literal:
        import ast
        lit = ast.literal_eval(args.plan_literal)
        dup_capacity = int(lit["dup_capacity"])
        plan_kw = dict(
            phase_plan=tuple(tuple(p) for p in lit["phase_plan"]),
            max_tiles_per_gaussian=int(lit["max_tiles"]))
        settings = settings._replace(dup_capacity=dup_capacity, **plan_kw)
    elif args.plan == "tuned":
        from wast3d_tpu.ops.rasterizer.autoplan import tune_serving_settings
        settings = tune_serving_settings(scene, [cam], settings)
        dup_capacity = int(settings.dup_capacity)
        plan_kw = dict(
            phase_plan=settings.phase_plan,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian)
        print(f"# tuned: dup_capacity={dup_capacity} "
              f"max_tiles={settings.max_tiles_per_gaussian} "
              f"plan={settings.phase_plan}", file=sys.stderr)

    cam_args = (cam.view_transform, cam.full_proj_transform,
                cam.camera_center, cam.tan_fovx, cam.tan_fovy)

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

    def ks(x):  # keepalive: order-dependent strided consumer
        return jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32))

    stages = {}

    # CHAINED timing (r4s4 trap, now observed on THIS tool: unchained
    # repeats of one (executable, args) pair coalesced to 0.03 ms
    # "stages" on the trained-scene run — 3 orders of magnitude below
    # device compute). R reps run inside ONE dispatch via lax.scan with
    # the carry perturbing the view matrix (a real input), so the device
    # serializes them; consecutive dispatches chain through the carry.
    R = 4

    def timed(name, fn):
        def body(c, _):
            view_t, proj_t, center, tfx, tfy = cam_args
            ca = (view_t + c, proj_t, center, tfx, tfy)
            s = fn(scene, ca, c)
            return c + 0.0 * s, None

        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(body, c, None, length=R)
            return c

        c = run(jnp.float32(0.0))
        jax.block_until_ready(c)
        reps = max(1, args.iters // R)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = run(c * 0.0)
        jax.block_until_ready(c)
        dt = (time.perf_counter() - t0) / (reps * R) * 1e3
        stages[name] = round(dt, 2)
        print(f"{name:>24}: {dt:8.2f} ms", flush=True)
        return dt

    # S0: preprocess only
    def s0(scene, cam_args, c):
        p = prep_of(scene, cam_args)
        return ks(p.means2d) + ks(p.conics) + ks(p.colors) + ks(p.depths)

    timed("preprocess", s0)

    # S1: + depth pre-sort + rank inverse (binning steps 1)
    def s1(scene, cam_args, c):
        p = prep_of(scene, cam_args)
        iota = jnp.arange(n, dtype=jnp.int32)
        _, order = jax.lax.sort(
            (jnp.where(p.radii > 0, p.depths, jnp.inf), iota), num_keys=1)
        _, rank_of = jax.lax.sort((order, iota), num_keys=1)
        return ks(order) + ks(rank_of) + ks(p.conics) + ks(p.colors)

    timed("+depth_presort", s1)

    # S2 family: full binning, cull on/off
    def mk_bin(cull):
        def f(scene, cam_args, c):
            p = prep_of(scene, cam_args)
            b = bin_gaussians(
                p.means2d, p.depths, p.radii, w, h,
                dup_capacity=dup_capacity, **plan_kw,
                ext_x=p.extent_x, ext_y=p.extent_y,
                conics=p.conics if cull else None,
                opacities=p.opacities if cull else None,
            )
            return (ks(b.rank) + ks(b.tile_start) + ks(b.tile_of_dup)
                    + ks(p.colors) + ks(p.conics))
        return f

    # Binning sub-stages via the _probe early exits (emit -> sort ->
    # decode -> ranges), each cumulative and keepalive-consumed.
    def mk_bin_probe(probe):
        def f(scene, cam_args, c):
            p = prep_of(scene, cam_args)
            out = bin_gaussians(
                p.means2d, p.depths, p.radii, w, h,
                dup_capacity=dup_capacity, **plan_kw,
                ext_x=p.extent_x, ext_y=p.extent_y,
                conics=p.conics, opacities=p.opacities,
                _probe=probe,
            )
            return ks(out) + ks(p.colors) + ks(p.conics)
        return f

    for probe in ("emit", "sort", "decode", "ranges"):
        timed(f"+bin:{probe}", mk_bin_probe(probe))
    timed("+binning(cull)", mk_bin(True))
    timed("+binning(nocull)", mk_bin(False))

    # S3: + gather + pack (recentred), exact f32
    grid_x, grid_y = tile_grid(w, h)

    def mk_gather(cull, fast):
        def f(scene, cam_args, c):
            p = prep_of(scene, cam_args)
            b = bin_gaussians(
                p.means2d, p.depths, p.radii, w, h,
                dup_capacity=dup_capacity, **plan_kw,
                ext_x=p.extent_x, ext_y=p.extent_y,
                conics=p.conics if cull else None,
                opacities=p.opacities if cull else None,
            )
            packed_g = jnp.stack(
                [p.means2d[:, 0], p.means2d[:, 1], p.conics[:, 0],
                 p.conics[:, 1], p.conics[:, 2], p.opacities, p.depths,
                 p.colors[:, 0], p.colors[:, 1], p.colors[:, 2]], axis=1)
            K = b.rank.shape[0]
            safe_rank = jnp.where(
                jnp.arange(K, dtype=jnp.int32) < b.tile_end[-1], b.rank, n)
            source = jnp.concatenate(
                [packed_g[b.depth_order], jnp.zeros((1, 10), jnp.float32)])
            rows = source[safe_rank]
            pt = rows.T
            ox = (b.tile_of_dup % grid_x).astype(jnp.float32) * TILE
            oy = (b.tile_of_dup // grid_x).astype(jnp.float32) * TILE
            pt = jnp.concatenate(
                [pt[0:1] - ox[None], pt[1:2] - oy[None], pt[2:]], axis=0)
            if fast:
                pt = pt.astype(jnp.bfloat16)
            packed = jnp.pad(pt, ((0, pb.NROWS - pt.shape[0]), (0, pb.G)))
            return ks(packed) + ks(b.tile_start)
        return f

    timed("+gather_pack", mk_gather(True, False))
    timed("+gather_pack(bf16)", mk_gather(True, True))

    # Candidate fast-tier gather: per-gaussian split-bf16 pack into u32
    # pairs FIRST (N-sized, cheap), gather 24B/row instead of 40B, unpack
    # after. Means carry hi+lo bf16 halves so recentring stays subpixel.
    # Serving-only (u32 bitcast is not differentiable). This stage times
    # the full replacement for +gather_pack(bf16).
    def gather_packed(scene, cam_args, c):
        p = prep_of(scene, cam_args)
        b = bin_gaussians(
            p.means2d, p.depths, p.radii, w, h, dup_capacity=dup_capacity, **plan_kw,
            ext_x=p.extent_x, ext_y=p.extent_y,
            conics=p.conics, opacities=p.opacities,
        )
        mx, my = p.means2d[:, 0], p.means2d[:, 1]
        mx_hi = mx.astype(jnp.bfloat16)
        my_hi = my.astype(jnp.bfloat16)
        cols = jnp.stack(
            [mx_hi.astype(jnp.float32), (mx - mx_hi.astype(jnp.float32)),
             my_hi.astype(jnp.float32), (my - my_hi.astype(jnp.float32)),
             p.conics[:, 0], p.conics[:, 1], p.conics[:, 2], p.opacities,
             p.depths, p.colors[:, 0], p.colors[:, 1], p.colors[:, 2]],
            axis=1).astype(jnp.bfloat16)  # [N,12] bf16
        packed_u32 = jax.lax.bitcast_convert_type(
            cols.reshape(-1, 6, 2), jnp.uint32)  # [N,6]
        K = b.rank.shape[0]
        safe_rank = jnp.where(
            jnp.arange(K, dtype=jnp.int32) < b.tile_end[-1], b.rank, n)
        src = jnp.concatenate(
            [packed_u32[b.depth_order], jnp.zeros((1, 6), jnp.uint32)])
        rows_u = src[safe_rank]  # [K,6] u32 gather (24B/row)
        rows = jax.lax.bitcast_convert_type(
            rows_u, jnp.bfloat16).reshape(-1, 12)  # [K,12]
        ox = (b.tile_of_dup % grid_x).astype(jnp.float32) * TILE
        oy = (b.tile_of_dup // grid_x).astype(jnp.float32) * TILE
        mxl = (rows[:, 0].astype(jnp.float32) - ox
               + rows[:, 1].astype(jnp.float32)).astype(jnp.bfloat16)
        myl = (rows[:, 2].astype(jnp.float32) - oy
               + rows[:, 3].astype(jnp.float32)).astype(jnp.bfloat16)
        pt = jnp.concatenate([mxl[None], myl[None], rows[:, 4:].T], axis=0)
        packed = jnp.pad(pt, ((0, pb.NROWS - pt.shape[0]), (0, pb.G)))
        return ks(packed) + ks(b.tile_start)

    timed("+gather_pack(u32packed)", gather_packed)

    # S4: full renders
    def mk_full(fast, cull):
        s = settings._replace(fast_chain=fast, tile_cull=cull)

        def f(scene, cam_args, c):
            return ks(api.render(cam, scene, bg + c, settings=s)["render"])
        return f

    timed("full_exact", mk_full(False, True))
    timed("full_exact_nocull", mk_full(False, False))
    timed("full_fast", mk_full(True, True))
    timed("full_fast_nocull", mk_full(True, False))

    plan_name = "literal" if args.plan_literal else args.plan
    print(json.dumps({"n": n, "res": args.res, "cap_mult": args.cap_mult,
                      "plan": plan_name, "ply": args.ply,
                      "dup_capacity": dup_capacity,
                      "stages_ms": stages}))


if __name__ == "__main__":
    main()
