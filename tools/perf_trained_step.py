#!/usr/bin/env python
"""VERDICT r4 'weak #3' reconciliation: is the fast-chain train step
really 2x slower than exact at 311k/800^2, or was the r4 gate pair
chip-contended?

The r4 resumable 30k gates recorded 2.87 steps/s (fast) vs 6.09 (exact)
over their whole runs, but the clean A/B at 200k synthetic shows only a
~5% fast-step penalty (50.1 vs 47.8 ms, NOTES_PERF r4s1). This tool runs
the SHORT chained A/B the verdict asked for: load the trained 311k-PLY
scene, build the exact and fast train steps at 800^2, and time each with
chained state dependencies (the only honest methodology over the axon
tunnel — NOTES_PERF 'Measurement traps').

Usage: python tools/perf_trained_step.py [--iters 20] [--res 800]
Writes runs/trained_step_ab.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as bench_mod  # noqa: F401  (cache setup side effect)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--cap-mult", type=int, default=6)
    ap.add_argument("--out", default="runs/trained_step_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wast3d_tpu.config import OptimizationConfig
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import api
    from wast3d_tpu.scene import ply as ply_mod
    from wast3d_tpu.train import reconstruct as R

    cands = sorted(
        glob.glob("runs/qgate*/model/point_cloud/iteration_30000/"
                  "point_cloud.ply"),
        key=os.path.getsize, reverse=True)
    if not cands:
        raise SystemExit("no 30k-trained PLY under runs/")
    path = cands[0]
    scene = ply_mod.load_ply(path)
    n = int(scene.xyz.shape[0])
    res = args.res
    cam = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=0.9, fovy=0.9, width=res, height=res)
    bg = jnp.zeros(3)
    cfg = OptimizationConfig()
    key = jax.random.PRNGKey(0)
    out = {"ply": path, "n": n, "res": res, "iters": args.iters}

    for name, kw in (("exact", {}), ("fast", {"fast_chain": True})):
        settings = api.RasterizeSettings(
            renderer="pallas", dup_capacity=args.cap_mult * n, chunk=32,
            **kw)

        @jax.jit
        def gt_fn(scene, bg, settings=settings):
            return api.render(cam, scene, bg, settings=settings)["render"]

        gt = gt_fn(scene, bg)
        st = R.init_train_state(scene, cfg, 1.0)

        def step(st):
            st, aux = R.train_step(
                st, cam, gt, bg, key, opt_cfg=cfg, settings=settings,
                width=res, height=res, jitter=False)
            return st, aux

        st, aux = step(st)
        jax.block_until_ready(st.scene.xyz)
        if bool(aux["overflow"]):
            out[f"{name}_overflow"] = True
            print(f"# {name}: overflow at cap {args.cap_mult}N",
                  file=sys.stderr)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, aux = step(st)  # chained: st feeds the next step
        jax.block_until_ready(st.scene.xyz)
        ms = (time.perf_counter() - t0) * 1e3 / args.iters
        out[f"{name}_step_ms"] = round(ms, 2)
        out[f"{name}_steps_per_s"] = round(1e3 / ms, 3)
        print(f"# {name}: {ms:.2f} ms/step", file=sys.stderr)

    if "exact_step_ms" in out and "fast_step_ms" in out:
        out["fast_over_exact"] = round(
            out["fast_step_ms"] / out["exact_step_ms"], 3)
    os.makedirs("runs", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
