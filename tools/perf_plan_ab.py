#!/usr/bin/env python
"""A/B the binning emission plan (default vs tight) at ladder sizes.

Times the full fwd frame and the train step in situ (NOTES_PERF traps:
whole-program timings only), reporting overflow-cause flags so a
band-budget miss is visible rather than silently truncating.

    python tools/perf_plan_ab.py [--n 1000000] [--res 1296x832]
        [--iters 8] [--cap-mult 4] [--train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", default="1296x832")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cap-mult", type=float, default=4)
    ap.add_argument("--plans", default="default,tight",
                    help="comma list: default,tight")
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import bench as bench_mod
    from wast3d_tpu.config import OptimizationConfig
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import api
    from wast3d_tpu.train import reconstruct as R

    n = args.n
    w, h = (int(x) for x in args.res.split("x"))
    scene = bench_mod._build(n, cap=n)
    cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=0.9, fovy=0.9, width=w, height=h)
    bg = jnp.zeros(3)
    all_plans = {
        "default": {},
        "tight": dict(phase_a_tiles=4, big_budget_divisor=64,
                      floor_band_budget=128),
    }
    plans = {k: all_plans[k] for k in args.plans.split(",")}
    report = {"n": n, "res": args.res, "cap_mult": args.cap_mult}
    for name, kw in plans.items():
        settings = api.RasterizeSettings(
            renderer="pallas", dup_capacity=int(args.cap_mult * n),
            max_per_tile=1024, chunk=32, **kw)

        @jax.jit
        def fwd(scene, camera, bg, settings=settings):
            r = api.render(camera, scene, bg, settings=settings)
            return (r["render"], r["overflow"], r["overflow_emit"],
                    r["overflow_rect"])

        out, ovf, ove, ovr = fwd(scene, cam, bg)
        jax.block_until_ready(out)
        flags = dict(overflow=bool(ovf), emit=bool(ove), rect=bool(ovr))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, *_ = fwd(scene, cam, bg)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        report[name] = {
            "fwd_ms": round(ms, 2),
            "mpix_s": round((w * h / 1e6) / (ms / 1e3), 2),
            **flags,
        }
        print(f"[{name}] fwd {ms:.2f} ms  "
              f"{(w * h / 1e6) / (ms / 1e3):.2f} MPix/s  {flags}")

        if args.train:
            state = R.init_train_state(scene, OptimizationConfig(), 1.0)
            key = jax.random.PRNGKey(0)

            def step(st, settings=settings):
                st, _ = R.train_step(
                    st, cam, out, bg, key, opt_cfg=OptimizationConfig(),
                    settings=settings, width=w, height=h, jitter=False,
                )
                return st

            st = step(state)
            jax.block_until_ready(st.scene.xyz)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st = step(st)
            jax.block_until_ready(st.scene.xyz)
            sms = (time.perf_counter() - t0) / args.iters * 1e3
            report[name]["step_ms"] = round(sms, 2)
            report[name]["steps_per_s"] = round(1e3 / sms, 3)
            print(f"[{name}] step {sms:.2f} ms  {1e3 / sms:.3f} steps/s")
            del state, st

    print(json.dumps(report))


if __name__ == "__main__":
    main()
