#!/usr/bin/env python
"""In-situ train-step timing harness (NOTES_PERF.md methodology).

Times the FULL jitted train step at BENCH_N/BENCH_RES with chained
dependencies (state feeds the next step), which is the only trustworthy
timing over the axon tunnel. Modes compare grad_reduce variants and
fwd-only cost.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_step.py \
        [--modes scatter,segsum,segsum_sortpayload,none] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod  # repo-root bench: scene builder + cache setup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="none,segsum,segsum_sortpayload")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n", type=int, default=int(os.environ.get("BENCH_N", 200_000)))
    ap.add_argument("--res", default=os.environ.get("BENCH_RES", "800x800"))
    ap.add_argument("--fwd", action="store_true", help="also time fwd-only")
    ap.add_argument("--decompose", action="store_true",
                    help="time fwd+loss and fwd+bwd (no Adam/stats)")
    ap.add_argument("--dssim0", action="store_true",
                    help="lambda_dssim=0 (cost the SSIM term)")
    ap.add_argument("--cap-mult", type=int, default=6,
                    help="dup_capacity multiplier (default 6)")
    ap.add_argument("--pieces", action="store_true",
                    help="time step variants isolating Adam/stats/m2d-tap")
    ap.add_argument("--fast", action="store_true",
                    help="fast_chain=True (bf16 blend kernels)")
    ap.add_argument("--no-tile-cull", action="store_true",
                    help="disable the exact per-tile ellipse cull (A/B)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wast3d_tpu.config import OptimizationConfig
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import api
    from wast3d_tpu.train import reconstruct as R

    w, h = (int(x) for x in args.res.split("x"))
    scene = bench_mod._build(args.n, cap=args.n)
    cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=0.9, fovy=0.9, width=w, height=h)
    bg = jnp.zeros(3)

    def mk_settings(mode):
        return api.RasterizeSettings(
            renderer="pallas", dup_capacity=args.cap_mult * args.n,
            max_per_tile=1024, chunk=32, grad_reduce=mode,
            fast_chain=args.fast, tile_cull=not args.no_tile_cull,
        )

    settings0 = mk_settings("segsum")

    @jax.jit
    def fwd(scene, camera, bg):
        return api.render(camera, scene, bg, settings=settings0)["render"]

    gt = fwd(scene, cam, bg)
    jax.block_until_ready(gt)
    if args.fwd:
        t0 = time.perf_counter()
        for _ in range(args.iters):
            gt = fwd(scene, cam, bg)
        jax.block_until_ready(gt)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"fwd_only: {dt*1e3:8.2f} ms  ({(w*h/1e6)/dt:6.2f} MPix/s)")

    key = jax.random.PRNGKey(0)
    opt = OptimizationConfig(lambda_dssim=0.0) if args.dssim0 \
        else OptimizationConfig()

    if args.decompose:
        # Isolate (a) fwd+loss, (b) +backward (grads consumed, no
        # Adam/stats). Chained via a scalar perturbation of xyz.
        from wast3d_tpu.ops.image_losses import photometric_loss
        from wast3d_tpu.train.optim import make_optimizer

        st0 = R.init_train_state(scene, opt, 1.0)
        params0 = st0.scene.params()

        @jax.jit
        def fwd_loss(params, eps):
            p = dict(params, xyz=params["xyz"] + eps)
            s = scene.with_params(p)
            out = api.render(cam, s, bg, settings=settings0)
            return photometric_loss(out["render"], gt, opt.lambda_dssim)

        @jax.jit
        def fwd_bwd(params, eps):
            p = dict(params, xyz=params["xyz"] + eps)

            def lf(p2, m2d):
                s = scene.with_params(p2)
                out = api.render(cam, s, bg, settings=settings0,
                                 means2d_offset=m2d)
                return photometric_loss(out["render"], gt,
                                        opt.lambda_dssim)

            m2d = jnp.zeros((scene.capacity, 2), jnp.float32)
            g, gm = jax.grad(lf, argnums=(0, 1))(p, m2d)
            return sum(jnp.sum(v[::4097]) for v in jax.tree.leaves(g)) + \
                jnp.sum(gm[::4097])

        for name, f in (("fwd_loss", fwd_loss), ("fwd_bwd", fwd_bwd)):
            e = jnp.float32(0.0)
            e = f(params0, e) * 1e-12
            jax.block_until_ready(e)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                e = f(params0, e) * 1e-12
            jax.block_until_ready(e)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:>10s}: {dt*1e3:8.2f} ms")

    if args.pieces:
        # Custom step variants isolating Adam, densify-stats, and the
        # means2d gradient tap (train_step structure kept identical).
        from wast3d_tpu.ops.image_losses import photometric_loss
        from wast3d_tpu.train import densify as densify_mod
        from wast3d_tpu.train.optim import make_optimizer

        optimizer = make_optimizer(opt, 1.0)

        def make_step(do_adam, do_stats, do_m2d):
            @jax.jit
            def step(state):
                sc = state.scene
                params = sc.params()
                m2d_zero = jnp.zeros((sc.capacity, 2), jnp.float32)

                def loss_fn(p, m2d):
                    s = sc.with_params(p)
                    out = api.render(
                        cam, s, bg, settings=settings0,
                        means2d_offset=m2d if do_m2d else None,
                    )
                    return photometric_loss(
                        out["render"], gt, opt.lambda_dssim
                    ), out

                if do_m2d:
                    (loss, out), (g, gm) = jax.value_and_grad(
                        loss_fn, argnums=(0, 1), has_aux=True
                    )(params, m2d_zero)
                else:
                    (loss, out), g = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params, m2d_zero)
                    gm = m2d_zero
                step_n = state.step + 1
                if do_adam:
                    new_params, new_opt = optimizer.update(
                        g, state.opt_state, params, step_n
                    )
                else:
                    new_params = jax.tree.map(
                        lambda p, gg: p - 1e-12 * gg, params, g
                    )
                    new_opt = state.opt_state
                if do_stats:
                    new_stats = densify_mod.add_stats(
                        state.stats, gm, out["radii"],
                        out["visibility_filter"], w, h,
                    )
                else:
                    new_stats = densify_mod.DensifyStats(
                        state.stats[0] + jnp.sum(gm[::8191]),
                        *state.stats[1:]
                    )
                return R.TrainState(
                    sc.with_params(new_params), new_opt, new_stats, step_n
                )
            return step

        variants = [
            ("full", (True, True, True)),
            ("noadam", (False, True, True)),
            ("nostats", (True, False, True)),
            ("nom2d+nostats", (True, False, False)),
        ]
        for name, flags in variants:
            stepf = make_step(*flags)
            st = R.init_train_state(scene, opt, 1.0)
            st = stepf(st)
            jax.block_until_ready(st.scene.xyz)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st = stepf(st)
            jax.block_until_ready(st.scene.xyz)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"piece[{name:>14s}]: {dt*1e3:8.2f} ms")

    for mode in args.modes.split(","):
        if mode == "-":
            continue
        st = R.init_train_state(scene, opt, 1.0)
        settings = mk_settings(mode)
        t_c0 = time.perf_counter()
        st, _ = R.train_step(st, cam, gt, bg, key, opt_cfg=opt,
                             settings=settings, width=w, height=h,
                             jitter=False)
        jax.block_until_ready(st.scene.xyz)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, _ = R.train_step(st, cam, gt, bg, key, opt_cfg=opt,
                                 settings=settings, width=w, height=h,
                                 jitter=False)
        jax.block_until_ready(st.scene.xyz)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"step[{mode:>18s}]: {dt*1e3:8.2f} ms "
              f"({1/dt:6.2f} steps/s; compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
