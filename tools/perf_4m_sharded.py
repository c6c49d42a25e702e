#!/usr/bin/env python
"""BASELINE config-4 measurement: the tile-sharded 4M-Gaussian training
step over an 8-device mesh (VERDICT r3 item 4).

No multi-chip hardware exists in this environment, so this tool does the
two things that CAN be validated here and writes the artifact the scaling
claim rests on:

1. **Collective-volume accounting at the REAL 4M shape**: jit-lower and
   compile `make_tile_sharded_train_step` on a virtual 8-device CPU mesh
   at the true config-4 shape (N=4M, 1296x832), then parse the optimized
   HLO for every collective op (all-to-all / all-gather / all-reduce /
   reduce-scatter / collective-permute) and total the bytes each moves.
   This is the evidence that the design's per-step communication is
   O(dups/P) + O(image), NOT O(N) — the property that makes config 4
   scale.
2. **Executed correctness + step time at a reduced N** (CPU execution of
   a 4M blend is hours; --exec-n defaults to 512k): one compiled step
   actually runs end-to-end on the mesh — shard-local binning, the
   routing all_to_all, owner-side merge sort, blend, backward, Adam.

Output: JSON to stdout + runs/sharded4m/sharded_4m.json with the HLO
collective table, memory analysis, and an ICI-time scaling estimate.

Usage: python tools/perf_4m_sharded.py [--n 4000000] [--exec-n 524288]
           [--devices 8] [--res 1296x832]
(run under JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8;
the tool self-bootstraps a subprocess with those when needed.)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([0-9,]*)\]")
_COLL_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|\S+)\s+"
    r"(all-to-all|all-gather|all-reduce|reduce-scatter|collective-permute)"
    r"(?:-start|-done)?\(", re.MULTILINE)


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def hlo_collectives(hlo_text: str) -> dict:
    """Sum output bytes per collective kind from optimized HLO text.
    `-done` ops are skipped (the paired `-start` already counted)."""
    per_kind: dict[str, dict] = {}
    for m in _COLL_RE.finditer(hlo_text):
        line = hlo_text[m.start():hlo_text.index("\n", m.start())]
        if "-done(" in line:
            continue
        kind = m.group(2)
        nbytes = _shape_bytes(m.group(1))
        d = per_kind.setdefault(kind, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += nbytes
    return per_kind


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--exec-n", type=int, default=131_072)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--res", default="1296x832")
    ap.add_argument("--exec-res", default="648x416",
                    help="resolution for the executed reduced-N step "
                         "(CPU-interpret blend is slow; the 4M-shape leg "
                         "above is compile-only)")
    ap.add_argument("--dup-mult", type=int, default=5)
    ap.add_argument("--scale-table", default="2,4,8",
                    help="comma-separated device counts for the compile-"
                         "only collective/memory scaling table ('' to "
                         "skip)")
    ap.add_argument("--out", default="runs/sharded4m")
    args = ap.parse_args()

    import jax

    if os.environ.get("WAST3D_FORCE_CPU"):
        # The axon plugin overrides JAX_PLATFORMS env; only the config
        # call sticks (verify-skill gotcha).
        jax.config.update("jax_platforms", "cpu")

    if len(jax.devices()) < args.devices or jax.default_backend() != "cpu":
        if os.environ.get("WAST3D_FORCE_CPU"):
            # Fork-bomb fuse: we ARE the bootstrap child and still don't
            # see the virtual mesh — config problem, do not re-exec.
            raise SystemExit(
                f"bootstrap failed: backend={jax.default_backend()} "
                f"devices={len(jax.devices())}")
        # Self-bootstrap a virtual CPU mesh subprocess (same pattern as
        # __graft_entry__._bootstrap_virtual_devices).
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        env["WAST3D_FORCE_CPU"] = "1"
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env).returncode)

    import jax.numpy as jnp

    import bench as bench_mod
    from wast3d_tpu.config import OptimizationConfig
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import api
    from wast3d_tpu.parallel.mesh import make_mesh
    from wast3d_tpu.parallel.train_sharded import (
        init_sharded, make_tile_sharded_train_step)

    w, h = (int(x) for x in args.res.split("x"))
    mesh = make_mesh(args.devices, data=1)
    cfg = OptimizationConfig()
    cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=0.9, fovy=0.9, width=w, height=h)
    bg = jnp.zeros(3)
    res: dict = {"n": args.n, "devices": args.devices, "res": args.res}

    # --- 1. compile-only at the true config-4 shape ---
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wast3d_tpu.train import reconstruct as R

    n = args.n
    settings = api.RasterizeSettings(
        renderer="pallas", dup_capacity=args.dup_mult * n, max_per_tile=1024,
        chunk=32, pallas_interpret=True, grad_reduce="segsum",
    )

    def compile_leg(leg_mesh):
        """Lower+compile the step at the full-N shape on `leg_mesh`;
        return (collective table, memory analysis dict)."""
        step = make_tile_sharded_train_step(leg_mesh, cfg, settings)
        t0 = time.time()
        with leg_mesh:
            # Abstract TrainState at the full 4M shape: build a tiny
            # state, then scale every capacity-axis leaf to n as
            # ShapeDtypeStructs with the real shardings (no 4M host
            # materialization needed).
            tiny_cap = 64
            tiny = bench_mod._build(tiny_cap, cap=tiny_cap)
            st_tiny = jax.eval_shape(
                lambda: R.init_train_state(tiny, cfg, 1.0))
            row = NamedSharding(leg_mesh, P("model"))
            rep = NamedSharding(leg_mesh, P())

            def scale(x):
                if x.ndim >= 1 and x.shape[0] == tiny_cap:
                    return jax.ShapeDtypeStruct((n,) + x.shape[1:], x.dtype,
                                                sharding=row)
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep)

            state_shape = jax.tree.map(scale, st_tiny)
            gt_shape = jax.ShapeDtypeStruct((h, w, 3), jnp.float32,
                                            sharding=rep)
            lowered = step.lower(state_shape, cam, gt_shape, bg)
            compiled = lowered.compile()
            p = len(leg_mesh.devices.flatten())
            print(f"# compiled {n // 10**6}M step on {p} devices in "
                  f"{time.time() - t0:.0f}s", file=sys.stderr)
        coll = hlo_collectives(compiled.as_text())
        try:
            ma = compiled.memory_analysis()
            mem = {
                "argument_size_mb": round(
                    ma.argument_size_in_bytes / 2**20, 1),
                "output_size_mb": round(ma.output_size_in_bytes / 2**20, 1),
                "temp_size_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            }
        except Exception as e:  # noqa: BLE001 - backend-dependent API
            mem = str(e)[:200]
        return coll, mem

    coll, mem = compile_leg(mesh)
    res["hlo_collectives_4m"] = coll
    res["memory_analysis_4m"] = mem

    total_coll_gb = sum(d["bytes"] for d in coll.values()) / 2**30
    scene_gb = n * (3 + 48 + 3 + 4 + 1) * 4 / 2**30  # param floats per row
    res["collective_total_gb_per_step"] = round(total_coll_gb, 3)
    res["scene_param_gb"] = round(scene_gb, 3)
    # Scaling estimate: v5p ICI ~90 GB/s per direction per link (public
    # "How to Scale Your Model" figures class); collectives here are
    # image- and dup-sized, so ICI time per step ~ bytes / (P * 90e9).
    ici_bw = 90e9
    res["ici_time_est_ms_v5p8"] = round(
        sum(d["bytes"] for d in coll.values()) / (args.devices * ici_bw)
        * 1e3, 3)

    # --- 1b. device-count scaling table (compile-only): collective
    # bytes + per-device temp memory at P=2/4/8. The design claim is
    # per-step comms O(dups/P)+O(halo) and per-device memory ~O(N/P);
    # this table is the virtual-mesh evidence.
    if args.scale_table:
        table = {}
        for d in (int(x) for x in args.scale_table.split(",")):
            if d == args.devices:
                c, m = coll, mem
            else:
                c, m = compile_leg(make_mesh(d, data=1))
            table[str(d)] = {
                "collective_total_mb": round(
                    sum(v["bytes"] for v in c.values()) / 2**20, 1),
                "collectives": c,
                "temp_size_mb": (m.get("temp_size_mb")
                                 if isinstance(m, dict) else m),
                "argument_size_mb": (m.get("argument_size_mb")
                                     if isinstance(m, dict) else None),
            }
        res["scaling_table"] = table

    # --- 2. executed step at reduced N ---
    n2 = args.exec_n
    w2, h2 = (int(x) for x in args.exec_res.split("x"))
    cam2 = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                          fovx=0.9, fovy=0.9, width=w2, height=h2)
    settings2 = api.RasterizeSettings(
        renderer="pallas", dup_capacity=args.dup_mult * n2,
        max_per_tile=1024, chunk=32, pallas_interpret=True,
        grad_reduce="segsum",
    )
    step2 = make_tile_sharded_train_step(mesh, cfg, settings2)
    scene2 = bench_mod._build(n2, cap=n2)
    with mesh:
        st = init_sharded(scene2, cfg, mesh)
        gt = jnp.zeros((h2, w2, 3), jnp.float32)
        t0 = time.time()
        st, aux = step2(st, cam2, gt, bg)
        jax.block_until_ready(aux["loss"])
        res["exec_n"] = n2
        res["exec_res"] = args.exec_res
        res["exec_first_step_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        st, aux = step2(st, cam2, gt, bg)
        jax.block_until_ready(aux["loss"])
        res["exec_warm_step_s"] = round(time.time() - t0, 1)
        res["exec_loss_finite"] = bool(np.isfinite(float(aux["loss"])))
        res["exec_overflow"] = bool(aux["overflow"])

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "sharded_4m.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
