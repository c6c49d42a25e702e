"""Reconstruction quality gate: full training loop -> held-out PSNR.

The reference's implicit quality bar is reproducing 3DGS PSNR at 7k/30k
on real scenes (`/root/reference/full_eval.py:67-68`, `metrics.py:71-83`).
No reference-class capture datasets ship in this environment, so this
gate builds a *consistent 3D scene* the honest way: a procedural
ground-truth Gaussian scene is rendered from many viewpoints (novel-view
geometry included), the training pipeline then reconstructs it FROM
RANDOM INIT — exercising densify/clone/split/prune, the LR schedule, SH
warm-up, opacity resets, capacity growth — and held-out views score
PSNR. A reconstruction-capable pipeline must recover the scene; any
regression in the rasterizer VJP, densification logic, or schedules
shows up as a PSNR drop on views it never trained on.

Usage:  python tools/quality_gate.py [--iters 7000] [--out runs/qgate]
Writes <out>/quality_gate.json {psnr_test, psnr_train, iters, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _enable_cache():
    import jax

    if os.environ.get("WAST3D_FORCE_CPU"):
        # CPU fallback for tunnel outages / A-B runs without the chip.
        # Env JAX_PLATFORMS=cpu alone is overridden by the axon plugin;
        # the config update post-import is what sticks (conftest.py).
        jax.config.update("jax_platforms", "cpu")
        # No persistent cache on CPU: foreign-host CPU AOT entries abort
        # on deserialize (utils/cache.enable doc).
        return
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _gt_arrays(n_blobs=60, pts_per_blob=150, seed=3, detail=False):
    """Raw GT splat arrays. `detail=True` makes the scene high-frequency
    the way real captures are (independent per-point colors, tighter
    splats): a reconstruction then NEEDS hundreds of thousands of small
    splats, which is what drives densification into the reference's
    config-2/3 N range at default thresholds."""
    rng = np.random.default_rng(seed)
    xyz, rgb, scal = [], [], []
    for _ in range(n_blobs):
        c = rng.normal(size=3)
        c = c / np.linalg.norm(c) * rng.uniform(0.5, 1.0)
        color = rng.uniform(0.1, 0.95, 3)
        sigma = rng.uniform(0.008, 0.035) if detail else rng.uniform(0.02, 0.08)
        p = c + rng.normal(size=(pts_per_blob, 3)) * sigma
        xyz.append(p)
        if detail:
            rgb.append(rng.uniform(0.05, 0.95, (pts_per_blob, 3)))
            scal.append(np.full((pts_per_blob, 3), sigma * 0.35))
        else:
            rgb.append(np.tile(color, (pts_per_blob, 1))
                       * rng.uniform(0.7, 1.3, (pts_per_blob, 1)).clip(0, 1))
            scal.append(np.full((pts_per_blob, 3), sigma * 0.6))
    xyz = np.concatenate(xyz).astype(np.float32)
    rgb = np.clip(np.concatenate(rgb), 0, 1).astype(np.float32)
    scal = np.log(np.concatenate(scal)).astype(np.float32)
    return xyz, rgb, scal


def make_gt_scene(n_blobs=60, pts_per_blob=150, seed=3, detail=False):
    """Procedural ground truth: colored Gaussian blobs on and inside a
    sphere shell — enough structure that reconstruction needs thousands
    of well-placed splats."""
    import jax.numpy as jnp

    from wast3d_tpu.core.sh import rgb_to_sh
    from wast3d_tpu.core.transforms import inverse_sigmoid
    from wast3d_tpu.scene import gaussians as G

    xyz, rgb, scal = _gt_arrays(n_blobs, pts_per_blob, seed, detail)
    n = len(xyz)
    return G.from_arrays(
        xyz=xyz,
        features_dc=np.asarray(rgb_to_sh(jnp.asarray(rgb)))[:, None, :],
        features_rest=np.zeros((n, 15, 3), np.float32),
        scaling=scal,
        rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        opacity=np.asarray(inverse_sigmoid(jnp.full((n, 1), 0.92))),
        capacity=n,
    )


def make_dataset(root, res=400, n_train=40, n_test=5, n_blobs=60,
                 pts_per_blob=150, detail=False, init_gt=False):
    """Render the GT scene into a Blender-format dataset (train +
    transforms_test.json held-out views).

    `init_gt=True` writes the (jittered) GT point cloud as points3d.ply —
    the analogue of the reference's COLMAP/SfM initialization
    (`scene/dataset_readers.py` fetchPly path): real runs start from
    structure-bearing points, not a random cube, and their final N scales
    from that seeding."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from wast3d_tpu.core.camera import make_camera
    from wast3d_tpu.ops.rasterizer import api

    scene = make_gt_scene(n_blobs=n_blobs, pts_per_blob=pts_per_blob,
                          detail=detail)
    settings = api.RasterizeSettings(
        renderer="pallas", dup_capacity=1 << 20, phase_a_tiles=16,
        pallas_interpret=bool(os.environ.get("WAST3D_FORCE_CPU")),
    )
    os.makedirs(root, exist_ok=True)
    if init_gt:
        from wast3d_tpu.scene.datasets import store_ply_points

        xyz, rgb, _ = _gt_arrays(n_blobs, pts_per_blob, detail=detail)
        rng = np.random.default_rng(11)
        store_ply_points(
            os.path.join(root, "points3d.ply"),
            xyz + rng.normal(size=xyz.shape).astype(np.float32) * 0.01,
            np.clip(rgb + rng.normal(size=rgb.shape) * 0.1, 0, 1) * 255,
        )
    fovx = 0.8

    @jax.jit
    def render(cam_scene, camera):
        return api.render(camera, cam_scene, jnp.zeros(3),
                          settings=settings)["render"]

    def pose(i, total, phase):
        th = 2 * np.pi * i / total + phase
        el = 0.35 * np.sin(3 * th + phase)
        eye = 4.0 * np.array([np.cos(th) * np.cos(el), np.sin(el),
                              np.sin(th) * np.cos(el)])
        # c2w with -z forward toward origin, y up (Blender convention).
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = eye
        return c2w

    def write_split(name, count, phase):
        frames = []
        for i in range(count):
            c2w = pose(i, count, phase)
            # Blender->COLMAP the way our loader does it (flip y,z cols).
            c2w_cv = c2w.copy()
            c2w_cv[:3, 1:3] *= -1
            w2c = np.linalg.inv(c2w_cv)
            R = w2c[:3, :3].T
            t = w2c[:3, 3]
            cam = make_camera(R, t, fovx=fovx, fovy=fovx, width=res,
                              height=res)
            img = np.asarray(render(scene, cam))
            rgba = np.concatenate(
                [np.clip(img, 0, 1), np.ones((res, res, 1))], -1)
            fname = f"{name}_{i}"
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(root, f"{fname}.png"))
            frames.append({"file_path": f"./{fname}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(root, f"transforms_{name}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    write_split("train", n_train, 0.0)
    write_split("test", n_test, 0.123)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--res", type=int, default=400)
    ap.add_argument("--blobs", type=int, default=60,
                    help="GT scene complexity (reconstruction N scales "
                         "with it; 300+ drives N past 200k)")
    ap.add_argument("--pts", type=int, default=150, help="points per blob")
    ap.add_argument("--views", type=int, default=40, help="training views")
    ap.add_argument("--detail", action="store_true",
                    help="high-frequency GT (per-point colors, small "
                         "splats) — drives reconstruction N into the "
                         "reference's config-2/3 range")
    ap.add_argument("--init-gt", action="store_true",
                    help="seed points3d.ply from jittered GT points "
                         "(the COLMAP/SfM-init analogue)")
    ap.add_argument("--fast-chain", action="store_true",
                    help="train with the bf16 fast_chain blend kernels "
                         "(quality-gates the approximate mode)")
    ap.add_argument("--out", default="runs/qgate")
    ap.add_argument("--data", default=None, help="reuse an existing dataset")
    ap.add_argument("--log-every", type=int, default=500)
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent compile cache")
    ap.add_argument("--densify-grad-scale", type=float, default=1.0,
                    help="multiply densify_grad_threshold by this "
                         "(0.5 = double the densification budget; the "
                         "r5 capacity-vs-scene-difficulty ablation)")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing chkpnt* in the model dir "
                         "(default: resume from the latest)")
    args = ap.parse_args()
    if args.no_cache:
        # Authoritative: utils/cache.enable honors this env var, so the
        # module-level _enable_cache() in train.driver (imported below)
        # cannot silently re-enable the cache (round-3 advisor finding).
        os.environ["WAST3D_NO_CACHE"] = "1"
    else:
        _enable_cache()

    import jax.numpy as jnp

    from wast3d_tpu.config import OptimizationConfig
    from wast3d_tpu.ops.image_losses import psnr
    from wast3d_tpu.ops.rasterizer import api
    from wast3d_tpu.scene.datasets import build_cameras, load_scene_info
    from wast3d_tpu.train.driver import train_scene

    t0 = time.time()
    data = args.data or os.path.join(args.out, "data")
    if not os.path.exists(os.path.join(data, "transforms_train.json")):
        make_dataset(data, res=args.res, n_train=args.views,
                     n_blobs=args.blobs, pts_per_blob=args.pts,
                     detail=args.detail, init_gt=args.init_gt)
        print(f"dataset rendered ({time.time() - t0:.0f}s)")

    model = os.path.join(args.out, "model")
    opt = OptimizationConfig(
        iterations=args.iters,
        position_lr_max_steps=args.iters,
        densify_until_iter=args.iters // 2,
    )
    if args.densify_grad_scale != 1.0:
        opt = opt.__class__(**{**opt.__dict__,
            "densify_grad_threshold":
                opt.densify_grad_threshold * args.densify_grad_scale})
    # Duplicate budget ~5x the initial point count (measured dup/N at the
    # gate scenes is ~3-4): avoids the first few overflow->grow recompiles
    # when seeding from a large GT point cloud.
    n0 = args.blobs * args.pts if args.init_gt else 100_000
    settings = api.RasterizeSettings(
        renderer="pallas",
        dup_capacity=max(1 << 20, 1 << (5 * n0 - 1).bit_length()),
        phase_a_tiles=16,
        fast_chain=args.fast_chain,
        pallas_interpret=bool(os.environ.get("WAST3D_FORCE_CPU")),
    )
    # Periodic checkpoints + resume: the TPU tunnel dies mid-run often
    # enough (twice on 8/19 alone) that losing a 2h 30k gate to an
    # outage is the common case, not the exception.
    ck_step = max(1000, args.iters // 6)
    ckpts = list(range(ck_step, args.iters, ck_step))
    start_ckpt = None
    if not args.fresh:
        import glob as _glob

        found = sorted(
            _glob.glob(os.path.join(model, "chkpnt*")),
            key=lambda p: int("".join(filter(str.isdigit,
                                             os.path.basename(p))) or 0),
        )
        if found:
            start_ckpt = found[-1]
            print(f"resuming from {start_ckpt}")
    t_train0 = time.time()
    trainer = train_scene(
        source_path=data, model_path=model, iterations=args.iters,
        eval_split=True, save_iterations=[args.iters],
        checkpoint_iterations=ckpts, start_checkpoint=start_ckpt,
        opt_cfg=opt, settings=settings, quiet=True,
        log_every=args.log_every,
    )
    train_wall = time.time() - t_train0
    print(f"trained {args.iters} iters ({time.time() - t0:.0f}s), "
          f"N={int(trainer.state.scene.num_active)}")

    # Held-out PSNR through the trained scene.
    info = load_scene_info(data, eval_split=True)
    res = {}
    for split, cams_info in (("test", info.test_cameras),
                             ("train", info.train_cameras[:5])):
        vals = []
        for cam, gt in build_cameras(cams_info):
            out = api.render(cam, trainer.state.scene, jnp.zeros(3),
                             settings=trainer.settings)
            vals.append(float(psnr(out["render"], gt)))
        res[f"psnr_{split}"] = round(float(np.mean(vals)), 3)
    res.update(iters=args.iters, res=args.res, blobs=args.blobs,
               pts=args.pts, detail=args.detail, init_gt=args.init_gt,
               fast_chain=args.fast_chain,
               densify_grad_scale=args.densify_grad_scale,
               n_gaussians=int(trainer.state.scene.num_active),
               wall_s=round(time.time() - t0, 1),
               train_wall_s=round(train_wall, 1),
               steps_per_s=round(args.iters / train_wall, 2),
               events=[h for h in trainer.history if "event" in h][-20:])
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "quality_gate.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "events"}))


if __name__ == "__main__":
    main()
