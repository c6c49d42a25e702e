"""CLI: the full WaSt-3D pipeline in one command.

Equivalent of the reference's shell orchestration
(`/root/reference/scripts/train_style_scenes.sh`,
`cluster_style_scenes.sh` + notebook 11): reconstruct content, reconstruct
style with sphere regularizers, export style clusters, stylize, render a
turntable of the result.

`python -m wast3d_tpu.cli.pipeline --content_data <ds> --style_data <ds>
 --workdir out/ [--style_cluster_index 0] [--styles ...]`
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description="wast3d_tpu full pipeline")
    parser.add_argument("--content_data", required=True, type=str)
    parser.add_argument("--style_data", required=True, type=str)
    parser.add_argument("--workdir", required=True, type=str)
    parser.add_argument("--iterations", type=int, default=30_000)
    parser.add_argument("--num_clusters", type=int, default=100)
    parser.add_argument("--style_cluster_index", type=int, default=0)
    parser.add_argument("--sphere_mode", type=str, default="isotropic",
                        choices=["isotropic", "anisotropic", "anisotropic_simple"])
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--turntable_frames", type=int, default=60)
    parser.add_argument("--devices", type=int, default=1,
                        help="shard the stylization ball-fit axis over "
                             "this many devices")
    parser.add_argument("--skip_recon", action="store_true",
                        help="reuse existing reconstructions in workdir")
    args = parser.parse_args()

    from wast3d_tpu.utils.cache import enable

    enable()

    from wast3d_tpu.config import SphereConfig
    from wast3d_tpu.train.driver import train_scene

    content_dir = os.path.join(args.workdir, "content")
    style_dir = os.path.join(args.workdir, "style")
    content_ply = os.path.join(content_dir, "point_cloud",
                               f"iteration_{args.iterations}", "point_cloud.ply")
    style_ply = os.path.join(style_dir, "point_cloud",
                             f"iteration_{args.iterations}", "point_cloud.ply")

    if not (args.skip_recon and os.path.exists(content_ply)):
        print("== [1/5] content reconstruction ==")
        train_scene(args.content_data, content_dir, iterations=args.iterations,
                    white_background=args.white_background,
                    save_iterations=[args.iterations])
    if not (args.skip_recon and os.path.exists(style_ply)):
        print("== [2/5] style reconstruction (spheres) ==")
        sphere_cfg = (
            SphereConfig() if args.sphere_mode == "isotropic"
            else SphereConfig(anisotropic=True, anisotropy_ratio=1.3,
                              lambda_anisotropy=0.1,
                              lambda_min_scale=0.5 if args.sphere_mode == "anisotropic" else 0.0)
        )
        train_scene(args.style_data, style_dir, iterations=args.iterations,
                    white_background=args.white_background,
                    sphere_cfg=sphere_cfg, save_iterations=[args.iterations])

    print("== [3/5] style cluster export ==")
    from wast3d_tpu.scene.ply import load_ply
    from wast3d_tpu.stylize.cluster import export_clusters, load_cluster

    clusters_dir = os.path.join(args.workdir, "style_clusters")
    style_scene = load_ply(style_ply)
    paths = export_clusters(style_scene, clusters_dir, args.num_clusters)

    print("== [4/5] stylization ==")
    from wast3d_tpu.stylize.pipeline import stylize_scene
    from wast3d_tpu.scene.ply import save_ply

    content_scene = load_ply(content_ply)
    patch = load_cluster(paths[args.style_cluster_index])
    mesh = None
    if args.devices > 1:
        from wast3d_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices, data=args.devices)
    stylized = stylize_scene(content_scene, patch, verbose=True, mesh=mesh)
    out_ply = os.path.join(args.workdir, "stylized.ply")
    save_ply(stylized, out_ply)
    print(f"stylized scene -> {out_ply}")

    print("== [5/5] turntable render ==")
    import numpy as np

    from wast3d_tpu.eval.camera_path import render_path, spiral_path

    xyz = np.asarray(stylized.xyz)[np.asarray(stylized.mask)]
    center = xyz.mean(0)
    radius = float(np.linalg.norm(xyz - center, axis=1).max() * 2.5)
    cams = spiral_path(center, radius, radius * 0.2,
                       num_frames=args.turntable_frames)
    frames = render_path(stylized, cams, os.path.join(args.workdir, "turntable"))
    print(f"{len(frames)} frames -> {os.path.join(args.workdir, 'turntable')}")


if __name__ == "__main__":
    main()
