"""CLI: data-parallel style sweep (one content x many style clusters).

`python -m wast3d_tpu.cli.sweep --content <ply> --style_clusters a.npz b.npz
 --output_dir out/` — styles shard over the mesh's data axis (BASELINE
config 5)."""

from __future__ import annotations

import argparse
import os


def main() -> None:
    from wast3d_tpu.config import StylizeConfig, add_config_args, extract_config

    parser = argparse.ArgumentParser(description="wast3d_tpu style sweep")
    parser.add_argument("--content", required=True, type=str)
    parser.add_argument("--style_clusters", required=True, nargs="+", type=str)
    parser.add_argument("--output_dir", required=True, type=str)
    parser.add_argument("--data_axis", type=int, default=0,
                        help="mesh data-axis size (0 = all devices)")
    parser.add_argument("--max_style_points", type=int, default=16384)
    parser.add_argument("--seed", type=int, default=0)
    add_config_args(parser, StylizeConfig())
    args = parser.parse_args()
    cfg = extract_config(StylizeConfig, args)

    from wast3d_tpu.utils.cache import enable

    enable()
    import jax

    from wast3d_tpu.parallel.mesh import make_mesh
    from wast3d_tpu.scene.ply import load_ply, save_ply
    from wast3d_tpu.stylize.cluster import load_cluster
    from wast3d_tpu.stylize.sweep import stylize_sweep

    n_dev = len(jax.devices())
    data = args.data_axis or n_dev
    mesh = make_mesh(data, data=data) if data > 1 else None

    content = load_ply(args.content)
    patches = [load_cluster(p) for p in args.style_clusters]
    outs = stylize_sweep(content, patches, cfg=cfg, mesh=mesh, seed=args.seed,
                         max_style_points=args.max_style_points, verbose=True)
    os.makedirs(args.output_dir, exist_ok=True)
    for path, scene in zip(args.style_clusters, outs):
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.output_dir, f"stylized_{name}.ply")
        save_ply(scene, out)
        print(f"-> {out}")


if __name__ == "__main__":
    main()
