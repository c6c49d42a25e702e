"""CLI: scene-to-scene stylization (the notebook-11 pipeline as a command).

`python -m wast3d_tpu.cli.stylize --content <ply> --style_cluster <npz>
 --output <ply>`"""

from __future__ import annotations

import argparse
import dataclasses


def main() -> None:
    from wast3d_tpu.config import StylizeConfig, add_config_args, extract_config

    parser = argparse.ArgumentParser(description="wast3d_tpu stylization")
    parser.add_argument("--content", required=True, type=str,
                        help="content scene PLY (trained 3DGS)")
    parser.add_argument("--style_cluster", required=True, type=str,
                        help="style patch npz (from cli.save_clusters)")
    parser.add_argument("--output", required=True, type=str)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_style_points", type=int, default=16384)
    parser.add_argument("--devices", type=int, default=1,
                        help="shard the ball-fit axis over this many "
                             "devices (1 = single device)")
    add_config_args(parser, StylizeConfig())
    args = parser.parse_args()
    cfg = extract_config(StylizeConfig, args)

    from wast3d_tpu.utils.cache import enable

    enable()
    from wast3d_tpu.stylize.pipeline import stylize_from_files

    mesh = None
    if args.devices > 1:
        from wast3d_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices, data=args.devices)
    stylize_from_files(
        args.content, args.style_cluster, args.output, cfg=cfg,
        seed=args.seed, batch_size=args.batch_size, verbose=True,
        max_style_points=args.max_style_points, mesh=mesh,
    )


if __name__ == "__main__":
    main()
