"""CLI: K-means cluster a trained style scene and export patch npz files.

Equivalent of `/root/reference/aux_save_clusters_clean.py:171-183`
(`--ckpt_path --output_dir --num_clusters`). Accepts either a PLY or an
orbax checkpoint directory."""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description="export style clusters")
    parser.add_argument("--ckpt_path", required=True, type=str,
                        help="scene PLY or orbax checkpoint dir")
    parser.add_argument("--output_dir", required=True, type=str)
    parser.add_argument("--num_clusters", type=int, default=100)
    parser.add_argument("--n_init", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from wast3d_tpu.utils.cache import enable

    enable()
    from wast3d_tpu.stylize.cluster import export_clusters

    if args.ckpt_path.endswith(".ply"):
        from wast3d_tpu.scene.ply import load_ply

        scene = load_ply(args.ckpt_path)
    else:
        from wast3d_tpu.train.checkpoint import load_checkpoint

        state, _ = load_checkpoint(args.ckpt_path)
        scene = state.scene
    paths = export_clusters(scene, args.output_dir, args.num_clusters,
                            n_init=args.n_init, seed=args.seed)
    print(f"wrote {len(paths)} clusters to {args.output_dir}")


if __name__ == "__main__":
    main()
