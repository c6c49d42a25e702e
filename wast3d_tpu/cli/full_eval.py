"""CLI: full benchmark sweep (train/render/metrics over scene lists).

Equivalent of `/root/reference/full_eval.py` CLI."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description="wast3d_tpu full evaluation")
    parser.add_argument("--mipnerf360", "-m360", type=str, default=None)
    parser.add_argument("--tanksandtemples", "-tat", type=str, default=None)
    parser.add_argument("--deepblending", "-db", type=str, default=None)
    parser.add_argument("--output_path", "-o", type=str, default="./eval")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--scenes", nargs="*", type=str, default=None)
    args = parser.parse_args()

    from wast3d_tpu.eval.full_eval import full_eval

    results = full_eval(
        mipnerf360_dir=args.mipnerf360,
        tanksandtemples_dir=args.tanksandtemples,
        deepblending_dir=args.deepblending,
        output_dir=args.output_path,
        skip_training=args.skip_training,
        skip_rendering=args.skip_rendering,
        skip_metrics=args.skip_metrics,
        scenes=args.scenes,
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
