"""CLI: batch-render train/test sets from a trained model.

`python -m wast3d_tpu.cli.render -m <model_path> [--iteration N]`
Equivalent of `/root/reference/render.py:44-65` (reads the saved
`cfg_args` to recover source path like `get_combined_args`)."""

from __future__ import annotations

import argparse

from wast3d_tpu.config import load_cfg_args


def main() -> None:
    parser = argparse.ArgumentParser(description="wast3d_tpu render")
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--source_path", "-s", type=str, default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--resolution", "-r", type=int, default=-1)
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--fast", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="bf16 fast_chain serving kernels (default on: "
                             "end-to-end 30k/800^2 gate showed 0.006 dB "
                             "PSNR delta vs exact, runs/qgate_r4_800_30k*; "
                             "--no-fast for the f32 training tier)")
    parser.add_argument("--batch", type=int, default=1,
                        help="cameras per dispatch (render_batch)")
    parser.add_argument("--autoplan", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="tune the emission plan + duplicate capacity "
                             "to the scene's measured straddle histogram "
                             "at load (ops/rasterizer/autoplan.py); "
                             "overflowing views fall back to the "
                             "conservative defaults automatically")
    args = parser.parse_args()

    source = args.source_path
    white_bg = args.white_background
    cfg = load_cfg_args(args.model_path)
    if cfg is not None:
        source = source or getattr(cfg, "source_path", None)
        white_bg = white_bg or getattr(cfg, "white_background", False)
    if not source:
        parser.error("--source_path required (no cfg_args found)")

    from wast3d_tpu.eval.render_sets import render_sets
    from wast3d_tpu.ops.rasterizer import api

    render_sets(
        args.model_path, source, iteration=args.iteration,
        skip_train=args.skip_train, skip_test=args.skip_test,
        white_background=white_bg, resolution=args.resolution,
        settings=api.RasterizeSettings(
            renderer="pallas", dup_capacity=1 << 21,
            fast_chain=args.fast,
        ),
        batch=args.batch,
        autoplan=args.autoplan,
    )


if __name__ == "__main__":
    main()
