"""CLI: photometric reconstruction training.

`python -m wast3d_tpu.cli.train -s <source> -m <model_path> [...]`

Flag-compatible with the reference `train.py:217-244` CLI (same flag
names/defaults via the shared config groups). `--sphere_mode
{none,isotropic,anisotropic,anisotropic_simple}` folds the reference's
`train_spheres*.py` variants into one entry point.
"""

from __future__ import annotations

import argparse

from wast3d_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    SphereConfig,
    add_config_args,
    extract_config,
)


def main() -> None:
    parser = argparse.ArgumentParser(description="wast3d_tpu training")
    add_config_args(parser, ModelConfig(), OptimizationConfig(), PipelineConfig())
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--sphere_mode", type=str, default="none",
                        choices=["none", "isotropic", "anisotropic",
                                 "anisotropic_simple"])
    parser.add_argument("--renderer", type=str, default="pallas",
                        choices=["pallas", "tiled", "oracle"])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    model = extract_config(ModelConfig, args)
    opt = extract_config(OptimizationConfig, args)

    sphere_cfg = None
    if args.sphere_mode == "isotropic":
        sphere_cfg = SphereConfig()
    elif args.sphere_mode == "anisotropic":
        sphere_cfg = SphereConfig(anisotropic=True, anisotropy_ratio=1.3,
                                  lambda_anisotropy=0.1, lambda_min_scale=0.5)
    elif args.sphere_mode == "anisotropic_simple":
        sphere_cfg = SphereConfig(anisotropic=True, anisotropy_ratio=1.3,
                                  lambda_anisotropy=0.1, lambda_min_scale=0.0)

    from wast3d_tpu.ops.rasterizer.api import RasterizeSettings
    from wast3d_tpu.train.driver import train_scene
    from wast3d_tpu.viewer import network_gui

    gui = network_gui.maybe_start(args.ip, args.port)
    try:
        train_scene(
            source_path=model.source_path,
            model_path=model.model_path,
            images=model.images,
            resolution=model.resolution,
            iterations=opt.iterations,
            eval_split=model.eval,
            white_background=model.white_background,
            sh_degree=model.sh_degree,
            save_iterations=args.save_iterations,
            checkpoint_iterations=args.checkpoint_iterations,
            start_checkpoint=args.start_checkpoint,
            opt_cfg=opt,
            sphere_cfg=sphere_cfg,
            settings=RasterizeSettings(renderer=args.renderer),
            seed=args.seed,
            quiet=args.quiet,
            gui=gui,
            data_device=model.data_device,
        )
    finally:
        if gui:
            gui.stop()


if __name__ == "__main__":
    main()
