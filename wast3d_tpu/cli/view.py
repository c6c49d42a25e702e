"""CLI: interactive web viewer for a trained model.

`python -m wast3d_tpu.cli.view -m <model_path> [--iteration N] [--port P]`

The TPU-native replacement for inspecting a trained scene with the
reference's SIBR desktop viewer (`/root/reference/SIBR_viewers/`):
rendering stays on the accelerator via the production rasterizer; any
browser is the client (drag = orbit, wheel = zoom). See
`viewer/web.py`."""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser(description="wast3d_tpu web viewer")
    ap.add_argument("--model_path", "-m", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--renderer", default="pallas",
                    choices=["pallas", "tiled"])
    ap.add_argument("--fast", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bf16 fast_chain serving mode (default on: "
                         "quality-gated at 0.006 dB vs exact, "
                         "runs/qgate_r4_800_30k*; --no-fast for f32)")
    ap.add_argument("--dup-capacity", type=int, default=1 << 21)
    args = ap.parse_args()

    from wast3d_tpu.ops.rasterizer import api
    from wast3d_tpu.scene.ply import load_ply
    from wast3d_tpu.train.checkpoint import find_max_iteration
    from wast3d_tpu.viewer.web import serve_scene

    it = args.iteration
    if it == -1:
        it = find_max_iteration(args.model_path)
        if it is None:
            raise SystemExit(f"no point_cloud/iteration_* under "
                             f"{args.model_path}")
    ply = os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    scene = load_ply(ply)
    settings = api.RasterizeSettings(
        renderer=args.renderer, dup_capacity=args.dup_capacity,
        fast_chain=args.fast,
    )
    print(f"loaded {ply}")
    serve_scene(scene, port=args.port, settings=settings)


if __name__ == "__main__":
    main()
