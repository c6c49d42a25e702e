"""Full evaluation harness: train -> render -> metrics over scene lists.

Equivalent of `/root/reference/full_eval.py:15-75`: the standard 3DGS
benchmark sweep over MipNeRF-360 (outdoor/indoor), Tanks&Temples, and
DeepBlending scenes, training each to 30k iterations with eval split,
rendering iterations 7000 and 30000, and running the metrics harness.
Runs in-process (no os.system shelling like the reference)."""

from __future__ import annotations

import os
from typing import List, Optional

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]

EVAL_ITERATIONS = (7000, 30000)


def run_training(source: str, model_path: str, images: str = "images",
                 resolution: int = -1, iterations: int = 30000,
                 quiet: bool = True) -> None:
    from wast3d_tpu.train.driver import train_scene

    train_scene(
        source_path=source, model_path=model_path, images=images,
        resolution=resolution, iterations=iterations, eval_split=True,
        save_iterations=list(EVAL_ITERATIONS), quiet=quiet,
    )


def full_eval(
    mipnerf360_dir: Optional[str] = None,
    tanksandtemples_dir: Optional[str] = None,
    deepblending_dir: Optional[str] = None,
    output_dir: str = "./eval",
    skip_training: bool = False,
    skip_rendering: bool = False,
    skip_metrics: bool = False,
    scenes: Optional[List[str]] = None,
) -> dict:
    from wast3d_tpu.eval.metrics import evaluate
    from wast3d_tpu.eval.render_sets import render_sets

    jobs = []  # (scene_name, source_path, images_arg, resolution)
    if mipnerf360_dir:
        for s in MIPNERF360_OUTDOOR:
            jobs.append((s, os.path.join(mipnerf360_dir, s), "images_4", -1))
        for s in MIPNERF360_INDOOR:
            jobs.append((s, os.path.join(mipnerf360_dir, s), "images_2", -1))
    if tanksandtemples_dir:
        for s in TANKS_AND_TEMPLES:
            jobs.append((s, os.path.join(tanksandtemples_dir, s), "images", -1))
    if deepblending_dir:
        for s in DEEP_BLENDING:
            jobs.append((s, os.path.join(deepblending_dir, s), "images", -1))
    if scenes:
        jobs = [j for j in jobs if j[0] in scenes]

    model_paths = []
    for name, source, images, resolution in jobs:
        model_path = os.path.join(output_dir, name)
        model_paths.append(model_path)
        if not skip_training:
            run_training(source, model_path, images, resolution)
        if not skip_rendering:
            for it in EVAL_ITERATIONS:
                render_sets(model_path, source, iteration=it, skip_train=True)
    if not skip_metrics:
        return evaluate(model_paths)
    return {}
