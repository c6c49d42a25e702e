"""End-to-end driver tests: train_scene on synthetic Blender and COLMAP
fixtures (the two dataset dispatch branches, `scene/__init__.py:43-49`
in the reference)."""

import json
import os

import numpy as np
import pytest

from tests.test_datasets_eval import _make_blender_fixture, _make_colmap_fixture


def test_train_scene_blender(tmp_path):
    from wast3d_tpu.config import OptimizationConfig
    from wast3d_tpu.ops.rasterizer.api import RasterizeSettings
    from wast3d_tpu.scene.ply import load_ply
    from wast3d_tpu.train.driver import train_scene

    src = str(tmp_path / "scene")
    _make_blender_fixture(src)
    # Shrink the default random cloud for CPU speed.
    from wast3d_tpu.scene.datasets import store_ply_points

    rng = np.random.default_rng(0)
    store_ply_points(os.path.join(src, "points3d.ply"),
                     rng.uniform(-1, 1, (200, 3)),
                     rng.uniform(0, 255, (200, 3)))

    model = str(tmp_path / "model")
    trainer = train_scene(
        source_path=src,
        model_path=model,
        iterations=30,
        save_iterations=[20, 30],
        checkpoint_iterations=[30],
        opt_cfg=OptimizationConfig(iterations=30, densify_from_iter=10**9),
        settings=RasterizeSettings(renderer="tiled", dup_capacity=1 << 12,
                                   max_per_tile=128, chunk=16),
        quiet=True,
    )
    assert int(trainer.state.step) == 30
    # PLY artifacts at the reference layout.
    ply = os.path.join(model, "point_cloud", "iteration_30", "point_cloud.ply")
    assert os.path.exists(ply)
    scene = load_ply(ply)
    assert int(scene.num_active) == 200
    # cfg_args readable.
    from wast3d_tpu.config import load_cfg_args

    cfg = load_cfg_args(model)
    assert cfg.sh_degree == 3
    # log written with psnr entries.
    log = [json.loads(l) for l in open(os.path.join(model, "log.jsonl"))]
    assert any("psnr_train" in e for e in log)
    # checkpoint restorable and resumes.
    from wast3d_tpu.train.checkpoint import load_checkpoint

    state2, slr = load_checkpoint(os.path.join(model, "chkpnt30"))
    assert int(state2.step) == 30
    assert slr > 0


def test_train_scene_colmap(tmp_path):
    """train_scene end-to-end over the COLMAP ingestion branch: binary
    sparse/0 model -> SfM-point init (KNN scales) -> llffhold eval split
    -> train + held-out eval + PLY save."""
    from wast3d_tpu.config import OptimizationConfig
    from wast3d_tpu.ops.rasterizer.api import RasterizeSettings
    from wast3d_tpu.scene.ply import load_ply
    from wast3d_tpu.train.driver import train_scene

    src = str(tmp_path / "scene")
    _make_colmap_fixture(src)

    model = str(tmp_path / "model")
    trainer = train_scene(
        source_path=src,
        model_path=model,
        iterations=20,
        save_iterations=[20],
        eval_split=True,  # llffhold=8: 1 of the 4 cams held out
        opt_cfg=OptimizationConfig(iterations=20, densify_from_iter=10**9),
        settings=RasterizeSettings(renderer="tiled", dup_capacity=1 << 12,
                                   max_per_tile=128, chunk=16),
        quiet=True,
    )
    assert int(trainer.state.step) == 20
    ply = os.path.join(model, "point_cloud", "iteration_20",
                       "point_cloud.ply")
    scene = load_ply(ply)
    assert int(scene.num_active) == 50  # the fixture's SfM points
    assert np.isfinite(np.asarray(scene.xyz)[np.asarray(scene.mask)]).all()
    log = [json.loads(l) for l in open(os.path.join(model, "log.jsonl"))]
    assert any("psnr_test" in e for e in log)  # held-out eval ran
