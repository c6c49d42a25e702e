"""Configuration dataclasses with CLI parity to the reference.

The reference uses reflection-based ParamGroups feeding argparse
(`/root/reference/arguments/__init__.py:19-111`). We keep the same three
groups, field names, and defaults so command lines and saved `cfg_args`
remain interchangeable, but as plain dataclasses with explicit argparse
wiring and a `to_cfg_args`/`from_cfg_args` round-trip.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field, fields
from typing import Any, Optional


@dataclass(frozen=True)
class ModelConfig:
    """Reference `ModelParams` (`arguments/__init__.py:47-62`)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = False


@dataclass(frozen=True)
class PipelineConfig:
    """Reference `PipelineParams` (`arguments/__init__.py:64-69`).

    `convert_SHs_python` / `compute_cov3D_python` toggle precomputed
    color/covariance paths into the rasterizer (semantics preserved even
    though on TPU both paths are jitted jnp either way)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass(frozen=True)
class OptimizationConfig:
    """Reference `OptimizationParams` (`arguments/__init__.py:71-89`)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.1
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 30_000
    densify_grad_threshold: float = 0.0002


@dataclass(frozen=True)
class SphereConfig:
    """Style-scene sphere regularizer weights.

    Reference: isotropy/uniformity weights hardcoded 1e-1/1e-2 in
    `train_spheres.py:107-127`; anisotropic hinge in
    `train_spheres_anisotropic.py:97-145`."""

    lambda_isotropy: float = 0.1
    lambda_uniformity: float = 0.01
    anisotropic: bool = False
    anisotropy_ratio: float = 2.0
    lambda_anisotropy: float = 0.1
    min_scale: float = 0.0
    lambda_min_scale: float = 0.0


@dataclass(frozen=True)
class StylizeConfig:
    """WaSt-3D stylization pipeline knobs (notebook 11 defaults).

    Reference: content clusters / outlier quantile / subsample from
    `notebooks/11.fit_cluster_to_the_full_scene.ipynb` cells 5-6; ball
    radius factor and minimum ball size cell 21-22; descriptor scales,
    Adam steps/lr, loss weights cell 28; merge scale factor cell 36."""

    num_content_clusters: int = 80
    outlier_quantile: float = 0.975
    outlier_knn: int = 30
    ball_radius_factor: float = 0.45
    min_ball_points: int = 40
    fit_steps: int = 1000
    fit_lr: float = 1e-3
    global_knn: int = 2000
    global_stride: int = 20
    local_knn: int = 100
    domain_knn: int = 20
    w_global: float = 1.0
    w_local: float = 2e2
    w_domain: float = 3e1
    w_coverage: float = 0.0  # loss_domain_coverage weight (multi-cluster nb)
    merge_scale_factor: float = 0.885
    ball_capacity: int = 2048  # static padded points per coverage ball
    max_balls: int = 512  # static upper bound on coverage balls
    desc_block: int = 2048  # descriptor-loss column block (memory knob)
    # Fused Pallas descriptor-loss kernel (stylize/desc_kernel.py): ~2x on
    # large patches vs the streaming XLA path, costs an [Mp, Mp] uint8
    # pair-code matrix in HBM. Production default; auto-applied when the
    # padded patch is >= 2048 points (below that the streaming path wins)
    # and the backend is TPU. Disable for A/B parity runs.
    desc_kernel: bool = True
    pallas_interpret: bool = False  # run stylize kernels interpreted (CPU)


_GROUPS = {
    "model": ModelConfig,
    "pipeline": PipelineConfig,
    "optimization": OptimizationConfig,
    "sphere": SphereConfig,
    "stylize": StylizeConfig,
}

# Fields that get single-letter shorthands in the reference CLI
# (leading-underscore fields in `arguments/__init__.py:30-36`).
_SHORTHANDS = {
    "source_path": "-s",
    "model_path": "-m",
    "images": "-i",
    "resolution": "-r",
    "white_background": "-w",
}


def add_config_args(parser: argparse.ArgumentParser, *configs: Any) -> None:
    """Register dataclass fields as --flags (reference ParamGroup.__init__)."""
    for cfg in configs:
        for f in fields(cfg):
            flag = f"--{f.name}"
            names = [flag]
            if f.name in _SHORTHANDS:
                names.append(_SHORTHANDS[f.name])
            default = getattr(cfg, f.name)
            if isinstance(default, bool):
                parser.add_argument(*names, action="store_true", default=default)
            else:
                parser.add_argument(*names, type=type(default), default=default)


def extract_config(cls, args: argparse.Namespace):
    """Build a config dataclass from parsed args (reference ParamGroup.extract)."""
    kwargs = {}
    for f in fields(cls):
        if hasattr(args, f.name):
            kwargs[f.name] = getattr(args, f.name)
    cfg = cls(**kwargs)
    if hasattr(cfg, "source_path") and cfg.source_path:
        cfg = dataclasses.replace(cfg, source_path=os.path.abspath(cfg.source_path))
    return cfg


def save_cfg_args(model_cfg: ModelConfig, model_path: str) -> None:
    """Persist a `cfg_args` file readable by the reference's
    `get_combined_args` (`arguments/__init__.py:91-111`)."""
    os.makedirs(model_path, exist_ok=True)
    ns = argparse.Namespace(**dataclasses.asdict(model_cfg))
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(ns))


def load_cfg_args(model_path: str) -> Optional[argparse.Namespace]:
    path = os.path.join(model_path, "cfg_args")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        text = f.read()
    # `Namespace(...)` literal, same format the reference eval()s.
    return eval(text, {"Namespace": argparse.Namespace})  # noqa: S307
