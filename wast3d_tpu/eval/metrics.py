"""SSIM / PSNR / LPIPS evaluation over render directories.

Equivalent of `/root/reference/metrics.py:36-103`: walks
`<model_path>/test/ours_<iter>/{renders,gt}`, computes per-view and mean
metrics, writes `results.json` + `per_view.json` in the same schema.
LPIPS is exact only when pretrained weights are supplied (see
`wast3d_tpu.ops.lpips`); otherwise the metric key is `lpips_proxy`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops.image_losses import psnr as psnr_fn
from wast3d_tpu.ops.image_losses import ssim as ssim_fn
from wast3d_tpu.ops.lpips import LPIPS


def _read_images(renders_dir: str, gt_dir: str):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(os.path.join(renders_dir, fname)),
                       dtype=np.float32)[..., :3] / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, fname)),
                       dtype=np.float32)[..., :3] / 255.0
        renders.append(r)
        gts.append(g)
        names.append(fname)
    return renders, gts, names


def evaluate_dir(method_dir: str, lpips_model: Optional[LPIPS] = None) -> Dict:
    """Evaluate one `ours_<iteration>` directory. Returns metric dict."""
    renders, gts, names = _read_images(
        os.path.join(method_dir, "renders"), os.path.join(method_dir, "gt")
    )
    if lpips_model is None:
        lpips_model = LPIPS()
    ssim_j = jax.jit(ssim_fn)
    psnr_j = jax.jit(psnr_fn)
    per_view = {"SSIM": {}, "PSNR": {}, lpips_model.metric_name.upper(): {}}
    ssims, psnrs, lpipss = [], [], []
    for r, g, name in zip(renders, gts, names):
        s = float(ssim_j(jnp.asarray(r), jnp.asarray(g)))
        p = float(psnr_j(jnp.asarray(r), jnp.asarray(g)))
        l = float(lpips_model(r, g))
        ssims.append(s)
        psnrs.append(p)
        lpipss.append(l)
        per_view["SSIM"][name] = s
        per_view["PSNR"][name] = p
        per_view[lpips_model.metric_name.upper()][name] = l
    return {
        "mean": {
            "SSIM": float(np.mean(ssims)),
            "PSNR": float(np.mean(psnrs)),
            lpips_model.metric_name.upper(): float(np.mean(lpipss)),
        },
        "per_view": per_view,
    }


def evaluate(model_paths: List[str], split: str = "test") -> Dict:
    """Reference `evaluate` (`metrics.py:36-93`): per model dir, evaluate
    every `ours_*` method under `<model>/<split>`, write results.json and
    per_view.json."""
    lpips_model = LPIPS()
    all_results = {}
    for model_path in model_paths:
        results, per_views = {}, {}
        split_dir = os.path.join(model_path, split)
        if not os.path.isdir(split_dir):
            continue
        for method in sorted(os.listdir(split_dir)):
            mdir = os.path.join(split_dir, method)
            if not os.path.isdir(os.path.join(mdir, "renders")):
                continue
            res = evaluate_dir(mdir, lpips_model)
            results[method] = res["mean"]
            per_views[method] = res["per_view"]
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(results, f, indent=True)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_views, f, indent=True)
        all_results[model_path] = results
    return all_results
