"""LPIPS perceptual metric (VGG16 backbone + learned linear heads).

Re-implementation of the reference's vendored `lpipsPyTorch`
(`/root/reference/lpipsPyTorch/modules/{lpips,networks,utils}.py`, used by
`metrics.py:18,74`): ImageNet-normalized input, VGG16 relu1_2..relu5_3
activations, per-layer unit-normalization across channels, squared
difference, 1x1 learned linear reduction, spatial mean, sum over layers.

Weights: the reference downloads pretrained VGG16 + LPIPS linear weights
from a URL — impossible here (zero egress). Both load from user-supplied
files (torch state dicts or .npz): `WAST3D_VGG16_WEIGHTS` and
`WAST3D_LPIPS_WEIGHTS`. Without them, a deterministic random backbone
with uniform linear heads is used and the metric is reported as
`lpips_proxy` — a valid relative perceptual distance (random-feature
perceptual metrics are standard fallbacks) but NOT comparable to
published LPIPS numbers. `is_calibrated()` tells callers which one
they're getting.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 features: conv indices and relu capture points (torchvision).
_VGG16_LAYERS = [
    (0, "conv", 3, 64), (1, "relu"), (2, "conv", 64, 64), (3, "relu"),
    (4, "pool"),
    (5, "conv", 64, 128), (6, "relu"), (7, "conv", 128, 128), (8, "relu"),
    (9, "pool"),
    (10, "conv", 128, 256), (11, "relu"), (12, "conv", 256, 256), (13, "relu"),
    (14, "conv", 256, 256), (15, "relu"),
    (16, "pool"),
    (17, "conv", 256, 512), (18, "relu"), (19, "conv", 512, 512), (20, "relu"),
    (21, "conv", 512, 512), (22, "relu"),
    (23, "pool"),
    (24, "conv", 512, 512), (25, "relu"), (26, "conv", 512, 512), (27, "relu"),
    (28, "conv", 512, 512), (29, "relu"),
]
_CAPTURE_RELU = (3, 8, 15, 22, 29)  # relu1_2, 2_2, 3_3, 4_3, 5_3
_CHANNELS = (64, 128, 256, 512, 512)

# The reference's z-score constants (`lpipsPyTorch/modules/networks.py:41-44`
# BaseNet buffers) — NOT the ImageNet mean/std; metrics.py feeds [0,1]
# images straight into this normalization.
_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_STD = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, backbone_path: Optional[str] = None,
                 lin_path: Optional[str] = None, seed: int = 0):
        backbone_path = backbone_path or os.environ.get("WAST3D_VGG16_WEIGHTS")
        lin_path = lin_path or os.environ.get("WAST3D_LPIPS_WEIGHTS")
        self.calibrated = bool(backbone_path and lin_path)
        self.params = self._load_backbone(backbone_path, seed)
        self.lins = self._load_lins(lin_path)

    def is_calibrated(self) -> bool:
        return self.calibrated

    @property
    def metric_name(self) -> str:
        return "lpips" if self.calibrated else "lpips_proxy"

    def _load_backbone(self, path, seed):
        if path:
            if path.endswith(".npz"):
                data = dict(np.load(path))
            else:
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=True)
                data = {k: np.asarray(v) for k, v in sd.items()}
            return {
                k: np.asarray(data[k], np.float32)
                for k in data if k.startswith("features.")
            }
        rng = np.random.default_rng(seed)
        params = {}
        for spec in _VGG16_LAYERS:
            if spec[1] != "conv":
                continue
            idx, _, cin, cout = spec
            w = rng.normal(0, np.sqrt(2.0 / (cin * 9)), (cout, cin, 3, 3))
            params[f"features.{idx}.weight"] = w.astype(np.float32)
            params[f"features.{idx}.bias"] = np.zeros(cout, np.float32)
        return params

    def _load_lins(self, path):
        if path:
            if path.endswith(".npz"):
                data = dict(np.load(path))
            else:
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=True)
                data = {k: np.asarray(v) for k, v in sd.items()}
            # Accept the raw download keys (lin0.model.1.weight), the
            # reference's renamed form "0.1.weight"
            # (`lpipsPyTorch/modules/utils.py:22-28`), and plain "0.weight".
            def pick(i):
                for k in (f"lin{i}.model.1.weight", f"{i}.1.weight",
                          f"{i}.weight"):
                    if k in data:
                        return data[k]
                raise KeyError(f"no lin weight for layer {i} in {list(data)[:8]}")

            return [np.asarray(pick(i), np.float32).reshape(-1)
                    for i in range(5)]
        return [np.full(c, 1.0 / c, np.float32) for c in _CHANNELS]

    def _features(self, img: jnp.ndarray) -> List[jnp.ndarray]:
        x = (img[None] - _MEAN) / _STD
        feats = []
        for spec in _VGG16_LAYERS:
            kind = spec[1]
            if kind == "conv":
                idx = spec[0]
                from wast3d_tpu.ops.vgg import conv3x3_shift_matmul

                x = conv3x3_shift_matmul(
                    x, jnp.asarray(self.params[f"features.{idx}.weight"]),
                    jnp.asarray(self.params[f"features.{idx}.bias"]),
                )
            elif kind == "relu":
                x = jax.nn.relu(x)
                if spec[0] in _CAPTURE_RELU:
                    feats.append(x)
            elif kind == "pool":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        """[H,W,3] images in [0,1] -> scalar distance."""
        f1 = self._features(jnp.asarray(img1, jnp.float32))
        f2 = self._features(jnp.asarray(img2, jnp.float32))
        total = jnp.float32(0.0)
        for a, b, lin in zip(f1, f2, self.lins):
            an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (an - bn) ** 2
            total = total + jnp.mean(jnp.sum(d * jnp.asarray(lin), axis=-1))
        return total
