"""LPIPS calibration correctness vs the reference's vendored lpipsPyTorch.

Same strategy as test_vgg_torch_parity: the pretrained VGG16/linear
weights can't be downloaded (zero egress), but the PIPELINE can be proved
correct on arbitrary weights — replicate the reference LPIPS forward
(`/root/reference/lpipsPyTorch/modules/{lpips,networks,utils}.py`: BaseNet
z-score, vgg16 features with relu captures [4,9,16,23,30] 1-based,
channel-unit-normalized activations, squared diff, 1x1 linear heads,
spatial mean, sum) in functional torch, and assert our `ops.lpips.LPIPS`
produces the same scalar from the same weight files.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from wast3d_tpu.ops import lpips as L  # noqa: E402


def _random_weights(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for spec in L._VGG16_LAYERS:
        if spec[1] != "conv":
            continue
        idx, _, cin, cout = spec
        sd[f"features.{idx}.weight"] = rng.normal(
            0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.normal(0, 0.01, cout).astype(
            np.float32)
    # lin heads in the reference's renamed key format ("0.1.weight",
    # `lpipsPyTorch/modules/utils.py:22-28`), shape [1, C, 1, 1].
    lins = {
        f"{i}.1.weight": rng.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate(L._CHANNELS)
    }
    return sd, lins


def _ref_lpips(sd, lins, x_np, y_np):
    """The reference LPIPS.forward in functional torch."""
    mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.tensor(img).permute(2, 0, 1)[None]
        x = (x - mean) / std
        out = []
        for spec in L._VGG16_LAYERS:
            kind = spec[1]
            if kind == "conv":
                idx = spec[0]
                x = F.conv2d(x, torch.tensor(sd[f"features.{idx}.weight"]),
                             torch.tensor(sd[f"features.{idx}.bias"]),
                             padding=1)
            elif kind == "relu":
                x = F.relu(x)
                if spec[0] in L._CAPTURE_RELU:
                    norm = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                    out.append(x / (norm + 1e-10))
            elif kind == "pool":
                x = F.max_pool2d(x, 2, 2)
        return out

    fx, fy = feats(x_np), feats(y_np)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        w = torch.tensor(lins[f"{i}.1.weight"])
        total += float(F.conv2d(d, w).mean((2, 3)).sum())
    return total


def test_lpips_matches_reference_pipeline(tmp_path):
    sd, lins = _random_weights()
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    want = _ref_lpips(sd, lins, a, b)

    bpath, lpath = str(tmp_path / "vgg16.npz"), str(tmp_path / "lins.npz")
    np.savez(bpath, **sd)
    np.savez(lpath, **lins)
    m = L.LPIPS(backbone_path=bpath, lin_path=lpath)
    assert m.is_calibrated() and m.metric_name == "lpips"
    got = float(m(a, b))
    assert got == pytest.approx(want, rel=1e-4)
    # identity -> 0
    assert float(m(a, a)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_proxy_mode_still_orders():
    m = L.LPIPS()  # no weights -> proxy
    assert not m.is_calibrated() and m.metric_name == "lpips_proxy"
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    near = np.clip(a + rng.normal(0, 0.02, a.shape).astype(np.float32), 0, 1)
    far = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(m(a, near)) < float(m(a, far))
