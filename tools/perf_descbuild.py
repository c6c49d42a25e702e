#!/usr/bin/env python
"""Time compute_target_descriptors at 16k patch (VERDICT r2 item 4:
target < 15 s/patch; r2 baseline 62 s, r3s2 after knn-sort + device-side
masks/packbits: expected well under the target — this records it).

Seconds-scale one-time build, so standalone timing is valid
(NOTES_PERF sub-ms traps do not apply)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as bench_mod  # noqa: F401  (jax cache setup)


def main():
    import jax

    from wast3d_tpu.stylize.fit import compute_target_descriptors

    m = int(os.environ.get("DESC_M", 16384))
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(m, 3)) * 0.25).astype(np.float32)

    t0 = time.perf_counter()
    tgt = compute_target_descriptors(pts)
    jax.block_until_ready(jax.tree_util.tree_leaves(tgt))
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    tgt = compute_target_descriptors(pts)
    jax.block_until_ready(jax.tree_util.tree_leaves(tgt))
    warm = time.perf_counter() - t0

    print(json.dumps({
        "metric": "descriptor_build_16k_s",
        "cold_s": round(cold, 2),
        "warm_s": round(warm, 2),
        "m": m,
        "target_s": 15.0,
    }))


if __name__ == "__main__":
    main()
