#!/usr/bin/env python
"""Blend-kernel cost attribution via WAST3D_BLEND_ABLATE variants.

Runs tools/perf_step.py in a subprocess per ablation flag (the flag is
read at module import), timing fwd-only and the full train step. The
ablated kernels produce WRONG pixels — measurement only (NOTES_PERF.md).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_ablate.py
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

ABLATIONS = ["", "scan1", "cheaptrans", "noacc", "noexit"]


def main():
    iters = sys.argv[1] if len(sys.argv) > 1 else "30"
    for ab in ABLATIONS:
        env = dict(os.environ, WAST3D_BLEND_ABLATE=ab)
        print(f"=== ablate [{ab or 'none'}] ===", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(HERE, "perf_step.py"),
             "--modes", "segsum_sortpacked", "--fwd", "--iters", iters],
            env=env, check=False,
        )


if __name__ == "__main__":
    main()
