#!/usr/bin/env python
"""Minimizer for the monolithic-suite XLA CPU segfault (VERDICT r4
weak #7).

Observed failure: ONE long-lived pytest process running the full suite
segfaults inside `backend_compile_and_load` at ~77-80% of the run,
always in a late big-compile test that passes standalone (twice on
8/19; tools/run_suite.sh is the per-file workaround). Hypothesis: XLA
CPU compiler state (or its constant-folding arena) accumulated across
hundreds of DISTINCT compilations corrupts/exhausts something a single
compile never sees.

This script stress-compiles distinct CPU programs in one process —
shape/op mixes drawn from the suite's actual load (sorts, scatters,
segment sums, convs, pallas-interpret-free XLA paths) — with
faulthandler armed, logging RSS every 10 compiles. A crash here is the
minimized repro; survival past --max compiles (default 500, ~2x the
suite's compile count) is evidence the trigger needs the suite's exact
program sequence — in which case run the monolithic suite under
faulthandler (tools/run_suite.sh documents the workaround either way):

    python -X faulthandler -m pytest tests/ -q 2>&1 | tee /tmp/mono.log

Usage: python tools/repro_xla_cpu_segfault.py [--max 500]
"""

from __future__ import annotations

import argparse
import faulthandler
import os
import resource
import sys

faulthandler.enable()

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    rng = np.random.default_rng(0)

    def program(i):
        """A distinct program per i: compile-heavy op mixes at varying
        static shapes (so nothing hits the jit cache)."""
        m = 1 << (14 + i % 6)  # 16k..512k
        n = 1000 + 37 * i
        k = 3 + i % 5

        @jax.jit
        def f(keys, vals, img):
            s = jax.lax.sort(keys ^ jnp.uint32(i), dimension=0)
            dec = (s % jnp.uint32(n)).astype(jnp.int32)
            seg = jnp.zeros((n, 4), jnp.float32).at[dec].add(vals)
            c = jax.lax.conv_general_dilated(
                img, jnp.ones((k, k, 1, 2), jnp.float32) / (k * k),
                (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bnd = jnp.searchsorted(s, jnp.arange(64, dtype=jnp.uint32)
                                   * jnp.uint32(n))
            return seg.sum() + c.mean() + bnd.sum()

        keys = jnp.asarray(
            rng.integers(0, 1 << 31, m, dtype=np.int64).astype(np.uint32))
        vals = jnp.asarray(rng.random((m, 4), dtype=np.float32))
        img = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
        return float(f(keys, vals, img))

    for i in range(args.max):
        v = program(i)
        assert np.isfinite(v)
        if i % 10 == 0:
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            print(f"compile {i}: rss {rss} MB", flush=True)
    print(f"SURVIVED {args.max} distinct compiles — the synthetic churn "
          "does not reproduce; the trigger needs the suite's exact "
          "program sequence (see docstring fallback)", flush=True)


if __name__ == "__main__":
    main()
