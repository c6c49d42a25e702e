#!/usr/bin/env python
"""Is the K-row gather transaction-bound, and does index LOCALITY fix it?

The duplicate gather (source[N,10] f32 rows indexed by the sorted-dup
rank array) runs at ~3 GB/s useful bytes on v5e — ~8% of an HBM burst if
every random 40 B row costs a full ~512 B transaction
(runs/trained_anatomy_tuned.log: 8.0 ms for 729k rows; bytes-
proportional: 24 B rows take 4.9 ms). If locality is the lever, a
spatially-clustered source ordering (rows sorted by center-tile, so a
tile's gather indices form a few ascending runs) should approach the
sorted-index rate. This tool measures the SAME gather shape under index
distributions spanning that design space:

  random    — uniform random rows (today's worst case / upper bound)
  sorted    — globally ascending indices (sequential read, 2x coverage)
  runs8     — 8-way interleaved ascending runs (the straddle pattern a
              center-tile-ordered source sees inside one tile)
  block256  — random within 256-row blocks, blocks ascending (moderate
              clustering)

Writes runs/gather_locality.json. Usage:
  python tools/perf_gather_locality.py [--n 311552] [--k 729088]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=311_552)
    ap.add_argument("--k", type=int, default=729_088)
    ap.add_argument("--cols", type=int, default=10)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="runs/gather_locality.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n, k, cols = args.n, args.k, args.cols
    rng = np.random.default_rng(0)
    source = jnp.asarray(rng.random((n + 1, cols), dtype=np.float32))

    idx_random = rng.integers(0, n, k, dtype=np.int32)
    idx_sorted = np.sort(idx_random)
    # 8 interleaved ascending runs: split sorted indices round-robin.
    runs = [idx_sorted[i::8] for i in range(8)]
    idx_runs8 = np.concatenate(runs)
    # Random-within-block, blocks ascending.
    blk = 256
    base = (idx_sorted // blk) * blk
    idx_block = np.minimum(base + rng.integers(0, blk, k), n - 1).astype(
        np.int32)

    R = 4

    def chained_ms(idx):
        idx = jnp.asarray(idx)

        def body(c, _):
            rows = source[jnp.minimum(idx + c.astype(jnp.int32), n)]
            return c + 0.0 * rows[::4097].sum(), None

        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(body, c, None, length=R)
            return c

        c = run(jnp.float32(0.0))
        jax.block_until_ready(c)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = run(c * 0.0)
            jax.block_until_ready(c)
            best = min(best,
                       (time.perf_counter() - t0) * 1e3 / (args.iters * R))
        return best

    out = {"n": n, "k": k, "cols": cols, "row_bytes": cols * 4}
    for name, idx in (("random", idx_random), ("sorted", idx_sorted),
                      ("runs8", idx_runs8), ("block256", idx_block)):
        ms = chained_ms(idx)
        gbs = k * cols * 4 / (ms / 1e3) / 1e9
        out[name] = {"ms": round(ms, 3), "useful_GBs": round(gbs, 2)}
        print(f"# {name:>8}: {ms:7.3f} ms ({gbs:6.2f} GB/s useful)",
              file=sys.stderr)

    os.makedirs("runs", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
