#!/usr/bin/env python
"""Descriptor-build kNN experiments at 16k patch (VERDICT r2 item 4:
62s one-time build, local kNN k=100 dominating). Seconds-scale ops, so
standalone timing is valid (NOTES_PERF traps apply to sub-ms only)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as bench_mod  # noqa: F401  (jax cache setup)


def main():
    import jax
    import jax.numpy as jnp

    from wast3d_tpu.ops.knn import knn_sq_dists, pairwise_sq_dists

    m, k = 16384, 100
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32) * 0.25)

    def timeit(name, f, *a, **kw):
        out = f(*a, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*a, **kw)
        jax.block_until_ready(out)
        print(f"{name:>28s}: {time.perf_counter() - t0:7.2f} s")
        return out

    d_ref, i_ref = timeit("current scan+top_k", knn_sq_dists, pts, pts, k=k)

    # Full-matrix single top_k.
    @jax.jit
    def full_topk(p):
        d = pairwise_sq_dists(p, p)
        nd, idx = jax.lax.top_k(-d, k)
        return -nd, idx

    d1, i1 = timeit("full-matrix top_k", full_topk, pts)

    # approx_max_k (TPU PartialReduce) at two recall targets.
    for recall in (0.95, 0.99, 1.0):
        @jax.jit
        def approx(p):
            d = pairwise_sq_dists(p, p)
            nd, idx = jax.lax.approx_max_k(-d, k, recall_target=recall)
            return -nd, idx

        da, ia = timeit(f"full-matrix approx r={recall}", approx, pts)
        agree = float(jnp.mean((jnp.sort(ia, 1) == jnp.sort(i_ref, 1))
                               .all(1).astype(jnp.float32)))
        derr = float(jnp.abs(da - d_ref).max())
        print(f"{'':>28s}  rows-exact {agree:.4f} max|d-dref| {derr:.2e}")

    # Blocked-query approx: avoids the m x m matrix.
    for recall in (0.95,):
        @jax.jit
        def approx_blocked(p):
            def body(q):
                d = pairwise_sq_dists(q, p)
                nd, idx = jax.lax.approx_max_k(-d, k, recall_target=recall)
                return -nd, idx
            qs = p.reshape(8, m // 8, 3)
            nd, idx = jax.lax.map(body, qs)
            return nd.reshape(m, k), idx.reshape(m, k)

        da, ia = timeit(f"blocked approx r={recall}", approx_blocked, pts)
        agree = float(jnp.mean((jnp.sort(ia, 1) == jnp.sort(i_ref, 1))
                               .all(1).astype(jnp.float32)))
        print(f"{'':>28s}  rows-exact {agree:.4f}")

    # Exact per-row-sort path (the r3 production choice).
    from wast3d_tpu.ops.knn import knn_sq_dists_sort

    d_s, i_s = timeit("row-sort local k=100", knn_sq_dists_sort,
                      pts, pts, k=k)
    agree = float(jnp.mean((i_s == i_ref).all(1).astype(jnp.float32)))
    print(f"{'':>28s}  rows-exact {agree:.4f}")
    timeit("row-sort global k=2000", knn_sq_dists_sort,
           pts[::20], pts, k=2000)
    timeit("scan+topk global k=2000", knn_sq_dists, pts[::20], pts, k=2000)


if __name__ == "__main__":
    main()
