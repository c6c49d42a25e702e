#!/usr/bin/env python
"""Quantify the XLA TPU sort floor for the binning stage (VERDICT r4
item 2c: "spike the in-kernel 2-stream merge or Pallas radix sort that
beats the next-pow2 XLA sort floor — even a negative result with
measured DMA rates closes that chapter").

Measures, with chained on-device scan timing (NOTES_PERF "measurement
traps" — unchained repeats coalesce over the tunnel):
  - lax.sort u32 single-key at 2^20..2^24 (the grid sort tiers used at
    200k tuned / 1M tight / 4M tight);
  - lax.sort (i32, i32) 2-key at the same sizes (the 4M fallback tier);
  - lax.sort f32-key + i32 payload at N = 200k / 1M / 4M (the depth
    presort + selection sorts);
  - scatter-add rate (K rows -> N) at 1M (the op a Pallas radix sort
    would need per pass, and the reason it loses: rasterizer_impl.cu's
    cub::DeviceRadixSort leans on exactly the high-rate global scatter
    TPUs don't have).

Derives bytes-moved rooflines: a radix sort is 4 passes x 8 B/key
(read+write) ~ 32 B/key; a bitonic network is ~log^2(n)/2 passes x
8 B/key. Compares measured lax.sort to both. Writes
runs/sort_floor.json and prints one JSON line.

Usage: python tools/perf_sort_floor.py [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="runs/sort_floor.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    R = 4  # chained reps inside one dispatch

    def chained_ms(make_op, arg):
        """Time make_op(arg) with a data-dependent chain of R reps inside
        one jitted dispatch (the tunnel-safe methodology)."""

        def body(c, _):
            out = make_op(arg, c)
            return c + out, None

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

    rng = np.random.default_rng(0)
    out = {"sizes": {}, "n_sorts": {}, "scatter": {}}

    for p in (20, 21, 22, 23, 24):
        m = 1 << p
        keys_u32 = jnp.asarray(
            rng.integers(0, 1 << 31, m, dtype=np.int64).astype(np.uint32))
        k1 = jnp.asarray(np.asarray(keys_u32).astype(np.int32))
        k2 = jnp.asarray(rng.integers(0, 1 << 30, m, dtype=np.int32))

        def sort_u32(a, c):
            s = jax.lax.sort(a ^ c.astype(jnp.uint32), dimension=0)
            return s[::4097].astype(jnp.float32).sum()

        def sort_2key(ab, c):
            a, b = ab
            sa, sb = jax.lax.sort(
                (a ^ c.astype(jnp.int32), b), dimension=0, num_keys=2)
            return (sa[::4097] + sb[::4097]).astype(jnp.float32).sum()

        t1 = chained_ms(sort_u32, keys_u32)
        t2 = chained_ms(sort_2key, (k1, k2))
        out["sizes"][str(p)] = {
            "u32_1key_ms": round(t1, 3),
            "i32_2key_ms": round(t2, 3),
            # effective streamed bytes/s if this were a 4-pass radix
            "radix_roofline_ms_800GBs": round(m * 32 / 800e9 * 1e3, 3),
            "bitonic_passes": p * (p + 1) // 2,
            "bitonic_roofline_ms_800GBs": round(
                m * 8 * (p * (p + 1) // 2) / 800e9 * 1e3, 3),
        }
        print(f"# 2^{p}: u32 {t1:.2f} ms, 2key {t2:.2f} ms", file=sys.stderr)

    for n in (200_000, 1_000_000, 4_000_000):
        depths = jnp.asarray(rng.random(n, dtype=np.float32))
        iota = jnp.arange(n, dtype=jnp.int32)

        def presort(d, c):
            _, o = jax.lax.sort((d + c, iota), dimension=0, num_keys=1)
            return o[::4097].astype(jnp.float32).sum()

        def presort_inv(d, c):
            _, o = jax.lax.sort((d + c, iota), dimension=0, num_keys=1)
            _, r = jax.lax.sort((o, iota), dimension=0, num_keys=1)
            return (o[::4097] + r[::4097]).astype(jnp.float32).sum()

        t1 = chained_ms(presort, depths)
        t2 = chained_ms(presort_inv, depths)
        out["n_sorts"][str(n)] = {
            "f32key_payload_ms": round(t1, 3),
            "plus_inverse_ms": round(t2, 3),
        }
        print(f"# N={n}: presort {t1:.2f}, +inverse {t2:.2f}",
              file=sys.stderr)

    # Scatter-add rate at radix-pass shape: K = 2^22 rows -> N = 2^22.
    k = 1 << 22
    idx = jnp.asarray(rng.integers(0, k, k, dtype=np.int32))
    vals = jnp.asarray(rng.random(k, dtype=np.float32))

    def scat(iv, c):
        i, v = iv
        z = jnp.zeros((k,), jnp.float32)
        r = z.at[i].add(v + c)
        return r[::4097].sum()

    t = chained_ms(scat, (idx, vals))
    out["scatter"]["k_2^22_ms"] = round(t, 3)
    out["scatter"]["updates_per_ms"] = round(k / t, 0)
    print(f"# scatter 2^22: {t:.2f} ms ({k / t / 1e3:.0f}k rows/ms)",
          file=sys.stderr)

    os.makedirs("runs", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
