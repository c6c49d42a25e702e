"""Per-Gaussian gradient reduction: rank-major Pallas segment sum.

The blend backward produces one gradient column per sorted DUPLICATE
(tile-major order); training needs their per-Gaussian sums. The CUDA
reference accumulates with atomicAdd into per-Gaussian slots
(`backward.cu:552`); the XLA transpose of the sorted gather is a K->N
scatter-add that costs ~16 ms at 856k duplicates on v5e — the single most
expensive op in the train step (NOTES_PERF.md). Every XLA-level
alternative measured worse; this module is the Pallas design that beats
it:

1. XLA: sort duplicate depth-ranks with an iota payload and gather the
   gradient rows into rank-major order — now every Gaussian's duplicates
   are CONTIGUOUS (a segment), because `rank` is unique per Gaussian.
2. Pallas (this kernel): one sequential streaming pass. (16, 128) chunks
   of duplicate gradient columns are DMA'd double-buffered (the same
   lane-major layout the blend kernels use — duplicates on lanes); each
   chunk is summed into a 256-slot VMEM ring addressed by
   `rank - ring_base` via a one-hot MXU contraction
   (onehot[r, j] = (base + r == rank_j), exact in bf16; the data is
   hi/lo split for ~2^-16 relative accuracy, matching the blend
   kernels). Ranks are globally ascending, so the ring's lower half can
   be flushed to HBM as an ALIGNED 128-row block whenever the chunk's
   ranks pass the window — segments spanning chunk boundaries accumulate
   naturally in the ring, absent ranks (culled Gaussians) just leave
   zero rows, and every output row in [0, n1) is written exactly once
   (async, 2-slot pipelined), so the output needs no zero-init.

Output rows are indexed BY RANK, which is exactly the row space of the
depth-ordered source table the gather reads from — so no inverse-mapping
epilogue exists at all; the caller slices `out[:n1, :C]` as d_source.

Layout notes (Mosaic constraints): HBM buffers touched by manual DMA
keep a 128-multiple minor dim — the input is [16, Kpad] (columns =
duplicates) and the output [rows, 128] (cols 16.. are dead); the ring is
(256 rank-slots, 16) sublane-major, produced directly by the contraction
dot_general(onehot (slots,128), chunk (16,128), contract dim 1 x dim 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 1024  # duplicates per DMA chunk. Wide: the sequential chunk loop's
# scalar overhead dominates — at 128 the 9.4k iterations cost ~4.6 ms of
# the kernel's time (vs ~0.2 ms of matmul/DMA); widening amortizes it
# while the per-element matmul/compare work is unchanged.
NCOLS = 16  # padded gradient row count (10 real + rank row + 5 pad)
RANK_ROW = 15  # gT row carrying the column's depth rank (f32)
RING = 256  # ring slots (2 flush blocks)
OUT_W = 128  # output minor dim (DMA tile width; cols >= NCOLS unused)


def _split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _segsum_kernel(g_hbm, out_hbm, gv, stage, ring_ref, sem_g, sem_w):
    """Single-program streaming segment sum (see module doc).

    g_hbm: [16, Kpad] f32 rank-major gradient columns; row RANK_ROW
    carries each column's depth rank as f32 (exact below 2^24 — a
    separate i32 rank array is impossible to row-DMA: Mosaic tiles i32
    HBM buffers (8,128) and rejects 1-row slices).
    out_hbm: [out_rows, 128] f32; rows [0, sentinel+1) all written.
    """
    nchunks = g_hbm.shape[1] // G

    def g_dma(slot, c):
        return pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(c * G, G)], gv.at[slot], sem_g.at[slot]
        )

    def flush(slot, fc):
        return pltpu.make_async_copy(
            stage.at[slot], out_hbm.at[pl.ds(fc * (RING // 2), RING // 2), :],
            sem_w.at[slot],
        )

    g_dma(0, 0).start()
    ring_ref[...] = jnp.zeros((RING, NCOLS), jnp.float32)

    dims = (((1,), (1,)), ((), ()))  # contract dup lanes of both operands

    def contrib(ranks, base, hi, lo, rows):
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, G), 0)
        onehot = (slot_iota + base == ranks).astype(jnp.bfloat16)
        return (
            jax.lax.dot_general(onehot, hi, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(onehot, lo, dims,
                                  preferred_element_type=jnp.float32)
        )  # (rows, 16)

    def body(c, fc):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            g_dma(1 - slot, c + 1).start()

        g_dma(slot, c).wait()
        chunk = gv[slot]  # (16, G) — duplicates on lanes
        ranks = chunk[RANK_ROW:RANK_ROW + 1, :].astype(jnp.int32)  # (1, G)
        hi, lo = _split2(chunk)
        last = jnp.max(ranks)

        # Flush windows until the chunk's ranks fit [base, base + RING):
        # accumulate ONLY the lower half (disjoint from later windows),
        # merge with the ring's lower half, write, shift.
        def wcond(st):
            fc, _ = st
            return last >= fc * (RING // 2) + RING

        def wbody(st):
            fc, wslot = st
            base = fc * (RING // 2)
            low = ring_ref[: RING // 2] + contrib(
                ranks, base, hi, lo, RING // 2
            )

            @pl.when(fc >= 2)
            def _():
                flush(wslot, fc - 2).wait()  # slot reuse (2 in flight)

            stage[wslot] = jnp.pad(low, ((0, 0), (0, OUT_W - NCOLS)))
            flush(wslot, fc).start()
            ring_ref[: RING // 2] = ring_ref[RING // 2:]
            ring_ref[RING // 2:] = jnp.zeros(
                (RING // 2, NCOLS), jnp.float32
            )
            return fc + 1, 1 - wslot

        fc, _ = jax.lax.while_loop(wcond, wbody, (fc, jax.lax.rem(fc, 2)))

        # Final (resident) window: full-ring accumulate, no flush.
        ring_ref[...] = ring_ref[...] + contrib(
            ranks, fc * (RING // 2), hi, lo, RING
        )
        return fc

    fc = jax.lax.fori_loop(0, nchunks, body, jnp.int32(0))

    # Drain: both ring halves, then all outstanding writes. The sentinel
    # padding forced fc high enough that rows [0, sentinel + 1) are
    # covered by blocks [0, fc + 2).
    @pl.when(fc >= 2)
    def _():
        flush(jax.lax.rem(fc, 2), fc - 2).wait()

    stage[jax.lax.rem(fc, 2)] = jnp.pad(
        ring_ref[: RING // 2], ((0, 0), (0, OUT_W - NCOLS))
    )
    flush(jax.lax.rem(fc, 2), fc).start()

    @pl.when(fc >= 1)
    def _():
        flush(jax.lax.rem(fc + 1, 2), fc - 1).wait()

    stage[jax.lax.rem(fc + 1, 2)] = jnp.pad(
        ring_ref[RING // 2:], ((0, 0), (0, OUT_W - NCOLS))
    )
    flush(jax.lax.rem(fc + 1, 2), fc + 1).start()
    flush(jax.lax.rem(fc, 2), fc).wait()
    flush(jax.lax.rem(fc + 1, 2), fc + 1).wait()


@functools.partial(jax.jit, static_argnames=("n1", "interpret"))
def segment_reduce_by_rank_sortpayload(
    d_sorted: jnp.ndarray, safe_rank: jnp.ndarray, n1: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as `segment_reduce_by_rank`, but rank-major order is
    produced by a multi-operand `lax.sort` carrying the C gradient columns
    as payloads — no K-row random gather at all. The gather is
    latency-bound (~7 ns/row on v5e: 8.4 ms at 1.2M duplicates); the sort
    network moves the payloads with sequential bandwidth instead."""
    k, C = d_sorted.shape
    kpad = -(-(k + 1) // G) * G
    n1pad = -(-n1 // 128) * 128
    if n1pad == n1:
        n1pad += 128
    sentinel = n1pad - 1
    out_rows = n1pad + RING

    ranks_p = jnp.pad(safe_rank, (0, kpad - k), constant_values=sentinel)
    ops = (ranks_p,) + tuple(
        jnp.pad(d_sorted[:, i], (0, kpad - k)) for i in range(C)
    )
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1)
    zero = jnp.zeros((kpad,), jnp.float32)
    rows = (
        list(sorted_ops[1:])
        + [zero] * (RANK_ROW - C)
        + [sorted_ops[0].astype(jnp.float32)]  # exact: ranks < 2^24
    )
    gT = jnp.stack(rows, axis=0)  # [16, Kpad], row RANK_ROW = rank

    out = pl.pallas_call(
        _segsum_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NCOLS, G), jnp.float32),
            pltpu.VMEM((2, RING // 2, OUT_W), jnp.float32),
            pltpu.VMEM((RING, NCOLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((out_rows, OUT_W), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gT)
    return out[:n1, :C]


@functools.partial(jax.jit, static_argnames=("n1", "interpret"))
def segment_reduce_by_rank_sortpacked(
    d_sorted: jnp.ndarray, safe_rank: jnp.ndarray, n1: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """`segment_reduce_by_rank_sortpayload` with the payload columns
    rounded to bf16 and bit-packed in PAIRS into uint32 operands — half
    the sort network traffic (6 operands instead of 11). Per-duplicate
    gradients are quantized to bf16 (~2^-9 relative) BEFORE the f32
    per-Gaussian summation; the summation itself stays f32-accurate.
    This matches the accuracy class of the split-bf16 blend kernels that
    produced the gradients."""
    k, C = d_sorted.shape
    kpad = -(-(k + 1) // G) * G
    n1pad = -(-n1 // 128) * 128
    if n1pad == n1:
        n1pad += 128
    sentinel = n1pad - 1
    out_rows = n1pad + RING

    ranks_p = jnp.pad(safe_rank, (0, kpad - k), constant_values=sentinel)

    def pack_pair(i):
        a = d_sorted[:, i].astype(jnp.bfloat16)
        a_u = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
        if i + 1 < C:
            b = d_sorted[:, i + 1].astype(jnp.bfloat16)
            b_u = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(
                jnp.uint32
            )
        else:
            b_u = jnp.zeros_like(a_u)
        return jnp.pad((a_u << 16) | b_u, (0, kpad - k))

    ops = (ranks_p,) + tuple(pack_pair(i) for i in range(0, C, 2))
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1)

    def unpack(u):
        hi = jax.lax.bitcast_convert_type(
            (u >> 16).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        lo = jax.lax.bitcast_convert_type(
            (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        return hi, lo

    zero = jnp.zeros((kpad,), jnp.float32)
    rows = []
    for u in sorted_ops[1:]:
        hi, lo = unpack(u)
        rows.extend([hi, lo])
    rows = rows[:C]
    rows += [zero] * (RANK_ROW - C)
    rows.append(sorted_ops[0].astype(jnp.float32))  # exact: ranks < 2^24
    gT = jnp.stack(rows, axis=0)  # [16, Kpad], row RANK_ROW = rank

    out = pl.pallas_call(
        _segsum_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NCOLS, G), jnp.float32),
            pltpu.VMEM((2, RING // 2, OUT_W), jnp.float32),
            pltpu.VMEM((RING, NCOLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((out_rows, OUT_W), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gT)
    return out[:n1, :C]


@functools.partial(jax.jit, static_argnames=("n1", "interpret"))
def segment_reduce_by_rank(d_sorted: jnp.ndarray, safe_rank: jnp.ndarray,
                           n1: int, interpret: bool = False) -> jnp.ndarray:
    """Sum duplicate gradient rows per depth-rank.

    d_sorted: [K, C<=16] f32 per-duplicate gradients (tile-major order).
    safe_rank: [K] i32 depth rank per duplicate, in [0, n1).
    Returns [n1, C]: row r = sum of d_sorted rows with safe_rank == r
    (exactly `zeros.at[safe_rank].add(d_sorted)`, to split-bf16 accuracy).
    """
    k, C = d_sorted.shape
    ranks_rm, perm = jax.lax.sort(
        (safe_rank, jnp.arange(k, dtype=jnp.int32)), dimension=0, num_keys=1
    )
    g = d_sorted[perm]  # [K, C] rank-major

    # At least one sentinel-padded entry must exist: the sentinel drags
    # the flush window past every real rank so rows [0, n1) are all
    # written (unwritten output rows are uninitialized, not zero).
    kpad = -(-(k + 1) // G) * G
    n1pad = -(-n1 // 128) * 128
    if n1pad == n1:
        n1pad += 128
    sentinel = n1pad - 1  # > every real rank, sliced away below
    out_rows = n1pad + RING

    ranks_f = jnp.pad(
        ranks_rm, (0, kpad - k), constant_values=sentinel
    ).astype(jnp.float32)  # exact: ranks < 2^24
    gT = jnp.concatenate(
        [
            jnp.pad(g.T, ((0, RANK_ROW - C), (0, kpad - k))),
            ranks_f[None, :],
        ],
        axis=0,
    )  # [16, Kpad], row RANK_ROW = rank

    out = pl.pallas_call(
        _segsum_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gT (manual DMA)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NCOLS, G), jnp.float32),  # gv
            pltpu.VMEM((2, RING // 2, OUT_W), jnp.float32),  # stage
            pltpu.VMEM((RING, NCOLS), jnp.float32),  # ring
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((out_rows, OUT_W), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gT)
    return out[:n1, :C]
