"""Pallas TPU kernel for the per-tile alpha-blend (forward + backward).

The performance core of the rasterizer — the TPU equivalent of
`renderCUDA` forward/backward (`/root/reference/submodules/
cuda_rasterizer/forward.cu:262-390`, `backward.cu:414-640`). Unlike the
XLA `tiled.py` path (which pads every tile's list to a static max), this
kernel walks each tile's **exact** sorted range with a dynamic-trip-count
loop and stops early once every pixel in the tile saturates (T < 1e-4) —
the same work-skipping the CUDA kernel gets from its
`__syncthreads_count(done)` vote.

Data layout (chosen for the TPU memory system):
- Sorted per-duplicate data is packed **transposed** as one [16, K+G]
  f32 array (rows = mx, my, conic A/B/C, opacity, depth, r, g, b, pad;
  columns = entries). Entries therefore live on the *lane* axis, so a
  chunk load is a lane-aligned (16, 128) slab DMA'd HBM->VMEM — Mosaic
  requires lane-dim slices aligned to 128, which this layout gives for
  free (G=128 tail columns of padding keep the last chunk in bounds).
- Pixels live on the *sublane* axis: the 16x16 tile is 256 rows. All
  per-chunk matrices are (256 pixels, 128 entries); broadcasts like
  dx = px(256,1) - mx(1,128) need no transposes anywhere.
- The sequential front-to-back transmittance recurrence is re-expressed
  as matmuls on the MXU: the within-chunk exclusive log-transmittance is
  s @ U with U strictly-upper-triangular ones (128,128), and the
  color/depth accumulation is w(256,128) contracted with data(16,128).
  The CUDA kernel's serial per-pixel loop becomes 3 matmuls per 128
  Gaussians.
- The early-stop rule (stop *before* the entry that would push T below
  1e-4, `forward.cu:357-362`) is a cumulative-trigger mask, again via a
  triangular matmul.

Backward walks the same ranges front-to-back, recomputing alpha/T (no
per-entry residuals stored), using the identity
    dL/dalpha_i = q_i * T_i - (S_total - prefix_i(q w)) / (1 - alpha_i)
where q_i = g_color . c_i + g_depth * d_i and S_total collapses the
suffix sum to quantities known from the forward outputs — the same trick
the CUDA backward's back-to-front `accum_rec` walk uses
(`backward.cu:414-...`), vectorized per chunk. Consecutive tiles share a
128-aligned boundary window of the sorted array (tile ranges are
contiguous), so per-entry gradients are *accumulated* with a
read-modify-write into a zero-initialized aliased output — safe because
the TPU grid executes sequentially. This replaces the CUDA backward's
atomicAdd (`backward.cu:552`) with a deterministic accumulation; the
final per-Gaussian reduction is a segment-sum OUTSIDE the kernel (the
autodiff transpose of the sorted gather).

custom_vjp boundary: `blend(packed, pixf, starts, ends)` — the gather
from per-Gaussian arrays into sorted order stays in XLA autodiff.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measurement-only ablations (NOTES_PERF methodology): comma-separated
# flags in WAST3D_BLEND_ABLATE pick kernel variants with WRONG outputs
# used to attribute in-situ cost. Never set in production.
_ABLATE = frozenset(
    f for f in os.environ.get("WAST3D_BLEND_ABLATE", "").split(",") if f
)

# Chunk size (entries per inner step). Wider chunks were tried TWICE
# for the f32 kernels: flat G=256 in r2 (+1.2ms: 4x tri-matmul FLOPs,
# coarser exit) and G=256 with the two-level _scan_dot in r3 (fwd
# -0.7ms but step +0.6ms: (P,256) f32 intermediates are 64 vregs each,
# so the backward's live set spills to VMEM and eats the halved
# per-chunk overhead). G=128 keeps every (P,G) f32 value at 32 vregs.
# Env-tunable for the bf16 fast tier, where (P,256) is 32 vregs again
# (WAST3D_BLEND_G=256 — an experiment knob, not a config surface).
G = int(os.environ.get("WAST3D_BLEND_G", 128))
SUB = 128  # scan sub-chunk (tri-matmul width; lane-alignment quantum)
assert G % SUB == 0 and G > 0, G
NSUB = G // SUB
P = 256  # pixels per 16x16 tile
NROWS = 16  # packed data rows
TPP = 4  # tiles per grid program (amortizes per-program overhead)

# Packed row indices.
R_MX, R_MY, R_A, R_B, R_CC, R_OPA, R_DEPTH, R_R, R_G, R_B2 = range(10)

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4



# Split-bf16 matmul scheme: an f32 MXU matmul lowers to ~6 bf16 passes on
# v5e (measured: each f32 (P,G) matmul here costs ~1.7ms/frame at 856k
# dups vs ~0.3ms in bf16). Splitting an operand x = hi + lo with
# hi = bf16(x), lo = bf16(x - hi) keeps ~16 mantissa bits through the
# product; the triangular masks are 0/1 (EXACT in bf16), so the scans
# need only the 2 split passes, and the accumulation matmul needs 3
# (hi*hi + lo*hi + hi*lo; the dropped lo*lo term is ~1.5e-5 relative).


def _split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_dot(x, u_bf16):
    """x @ u for 0/1-valued u at 2 bf16 MXU passes. NOT full f32: the
    hi+lo split keeps ~16 of f32's 24 mantissa bits (~2^-16 relative
    error), so the transmittance scans and gradient prefix sums built on
    it — and hence T_EPS early termination near the threshold — can
    deviate slightly from an f32 reference. Parity-test tolerances
    (tests/test_pallas_blend.py) are set against this bound."""
    hi, lo = _split2(x)
    if "scan1" in _ABLATE:  # measurement only: drop the lo pass
        return jax.lax.dot(hi, u_bf16, preferred_element_type=jnp.float32)
    return (
        jax.lax.dot(hi, u_bf16, preferred_element_type=jnp.float32)
        + jax.lax.dot(lo, u_bf16, preferred_element_type=jnp.float32)
    )


def _tri_strict_upper():
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    return (r < c).astype(jnp.bfloat16)  # U[k,j]=1 iff k<j

def _tri_incl_upper():
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    return (r <= c).astype(jnp.bfloat16)


def _scan_dot(x, u_bf16):
    """Two-level prefix scan of x (P, G) along lanes via SUB-wide
    triangular matmuls (strict or inclusive per the mask): per-sub-chunk
    scans plus a running carry — the G-wide scan at SUB^2 (not G^2)
    matmul FLOPs. The carry (sum of all previous sub-chunks) is correct
    for both the strict and the inclusive mask."""
    parts = []
    carry = None
    for i in range(NSUB):
        xi = x[:, i * SUB:(i + 1) * SUB]
        ei = _split_dot(xi, u_bf16)
        if carry is not None:
            ei = ei + carry
        parts.append(ei)
        if i + 1 < NSUB:
            ti = jnp.sum(xi, axis=1, keepdims=True)
            carry = ti if carry is None else carry + ti
    return parts[0] if NSUB == 1 else jnp.concatenate(parts, axis=1)


def _scan_dot_fast(x, u_bf16):
    """`_scan_dot` for an already-bf16 operand: single MXU pass per
    sub-chunk (no hi/lo split), f32 sub-chunk totals for the carry."""
    parts = []
    carry = None
    for i in range(NSUB):
        xi = x[:, i * SUB:(i + 1) * SUB]
        ei = jax.lax.dot(xi, u_bf16, preferred_element_type=jnp.float32)
        if carry is not None:
            ei = ei + carry
        parts.append(ei)
        if i + 1 < NSUB:
            ti = jnp.sum(xi.astype(jnp.float32), axis=1, keepdims=True)
            carry = ti if carry is None else carry + ti
    return parts[0] if NSUB == 1 else jnp.concatenate(parts, axis=1)


def _chunk_quantities(data, px, py, logT, done, start, end, off, pix8=None):
    """Shared forward recomputation for one chunk.

    data: (16, G); px/py: (P, 1); logT: (P, 1) f32; done: (P, 1) f32
    (0/1; the mask is derived HERE so its i1 bitwidth-layout matches this
    chain's compares — mixing 32-bit and 16-bit masks needs an i1
    relayout Mosaic cannot do). All pixel x entry matrices are (P, G).

    pix8: optional (P,8) bf16 pixel monomials (jitter-off fwd kernel
    only): the power quadratic moves to the MXU as THREE split-bf16
    (P,8)@(8,G) matmuls (hi/mid/lo on the coefficient side restores
    ~2^-24 relative of the cancelling expansion terms — tighter than the
    exact tier's documented 2^-16 transmittance-scan class), replacing
    the dx/dy/power ~10-pass (P,G) f32 VPU chain. pix8 itself is exact
    (integer tile-local coords; monomials <= 225 < 2^8)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) + off
    col_valid = (cols >= start) & (cols < end)  # (1,G)

    mx = data[R_MX:R_MX + 1, :]  # (1,G)
    my = data[R_MY:R_MY + 1, :]
    A = data[R_A:R_A + 1, :]
    B = data[R_B:R_B + 1, :]
    CC = data[R_CC:R_CC + 1, :]
    # Folding the range mask into opacity keeps every downstream mask a
    # pure data predicate: out-of-range columns get alpha == 0 < ALPHA_MIN
    # and fall into `skip` for free — one (1,G) select instead of an
    # (P,G) broadcast `| ~col_valid` in the skip mask.
    opa = jnp.where(col_valid, data[R_OPA:R_OPA + 1, :], 0.0)

    if pix8 is not None:
        Ah, Ch, Bn = -0.5 * A, -0.5 * CC, -B  # (1,G)
        c8 = jnp.concatenate(
            [Ah, Ch, Bn,
             -2.0 * Ah * mx - Bn * my,
             -2.0 * Ch * my - Bn * mx,
             Ah * mx * mx + Ch * my * my + Bn * mx * my,
             jnp.zeros_like(mx), jnp.zeros_like(mx)],
            axis=0,
        )  # (8,G) f32
        c_hi, c_mid = _split2(c8)
        c_lo = (c8 - c_hi.astype(jnp.float32)
                - c_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        power = (
            jax.lax.dot(pix8, c_hi, preferred_element_type=jnp.float32)
            + jax.lax.dot(pix8, c_mid, preferred_element_type=jnp.float32)
            + jax.lax.dot(pix8, c_lo, preferred_element_type=jnp.float32)
        )  # (P,G) f32
        # The expansion's residual (~2^-24 of the cancelling terms, up
        # to ~1e-4 absolute) can push power spuriously POSITIVE exactly
        # where it matters most — at the splat's center pixel, where
        # true power ~= 0 and alpha is maximal. A bare `power > 0` skip
        # would zero that pixel. Clamp the exp argument and give the
        # skip test an error allowance instead (the direct-form branch
        # below needs neither: its PSD quadratic can't go positive
        # beyond ~1-ulp).
        power = jnp.minimum(power, 0.0) + jnp.maximum(power - 1e-3, 0.0)
    else:
        dx = mx - px  # (P,G)
        dy = my - py
        # Folded-coefficient form: Ah = -A/2, Ch = -C/2, Bn = -B cost
        # three (1,G) column ops (1/P of a (P,G) pass) and save one full
        # (P,G) pass vs -0.5*(...) - B dx dy. The min(power, 0) exp
        # guard is dropped outright: the conic is PSD, so power <= 0 up
        # to rounding, and a spuriously positive power is skip-masked
        # below (exp overflow to +inf still yields alpha = 0.99 ->
        # where(skip, 0) — finite either way).
        power = ((-0.5 * A) * dx) * dx + ((-0.5 * CC) * dy) * dy \
            + ((-B) * dx) * dy
    if "cheaptrans" in _ABLATE:  # measurement only: fake transcendentals
        alpha = jnp.minimum(ALPHA_MAX, opa * (1.0 + jnp.minimum(power, 0.0)))
    else:
        alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
    skip = (power > 0.0) | (alpha < ALPHA_MIN)
    alpha = jnp.where(skip, 0.0, alpha)

    s = -alpha if "cheaptrans" in _ABLATE else jnp.log1p(-alpha)
    # Exclusive scan as a strictly-triangular matmul: benchmarked FASTER
    # than a log-doubling roll+add lane scan on v5e (lane shuffles are
    # expensive; the MXU eats the (G,G) product).
    excl = _scan_dot(s, _tri_strict_upper())  # (P,G)
    if "cheaptrans" in _ABLATE:
        T_prev = 1.0 + (logT + excl)
    else:
        T_prev = jnp.exp(logT + excl)
    test_T = T_prev * (1.0 - alpha)
    # done_incl == done | (T_prev < eps) | ((test_T < eps) & (alpha > 0))
    # collapses to a single compare: test_T is monotone non-increasing
    # along the chunk (test_T[j] = T_prev[j+1] and T_prev[j+1](1-a) <=
    # T_prev[j+1]), and test_T < eps iff the entry triggers (alpha > 0)
    # or T_prev was already below eps (alpha == 0 -> test_T == T_prev).
    # The set equality is exact, not an approximation.
    done_incl = (done > 0.5) | (test_T < T_EPS)  # (P,G) 32-bit mask
    w = jnp.where(done_incl, 0.0, alpha * T_prev)
    # s masked to contributing entries: callers fold it into the running
    # logT (log1p(-alpha) of skipped/post-done entries is exactly 0/s
    # respectively, so this REUSES the transcendental instead of a second
    # log1p over (P, G) in the caller). By the same monotonicity,
    # done_incl's lane-OR == its LAST column == this chunk's carry-out
    # done flag; callers must compute it as a lane REDUCE (replicated
    # layout), not a lane slice — see the kernel bodies.
    s_live = jnp.where(done_incl, 0.0, s)
    return alpha, T_prev, done_incl, w, s_live


def _chunk_quantities_fast(data, px, py, logT, done, start, end, off):
    """bf16 variant of `_chunk_quantities` (the `fast_chain` mode): the
    ~30-op (P,G) elementwise chain is the VPU-throughput bound of the
    whole rasterizer, and bf16 elementwise ops run at 2x f32 rate.

    Validity rests on the recentred packing (pallas_path.py): means and
    pixel coords are tile-local, so bf16's 8-bit mantissa gives subpixel
    dx/dy error for typical splats (error scales with splat extent, and
    large-extent splats have proportionally small conic curvature). The
    transmittance accumulator logT stays f32 across chunks (per-chunk
    bf16 contributions, f32 running sum), bounding drift. Measured class:
    ~0.3% alpha error; NOT bit-comparable to the f32 chain. Quality gate
    PASSED r4: a full 30k-iteration 800^2 training run under fast_chain
    lands at 33.879 dB test PSNR vs 33.885 exact (0.006 dB delta,
    runs/qgate_r4_800_30k{,_fast}/quality_gate.json) — the serving CLIs
    (cli/render.py, cli/view.py) now default to this tier; training
    keeps the f32 chain (in-situ r4 A/B: the bwd fast chain's extra f32
    casts make the fast STEP slower, 50.1 vs 47.8 ms)."""
    bf = jnp.bfloat16
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) + off
    col_valid = (cols >= start) & (cols < end)  # (1,G)

    # `data` may already BE bf16 (the fast path packs bf16 end-to-end:
    # half the gather/DMA bytes); astype is then a no-op. All casts here
    # are (1,G) — 1/P of a full pass.
    mx = data[R_MX:R_MX + 1, :].astype(bf)  # (1,G)
    my = data[R_MY:R_MY + 1, :].astype(bf)
    Ah = (bf(-0.5) * data[R_A:R_A + 1, :].astype(bf))
    Ch = (bf(-0.5) * data[R_CC:R_CC + 1, :].astype(bf))
    Bn = -data[R_B:R_B + 1, :].astype(bf)
    opa = jnp.where(col_valid, data[R_OPA:R_OPA + 1, :].astype(bf), bf(0))

    dx = mx - px.astype(bf)  # (P,G) bf16
    dy = my - py.astype(bf)
    power = (Ah * dx) * dx + (Ch * dy) * dy + (Bn * dx) * dy
    alpha = jnp.minimum(bf(ALPHA_MAX), opa * jnp.exp(power))
    # v5e has NO bf16 vector compares ("target does not support this
    # comparison"): every mask here widens its operand to f32 first.
    # Probed on-chip: 32-bit masks select over bf16 values fine, so the
    # wheres stay bf16 — only the 3 compare operands pay a (P,G) cast.
    a32 = alpha.astype(jnp.float32)
    skip = (power.astype(jnp.float32) > 0.0) | (a32 < ALPHA_MIN)
    a32 = jnp.where(skip, 0.0, a32)
    alpha = a32.astype(bf)

    # log1p must run f32 too (bf16 log1p does not legalize on v5e); the
    # f32 alpha is already in hand from the compare widen.
    s = jnp.log1p(-a32).astype(bf)  # (P,G) bf16
    # Single-pass bf16 scan (the hi/lo split exists to recover f32-ish
    # accuracy — pointless when the operand is already bf16).
    excl = _scan_dot_fast(s, _tri_strict_upper())  # (P,G) f32

    T_prev = jnp.exp((logT + excl).astype(bf))  # (P,G) bf16
    test_T = T_prev * (bf(1) - alpha)
    # The carried done is folded ARITHMETICALLY (done pixels zero their
    # test_T, which trivially passes the threshold) instead of a
    # (P,1)|(P,G) mask OR: Mosaic's inference relayouts the (P,G) lt
    # mask to the (P,1) operand's lane-replicated layout, which cannot
    # legalize ("non-singleton dimension replicated in destination").
    done_incl = (test_T.astype(jnp.float32) * (1.0 - done)) < T_EPS
    w = jnp.where(done_incl, bf(0), alpha * T_prev)
    s_live = jnp.where(done_incl, bf(0), s)
    return alpha, T_prev, done_incl, w, s_live


def _chunk_quantities_fast_quad(data, pix8, logT, done, start, end, off):
    """`_chunk_quantities_fast` with the power quadratic moved to the MXU
    (fwd kernel only, jitter-off renders): power(P,G) = pix8 @ C8 where
    pix8 = [px^2, py^2, px*py, px, py, 1, 0, 0] is per-TILE constant
    (hoisted out of the chunk loop; EXACT in bf16 — tile-local pixel
    coords are integers in [0,16) so px^2, px*py <= 225 < 256 are
    exactly representable) and C8(8,G) carries the per-entry expanded
    coefficients in split-bf16 (hi+lo, 2 MXU passes — the expansion
    cancels terms up to ~|2*Ah*mx*px| so a single bf16 pass would leave
    ~2^-8 * cancellation-magnitude absolute error on power; hi+lo
    restores ~2^-16). Replaces the dx/dy/power ~9-op (P,G) VPU chain
    with 2 (P,8)@(8,G) matmuls + O(1,G) coefficient math. Requires
    integer pixel coords: render paths gate it on sampling_offsets is
    None."""
    bf = jnp.bfloat16
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) + off
    col_valid = (cols >= start) & (cols < end)  # (1,G)

    mx = data[R_MX:R_MX + 1, :].astype(jnp.float32)  # (1,G)
    my = data[R_MY:R_MY + 1, :].astype(jnp.float32)
    Ah = -0.5 * data[R_A:R_A + 1, :].astype(jnp.float32)
    Ch = -0.5 * data[R_CC:R_CC + 1, :].astype(jnp.float32)
    Bn = -data[R_B:R_B + 1, :].astype(jnp.float32)
    opa = jnp.where(col_valid, data[R_OPA:R_OPA + 1, :].astype(bf), bf(0))

    c8 = jnp.concatenate(
        [Ah, Ch, Bn,
         -2.0 * Ah * mx - Bn * my,
         -2.0 * Ch * my - Bn * mx,
         Ah * mx * mx + Ch * my * my + Bn * mx * my,
         jnp.zeros_like(mx), jnp.zeros_like(mx)],
        axis=0,
    )  # (8,G) f32
    c_hi, c_lo = _split2(c8)
    power = (
        jax.lax.dot(pix8, c_hi, preferred_element_type=jnp.float32)
        + jax.lax.dot(pix8, c_lo, preferred_element_type=jnp.float32)
    )  # (P,G) f32
    # Expansion residual (~2^-16 of the cancelling terms, up to ~1e-2)
    # can push power spuriously positive at the splat CENTER pixel where
    # alpha peaks; a bare `power > 0` skip would zero it. Clamp + skip
    # allowance (see the exact-tier variant in _chunk_quantities).
    power = jnp.minimum(power, 0.0) + jnp.maximum(power - 0.05, 0.0)

    alpha = jnp.minimum(bf(ALPHA_MAX), opa * jnp.exp(power.astype(bf)))
    a32 = alpha.astype(jnp.float32)
    skip = (power > 0.0) | (a32 < ALPHA_MIN)
    a32 = jnp.where(skip, 0.0, a32)
    alpha = a32.astype(bf)

    s = jnp.log1p(-a32).astype(bf)  # (P,G) bf16
    excl = _scan_dot_fast(s, _tri_strict_upper())  # (P,G) f32

    T_prev = jnp.exp((logT + excl).astype(bf))  # (P,G) bf16
    test_T = T_prev * (bf(1) - alpha)
    done_incl = (test_T.astype(jnp.float32) * (1.0 - done)) < T_EPS
    w = jnp.where(done_incl, bf(0), alpha * T_prev)
    s_live = jnp.where(done_incl, bf(0), s)
    return alpha, T_prev, done_incl, w, s_live


def _fwd_kernel(starts_ref, ends_ref, data_hbm, pixf_ref, acc_ref, tfin_ref,
                data_vmem, sem, *, fast=False, quad=False):
    """Forward blend. Processes TPP tiles per grid program (amortizing
    per-program overhead) with double-buffered chunk DMA: the copy for
    chunk c+1 is in flight while chunk c computes (the CUDA kernel gets
    the same overlap from its cooperative shared-memory fetch)."""
    prog = pl.program_id(0)
    chunk_fn = _chunk_quantities_fast if fast else _chunk_quantities

    def one_tile(ti, _):
        t = prog * TPP + ti
        start = starts_ref[t]
        end = ends_ref[t]
        px = pixf_ref[ti, :, 0:1]  # (P,1)
        py = pixf_ref[ti, :, 1:2]
        if quad:
            # Per-tile pixel monomials for the quad-form MXU power
            # (exact bf16: integer tile-local coords, see
            # _chunk_quantities_fast_quad). Hoisted out of the chunk loop.
            one = jnp.ones_like(px)
            pix8 = jnp.concatenate(
                [px * px, py * py, px * py, px, py, one,
                 jnp.zeros_like(px), jnp.zeros_like(px)],
                axis=1).astype(jnp.bfloat16)  # (P,8)
        astart = (start // G) * G
        nchunks = pl.cdiv(jnp.maximum(end - astart, 0), G)

        def dma(slot, c):
            return pltpu.make_async_copy(
                data_hbm.at[:, pl.ds(astart + c * G, G)],
                data_vmem.at[slot], sem.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            dma(0, 0).start()

        def cond(state):
            c, logT, done, _ = state
            if "noexit" in _ABLATE:  # measurement only: no early exit
                return c < nchunks
            return (c < nchunks) & (jnp.min(done) < 0.5)

        def body(state):
            c, logT, done, acc = state
            slot = jax.lax.rem(c, 2)
            off = astart + c * G

            @pl.when(c + 1 < nchunks)
            def _():
                dma(1 - slot, c + 1).start()

            dma(slot, c).wait()
            data = data_vmem[slot]  # (16,G)
            if fast and quad:
                alpha, T_prev, done_incl, w, s_live = (
                    _chunk_quantities_fast_quad(
                        data, pix8, logT, done, start, end, off))
            elif quad:
                alpha, T_prev, done_incl, w, s_live = _chunk_quantities(
                    data, px, py, logT, done, start, end, off, pix8=pix8)
            else:
                alpha, T_prev, done_incl, w, s_live = chunk_fn(
                    data, px, py, logT, done, start, end, off
                )
            # acc += w @ data^T at 3 bf16 passes (see _split2 doc); in
            # fast mode w is already bf16 (2 passes, data still split).
            if "noacc" in _ABLATE:  # measurement only: ablate acc matmuls
                acc = acc + w[:, :NROWS].astype(jnp.float32)
            else:
                dims = (((1,), (1,)), ((), ()))
                if fast and data.dtype == jnp.bfloat16:
                    # bf16-packed fast path: data needs no split at all.
                    acc = acc + jax.lax.dot_general(
                        w, data, dims, preferred_element_type=jnp.float32)
                elif fast:
                    d_hi, d_lo = _split2(data)
                    acc = (
                        acc
                        + jax.lax.dot_general(
                            w, d_hi, dims,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            w, d_lo, dims,
                            preferred_element_type=jnp.float32)
                    )  # (P,16)
                else:
                    d_hi, d_lo = _split2(data)
                    w_hi, w_lo = _split2(w)
                    acc = (
                        acc
                        + jax.lax.dot_general(
                            w_hi, d_hi, dims,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            w_lo, d_hi, dims,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            w_hi, d_lo, dims,
                            preferred_element_type=jnp.float32)
                    )  # (P,16)
            if fast:
                s_sum = jnp.sum(s_live.astype(jnp.float32), axis=1,
                                keepdims=True)
            else:
                s_sum = jnp.sum(s_live, axis=1, keepdims=True)
            logT = logT + s_sum
            # done_incl is monotone along the chunk, so its OR over lanes
            # equals its last lane — but the carry-out MUST be a float
            # lane REDUCE, not a lane slice or an i1 vector: Mosaic
            # cannot legalize an scf.yield whose vreg layout differs from
            # the loop carry's splat init, and neither offset-layout
            # slices nor mask (i1) relayouts legalize (both failed on
            # real TPU; f32 {0,*} vs splat does). Hence the f32 done
            # carry with in-chunk `> 0.5` / `min < 0.5` tests at (P,1)
            # cost. (Both chains produce 32-bit masks — v5e has no bf16
            # compares — so the f32 reduce is layout-consistent.)
            done = jnp.max(done_incl.astype(jnp.float32), axis=1,
                           keepdims=True)
            return c + 1, logT, done, acc

        init = (
            jnp.int32(0),
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32),  # done (f32: see body note)
            jnp.zeros((P, NROWS), jnp.float32),
        )
        c_final, logT, done, acc = jax.lax.while_loop(cond, body, init)

        # Drain a prefetched-but-unconsumed copy after an early exit.
        @pl.when((c_final < nchunks) & (c_final > 0))
        def _():
            dma(jax.lax.rem(c_final, 2), c_final).wait()

        acc_ref[ti] = acc
        tfin_ref[ti] = jnp.exp(logT)
        return _

    jax.lax.fori_loop(0, TPP, one_tile, None)


def _bwd_kernel(starts_ref, ends_ref, data_hbm, pixf_ref, grads_ref,
                dzero_hbm, dout_hbm, data_vmem, din_vmem, dout_vmem,
                sem, isem, osem, *, fast=False):
    """Backward walk with read-modify-write accumulation (see module doc),
    TPP tiles per program and double-buffered input DMA. Early-exits once
    every pixel saturates, exactly like the forward — later entries have
    w = 0 and contribute zero gradient, and their (pre-zeroed, aliased)
    output blocks are simply never touched.

    The RMW is fully pipelined: the read of output block c+1 is
    prefetched with the input DMA for chunk c+1 (distinct offsets within
    a tile, so it cannot race this tile's writes), and writes are async
    with a slot-reuse wait two chunks later; each tile drains its
    outstanding writes before returning, which is what makes the next
    tile's first read (the shared 128-aligned boundary block) safe."""
    prog = pl.program_id(0)

    def one_tile(ti, _):
        t = prog * TPP + ti
        start = starts_ref[t]
        end = ends_ref[t]
        px = pixf_ref[ti, :, 0:1]  # (P,1)
        py = pixf_ref[ti, :, 1:2]
        gcr = grads_ref[ti, :, 0:1]
        gcg = grads_ref[ti, :, 1:2]
        gcb = grads_ref[ti, :, 2:3]
        gd = grads_ref[ti, :, 3:4]
        s_total = grads_ref[ti, :, 5:6]
        if fast:  # (P,1) casts, hoisted out of the chunk loop
            gcr_b = gcr.astype(jnp.bfloat16)
            gcg_b = gcg.astype(jnp.bfloat16)
            gcb_b = gcb.astype(jnp.bfloat16)
            gd_b = gd.astype(jnp.bfloat16)
        astart = (start // G) * G
        nchunks = pl.cdiv(jnp.maximum(end - astart, 0), G)

        def in_dma(slot, c):
            return pltpu.make_async_copy(
                data_hbm.at[:, pl.ds(astart + c * G, G)],
                data_vmem.at[slot], sem.at[slot],
            )

        def out_read(slot, c):
            return pltpu.make_async_copy(
                dout_hbm.at[:, pl.ds(astart + c * G, G)],
                din_vmem.at[slot], isem.at[slot],
            )

        def out_write(slot, c):
            return pltpu.make_async_copy(
                dout_vmem.at[slot],
                dout_hbm.at[:, pl.ds(astart + c * G, G)], osem.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            in_dma(0, 0).start()
            out_read(0, 0).start()

        def cond(state):
            c, logT, done, prefix = state
            if "noexit" in _ABLATE:  # measurement only: no early exit
                return c < nchunks
            return (c < nchunks) & (jnp.min(done) < 0.5)

        def body(state):
            c, logT, done, prefix = state
            off = astart + c * G
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < nchunks)
            def _():
                in_dma(1 - slot, c + 1).start()
                out_read(1 - slot, c + 1).start()

            in_dma(slot, c).wait()
            data = data_vmem[slot]
            chunk_fn = _chunk_quantities_fast if fast else _chunk_quantities
            alpha, T_prev, done_incl, w, s_live = chunk_fn(
                data, px, py, logT, done, start, end, off
            )

            if "cheapgrad" in _ABLATE:
                # Measurement only: stub the whole gradient block (q, qw
                # prefix scan, dpow, moment sums, color/depth reductions)
                # with one (P,G) product + one sublane reduction, keeping
                # the recompute chain, the RMW pipeline and the loop
                # carries intact. The in-situ delta vs baseline is the
                # CEILING for any MXU offload of the gradient block.
                aw = alpha.astype(jnp.float32) * w.astype(jnp.float32)
                stub = jnp.sum(aw, axis=0, keepdims=True)  # (1,G)
                dgrad = jnp.concatenate([stub] * NROWS, axis=0)  # (16,G)
                out_read(slot, c).wait()

                @pl.when(c >= 2)
                def _():
                    out_write(slot, c - 2).wait()

                dout_vmem[slot] = din_vmem[slot] + dgrad
                out_write(slot, c).start()

                if fast:
                    logT = logT + jnp.sum(s_live.astype(jnp.float32),
                                          axis=1, keepdims=True)
                else:
                    logT = logT + jnp.sum(s_live, axis=1, keepdims=True)
                done = jnp.max(done_incl.astype(jnp.float32), axis=1,
                               keepdims=True)
                return c + 1, logT, done, prefix

            # q[p,g] = gc . rgb_g + gd * depth_g
            if fast:
                q = (
                    data[R_R:R_R + 1, :].astype(jnp.bfloat16) * gcr_b
                    + data[R_G:R_G + 1, :].astype(jnp.bfloat16) * gcg_b
                    + data[R_B2:R_B2 + 1, :].astype(jnp.bfloat16) * gcb_b
                    + data[R_DEPTH:R_DEPTH + 1, :].astype(jnp.bfloat16)
                    * gd_b
                )  # (P,G) bf16
                qw = q * w
                prefix_incl = prefix + _scan_dot_fast(
                    qw, _tri_incl_upper()
                )
                alpha32 = alpha.astype(jnp.float32)
                qT = (q * T_prev).astype(jnp.float32)
            else:
                q = (
                    data[R_R:R_R + 1, :] * gcr
                    + data[R_G:R_G + 1, :] * gcg
                    + data[R_B2:R_B2 + 1, :] * gcb
                    + data[R_DEPTH:R_DEPTH + 1, :] * gd
                )  # (P,G)
                qw = q * w
                # NOTE r3: a hi-only bf16 prefix pass was tried here (drop
                # the lo pass of _split_dot) — it blew the scale-normalized
                # gradient-parity tolerance 8x (1.7% error vs the tiled f32
                # reference). The suffix-sum term amplifies per-chunk prefix
                # noise; keep the split-bf16 two-pass scan. (The fast
                # branch above accepts the bf16 error class by contract.)
                prefix_incl = prefix + _scan_dot(qw, _tri_incl_upper())
                alpha32 = alpha
                qT = q * T_prev
            # Compares on f32 operands only (v5e: no bf16 compares); in
            # fast mode w/opa are bf16 and alpha32 is the f32 widen.
            live = w.astype(jnp.float32) > 0.0 if fast else w > 0.0
            one_m = 1.0 - alpha32

            opa = data[R_OPA:R_OPA + 1, :].astype(jnp.float32)
            # alpha = min(0.99, opa*exp(power)); clamp kills the grad.
            # dalpha is only consumed through dpow — fold its live-mask
            # into the single where here (one (P,G) select, not two).
            unclamped = (alpha32 < ALPHA_MAX) & live
            dpow = jnp.where(
                unclamped,
                (qT - (s_total - prefix_incl) / one_m) * alpha32,
                0.0,
            )
            # dalpha*exp_pow = dalpha*alpha/opa = dpow/opa with opa
            # constant per entry — divide once per (1,G) column AFTER the
            # pixel reduction instead of a (P,G) divide+where.
            dopa = jnp.where(
                opa > 0.0,
                jnp.sum(dpow, axis=0, keepdims=True) / opa,
                0.0,
            )  # (1,G)

            A = data[R_A:R_A + 1, :]
            B = data[R_B:R_B + 1, :]
            CC = data[R_CC:R_CC + 1, :]
            mx = data[R_MX:R_MX + 1, :]
            my = data[R_MY:R_MY + 1, :]
            dx = mx - px
            dy = my - py
            # Moment form: A/B/CC are constant per COLUMN, so they factor
            # out of the pixel reductions — 5 (P,G) products + 5 sublane
            # sums instead of 17 (P,G) passes, then (1,G) algebra. Same
            # math reassociated (f32 rounding order differs immaterially).
            dpx = dpow * dx
            dpy = dpow * dy
            Sx = jnp.sum(dpx, axis=0, keepdims=True)  # (1,G)
            Sy = jnp.sum(dpy, axis=0, keepdims=True)
            dmx = -(A * Sx + B * Sy)
            dmy = -(CC * Sy + B * Sx)
            dA = -0.5 * jnp.sum(dpx * dx, axis=0, keepdims=True)
            dB = -jnp.sum(dpx * dy, axis=0, keepdims=True)
            dC = -0.5 * jnp.sum(dpy * dy, axis=0, keepdims=True)
            ddepth = jnp.sum(w * gd, axis=0, keepdims=True)
            dr = jnp.sum(w * gcr, axis=0, keepdims=True)
            dg = jnp.sum(w * gcg, axis=0, keepdims=True)
            db = jnp.sum(w * gcb, axis=0, keepdims=True)

            zero = jnp.zeros((1, G), jnp.float32)
            dgrad = jnp.concatenate(
                [dmx, dmy, dA, dB, dC, dopa, ddepth, dr, dg, db,
                 zero, zero, zero, zero, zero, zero], axis=0
            )  # (16,G)

            # Read-modify-write, pipelined: the block's prior contents
            # were prefetched into din_vmem[slot]; wait for the write
            # that last used this dout slot (chunk c-2) before reusing.
            out_read(slot, c).wait()

            @pl.when(c >= 2)
            def _():
                out_write(slot, c - 2).wait()

            dout_vmem[slot] = din_vmem[slot] + dgrad
            out_write(slot, c).start()

            if fast:
                logT = logT + jnp.sum(s_live.astype(jnp.float32), axis=1,
                                      keepdims=True)
                prefix = prefix + jnp.sum(qw.astype(jnp.float32), axis=1,
                                          keepdims=True)
            else:
                logT = logT + jnp.sum(s_live, axis=1, keepdims=True)
                prefix = prefix + jnp.sum(qw, axis=1, keepdims=True)
            # Float lane reduce, not a lane slice / i1 carry: see the
            # forward kernel's Mosaic scf.yield layout note.
            done = jnp.max(done_incl.astype(jnp.float32), axis=1,
                           keepdims=True)
            return c + 1, logT, done, prefix

        init = (
            jnp.int32(0),
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32),  # done (f32: see fwd note)
            jnp.zeros((P, 1), jnp.float32),
        )
        c_final, _logT, _done, _prefix = jax.lax.while_loop(cond, body, init)

        # Drain prefetched-but-unconsumed copies after an early exit.
        @pl.when((c_final < nchunks) & (c_final > 0))
        def _():
            in_dma(jax.lax.rem(c_final, 2), c_final).wait()
            out_read(jax.lax.rem(c_final, 2), c_final).wait()

        # Drain outstanding writes (chunks c_final-1, c_final-2): the
        # next tile's first block may alias this tile's last block.
        @pl.when(c_final >= 2)
        def _():
            out_write(jax.lax.rem(c_final, 2), c_final - 2).wait()

        @pl.when(c_final >= 1)
        def _():
            out_write(jax.lax.rem(c_final - 1, 2), c_final - 1).wait()

        return _

    jax.lax.fori_loop(0, TPP, one_tile, None)


def _blend_fwd_impl(packed, pixf, starts, ends, *, num_tiles, interpret,
                    fast=False, quad=False):
    # Pad the tile axis to a TPP multiple (empty ranges for pad tiles).
    num_progs = -(-num_tiles // TPP)
    nt_pad = num_progs * TPP
    if nt_pad != num_tiles:
        pixf = jnp.pad(pixf, ((0, nt_pad - num_tiles), (0, 0), (0, 0)))
        starts = jnp.pad(starts, (0, nt_pad - num_tiles))
        ends = jnp.pad(ends, (0, nt_pad - num_tiles))
    acc, tfin = pl.pallas_call(
        functools.partial(_fwd_kernel, fast=fast, quad=quad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_progs,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed (manual DMA)
                pl.BlockSpec((TPP, P, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TPP, P, NROWS), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TPP, P, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, NROWS, G), packed.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nt_pad, P, NROWS), jnp.float32),
            jax.ShapeDtypeStruct((nt_pad, P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(starts, ends, packed, pixf)
    return acc[:num_tiles], tfin[:num_tiles, :, 0]


def _blend_bwd_impl(packed, pixf, starts, ends, grads, *, num_tiles,
                    interpret, fast=False):
    K = packed.shape[1]
    dzeros = jnp.zeros((NROWS, K), jnp.float32)
    num_progs = -(-num_tiles // TPP)
    nt_pad = num_progs * TPP
    if nt_pad != num_tiles:
        pixf = jnp.pad(pixf, ((0, nt_pad - num_tiles), (0, 0), (0, 0)))
        grads = jnp.pad(grads, ((0, nt_pad - num_tiles), (0, 0), (0, 0)))
        starts = jnp.pad(starts, (0, nt_pad - num_tiles))
        ends = jnp.pad(ends, (0, nt_pad - num_tiles))
    dpacked = pl.pallas_call(
        functools.partial(_bwd_kernel, fast=fast),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_progs,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed
                pl.BlockSpec((TPP, P, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TPP, P, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # dzeros (aliased out)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # dpacked (manual DMA)
            ],
            scratch_shapes=[
                pltpu.VMEM((2, NROWS, G), packed.dtype),  # data_vmem
                pltpu.VMEM((2, NROWS, G), jnp.float32),  # din_vmem
                pltpu.VMEM((2, NROWS, G), jnp.float32),  # dout_vmem
                pltpu.SemaphoreType.DMA((2,)),  # sem
                pltpu.SemaphoreType.DMA((2,)),  # isem
                pltpu.SemaphoreType.DMA((2,)),  # osem
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((NROWS, K), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={5: 0},  # dzeros -> dpacked (incl. scalar args)
    )(starts, ends, packed, pixf, grads, dzeros)[0]
    return dpacked


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend(packed, pixf, starts, ends, num_tiles, interpret=False,
          fast=False, quad=False):
    """Per-tile sorted blend.

    Args:
      packed: [16, K + G] packed sorted duplicate data (G cols tail pad).
      pixf: [T, P, 2] jittered pixel coords per tile.
      starts/ends: [T] int32 sorted-range bounds.
      fast: bf16 elementwise chain in both kernels (the backward keeps
        its divide / moment reductions and all accumulators in f32;
        per-entry recompute, q/qw, and the prefix scan run bf16).
        ~0.3%-class alpha/gradient error vs the f32 chain.
      quad: fast-mode forward only — power quadratic as 2 split-bf16
        (P,8)@(8,G) MXU matmuls instead of the (P,G) VPU chain. Valid
        only for INTEGER pixel coords (no jitter); callers gate it. The
        backward keeps the non-quad recompute (it needs dx/dy for the
        gradient chain anyway); the fwd/bwd alpha recompute divergence
        this adds is within the tier's bf16 class.
    Returns:
      acc [T, P, 16] weighted sums (row layout: depth at 6, rgb at 7..9),
      final_T [T, P].
    """
    return _blend_fwd_impl(packed, pixf, starts, ends,
                           num_tiles=num_tiles, interpret=interpret,
                           fast=fast, quad=quad)


def _blend_vjp_fwd(packed, pixf, starts, ends, num_tiles, interpret, fast,
                   quad):
    out = _blend_fwd_impl(packed, pixf, starts, ends,
                          num_tiles=num_tiles, interpret=interpret,
                          fast=fast, quad=quad)
    return out, (packed, pixf, starts, ends, out[0], out[1])


def _blend_vjp_bwd(num_tiles, interpret, fast, quad, residuals, cotangents):
    packed, pixf, starts, ends, acc, tfin = residuals
    g_acc, g_tfin = cotangents
    gc = g_acc[:, :, R_R:R_B2 + 1]  # [T,P,3]
    gd = g_acc[:, :, R_DEPTH:R_DEPTH + 1]  # [T,P,1]
    gT = g_tfin[:, :, None]
    c_pre = acc[:, :, R_R:R_B2 + 1]
    d_pre = acc[:, :, R_DEPTH:R_DEPTH + 1]
    s_total = (
        jnp.sum(gc * c_pre, axis=2, keepdims=True)
        + gd * d_pre
        + tfin[:, :, None] * gT
    )  # [T,P,1]
    pad = jnp.zeros_like(gd)
    grads = jnp.concatenate([gc, gd, gT, s_total, pad, pad], axis=2)  # [T,P,8]
    # NOTE: cotangents on acc rows other than depth/rgb are ignored — those
    # are byproducts callers must not differentiate through.
    dpacked = _blend_bwd_impl(packed, pixf, starts, ends, grads,
                              num_tiles=num_tiles, interpret=interpret,
                              fast=fast)
    # custom_vjp cotangents must match the primal dtype; with bf16-packed
    # fast data this quantizes per-duplicate gradients to bf16 — the
    # accuracy class the default sortpacked reduction applies anyway.
    return dpacked.astype(packed.dtype), None, None, None


blend.defvjp(_blend_vjp_fwd, _blend_vjp_bwd)


def pack_sorted(prep_sorted: dict, K_pad: int) -> jnp.ndarray:
    """Pack gathered-sorted per-duplicate data into the [16, K_pad] layout."""
    K = prep_sorted["mx"].shape[0]
    rows = [
        prep_sorted["mx"], prep_sorted["my"],
        prep_sorted["conic"][:, 0], prep_sorted["conic"][:, 1],
        prep_sorted["conic"][:, 2], prep_sorted["opacity"],
        prep_sorted["depth"],
        prep_sorted["color"][:, 0], prep_sorted["color"][:, 1],
        prep_sorted["color"][:, 2],
    ]
    packed = jnp.stack(rows, axis=0)  # [10,K]
    return jnp.pad(packed, ((0, NROWS - packed.shape[0]), (0, K_pad - K)))
