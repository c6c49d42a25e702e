"""Fused Pallas TPU kernel for the pair-descriptor loss.

Computes  loss = sum_ij W_ij (D_ij - T_ij)^2  with
  D = cdist(x, x), T = cdist(tp, tp),
  W_ij = cg * [j in globalNN(i)] + cl * [j in localNN(i)]
without materializing any [Mp, Mp] intermediate in HBM — the XLA
streaming path (`fit.descriptor_loss`) round-trips several
[Mp, block] f32 slabs per scan step through HBM (matmul outputs break
fusion), which caps large patches at ~38 ball-steps/s; this kernel keeps
every slab in VMEM. The reference materializes the full distance
matrices with `torch.cdist` (notebook 11 cell 28) — dense [M, M] on a
datacenter GPU — so this is the TPU-native answer to the same math.

Layout: points are carried TRANSPOSED as (3, Mp) — an (Mp, 3) f32 array
in VMEM pads its 3-wide minor dim to 128 lanes (8MB at 16k, x4 under a
vmapped batch: scoped-vmem OOM), while (3, Mp) is 512KB. The pair-code
matrix streams as (BR, BC) uint8 blocks over a 2-D grid (~128KB working
set); x/tp stay VMEM-resident whole.

Gradient (custom VJP, recompute-based like the blend kernel):
  dL/dx_i = sum_j (R_ij + R_ji)(x_i - x_j),
  R_ij = 2 W_ij (D_ij - T_ij) / max(D_ij, eps)
accumulated per (row-block, col-block) as
  dx[:, rows] += x_r * rowsum(R) - x_c @ R^T
  dx[:, cols] += x_c * colsum(R) - x_r @ R
into a whole-(3, Mp) VMEM scratch (the grid is iterated sequentially).

Batching: `jax.vmap` maps the batch onto a leading grid dimension with
x/out batched and tp/code broadcast — used by `fit_balls`' per-ball vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 256  # rows per grid program
BC = 1024  # cols per inner step
EPS = 1e-12
_F32 = jax.lax.Precision.HIGHEST


def _block_terms(x_r3, x_c3, t_r3, t_c3, code_blk, cg, cl):
    """W, D, T for one (BR, BC) block from (3, BR)/(3, BC) point slabs."""
    cdim = (((0,), (0,)), ((), ()))
    xx = jax.lax.dot_general(x_r3, x_c3, cdim, precision=_F32)  # (BR,BC)
    a2r = jnp.sum(x_r3 * x_r3, axis=0)[:, None]  # (BR,1)
    a2c = jnp.sum(x_c3 * x_c3, axis=0)[None, :]  # (1,BC)
    d = jnp.sqrt(jnp.maximum(a2r + a2c - 2.0 * xx, 0.0))
    tt = jax.lax.dot_general(t_r3, t_c3, cdim, precision=_F32)
    b2r = jnp.sum(t_r3 * t_r3, axis=0)[:, None]
    b2c = jnp.sum(t_c3 * t_c3, axis=0)[None, :]
    t = jnp.sqrt(jnp.maximum(b2r + b2c - 2.0 * tt, 0.0))
    ci = code_blk.astype(jnp.int32)
    w = cg * (ci & 1).astype(jnp.float32) + cl * (
        (ci >> 1) & 1
    ).astype(jnp.float32)
    return w, d, t


def _loss_kernel(coefs_ref, x_ref, tp_ref, code_ref, loss_ref, acc_ref):
    r = pl.program_id(0)
    cb = pl.program_id(1)
    last = (r == pl.num_programs(0) - 1) & (cb == pl.num_programs(1) - 1)
    cg = coefs_ref[0]
    cl = coefs_ref[1]

    @pl.when((r == 0) & (cb == 0))
    def _():
        acc_ref[0] = jnp.float32(0.0)

    x_r3 = x_ref[:, pl.ds(r * BR, BR)]  # (3,BR)
    t_r3 = tp_ref[:, pl.ds(r * BR, BR)]
    x_c3 = x_ref[:, pl.ds(cb * BC, BC)]
    t_c3 = tp_ref[:, pl.ds(cb * BC, BC)]
    w, d, t = _block_terms(x_r3, x_c3, t_r3, t_c3, code_ref[...], cg, cl)
    acc_ref[0] += jnp.sum(w * (d - t) * (d - t))

    @pl.when(last)
    def _():
        loss_ref[0, 0] = acc_ref[0]


def _grad_kernel(coefs_ref, x_ref, tp_ref, code_ref, dx_ref, dx_vmem):
    r = pl.program_id(0)
    cb = pl.program_id(1)
    last = (r == pl.num_programs(0) - 1) & (cb == pl.num_programs(1) - 1)
    cg = coefs_ref[0]
    cl = coefs_ref[1]

    @pl.when((r == 0) & (cb == 0))
    def _():
        dx_vmem[:, :] = jnp.zeros_like(dx_vmem)

    x_r3 = x_ref[:, pl.ds(r * BR, BR)]  # (3,BR)
    t_r3 = tp_ref[:, pl.ds(r * BR, BR)]
    x_c3 = x_ref[:, pl.ds(cb * BC, BC)]
    t_c3 = tp_ref[:, pl.ds(cb * BC, BC)]
    w, d, t = _block_terms(x_r3, x_c3, t_r3, t_c3, code_ref[...], cg, cl)
    R = 2.0 * w * (d - t) / jnp.maximum(d, EPS)  # (BR,BC)
    rsum_t = jnp.sum(R, axis=1)[None, :]  # (1,BR)
    csum_t = jnp.sum(R, axis=0)[None, :]  # (1,BC)
    # (3,BC)@(BC,BR)^T-free forms: contract R's col axis against x_c3's
    # lane axis and R's row axis against x_r3's.
    rx_c = jax.lax.dot_general(
        x_c3, R, (((1,), (1,)), ((), ())), precision=_F32
    )  # (3,BR)
    rt_x_r = jax.lax.dot_general(
        x_r3, R, (((1,), (0,)), ((), ())), precision=_F32
    )  # (3,BC)
    dx_vmem[:, pl.ds(r * BR, BR)] += x_r3 * rsum_t - rx_c
    dx_vmem[:, pl.ds(cb * BC, BC)] += x_c3 * csum_t - rt_x_r

    @pl.when(last)
    def _():
        dx_ref[:, :] = dx_vmem[:, :]


def _loss_impl(x3, tp3, code, coefs, interpret):
    mp = x3.shape[1]
    assert mp % BC == 0 and mp % BR == 0, mp
    rb, cbn = mp // BR, mp // BC
    partial_losses = pl.pallas_call(
        _loss_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rb, cbn),
            in_specs=[
                pl.BlockSpec((3, mp), lambda r, c, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, mp), lambda r, c, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, BC), lambda r, c, *_: (r, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda r, c, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(coefs, x3, tp3, code)
    return partial_losses[0, 0]


def _grad_impl(x3, tp3, code, coefs, interpret):
    mp = x3.shape[1]
    rb, cbn = mp // BR, mp // BC
    dx3 = pl.pallas_call(
        _grad_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rb, cbn),
            in_specs=[
                pl.BlockSpec((3, mp), lambda r, c, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, mp), lambda r, c, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, BC), lambda r, c, *_: (r, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, mp), lambda r, c, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((3, mp), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((3, mp), jnp.float32),
        interpret=interpret,
    )(coefs, x3, tp3, code)
    return dx3


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def pair_loss(x, tp, code, cg, cl, interpret=False):
    """sum_ij W_ij (D_ij - T_ij)^2 via the fused kernel (module doc).

    x, tp: [Mp, 3] (transposed internally)."""
    coefs = jnp.stack([jnp.asarray(cg, jnp.float32),
                       jnp.asarray(cl, jnp.float32)])
    return _loss_impl(x.T, tp.T, code, coefs, interpret)


def _pair_loss_fwd(x, tp, code, cg, cl, interpret):
    coefs = jnp.stack([jnp.asarray(cg, jnp.float32),
                       jnp.asarray(cl, jnp.float32)])
    return _loss_impl(x.T, tp.T, code, coefs, interpret), (x, tp, code, coefs)


def _pair_loss_bwd(interpret, res, g):
    x, tp, code, coefs = res
    dx3 = _grad_impl(x.T, tp.T, code, coefs, interpret)
    return (dx3.T * g, jnp.zeros_like(tp), None,
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


pair_loss.defvjp(_pair_loss_fwd, _pair_loss_bwd)
