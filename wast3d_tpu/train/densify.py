"""Adaptive density control under XLA static shapes.

Re-design of the reference's dynamic-shape densification
(`/root/reference/scene/gaussian_model.py:349-407`): clone small
high-gradient Gaussians, split large high-gradient ones into N=2 children
sampled from the Gaussian itself, prune transparent/oversized ones — with
optimizer-moment surgery (`:258-327`: new rows get zeroed Adam moments,
pruned rows are removed).

The reference reallocates every tensor each call (`torch.cat` / boolean
indexing). Under jit we instead keep the capacity-padded GaussianScene and
express the same operations as masked scatters at **unchanged shapes**:

- prune      -> clear validity bits, park params at DEAD values
- clone      -> scatter source rows into free slots
- split      -> scatter 2 sampled children into free slots, kill sources
- moments    -> scatter zeros at every newly-populated slot

Free-slot allocation is a cumsum ranking over the validity mask — O(C),
deterministic, no host sync. If free capacity runs out, the lowest-index
candidates win and the rest are dropped; the returned `n_dropped` lets the
host grow capacity (a rare, amortized recompile) before the next call.

Densification *stats* (positional-gradient accumulator, seen-view counter,
max screen radius; reference `add_densification_stats` `:405-407`) live in
a DensifyStats pytree and are reset to zero by densify_and_prune exactly
as the reference's `densification_postfix` does (`:345-347`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from wast3d_tpu.core.transforms import quat_to_rotmat
from wast3d_tpu.scene.gaussians import DEAD_OPACITY, DEAD_XYZ, GaussianScene
from wast3d_tpu.train.optim import AdamState


class DensifyStats(NamedTuple):
    xyz_gradient_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray  # [C]
    max_radii2d: jnp.ndarray  # [C] float32 (pixels)


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(z, z, z)


def add_stats(
    stats: DensifyStats,
    means2d_grad: jnp.ndarray,
    radii: jnp.ndarray,
    visibility: jnp.ndarray,
    width: int,
    height: int,
) -> DensifyStats:
    """Accumulate view-space positional gradient norms for visible
    Gaussians (reference `add_densification_stats`, `:405-407`;
    `train.py:140-143`).

    means2d_grad is d(loss)/d(means2d) in *pixel* units; the reference's
    grad is w.r.t. NDC (its backward multiplies by 0.5*W / 0.5*H,
    `backward.cu` ddelx_dx), so we rescale to keep the
    densify_grad_threshold calibration identical."""
    gx = means2d_grad[:, 0] * (0.5 * width)
    gy = means2d_grad[:, 1] * (0.5 * height)
    norm = jnp.sqrt(gx * gx + gy * gy)
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + norm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(
            stats.max_radii2d, jnp.where(visibility, radii.astype(jnp.float32), 0.0)
        ),
    )


def add_stats_batch(
    stats: DensifyStats,
    means2d_grad: jnp.ndarray,  # [B, C, 2] per-view grads of the MEAN loss
    radii: jnp.ndarray,  # [B, C]
    visibility: jnp.ndarray,  # [B, C] bool
    width: int,
    height: int,
) -> DensifyStats:
    """Batched `add_stats`: one camera batch = B reference iterations.

    means2d_grad comes from differentiating the batch-MEAN loss; since a
    view's means2d offset only influences its own loss term, multiplying
    by B recovers each view's own-loss gradient (what the reference
    accumulates one view at a time, `train.py:140-143`)."""
    B = means2d_grad.shape[0]
    gx = means2d_grad[..., 0] * (0.5 * width * B)
    gy = means2d_grad[..., 1] * (0.5 * height * B)
    norm = jnp.sqrt(gx * gx + gy * gy)  # [B, C]
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + jnp.sum(norm * vis, 0),
        denom=stats.denom + jnp.sum(vis, 0),
        max_radii2d=jnp.maximum(
            stats.max_radii2d,
            jnp.max(jnp.where(visibility, radii.astype(jnp.float32), 0.0), 0),
        ),
    )


def _free_slot_table(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """slot_at_rank[r] = index of the r-th free slot (C if none)."""
    C = mask.shape[0]
    free = ~mask
    frank = jnp.cumsum(free) - 1  # rank among free slots
    slot_at_rank = jnp.full((C,), C, jnp.int32)
    slot_at_rank = slot_at_rank.at[jnp.where(free, frank, C)].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop"
    )
    n_free = jnp.sum(free)
    return slot_at_rank, n_free


def _scatter_rows(scene_arrays: dict, src_rows: dict, dest: jnp.ndarray) -> dict:
    """Scatter src rows into dest slots (dest == C drops)."""
    return {
        k: scene_arrays[k].at[dest].set(src_rows[k], mode="drop")
        for k in scene_arrays
    }


def densify_and_prune(
    scene: GaussianScene,
    opt_state: AdamState,
    stats: DensifyStats,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float,
    prune_big_screen: bool = False,
) -> Tuple[GaussianScene, AdamState, DensifyStats, jnp.ndarray]:
    """One density-control step (reference `densify_and_prune`, `:389-403`).
    max_screen_size <= 0 disables the screen/world size prunes (the
    reference passes None before iteration opacity_reset, `train.py:144`).

    prune_big_screen: the reference *looks* like it prunes screen-oversized
    Gaussians (`big_points_vs`, `:397-399`), but its clone/split both call
    `densification_postfix` which zeroes `max_radii2D` for every point
    (`:345-347`) BEFORE the prune reads it — so the screen-size prune never
    fires upstream. Default False reproduces that quirk exactly (only the
    world-size prune is live); True enables a working screen-size prune
    using the live max_radii2d stats (a deliberate improvement, off for
    strict parity).

    Returns (scene, opt_state, stats_reset, n_dropped)."""
    C = scene.capacity
    grads = stats.xyz_gradient_accum / stats.denom
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    scaling = scene.get_scaling
    max_scale = jnp.max(scaling, axis=1)
    high_grad = (grads >= max_grad) & scene.mask
    clone_mask = high_grad & (max_scale <= percent_dense * extent)
    split_mask = high_grad & (max_scale > percent_dense * extent)

    slot_at_rank, n_free = _free_slot_table(scene.mask)
    n_clone = jnp.sum(clone_mask)
    n_split = jnp.sum(split_mask)
    need = n_clone + 2 * n_split
    n_dropped = jnp.maximum(0, need - n_free)

    params = scene.params()
    arrays = dict(params)

    # ---- clone: copy rows verbatim (reference `densify_and_clone`).
    crank = jnp.cumsum(clone_mask) - 1  # rank among clones
    clone_dest = jnp.where(
        clone_mask, slot_at_rank[jnp.minimum(crank, C - 1)], C
    ).astype(jnp.int32)
    arrays = _scatter_rows(arrays, params, clone_dest)

    # ---- split: N=2 children sampled from the source Gaussian
    # (reference `densify_and_split`: xyz = mean + R @ (sigma * eps),
    # child scale = sigma / (0.8 * N); source pruned).
    srank = jnp.cumsum(split_mask) - 1
    eps1, eps2 = jax.random.normal(key, (2, C, 3), jnp.float32)
    R = quat_to_rotmat(scene.rotation)  # [C,3,3]
    child_scale = jnp.log(scaling / (0.8 * 2))

    def child_rows(eps):
        offset = jnp.einsum("cij,cj->ci", R, scaling * eps)
        rows = dict(params)
        rows["xyz"] = scene.xyz + offset
        rows["scaling"] = child_scale
        return rows

    for child, eps in enumerate((eps1, eps2)):
        dest_rank = n_clone + 2 * srank + child
        dest = jnp.where(
            split_mask, slot_at_rank[jnp.minimum(dest_rank, C - 1)], C
        ).astype(jnp.int32)
        arrays = _scatter_rows(arrays, child_rows(eps), dest)

    new_mask = scene.mask
    all_dest = jnp.concatenate(
        [
            clone_dest,
            jnp.where(split_mask, slot_at_rank[jnp.minimum(n_clone + 2 * srank, C - 1)], C),
            jnp.where(
                split_mask, slot_at_rank[jnp.minimum(n_clone + 2 * srank + 1, C - 1)], C
            ),
        ]
    ).astype(jnp.int32)
    new_mask = new_mask.at[all_dest].set(True, mode="drop")
    # Split sources die (reference prune_filter, `:371-372`).
    new_mask = new_mask & ~split_mask

    scene2 = scene.with_params(arrays).replace(mask=new_mask)

    # ---- prune (reference `:396-401`): low opacity, oversized on screen
    # (max_radii2d, zero for fresh slots), oversized in world.
    opac = scene2.get_opacity[:, 0]
    prune = opac < min_opacity
    if max_screen_size and max_screen_size > 0:
        big_ws = jnp.max(scene2.get_scaling, axis=1) > 0.1 * extent
        prune = prune | big_ws
        if prune_big_screen:
            # Live screen-size prune (upstream's is dead code, see above).
            big_vs = stats.max_radii2d > max_screen_size
            # New slots keep stale stats rows; mask them.
            big_vs = big_vs & ~_freshly_written(all_dest, C)
            prune = prune | big_vs
    final_mask = scene2.mask & ~prune

    # Park dead slots so they never render.
    dead = ~final_mask
    scene3 = scene2.replace(
        mask=final_mask,
        xyz=jnp.where(dead[:, None], DEAD_XYZ, scene2.xyz),
        opacity=jnp.where(dead[:, None], DEAD_OPACITY, scene2.opacity),
    )

    # ---- optimizer surgery: zero moments at new + dead slots (reference
    # zeroes moments for appended rows and drops pruned ones).
    touched = jnp.zeros((C,), bool).at[all_dest].set(True, mode="drop") | dead

    def zero_rows(t):
        shape = (C,) + (1,) * (t.ndim - 1)
        return jnp.where(touched.reshape(shape), 0.0, t)

    new_opt = AdamState(
        mu=jax.tree.map(zero_rows, opt_state.mu),
        nu=jax.tree.map(zero_rows, opt_state.nu),
        count=opt_state.count,
    )

    # Stats reset for everyone (reference `densification_postfix`, `:345-347`).
    return scene3, new_opt, init_stats(C), n_dropped


def _freshly_written(all_dest: jnp.ndarray, C: int) -> jnp.ndarray:
    return jnp.zeros((C,), bool).at[all_dest].set(True, mode="drop")


def reset_opacity(scene: GaussianScene, opt_state: AdamState) -> Tuple[GaussianScene, AdamState]:
    """Clamp opacity to <= 0.01 and zero its Adam moments (reference
    `reset_opacity` + `replace_tensor_to_optimizer`, `:210-213,258-271`)."""
    new_op = jnp.minimum(scene.get_opacity, 0.01)
    logit = jnp.log(new_op / (1.0 - new_op))
    logit = jnp.where(scene.mask[:, None], logit, scene.opacity)
    new_opt = AdamState(
        mu={**opt_state.mu, "opacity": jnp.zeros_like(opt_state.mu["opacity"])},
        nu={**opt_state.nu, "opacity": jnp.zeros_like(opt_state.nu["opacity"])},
        count=opt_state.count,
    )
    return scene.replace(opacity=logit), new_opt
