"""Shared host-side training schedule (densify / growth / opacity reset).

One implementation of the reference loop's control blocks
(`/root/reference/train.py:77-147`): SH warm-up every 1000 iters,
densify+prune on `densification_interval` inside the
[densify_from_iter, densify_until_iter) window, opacity resets, and the
TPU-specific capacity machinery (raster-setting growth on binning
overflow, row-capacity growth + densify retry). `train.reconstruct.Trainer`
and `parallel.train_sharded.ShardedTrainer` both drive this — keeping the
schedule in ONE place so it cannot diverge between the single-chip and
sharded paths.

The driver object contract (duck-typed; both Trainers satisfy it):
  state, opt_cfg, settings, history, key, _it, _white_bg,
  cameras_extent  — attributes read/written here;
  _pre_step(it)        — per-iteration hook before the step (GUI serve);
  _do_step(it)         — fetch camera(s), advance state, return aux;
  _on_settings_change()— react to a settings._replace (rebuild jits);
  _maybe_grow() / _grow() — row-capacity growth.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from wast3d_tpu.train import reconstruct as R


def _flag(aux: dict, name: str) -> bool:
    v = aux.get(name)
    return bool(np.asarray(v)) if v is not None else False


def overflow_growth_update(settings, aux: dict):
    """Map the binning overflow cause flags to the knob that clears them.

    Returns a dict of RasterizeSettings updates, or None when nothing
    tripped (or nothing can grow any further). Causes:
    - overflow_rect: a Gaussian's tile rect exceeds max_tiles_per_gaussian
      (the 512-tile ceiling). Doubling phase_a_tiles can never clear this
      (the emission phases stop at the ceiling), so grow the ceiling —
      it is bounded above by the screen's tile count, so growth terminates.
    - overflow_emit: the phase-selection budget truncated emission — grow
      phase_a_tiles (clamped to the rect ceiling; at the clamp, emission
      is single-phase and covers every rect, so no further growth helps)
      and, on the tiled path, max_per_tile.
    - overflow_route (tile-sharded renderer): a destination shard's
      duplicate bucket overflowed. With an explicit route_capacity, grow
      it; with auto sizing (route_capacity == 0) the bucket derives from
      dup_capacity, so grow that instead.
    - plain overflow with no cause flag: the sorted-duplicate prefix
      truncated — grow dup_capacity.
    """
    if not _flag(aux, "overflow"):
        return None
    upd = {}
    rect = _flag(aux, "overflow_rect")
    emit = _flag(aux, "overflow_emit")
    route = _flag(aux, "overflow_route")
    if (rect or emit) and settings.phase_plan:
        # An explicit plan (autoplan-synthesized or hand-set) overrides
        # the knob-derived schedule, so growing phase_a_tiles /
        # max_tiles_per_gaussian under it would change NOTHING: drop the
        # plan and let the (grown) knob path re-derive a feasible one.
        upd["phase_plan"] = ()
    if rect:
        upd["max_tiles_per_gaussian"] = settings.max_tiles_per_gaussian * 2
    if emit:
        ceiling = upd.get(
            "max_tiles_per_gaussian", settings.max_tiles_per_gaussian
        )
        new_pa = min(settings.phase_a_tiles * 2, ceiling)
        if new_pa > settings.phase_a_tiles:
            upd["phase_a_tiles"] = new_pa
        if settings.renderer == "tiled":
            upd["max_per_tile"] = settings.max_per_tile * 2
    grow_dup = not (rect or emit or route)
    if route:
        if settings.route_capacity > 0:
            upd["route_capacity"] = settings.route_capacity * 2
        else:
            grow_dup = True
    if grow_dup:
        upd["dup_capacity"] = settings.dup_capacity * 2
    return upd or None


def _log(tr, entry):
    tr.history.append(entry)
    sink = getattr(tr, "history_sink", None)
    if sink is not None:
        sink(entry)


def run_schedule(tr, iterations: int, log_every: int = 0):
    """Drive `iterations` steps of the reference training schedule on a
    Trainer-like object (see module docstring for the contract)."""
    cfg = tr.opt_cfg
    for _ in range(iterations):
        it = tr._it + 1  # 1-based like the reference
        tr._it = it
        tr._pre_step(it)
        # SH warm-up every 1000 iters (`train.py:77-78`).
        if it % 1000 == 0:
            tr.state = tr.state._replace(
                scene=tr.state.scene.one_up_sh_degree()
            )
        aux = tr._do_step(it)
        # Densification block (`train.py:137-147`).
        if it < cfg.densify_until_iter:
            if (it > cfg.densify_from_iter
                    and it % cfg.densification_interval == 0):
                # A truncated binning emission silently degrades training
                # (the CUDA path is uncapped, rasterizer_impl.cu:291-305):
                # check the overflow cause flags at densify cadence and
                # grow the knob that tripped.
                upd = overflow_growth_update(tr.settings, aux)
                if upd:
                    _log(tr,
                        {"iter": it, "event": "raster_capacity_grow", **upd}
                    )
                    tr.settings = tr.settings._replace(**upd)
                    tr._on_settings_change()
                max_screen = 20.0 if it > cfg.opacity_reset_interval else 0.0
                tr._maybe_grow()
                tr.key, k2 = jax.random.split(tr.key)
                # densify_and_prune is pure: if free capacity can't hold
                # this clone/split burst (dropped > 0), discard the result,
                # grow, and re-run so no candidates are lost.
                for _attempt in range(3):
                    scene, opt, stats, dropped = R.densify_and_prune_jit(
                        tr.state.scene, tr.state.opt_state, tr.state.stats,
                        k2,
                        max_grad=cfg.densify_grad_threshold,
                        min_opacity=0.005,
                        extent=float(tr.cameras_extent),
                        max_screen_size=max_screen,
                        percent_dense=cfg.percent_dense,
                    )
                    if int(np.asarray(dropped)) == 0:
                        break
                    _log(tr,
                        {"iter": it, "event": "capacity_grow_retry",
                         "dropped": int(np.asarray(dropped))}
                    )
                    tr._grow()
                tr.state = R.TrainState(scene, opt, stats, tr.state.step)
            if it % cfg.opacity_reset_interval == 0 or (
                # white-bg models also reset right when densification
                # starts (`train.py:146-147`)
                tr._white_bg and it == cfg.densify_from_iter
            ):
                scene, opt = R.reset_opacity_jit(
                    tr.state.scene, tr.state.opt_state
                )
                tr.state = tr.state._replace(scene=scene, opt_state=opt)
        if log_every and it % log_every == 0:
            _log(tr,
                {"iter": it, "loss": float(aux["loss"]),
                 "n": int(aux["num_active"]), "t": time.time()}
            )
    return tr.state
