"""Scene-adaptive emission-plan tuning for serving.

The binning stage's static shapes — the emission grid (and through it
the u32 sort's power-of-two pad), the K-row gather width, and the
blend's packed width — are bounded by `RasterizeSettings` knobs whose
SAFE values depend on the scene's tile-straddle distribution. That
distribution differs wildly between workloads: the synthetic bench scene
has 17-19% of Gaussians straddling >4 tiles, while a 30k-trained real
scene has ~4% (densification shrinks splats toward surfaces;
tools/tile_straddle.py histograms). Serving a trained 311k scene with
the conservative knob defaults pays a 2^22-slot sort and a 4N-row
gather its actual distribution never needs.

`tune_serving_settings` closes that gap once per scene at load time.
The classic CUDA pipeline has no analogue — it allocates buffers
dynamically per frame (`rasterizer_impl.cu:198-343`); static-shape XLA
moves that decision to plan selection, so the right TPU design is to
MEASURE the scene and synthesize the plan:

1. probe the straddle histogram over a few representative cameras
   (device-side; geometry only, no SH/color work);
2. synthesize band budgets directly from the measured counts x margin —
   the knob presets cannot express e.g. the single fat ~38k band that
   crosses the 2^21 -> 2^20 sort-pad boundary on the 200k bench scene;
3. probe the post-cull duplicate count under the chosen plan and size
   `dup_capacity` to it (x margin), shrinking the gather/pack width.

Every safety net stays on: a camera outside the probed envelope trips
`overflow_*`, and callers keep their auto-grow / fallback loops.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from wast3d_tpu.ops.rasterizer.api import RasterizeSettings
from wast3d_tpu.ops.rasterizer.binning import (
    bin_gaussians, compute_rects, tile_grid)

# Phase-A widths to consider. Band starts double from ra, so the static
# threshold set (union over candidates) stays small.
_RA_CANDIDATES = (2, 3, 4, 6, 8)


def _padded(total: int) -> int:
    return 1 << (max(int(total), 1) - 1).bit_length()


def _band_starts(ra: int, max_tiles: int):
    starts = []
    s = ra
    while s < max_tiles:
        starts.append(s)
        s *= 2
    return starts


def _probe_prep(camera, scene, scaling_modifier: float):
    """Geometry-only preprocess (zero precomputed colors, no SH eval)."""
    import jax.numpy as jnp

    from wast3d_tpu.ops.rasterizer import preprocess as prep_mod

    n = scene.get_xyz.shape[0]
    return prep_mod.preprocess(
        means3d=scene.get_xyz,
        opacities=scene.get_opacity,
        view_transform=camera.view_transform,
        full_proj_transform=camera.full_proj_transform,
        camera_center=camera.camera_center,
        tan_fovx=camera.tan_fovx,
        tan_fovy=camera.tan_fovy,
        width=camera.width,
        height=camera.height,
        colors_precomp=jnp.zeros((n, 3), jnp.float32),
        scales=scene.get_scaling,
        rotations=scene.get_rotation,
        scaling_modifier=scaling_modifier,
        mask=scene.mask,
    )


def probe_straddle(scene, cameras, thresholds, scaling_modifier: float = 1.0):
    """Per-camera straddle stats on device: counts of Gaussians with
    tiles_touched > t for each t in `thresholds`, plus max tiles_touched.

    Returns (counts [C, T], max_tt [C]) as numpy int arrays."""
    import jax
    import jax.numpy as jnp

    thr = jnp.asarray(np.asarray(thresholds, np.int32))

    @jax.jit
    def one(camera, scene):
        prep = _probe_prep(camera, scene, scaling_modifier)
        gx, gy = tile_grid(camera.width, camera.height)
        xmin, ymin, xmax, ymax = compute_rects(
            prep.means2d, prep.radii, gx, gy,
            ext_x=prep.extent_x, ext_y=prep.extent_y)
        tt = (xmax - xmin) * (ymax - ymin)
        counts = jnp.sum(tt[None, :] > thr[:, None], axis=1)
        return counts, jnp.max(tt)

    counts, max_tt = [], []
    for cam in cameras:
        c, m = one(cam, scene)
        counts.append(np.asarray(c))
        max_tt.append(int(m))
    return np.stack(counts), np.asarray(max_tt)


def synthesize_plan(n: int, need, max_tiles: int, band_margin: float = 1.5):
    """Build the smallest-padded-grid emission plan whose band budgets
    hold the measured straddle counts with margin.

    need: dict threshold -> worst probed count(tiles_touched > threshold).
    Bands double in extent from phase A's width; each band's budget is
    band_margin x its measured demand, rounded up to a multiple of 8
    (min 8 — zero-demand bands still cost slots; keep them tiny).
    Returns a static phases tuple ((0, ra, None), (start, extra, budget),
    ...) suitable for RasterizeSettings.phase_plan."""
    best = None
    for ra in _RA_CANDIDATES:
        phases = [(0, ra, None)]
        covered = ra
        for start in _band_starts(ra, max_tiles):
            extra = min(start, max_tiles - covered)  # band end = 2*start
            demand = need.get(start)
            assert demand is not None, (start, sorted(need))
            budget = max(8, int(-(-band_margin * demand // 8)) * 8)
            budget = min(budget, n)
            phases.append((covered, extra, budget))
            covered += extra
        total = n * ra + sum(e * b for _, e, b in phases[1:])
        key = (_padded(total), len(phases), total)
        if best is None or key < best[0]:
            best = (key, tuple(phases))
    return best[1]


def measure_duplicates(scene, cameras, plan, max_tiles: int,
                       scaling_modifier: float = 1.0,
                       jitter_margin: float = 0.0,
                       tile_cull: bool = True):
    """Post-cull duplicate count + emit-overflow check under `plan` for
    each camera (device-side; binning with the full grid, no cap slice).
    Returns (num_duplicates [C], any_emit_overflow bool).

    tile_cull/jitter_margin must mirror the render pipeline being sized
    (pallas_path passes conics/opacities only when settings.tile_cull and
    jitter_margin=1.0 under pixel jitter): probing WITH the cull while
    serving without it undersizes dup_capacity by the 13-19% the cull
    drops, guaranteeing overflow_dup on every frame."""
    import jax

    @jax.jit
    def one(camera, scene):
        prep = _probe_prep(camera, scene, scaling_modifier)
        b = bin_gaussians(
            prep.means2d, prep.depths, prep.radii,
            camera.width, camera.height,
            dup_capacity=0, max_tiles_per_gaussian=max_tiles,
            phase_plan=plan,
            ext_x=prep.extent_x, ext_y=prep.extent_y,
            conics=prep.conics if tile_cull else None,
            opacities=prep.opacities if tile_cull else None,
            jitter_margin=jitter_margin,
        )
        return b.num_duplicates, b.overflow_emit

    dups, ovf = [], False
    for cam in cameras:
        d, o = one(cam, scene)
        dups.append(int(d))
        ovf = ovf or bool(o)
    return np.asarray(dups), ovf


def tune_serving_settings(
    scene,
    cameras: Sequence,
    base: RasterizeSettings,
    band_margin: float = 1.5,
    cap_margin: float = 1.15,
    max_cameras: int = 8,
    scaling_modifier: float = 1.0,
    jitter: bool = False,
    cap_quantile: float = 1.0,
) -> RasterizeSettings:
    """Pick the tightest feasible emission plan + duplicate capacity for
    serving `scene` from cameras like `cameras` (evenly subsampled to
    `max_cameras` probe views).

    band_margin: headroom multiplier on each band's measured demand (for
    unprobed views). cap_margin: dup_capacity = cap_margin x the
    cap_quantile-quantile of the probed post-cull duplicate counts,
    rounded up to a 4096 multiple. The K-row gather+pack scales with the
    STATIC dup_capacity and is the trained-scene frame's largest stage
    (8 of 17 ms at 311k, runs/trained_anatomy_tuned.log), so sizing it
    to the WORST probe view (quantile 1.0, the safe default) taxes every
    frame for the fattest camera. Callers with an overflow fallback loop
    (eval/render_sets re-renders overflowing batches on the fallback
    settings) can pass cap_quantile ~0.5: typical views keep the lean
    gather, outlier views pay one re-render. Overflow flags remain the
    safety net either way; callers seeing overflow on a tuned config
    should fall back to `base` (plan budgets cannot be auto-grown
    through the knobs once phase_plan is set).
    """
    cams = list(cameras)
    if len(cams) > max_cameras:
        idx = np.linspace(0, len(cams) - 1, max_cameras).round().astype(int)
        cams = [cams[i] for i in sorted(set(idx.tolist()))]
    if not cams:
        return base

    n = int(scene.get_xyz.shape[0])
    max_tiles = int(base.max_tiles_per_gaussian)

    thresholds = sorted({
        s for ra in _RA_CANDIDATES for s in _band_starts(ra, max_tiles)
    })
    counts, max_tt = probe_straddle(
        scene, cams, thresholds, scaling_modifier=scaling_modifier)
    peak_tt = int(max_tt.max())
    if peak_tt > max_tiles:
        # A probed camera already exceeds the rect ceiling: grow it to
        # the next power of two before synthesis, else overflow_rect is
        # guaranteed on that camera.
        max_tiles = _padded(peak_tt)
        thresholds = sorted({
            s for ra in _RA_CANDIDATES for s in _band_starts(ra, max_tiles)
        })
        counts, max_tt = probe_straddle(
            scene, cams, thresholds, scaling_modifier=scaling_modifier)

    elif _padded(max(int(peak_tt * 1.5), 32)) < max_tiles:
        # SHRINK the rect ceiling to the probed envelope (x1.5 margin,
        # pow2): dropping unused high bands removes the floor band's
        # slots — the r4s3 blocker for small-grid plans (~127k slots at
        # 512 tiles / budget 256 on the 1M scene; a trained 311k scene's
        # peak straddle is far below 512). Safe because overflow_rect
        # still fires for any camera whose splats exceed the shrunk
        # ceiling and every caller keeps a fallback/growth loop — the
        # exact "overflow-growth story for rect caps" that makes
        # aggressive ceilings serviceable (train/schedule.py grows the
        # ceiling and clears the plan when it trips).
        max_tiles = _padded(max(int(peak_tt * 1.5), 32))

    need = dict(zip(thresholds, counts.max(axis=0).tolist()))
    plan = synthesize_plan(n, need, max_tiles, band_margin=band_margin)

    dups, emit_ovf = measure_duplicates(
        scene, cams, plan, max_tiles, scaling_modifier=scaling_modifier,
        jitter_margin=1.0 if jitter else 0.0,
        tile_cull=bool(base.tile_cull))
    if emit_ovf:  # cannot happen by construction; belt and braces
        return base
    dup_ref = float(np.quantile(dups, cap_quantile))
    cap = int(np.ceil(cap_margin * dup_ref / 4096.0) * 4096)
    return base._replace(
        phase_plan=plan,
        max_tiles_per_gaussian=max_tiles,
        dup_capacity=max(cap, 4096),
    )
