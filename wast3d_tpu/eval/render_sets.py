"""Batch rendering of train/test camera sets to image files.

Equivalent of `/root/reference/render.py:24-65` (`render_set` /
`render_sets`): loads a trained scene (PLY at the requested iteration),
renders every view, and writes `renders/NNNNN.png` + `gt/NNNNN.png`
under `<model_path>/<split>/ours_<iteration>/`.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.core.camera import Camera
from wast3d_tpu.ops.rasterizer import api as raster_api
from wast3d_tpu.scene.gaussians import GaussianScene
from wast3d_tpu.scene.ply import load_ply
from wast3d_tpu.train.checkpoint import find_max_iteration


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)).save(path)


def render_batch(
    cameras: List[Camera],
    scene: GaussianScene,
    bg_color: jnp.ndarray,
    settings: raster_api.RasterizeSettings = raster_api.RasterizeSettings(),
    mode: str = "map",
) -> dict:
    """Render B same-resolution views in ONE dispatch. Serving/eval
    throughput on the TPU is dispatch-latency bound at small frames
    (~100 ms tunnel round-trips dwarf ~6 ms of compute at 27k/400^2) —
    batching B views per dispatch amortizes that latency B-fold. The
    reference renders one view per CUDA launch (`render.py:30-35`);
    there is no analogue because CUDA launches are cheap. Returns the
    render() dict with a leading [B] axis.

    mode: "map" (default) runs the per-camera program sequentially
    inside the dispatch (`lax.map`) — each iteration is the exact
    single-frame program, so per-frame device time matches the
    single-camera path. "vmap" batches every stage instead; measured r4
    it is ~2.4x SLOWER per frame at 311k/800^2 (the batched emission
    cumsums + [B, 2^21] sort lose more than batching fuses — see
    NOTES_PERF r4s4), kept for A/B."""
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)
    return _render_batch_cached(settings, mode)(cam_batch, scene, bg_color)


@functools.lru_cache(maxsize=16)
def _render_batch_cached(settings, mode="map"):
    # settings is a NamedTuple of python scalars -> hashable cache key.
    @jax.jit
    def f(cam_batch, scene, bg_color):
        fn = lambda c: raster_api.render(c, scene, bg_color,  # noqa: E731
                                         settings=settings)
        if mode == "map":
            return jax.lax.map(fn, cam_batch)
        return jax.vmap(fn)(cam_batch)

    return f


def render_set(
    model_path: str,
    name: str,
    iteration: int,
    cameras: List[Tuple[Camera, Optional[jnp.ndarray]]],
    scene: GaussianScene,
    bg_color: jnp.ndarray,
    settings: raster_api.RasterizeSettings = raster_api.RasterizeSettings(),
    save_depth: bool = False,
    batch: int = 8,
    fallback_settings: Optional[raster_api.RasterizeSettings] = None,
) -> str:
    base = os.path.join(model_path, name, f"ours_{iteration}")
    render_dir = os.path.join(base, "renders")
    gt_dir = os.path.join(base, "gt")
    def pull(out, n):
        # ONE host transfer for render + depth + overflow: a separate
        # bool(jnp.any(overflow)) sync per batch would serialize the
        # render loop against the device for a 1-byte flag.
        leaves = {"render": out["render"][:n]}
        if save_depth:
            leaves["depth"] = out["depth"][:n]
        if fallback_settings is not None:
            leaves["ovf"] = jnp.any(out["overflow"])
        return jax.device_get(leaves)

    for b0 in range(0, len(cameras), batch):
        group = cameras[b0:b0 + batch]
        # Pad the tail by repeating the last view so every dispatch reuses
        # the one compiled [batch]-shaped program.
        padded = [c for c, _ in group] + [group[-1][0]] * (batch - len(group))
        out = render_batch(padded, scene, bg_color, settings=settings)
        host = pull(out, len(group))
        if fallback_settings is not None and bool(host["ovf"]):
            # A view outside the autoplan probe envelope tripped a static
            # capacity: re-render this group on the conservative settings
            # rather than write a truncated image.
            out = render_batch(padded, scene, bg_color,
                               settings=fallback_settings)
            host = pull(out, len(group))
        renders = host["render"]
        depths = host.get("depth")
        for j, (_, gt) in enumerate(group):
            idx = b0 + j
            save_image(os.path.join(render_dir, f"{idx:05d}.png"), renders[j])
            if gt is not None:
                save_image(os.path.join(gt_dir, f"{idx:05d}.png"), gt)
            if save_depth:
                d = depths[j]
                dn = (d - d.min()) / (np.ptp(d) + 1e-9)
                save_image(os.path.join(base, "depth", f"{idx:05d}.png"),
                           np.stack([dn] * 3, -1))
    return base


def render_sets(
    model_path: str,
    source_path: str,
    iteration: int = -1,
    skip_train: bool = False,
    skip_test: bool = False,
    white_background: bool = False,
    resolution: int = -1,
    settings: raster_api.RasterizeSettings = raster_api.RasterizeSettings(),
    batch: int = 8,
    autoplan: bool = True,
) -> None:
    """Reference `render_sets` (`render.py:37-55`).

    autoplan: tune the emission plan + duplicate capacity to the loaded
    scene's straddle histogram before rendering (pallas renderer only;
    ops/rasterizer/autoplan.py). Falls back to `settings` if a probe
    camera overflows the tuned plan."""
    from wast3d_tpu.scene.datasets import build_cameras, load_scene_info

    if iteration == -1:
        iteration = find_max_iteration(model_path)
    ply = os.path.join(model_path, "point_cloud", f"iteration_{iteration}",
                       "point_cloud.ply")
    scene = load_ply(ply)
    info = load_scene_info(source_path, white_background=white_background,
                           eval_split=True)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    fallback = None
    if autoplan and settings.renderer == "pallas":
        try:
            from wast3d_tpu.ops.rasterizer.autoplan import (
                tune_serving_settings)

            # Probe envelope = every split that will actually render
            # (test views can sit outside the train orbit; probing
            # train-only while rendering test pays a double render per
            # overflowing batch). Subsample the CameraInfo list BEFORE
            # build_cameras — probing needs geometry only, and building
            # all cameras decodes/resizes every ground-truth image.
            probe_infos = []
            if not skip_train:
                probe_infos += list(info.train_cameras)
            if not skip_test:
                probe_infos += list(info.test_cameras or [])
            probe_infos = probe_infos or list(
                info.train_cameras or info.test_cameras)
            if len(probe_infos) > 8:
                idx = np.linspace(0, len(probe_infos) - 1, 8).round()
                probe_infos = [probe_infos[int(i)]
                               for i in sorted(set(idx.tolist()))]
            probe = build_cameras(probe_infos, resolution)
            fallback = settings
            # cap_quantile 0.5: gather width sized to the MEDIAN probe
            # view; the rare fatter view trips overflow and re-renders
            # on `fallback` (the loop below already does this).
            settings = tune_serving_settings(
                scene, [c for c, _ in probe], settings, cap_quantile=0.5)
        except Exception as e:  # noqa: BLE001 — tuning must not kill eval
            print(f"# render_sets: autoplan tuning failed: {e!r}; "
                  "using knob defaults")
            fallback = None
    if not skip_train:
        render_set(model_path, "train", iteration,
                   build_cameras(info.train_cameras, resolution), scene, bg,
                   settings, batch=batch, fallback_settings=fallback)
    if not skip_test and info.test_cameras:
        render_set(model_path, "test", iteration,
                   build_cameras(info.test_cameras, resolution), scene, bg,
                   settings, batch=batch, fallback_settings=fallback)
