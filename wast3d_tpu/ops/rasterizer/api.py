"""Render facade: camera + GaussianScene -> image dict.

Mirror of the reference `render()`
(`/root/reference/gaussian_renderer/__init__.py:18-115`): builds raster
settings from the camera, supports precomputed-color / precomputed-cov3D
paths (the `convert_SHs_python` / `compute_cov3D_python` pipeline flags),
random per-pixel sampling offsets in (-1, 0], and returns the same logical
outputs {render, depth, radii, visibility_filter} plus final transmittance.

JAX-native differences:
- images are [H, W, C] float32 (the reference uses CHW torch tensors);
- the reference's zero-tensor `screenspace_points` / `cam_view_depth`
  gradient hack (`__init__.py:26-37`) is replaced by an explicit
  `means2d_offset` input: pass zeros of shape [N, 2] and differentiate
  with respect to it to obtain the view-space positional gradients used
  by densification. The camera-view-depth gradient needs no hack at all —
  autodiff routes depth gradients to means through the view matrix
  (what `backward.cu:395-397` hand-codes).
- the `sbmdls_extra` variant (`/root/reference/sbmdls_extra/__init__.py:29`
  — `cam_view_depth` shaped from `pc.ref_d`; the CUDA forward never reads
  its values, it exists purely so backward can deposit dL/dcamViewDepth,
  `rasterize_points.cu:159`) maps to the `view_depth_offset` input here:
  pass zeros of shape [N] and differentiate with respect to it to obtain
  the per-Gaussian expected-depth gradient that the reference's
  `cam_view_depth.grad` carries.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from wast3d_tpu.core.camera import Camera
from wast3d_tpu.core.sh import eval_sh_color
from wast3d_tpu.ops.rasterizer import oracle as oracle_mod
from wast3d_tpu.ops.rasterizer import preprocess as prep_mod
from wast3d_tpu.ops.rasterizer import tiled as tiled_mod
from wast3d_tpu.scene.gaussians import GaussianScene


class RasterizeSettings(NamedTuple):
    """Static knobs of the tiled renderer (all shape-affecting).

    renderer: "pallas" (production TPU kernel path), "tiled" (pure-XLA
    padded path; also the reference implementation for the kernel), or
    "oracle" (per-pixel exact, tests only). pallas_interpret runs the
    Pallas kernels in interpreter mode (CPU tests)."""

    renderer: str = "tiled"  # "pallas" | "tiled" | "oracle"
    dup_capacity: int = 1 << 18
    max_per_tile: int = 1024
    chunk: int = 32
    max_tiles_per_gaussian: int = 512
    pallas_interpret: bool = False
    phase_a_tiles: int = 6  # binning phase-A slots per gaussian
    big_budget_divisor: int = 16  # phase-B budget = N / divisor
    floor_band_budget: int = 256  # binning terminal-band element budget;
    # 128 + phase_a_tiles=4 + big_budget_divisor=64 is the 1M+ "tight"
    # plan (sort pad 2^23 -> 2^22, NOTES_PERF r4s4). Validate against the
    # scene's straddle histogram (tools/tile_straddle.py) before opting
    # in; overflow_emit flags a band-budget miss.
    phase_plan: tuple = ()  # explicit emission plan: static tuple of
    # (start, extra, budget) triples overriding the three knobs above.
    # Synthesized per scene from the measured straddle histogram by
    # ops/rasterizer/autoplan.tune_serving_settings — the knob presets
    # cannot express e.g. the single fat 38k band that crosses the
    # 2^21 -> 2^20 sort-pad boundary at the 200k bench scene. Overflow
    # semantics are unchanged.
    route_capacity: int = 0  # tile-sharded render: per-destination-shard
    # duplicate slots for the all_to_all (0 = auto from dup_capacity)
    tile_cull: bool = True  # exact per-tile ellipse cull at emission: drop
    # duplicates whose max achievable alpha in the tile is < 1/255 (the
    # blend kernel skips every pixel of those anyway, forward.cu:354).
    # Mathematically exact (≈1-ulp reassociation noise only); shrinks
    # dynamic per-tile ranges by ~13% (synthetic) to ~19% (trained
    # scenes). Off switch for A/B timing only.
    fast_chain: bool = False  # pallas path: bf16 elementwise chain in the
    # blend kernels (fwd + bwd recompute/q/prefix; divides, moment
    # reductions and accumulators stay f32). ~0.3%-class alpha/gradient
    # error vs the f32 chain — NOT bit-comparable. Quality-gated r4:
    # 0.006 dB PSNR delta on a full 30k/800^2 run
    # (runs/qgate_r4_800_30k{,_fast}) — serving CLIs default it ON;
    # training keeps f32 (fast bwd is net slower on v5e, NOTES_PERF r4s1).
    quad_power: bool = True  # pallas path, jitter-off renders: evaluate
    # the Gaussian power quadratic as split-bf16 (P,8)@(8,G) MXU matmuls
    # (triple split in the exact tier, ~2^-24 of the cancelling
    # expansion terms — tighter than the exact tier's documented 2^-16
    # scan class; double split in the fast tier) instead of the ~10-pass
    # per-(pixel,entry) VPU chain. The coefficient quantization makes
    # the forward piecewise-flat at ~1e-3 position scales, so
    # finite-difference probes of TINY gradients should pin
    # quad_power=False (the analytic VJP is unaffected — the backward
    # recomputes the direct form either way).
    pack_gather: bool = False  # fast_chain serving-only: per-Gaussian
    # split-bf16 pack into uint32 pairs BEFORE the K-row gather (24B/row
    # instead of 40B — the random gather is HBM-latency-bound, r4
    # anatomy). Means carry hi+lo bf16 halves so tile recentring stays
    # subpixel (same error class as fast_chain's post-recentre bf16
    # cast). NOT differentiable (u32 bitcast) — forward/serving only;
    # requires fast_chain.
    grad_reduce: str = "segsum_sortpacked"  # pallas path per-Gaussian
    # gradient reduction (r3 in-situ step times at 200k/800^2):
    #   "segsum_sortpacked" (default, 53.3 ms/step): rank-major order via
    #     multi-operand lax.sort with the 10 gradient columns bf16-PACKED
    #     in pairs into uint32 payloads, feeding the Pallas segment-sum
    #     kernel. Per-duplicate values quantize to bf16 (~2^-9 relative)
    #     before the f32 segment sum — the accuracy class of the
    #     split-bf16 blend kernels that produced them.
    #   "segsum_sortpayload" (56.6 ms): same, f32 payloads (no packing).
    #   "segsum" (58.2 ms): K-row gather into rank order + kernel;
    #     split-bf16 accuracy ~2^-16 relative.
    #   "scatter" (64.4 ms): XLA scatter-add — bit-exact reference
    #     semantics (backward.cu:552 atomicAdd, deterministic here).


def random_sampling_offsets(key: jax.Array, height: int, width: int) -> jnp.ndarray:
    """Uniform in (-1, 0], matching `torch.rand(...) * -1`
    (`gaussian_renderer/__init__.py:31`)."""
    return -jax.random.uniform(key, (height, width, 2), jnp.float32)


def render(
    camera: Camera,
    scene: GaussianScene,
    bg_color: jnp.ndarray,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    settings: RasterizeSettings = RasterizeSettings(),
    sampling_offsets: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    view_depth_offset: Optional[jnp.ndarray] = None,
    convert_shs_python: bool = False,
    compute_cov3d_python: bool = False,
) -> dict:
    """Render the scene from `camera`. Returns a dict with:
    render [H,W,3], depth [H,W], final_T [H,W], radii [N], visibility_filter
    [N] bool, overflow [] bool, plus the cause split overflow_emit
    (emission-budget truncation — grow phase_a_tiles/max_per_tile) and
    overflow_rect (rect-ceiling truncation — grow max_tiles_per_gaussian);
    plain overflow with neither cause set means dup_capacity. The oracle
    path never overflows. See train.schedule.overflow_growth_update."""
    colors_precomp = None
    shs = None
    if override_color is not None:
        colors_precomp = override_color
    elif convert_shs_python:
        dirs = scene.get_xyz - camera.camera_center[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        colors_precomp = eval_sh_color(
            scene.active_sh_degree, jnp.swapaxes(scene.get_features, 1, 2), dirs
        )
    else:
        shs = scene.get_features

    scales = rotations = cov3d_precomp = None
    if compute_cov3d_python:
        cov3d_precomp = scene.get_covariance(scaling_modifier)
    else:
        scales = scene.get_scaling
        rotations = scene.get_rotation

    prep = prep_mod.preprocess(
        means3d=scene.get_xyz,
        opacities=scene.get_opacity,
        view_transform=camera.view_transform,
        full_proj_transform=camera.full_proj_transform,
        camera_center=camera.camera_center,
        tan_fovx=camera.tan_fovx,
        tan_fovy=camera.tan_fovy,
        width=camera.width,
        height=camera.height,
        sh_degree=scene.active_sh_degree,
        shs=shs,
        colors_precomp=colors_precomp,
        scales=scales,
        rotations=rotations,
        cov3d_precomp=cov3d_precomp,
        scaling_modifier=scaling_modifier,
        mask=scene.mask,
    )
    if means2d_offset is not None:
        prep = prep._replace(means2d=prep.means2d + means2d_offset)
    if view_depth_offset is not None:
        # sbmdls_extra `cam_view_depth` gradient tap (module doc): zeros
        # in, grad out = per-Gaussian expected-depth gradient.
        prep = prep._replace(
            depths=prep.depths + jnp.reshape(view_depth_offset, (-1,))
        )

    if settings.renderer == "oracle":
        color, depth, final_T = oracle_mod.render_oracle(
            prep, camera.width, camera.height, bg_color, sampling_offsets
        )
        overflow = jnp.zeros((), bool)
        overflow_emit = jnp.zeros((), bool)
        overflow_rect = jnp.zeros((), bool)
    elif settings.renderer == "pallas":
        from wast3d_tpu.ops.rasterizer.pallas_path import render_pallas

        out = render_pallas(
            prep,
            camera.width,
            camera.height,
            bg_color,
            sampling_offsets,
            dup_capacity=settings.dup_capacity,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
            interpret=settings.pallas_interpret,
            phase_a_tiles=settings.phase_a_tiles,
            big_budget_divisor=settings.big_budget_divisor,
            floor_band_budget=settings.floor_band_budget,
            phase_plan=settings.phase_plan,
            grad_reduce=settings.grad_reduce,
            fast_chain=settings.fast_chain,
            tile_cull=settings.tile_cull,
            pack_gather=settings.pack_gather,
            quad_power=settings.quad_power,
        )
        color, depth, final_T = out.color, out.depth, out.final_T
        overflow, overflow_emit = out.overflow, out.overflow_emit
        overflow_rect = out.overflow_rect
    else:
        out = tiled_mod.render_tiled(
            prep,
            camera.width,
            camera.height,
            bg_color,
            sampling_offsets,
            dup_capacity=settings.dup_capacity,
            max_per_tile=settings.max_per_tile,
            chunk=settings.chunk,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
            phase_a_tiles=settings.phase_a_tiles,
            big_budget_divisor=settings.big_budget_divisor,
            floor_band_budget=settings.floor_band_budget,
            phase_plan=settings.phase_plan,
            tile_cull=settings.tile_cull,
        )
        color, depth, final_T = out.color, out.depth, out.final_T
        overflow, overflow_emit = out.overflow, out.overflow_emit
        overflow_rect = out.overflow_rect

    return {
        "render": color,
        "depth": depth,
        "final_T": final_T,
        "radii": prep.radii,
        "visibility_filter": prep.radii > 0,
        "overflow": overflow,
        "overflow_emit": overflow_emit,
        "overflow_rect": overflow_rect,
    }
