"""wast3d_tpu: TPU-native 3D Gaussian Splatting scene-to-scene stylization.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/WaSt3D (WaSt-3D, ECCV 2024; itself a fork of
graphdeco-inria/gaussian-splatting):

- a differentiable tile-binned Gaussian rasterizer (including the fork's
  per-pixel expected-depth channel and jittered sampling offsets) built on
  XLA sort/segment primitives and Pallas TPU kernels,
- photometric 3DGS reconstruction with on-device, static-shape
  densification/pruning under optax,
- sphere-regularized style-scene training, K-means style clustering,
- ball-coverage + nearest-neighbor-descriptor / Sinkhorn-OT stylization
  (the W2 scene-to-scene transfer), vmapped over coverage balls,
- VGG content/style/TV and depth/normal image-space refinement,
- COLMAP / NeRF-synthetic loaders and bit-compatible PLY checkpoints,
- multi-chip scaling via jax.sharding meshes (Gaussian-axis model
  parallelism, data-parallel style sweeps).

Structure:
  core/      pure math: SH, quaternions/covariances, cameras, LR schedules
  scene/     GaussianScene pytree, datasets (COLMAP/Blender), PLY I/O
  ops/       rasterizer (oracle + tiled + Pallas), knn, kmeans,
             descriptors, sinkhorn, image losses, VGG, depth utils
  train/     reconstruction/style training loops, densification, optimizer
  stylize/   clustering, ball coverage, patch fitting, merge/de-overlap
  refine/    image-space (VGG/depth/normals) refinement drivers
  parallel/  mesh + sharding helpers, ring primitives
  eval/      render sets, PSNR/SSIM/LPIPS metrics, full_eval harness
  viewer/    network GUI protocol server (SIBR-compatible)
  native/    C++ host-side helpers (fast PLY/COLMAP I/O) with numpy fallback
"""

__version__ = "0.1.0"
