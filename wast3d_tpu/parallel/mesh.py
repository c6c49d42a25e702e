"""Device mesh + sharding layout for multi-chip Gaussian scenes.

The reference is strictly single-GPU (SURVEY.md §2.7: no torch.distributed
anywhere); scale-out is a new, TPU-native capability:

- mesh axes ("data", "model"):
  * "model" shards the Gaussian axis (N splats) — preprocess, KNN/descriptor
    losses, and optimizer state all partition row-wise (BASELINE config 4:
    4M splats over a v5p-8).
  * "data" parallelizes independent render targets — camera batches during
    reconstruction, style scenes during sweep stylization (BASELINE
    config 5: 1 content x 8 styles).
- Scene/optimizer leaves use NamedSharding(P("model")) on axis 0; per-view
  tensors use P("data") on their leading batch axis; small globals
  (cameras, bg) replicate.

XLA inserts the collectives (all-gathers for the binning sort, psums for
the loss/grads) over ICI. There is no NCCL/MPI analogue to port — the
reference has none (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data: int = 1) -> Mesh:
    """Mesh of shape (data, model) over the first n_devices devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n % data != 0:
        raise ValueError(f"n_devices {n} not divisible by data axis {data}")
    arr = np.asarray(devs[:n]).reshape(data, n // data)
    return Mesh(arr, ("data", "model"))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharding of the Gaussian axis."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState with Gaussians (and optimizer rows) sharded over
    the model axis. Capacity must be divisible by the model axis size."""
    row = scene_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] == state.scene.capacity:
            return jax.device_put(x, row)
        return jax.device_put(x, rep)

    return jax.tree.map(place, state)
