"""Multi-host bootstrap for pod-scale runs.

The reference has no distributed story at all (SURVEY.md §2.7: strictly
single-GPU, no torch.distributed anywhere); everything here is new,
TPU-native capability. Single-host multi-chip needs nothing — `jax.devices()`
already sees every local chip and `parallel/mesh.py` meshes them. Crossing
HOSTS (a v5p pod slice spans hosts at >8 chips) needs exactly one extra
step: `jax.distributed.initialize()` on every host before first device use,
after which `jax.devices()` is the GLOBAL device list and the same
`make_mesh` + `NamedSharding` code paths compile unchanged — XLA routes
collectives over ICI within the slice and DCN across slices.

Usage (same script on every host; TPU pods auto-discover coordination
from the runtime environment, so all arguments stay None there):

    from wast3d_tpu.parallel.multihost import init_distributed, global_mesh
    init_distributed()
    mesh = global_mesh(data=2)          # (data, model) over ALL hosts' chips
    ... identical training/stylize code ...

Checkpointing: orbax handles multi-host saves natively (each host writes
its shards; `train/checkpoint.py` passes arrays through unchanged).
Host-side stages of the stylize pipeline (K-means seeding, greedy ball
cover) run identically on every host — they are deterministic (seeded)
pure-numpy, so no broadcast is needed.
"""

from __future__ import annotations

from typing import Optional

import jax

from wast3d_tpu.parallel.mesh import make_mesh

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize cross-host JAX. Idempotent; returns the process index.

    On TPU pods every argument may stay None (the TPU runtime provides
    coordinator/topology discovery). For CPU/GPU fleets pass all three —
    the standard `jax.distributed.initialize` contract.

    Safe to call in single-process runs: if there is nothing to
    coordinate (no coordinator address and no TPU runtime topology),
    this is a no-op returning 0 rather than a hang.
    """
    global _initialized
    if _initialized:
        return jax.process_index()
    single = (coordinator_address is None and num_processes in (None, 1)
              and jax.default_backend() != "tpu")
    if not single:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True
    return jax.process_index()


def global_mesh(data: int = 1, n_devices: Optional[int] = None):
    """`make_mesh` over the GLOBAL device list (call after
    `init_distributed`). Axes ("data", "model"), same semantics as
    `parallel.mesh.make_mesh` — the Gaussian axis shards over "model",
    independent work (camera batches, styles, balls) over "data"."""
    return make_mesh(n_devices, data=data)


def is_coordinator() -> bool:
    """True on the process that should write logs/checkpoint metadata."""
    return jax.process_index() == 0
