"""Numerical debug utilities (SURVEY §5: sanitizers / debug-mode parity).

The reference's only runtime checking is the CHECK_CUDA sync macro
(`auxiliary.h:166`) plus `torch.autograd.set_detect_anomaly`
(`train.py:243`) and the hand-run `debug_groups_loss` sanity fn
(`nerf2nerf/debug.py:4-60`). JAX equivalents:

- `nan_check(tree, name)`: checkify-style NaN/Inf trap over a pytree
  (call on grads/params when debugging; cheap enough to leave on for a
  few steps like --debug_from).
- `debug_groups_loss()`: the cluster pairwise-distance sanity
  optimization, asserting the loss drives grouped points to target
  distance structure — now an automated check rather than a hand-run one.
- Pallas kernels run under `pallas_interpret=True` for step-through
  debugging (see RasterizeSettings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nan_check(tree, name: str = "tree") -> bool:
    """Host-side NaN/Inf sweep; returns True if clean, raises otherwise."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
    return True


def debug_groups_loss(n: int = 8, k: int = 2, steps: int = 200,
                      lr: float = 0.01, seed: int = 0) -> float:
    """Cluster pairwise-difference loss sanity (reference
    `debug_groups_loss`): optimize random points so each cluster's
    pairwise distance matrix matches a zero target (collapse clusters).
    Returns the final loss (should approach 0)."""
    rng = np.random.default_rng(seed)
    data0 = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, k, n))

    def loss_fn(data):
        loss = jnp.float32(0.0)
        for c in range(k):
            m = (labels == c).astype(jnp.float32)
            diff = data[:, None, :] - data[None, :, :]
            d = jnp.sqrt(jnp.sum(diff**2, -1) + 1e-12)
            w = m[:, None] * m[None, :]
            loss = loss + jnp.mean(jnp.square(d * w))
        return loss

    @jax.jit
    def step(data, mu, nu, t):
        loss, g = jax.value_and_grad(loss_fn)(data)
        t = t + 1
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * g * g
        data = data - lr * (mu / (1 - 0.9**t)) / (jnp.sqrt(nu / (1 - 0.999**t)) + 1e-8)
        return data, mu, nu, t, loss

    data, mu, nu, t = data0, jnp.zeros_like(data0), jnp.zeros_like(data0), jnp.float32(0)
    for _ in range(steps):
        data, mu, nu, t, loss = step(data, mu, nu, t)
    return float(loss)


def standardize_xyz(xyz, mask=None):
    """(xyz - mean) / std over active points + the inverse transform params
    (the `train2.py:55-120` standardize/de-standardize experiment)."""
    import jax.numpy as _jnp

    if mask is None:
        mean = _jnp.mean(xyz, axis=0)
        std = _jnp.std(xyz, axis=0) + 1e-8
    else:
        m = mask.astype(_jnp.float32)[:, None]
        n = _jnp.maximum(m.sum(), 1.0)
        mean = _jnp.sum(xyz * m, axis=0) / n
        std = _jnp.sqrt(_jnp.sum(((xyz - mean) ** 2) * m, axis=0) / n) + 1e-8
    return (xyz - mean) / std, mean, std


def destandardize_xyz(xyz_std, mean, std):
    return xyz_std * std + mean
