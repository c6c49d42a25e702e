"""Per-group Adam optimizer with reference-parity hyperparameters.

Reproduces the reference's optimizer setup
(`/root/reference/scene/gaussian_model.py:149-175`): torch.optim.Adam with
eps=1e-15 over six named parameter groups
  xyz:      position_lr_init * spatial_lr_scale, exponential decay to
            position_lr_final * spatial_lr_scale (delay_mult warmup)
  f_dc:     feature_lr
  f_rest:   feature_lr / 20
  opacity:  opacity_lr
  scaling:  scaling_lr
  rotation: rotation_lr

Hand-rolled (not optax.adam) for two reasons: (a) exact parity with the
torch update (eps added outside the sqrt, bias correction by shared step
count), and (b) densification performs *surgery* on the first-moment /
second-moment buffers (zeroing rows for new Gaussians — reference
`cat_tensors_to_optimizer`/`_prune_optimizer`, `gaussian_model.py:258-327`),
which needs direct access to the moment pytrees under static shapes.

The whole update is pure jnp and jit-safe; the step count is a traced
scalar so LR scheduling happens on device.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from wast3d_tpu.config import OptimizationConfig
from wast3d_tpu.core.lr import expon_lr

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15

PARAM_KEYS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


class AdamState(NamedTuple):
    mu: Dict[str, jnp.ndarray]  # first moments, keyed like scene.params()
    nu: Dict[str, jnp.ndarray]  # second moments
    count: jnp.ndarray  # [] int32 step count


class GaussianOptimizer(NamedTuple):
    init: Callable
    update: Callable
    lr_fns: Dict[str, Callable]


def make_optimizer(
    cfg: OptimizationConfig, spatial_lr_scale: float
) -> GaussianOptimizer:
    xyz_sched = expon_lr(
        lr_init=cfg.position_lr_init * spatial_lr_scale,
        lr_final=cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )
    lr_fns = {
        "xyz": xyz_sched,
        "f_dc": lambda s: jnp.float32(cfg.feature_lr),
        "f_rest": lambda s: jnp.float32(cfg.feature_lr / 20.0),
        "opacity": lambda s: jnp.float32(cfg.opacity_lr),
        "scaling": lambda s: jnp.float32(cfg.scaling_lr),
        "rotation": lambda s: jnp.float32(cfg.rotation_lr),
    }

    def init(params: Dict[str, jnp.ndarray]) -> AdamState:
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        return AdamState(
            mu=zeros, nu=jax.tree.map(jnp.zeros_like, zeros), count=jnp.int32(0)
        )

    def update(grads, state: AdamState, params, step=None):
        """One Adam step. `step` (defaults to internal count) drives the
        xyz LR schedule — the reference calls update_learning_rate(iter)
        each iteration (`train.py:74`)."""
        count = state.count + 1
        sched_step = count if step is None else step
        b1c = 1.0 - BETA1 ** count.astype(jnp.float32)
        b2c = 1.0 - BETA2 ** count.astype(jnp.float32)
        new_mu, new_nu, new_params = {}, {}, {}
        for k in params:
            g = grads[k]
            m = BETA1 * state.mu[k] + (1.0 - BETA1) * g
            v = BETA2 * state.nu[k] + (1.0 - BETA2) * g * g
            m_hat = m / b1c
            v_hat = v / b2c
            lr = lr_fns[k](sched_step)
            new_params[k] = params[k] - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
            new_mu[k] = m
            new_nu[k] = v
        return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)

    return GaussianOptimizer(init=init, update=update, lr_fns=lr_fns)
