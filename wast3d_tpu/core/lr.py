"""Learning-rate schedules.

`expon_lr` reproduces the reference's Plenoxels-style log-linear decay
(`/root/reference/utils/general_utils.py:29-62`) as a jnp-traceable
function usable inside a jitted train step (the reference recomputes it in
python every iteration, `scene/gaussian_model.py:169-175`)."""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Returns schedule(step)->lr. Log-linear from lr_init to lr_final over
    max_steps, with an optional sine-eased warm-up delay."""

    if lr_init == 0.0 and lr_final == 0.0:
        return lambda step: jnp.zeros_like(jnp.asarray(step, jnp.float32))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
        # Negative steps disable the parameter (reference helper's step<0 branch).
        return jnp.where(step < 0, 0.0, delay_rate * log_lerp)

    return schedule
