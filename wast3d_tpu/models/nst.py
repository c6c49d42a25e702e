"""Classic Gatys neural style transfer on images (sanity reference).

Parity with `/root/reference/nerf2nerf/nst.py:34-111` and the in-situ
`test_simple_NST` control of `train_st_sphere4_vgg.py:142-151,251-277`:
optimize a generated image directly against VGG content + Gram style
losses — the known-good baseline used to sanity-check the VGG loss
plumbing before pointing it at rendered Gaussians.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wast3d_tpu.ops import vgg as vgg_mod


@partial(jax.jit, static_argnames=("steps",))
def _nst_scan(image0, content_feats, style_feats, params, alpha, beta, lr, steps):
    def loss_fn(img):
        feats = vgg_mod.get_features(params, img)
        l_c = vgg_mod.content_loss(content_feats, feats)
        l_s = vgg_mod.style_loss(style_feats, feats)
        return alpha * l_c + beta * l_s

    def step(carry, _):
        img, mu, nu, t = carry
        loss, g = jax.value_and_grad(loss_fn)(img)
        t = t + 1
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * g * g
        img = img - lr * (mu / (1 - 0.9**t)) / (jnp.sqrt(nu / (1 - 0.999**t)) + 1e-8)
        return (img, mu, nu, t), loss

    (img, *_), losses = jax.lax.scan(
        step, (image0, jnp.zeros_like(image0), jnp.zeros_like(image0),
               jnp.float32(0.0)), None, length=steps
    )
    return img, losses


def style_transfer(
    content_image: np.ndarray,
    style_image: np.ndarray,
    steps: int = 200,
    lr: float = 4e-3,
    alpha: float = 8.0,
    beta: float = 70.0,
    weights_path: Optional[str] = None,
):
    """Run NST; returns (stylized [H,W,3], losses). Weights as in the
    reference (`nst.py`: lr 0.004, alpha 8, beta 70)."""
    params = {k: jnp.asarray(v) for k, v in vgg_mod.load_weights(weights_path).items()}
    c = jnp.asarray(content_image, jnp.float32)
    s = jnp.asarray(style_image, jnp.float32)
    content_feats = vgg_mod.get_features(params, c)
    style_feats = vgg_mod.get_features(params, s)
    img, losses = _nst_scan(c, content_feats, style_feats, params,
                            alpha, beta, lr, steps)
    return np.asarray(jnp.clip(img, 0, 1)), np.asarray(losses)
