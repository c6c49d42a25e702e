"""Seeded randomized cross-renderer fuzz.

Targeted parity tests (test_rasterizer.py, test_pallas_blend.py,
test_golden_render.py) pin specific scenes; this sweeps randomized
*adversarial* scene/camera draws — extreme anisotropy, saturating and
near-threshold opacities, behind/near-plane points, off-screen splats,
rotated covariances, non-square frames — and asserts all three renderers
(oracle / tiled / pallas-interpret) agree on color, depth, final_T and on
gradients. Each draw mixes every hazard class so the per-seed cost stays
small while coverage multiplies.

Reference semantics under test: `forward.cu:262-389` compositing (alpha
clamp 0.99, skip < 1/255, stop before T < 1e-4) + `backward.cu` gradient
chain, via this repo's implementations only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.ops.rasterizer import api
from tests.test_rasterizer import _cam, _scene_from

BLACK = jnp.zeros(3)


def _adversarial_scene(seed, n=180):
    """Random scene mixing hazard classes (seeded, deterministic)."""
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)) * [1.4, 1.4, 0.8]
    # ~10% behind the camera / straddling the near plane (eye z=-5,
    # znear cull band), ~10% far off-screen.
    k = n // 10
    xyz[:k, 2] = rng.uniform(-7.0, -4.9, size=k)
    xyz[k:2 * k, 0] += rng.choice([-1, 1], size=k) * rng.uniform(8, 20, size=k)
    # Opacities spanning saturating (sigmoid~1) to sub-threshold (<1/255).
    opa = rng.uniform(0.25, 0.999, size=(n, 1))
    opa[2 * k:3 * k] = rng.uniform(0.002, 0.005, size=(k, 1))
    opa[3 * k:4 * k] = 0.999
    # Scales: 100:1 anisotropy + a few huge and tiny splats.
    scale = rng.uniform(0.02, 0.1, size=(n, 3))
    scale[4 * k:5 * k, 0] *= 10.0  # needles
    scale[5 * k:6 * k] *= 4.0      # big blobs
    scale[6 * k:7 * k] *= 0.05     # sub-pixel
    scene = _scene_from(
        xyz=xyz, rgb=rng.uniform(0, 1, size=(n, 3)), scale=scale,
        opacity=np.clip(opa, 1e-4, 1 - 1e-4),
    )
    # Random (normalized) rotations so covariances are not axis-aligned
    # (capacity-padded rows stay identity).
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-8)
    rot = np.asarray(scene.rotation).copy()
    rot[:n] = q
    return scene.replace(rotation=jnp.asarray(rot))


def _settings(renderer):
    return api.RasterizeSettings(
        renderer=renderer, dup_capacity=1 << 15, max_per_tile=512,
        chunk=16, pallas_interpret=(renderer == "pallas"),
        grad_reduce="segsum",
    )


FRAMES = [(64, 64), (80, 48), (56, 72)]  # square / wide / tall


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_forward_cross_renderer(seed):
    rng = np.random.default_rng(100 + seed)
    w, h = FRAMES[seed % len(FRAMES)]
    eye = (rng.uniform(-1, 1), rng.uniform(-1, 1), -5 + rng.uniform(-1, 1))
    cam = _cam(w=w, h=h, fov=float(rng.uniform(0.6, 1.1)), eye=eye)
    scene = _adversarial_scene(seed)
    outs = {}
    for r in ("oracle", "tiled", "pallas"):
        out = api.render(cam, scene, BLACK, settings=_settings(r))
        assert not bool(out.get("overflow", False)), (r, seed)
        outs[r] = out
        arr = np.asarray(out["render"])
        assert np.isfinite(arr).all(), (r, seed)
        assert arr.min() >= 0.0 and arr.max() <= 1.0 + 1e-4, (r, seed)
    for r in ("tiled", "pallas"):
        np.testing.assert_allclose(
            np.asarray(outs[r]["render"]), np.asarray(outs["oracle"]["render"]),
            atol=3e-3, err_msg=f"{r} color, seed {seed}")
        np.testing.assert_allclose(
            np.asarray(outs[r]["final_T"]), np.asarray(outs["oracle"]["final_T"]),
            atol=3e-3, err_msg=f"{r} final_T, seed {seed}")
        np.testing.assert_allclose(
            np.asarray(outs[r]["depth"]), np.asarray(outs["oracle"]["depth"]),
            atol=3e-2, err_msg=f"{r} depth, seed {seed}")


@pytest.mark.parametrize("seed", [0, 3])
def test_gradients_cross_renderer(seed):
    """xyz/opacity/scaling gradients of an image loss agree across
    renderers (scale-normalized: split-bf16 accumulation class)."""
    cam = _cam(w=48, h=48, eye=(0.3, -0.2, -5))
    scene = _adversarial_scene(seed, n=120)
    target = jnp.asarray(
        np.random.default_rng(9).uniform(0, 1, (48, 48, 3)), jnp.float32)

    def loss(xyz, opacity, scaling, renderer, target):
        s = scene.replace(xyz=xyz, opacity=opacity, scaling=scaling)
        out = api.render(cam, s, BLACK, settings=_settings(renderer))
        return jnp.mean(jnp.abs(out["render"] - target)) \
            + 0.1 * jnp.mean(out["depth"])

    grads = {}
    for r in ("oracle", "tiled", "pallas"):
        grads[r] = jax.grad(loss, argnums=(0, 1, 2))(
            scene.xyz, scene.opacity, scene.scaling, r, target)
    for r in ("tiled", "pallas"):
        for gi, name in ((0, "xyz"), (1, "opacity"), (2, "scaling")):
            g, go = np.asarray(grads[r][gi]), np.asarray(grads["oracle"][gi])
            assert np.isfinite(g).all(), (r, name, seed)
            denom = max(np.abs(go).max(), 1e-8)
            np.testing.assert_allclose(
                g / denom, go / denom, atol=2e-2,
                err_msg=f"{r} {name} grad, seed {seed}")
