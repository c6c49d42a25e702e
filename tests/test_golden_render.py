"""Golden-scene regression gate (VERDICT r1 'do this' #7a).

`tests/golden/scene.ply` is a reference-schema PLY (the bit-compatible
interchange format, `gaussian_model.construct_list_of_attributes`,
`/root/reference/scene/gaussian_model.py:177-189`) plus a committed
render (`render.npz`) produced by the exact per-pixel oracle at degree-3
SH from a non-axis-aligned COLMAP-convention camera. This pins the FULL
chain — PLY field order/activation conventions, camera matrix
conventions, SH eval, EWA projection, compositing — against drift: any
convention change in any layer shows up as a PSNR drop here.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from wast3d_tpu.core.camera import make_camera
from wast3d_tpu.ops.image_losses import psnr
from wast3d_tpu.ops.rasterizer import api
from wast3d_tpu.scene.ply import load_ply

GOLD = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(GOLD, "render.npz"))
    scene = load_ply(os.path.join(GOLD, "scene.ply"))
    scene = scene.replace(active_sh_degree=3)
    cam = make_camera(
        data["R"], data["t"], fovx=float(data["fov"][0]),
        fovy=float(data["fov"][1]), width=int(data["wh"][0]),
        height=int(data["wh"][1]),
    )
    return scene, cam, data


@pytest.mark.parametrize("renderer", ["oracle", "tiled", "pallas"])
def test_matches_golden(golden, renderer):
    scene, cam, data = golden
    settings = api.RasterizeSettings(
        renderer=renderer, dup_capacity=1 << 14, max_per_tile=512, chunk=32,
        phase_a_tiles=16, pallas_interpret=(renderer == "pallas"),
    )
    out = api.render(cam, scene, jnp.zeros(3), settings=settings)
    assert not bool(out.get("overflow", False))
    p = float(psnr(out["render"], jnp.asarray(data["color"])))
    # oracle is bit-identical to the stored render; the tiled/pallas paths
    # differ only by compositing chunk order (float assoc).
    assert p > 45.0, f"{renderer}: PSNR vs golden = {p:.2f}"
    d_err = float(jnp.max(jnp.abs(out["depth"] - jnp.asarray(data["depth"]))))
    assert d_err < 2e-2, f"{renderer}: depth drift {d_err}"
