"""TPU compile/run smoke: the fail-fast gate for chip-only regressions.

Mosaic kernel compilation happens in the backend at XLA-compile time, so
neither the CPU interpret-mode tests nor the jax.export lowering test can
catch a kernel that stops legalizing on real TPU (seen r3: an scf.yield
vreg-layout mismatch from a lane slice carried through a while_loop).
This probe compiles + runs the production render forward AND backward,
exact and fast chains, plus the grad-reduce segsum path, on a tiny scene.

Run it FIRST in any measurement session; exit code is the verdict.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    import bench
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import api

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n = 20_000
    scene = bench._build(n, cap=n)
    cam = look_at_camera(
        eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
        fovx=0.9, fovy=0.9, width=256, height=256,
    )
    bg = jnp.zeros(3)

    for fast in (False, True):
        for grad_reduce in ("segsum_sortpacked", "scatter"):
            st = api.RasterizeSettings(
                renderer="pallas", dup_capacity=4 * n, chunk=32,
                fast_chain=fast, grad_reduce=grad_reduce,
            )

            @jax.jit
            def loss(xyz, scene, cam, bg, st=st):
                scene = scene.replace(xyz=xyz)
                out = api.render(cam, scene, bg, settings=st)
                return jnp.sum(out["render"]) + 0.01 * jnp.sum(out["depth"])

            v = float(loss(scene.xyz, scene, cam, bg))
            g = jax.jit(jax.grad(loss))(scene.xyz, scene, cam, bg)
            gn = float(jnp.linalg.norm(g))
            ok = jnp.isfinite(v) and gn > 0.0 and jnp.isfinite(gn)
            print(
                f"fast={fast} grad_reduce={grad_reduce} "
                f"loss={v:.4f} |dxyz|={gn:.4f} ok={bool(ok)}",
                flush=True,
            )
            if not ok:
                return 1

    # Serving tier: pack_gather (u32 split-bf16 gather; forward-only).
    st = api.RasterizeSettings(
        renderer="pallas", dup_capacity=4 * n, chunk=32,
        fast_chain=True, pack_gather=True,
    )

    @jax.jit
    def fwd(scene, cam, bg):
        return api.render(cam, scene, bg, settings=st)["render"]

    img = fwd(scene, cam, bg)
    ok = bool(jnp.isfinite(jnp.sum(img)))
    print(f"pack_gather serving fwd ok={ok}", flush=True)
    if not ok:
        return 1
    print("TPU_SMOKE_OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
