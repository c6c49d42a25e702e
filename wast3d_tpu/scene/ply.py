"""Bit-compatible PLY interchange for Gaussian scenes.

Reproduces the reference's PLY schema exactly
(`/root/reference/scene/gaussian_model.py:177-256`): binary little-endian,
one `vertex` element with float32 properties
x, y, z, nx, ny, nz, f_dc_0..2, f_rest_0..(3K-4), opacity,
scale_0..2, rot_0..3, where K = (max_sh_degree+1)^2. Normals are written
as zeros. f_dc / f_rest are channel-major flattenings of the [N, K, 3]
coefficient tensor (the reference's `.transpose(1, 2).flatten(1)`),
so files round-trip byte-for-byte against the reference pipeline and load
in SIBR / standard 3DGS viewers.

Implemented directly on numpy structured arrays (no plyfile dependency in
the hot path); a C++ fast path may back this later via wast3d_tpu.native.
"""

from __future__ import annotations

import os
import re
from typing import Tuple

import numpy as np

from wast3d_tpu.scene.gaussians import GaussianScene, compact, from_arrays

_HEADER_RE = re.compile(rb"end_header\r?\n")


def _attribute_names(num_f_rest: int) -> list:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(num_f_rest)]
    names.append("opacity")
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(scene: GaussianScene, path: str, compact_first: bool = True) -> None:
    """Write the scene's active Gaussians in the reference schema
    (`gaussian_model.py:191-208`)."""
    if compact_first:
        scene = compact(scene)
        n = int(np.asarray(scene.num_active))
    else:
        n = scene.capacity
    xyz = np.asarray(scene.xyz)[:n]
    f_dc = np.asarray(scene.features_dc)[:n]  # [n,1,3]
    f_rest = np.asarray(scene.features_rest)[:n]  # [n,K-1,3]
    # channel-major flatten: [n, K, 3] -> [n, 3, K] -> [n, 3K]
    f_dc_flat = np.transpose(f_dc, (0, 2, 1)).reshape(n, -1)
    f_rest_flat = np.transpose(f_rest, (0, 2, 1)).reshape(n, -1)
    opacity = np.asarray(scene.opacity)[:n]
    scale = np.asarray(scene.scaling)[:n]
    rot = np.asarray(scene.rotation)[:n]

    names = _attribute_names(f_rest_flat.shape[1])
    data = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc_flat, f_rest_flat, opacity, scale, rot], axis=1
    ).astype("<f4")
    assert data.shape[1] == len(names)

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header.append("end_header")

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(np.ascontiguousarray(data).tobytes())


_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}


def _parse_header(blob: bytes) -> Tuple[int, list, int]:
    m = _HEADER_RE.search(blob)
    if m is None:
        raise ValueError("not a PLY file (no end_header)")
    header = blob[: m.start()].decode("ascii", errors="replace")
    lines = [ln.strip() for ln in header.splitlines() if ln.strip()]
    if not lines or lines[0] != "ply":
        raise ValueError("not a PLY file")
    fmt = next((ln for ln in lines if ln.startswith("format ")), "")
    if "binary_little_endian" not in fmt:
        raise ValueError(f"unsupported PLY format: {fmt!r}")
    n = None
    props = []
    in_vertex = False
    for ln in lines:
        if ln.startswith("element "):
            parts = ln.split()
            in_vertex = parts[1] == "vertex"
            if in_vertex:
                n = int(parts[2])
        elif ln.startswith("property ") and in_vertex:
            _, dtype, name = ln.split()
            if dtype not in _PLY_DTYPES:
                raise ValueError(f"unsupported property dtype {dtype}")
            props.append((name, _PLY_DTYPES[dtype]))
    if n is None:
        raise ValueError("no vertex element")
    return n, props, m.end()


def load_ply_arrays(path: str) -> dict:
    """Read a reference-schema PLY into raw numpy arrays
    (mirrors `gaussian_model.py:215-256`, including sorted f_rest/scale/rot
    name order). Uses the native C++ reader when available (all-f32
    files), numpy otherwise."""
    with open(path, "rb") as f:
        head = f.read(1 << 16)
    n, props, offset = _parse_header(head if b"end_header" in head else open(path, "rb").read())

    rec = None
    if all(dt == "<f4" for _, dt in props):
        from wast3d_tpu import native

        fast = native.read_ply_f32(path)
        if fast is not None and fast[1] == n and fast[2] == len(props):
            data = fast[0]
            rec = {name: data[:, i] for i, (name, _) in enumerate(props)}
    if rec is None:
        with open(path, "rb") as f:
            blob = f.read()
        rec = np.frombuffer(blob, dtype=np.dtype(props), count=n, offset=offset)

    def col(name):
        return np.asarray(rec[name])

    xyz = np.stack([col("x"), col("y"), col("z")], axis=1)
    opacity = col("opacity")[:, None]
    f_dc = np.stack([col("f_dc_0"), col("f_dc_1"), col("f_dc_2")], axis=1)[:, :, None]

    names = [p[0] for p in props]
    f_rest_names = sorted(
        (p for p in names if p.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    f_rest = (
        np.stack([col(p) for p in f_rest_names], axis=1) if f_rest_names
        else np.zeros((n, 0), np.float32)
    )
    num_rest = len(f_rest_names) // 3
    f_rest = f_rest.reshape(n, 3, num_rest)

    scale_names = sorted(
        (p for p in names if p.startswith("scale_")), key=lambda s: int(s.split("_")[-1])
    )
    scales = np.stack([col(p) for p in scale_names], axis=1)
    rot_names = sorted(
        (p for p in names if p.startswith("rot")), key=lambda s: int(s.split("_")[-1])
    )
    rots = np.stack([col(p) for p in rot_names], axis=1)
    return {
        "xyz": xyz,
        "features_dc": np.transpose(f_dc, (0, 2, 1)),  # [n,1,3]
        "features_rest": np.transpose(f_rest, (0, 2, 1)),  # [n,num_rest,3]
        "opacity": opacity,
        "scaling": scales,
        "rotation": rots,
    }


def load_ply(path: str, max_sh_degree: int = 3, capacity: int | None = None) -> GaussianScene:
    """Load into a GaussianScene; like the reference loader, the active SH
    degree is set to max (`gaussian_model.py:256`)."""
    arrs = load_ply_arrays(path)
    expected_rest = (max_sh_degree + 1) ** 2 - 1
    if arrs["features_rest"].shape[1] != expected_rest:
        raise ValueError(
            f"PLY has {arrs['features_rest'].shape[1]} f_rest coeffs per channel, "
            f"expected {expected_rest} for sh_degree {max_sh_degree}"
        )
    return from_arrays(
        xyz=arrs["xyz"],
        features_dc=arrs["features_dc"],
        features_rest=arrs["features_rest"],
        scaling=arrs["scaling"],
        rotation=arrs["rotation"],
        opacity=arrs["opacity"],
        max_sh_degree=max_sh_degree,
        active_sh_degree=max_sh_degree,
        capacity=capacity,
    )
