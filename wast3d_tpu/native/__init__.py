"""Native (C++) host-side IO fast paths, loaded via ctypes.

Build is lazy: on first use, `io.cpp` is compiled with g++ into
`_w3d_io.so` next to this file (no pybind11 in this environment — plain
C ABI + ctypes). Every entry point has a pure-numpy fallback in
`scene/ply.py` / `scene/colmap.py`; `available()` reports whether the
fast path loaded. Set WAST3D_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_w3d_io.so")
_SRC = os.path.join(_HERE, "io.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("WAST3D_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.w3d_read_ply_f32.restype = ctypes.c_int
        lib.w3d_read_ply_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.w3d_write_ply_f32.restype = ctypes.c_int
        lib.w3d_write_ply_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.w3d_read_colmap_points3d.restype = ctypes.c_int
        lib.w3d_read_colmap_points3d.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_ply_f32(path: str) -> Optional[Tuple[np.ndarray, int, int]]:
    """Fast path for all-float32 binary PLYs. Returns (data [rows, cols],
    rows, cols) or None if the fast path can't handle the file."""
    lib = _load()
    if lib is None:
        return None
    size = os.path.getsize(path)
    max_floats = size // 4 + 16
    buf = np.empty(max_floats, np.float32)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.w3d_read_ply_f32(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_floats, ctypes.byref(rows), ctypes.byref(cols),
    )
    if rc != 0:
        return None
    r, c = rows.value, cols.value
    return buf[: r * c].reshape(r, c).copy(), r, c


def write_ply_f32(path: str, header: str, data: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float32)
    rc = lib.w3d_write_ply_f32(
        path.encode(), header.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], data.shape[1],
    )
    return rc == 0


def read_colmap_points3d(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    # Upper bound: file_size / per-point minimum (59 bytes).
    max_pts = os.path.getsize(path) // 59 + 16
    xyz = np.empty((max_pts, 3), np.float64)
    rgb = np.empty((max_pts, 3), np.uint8)
    n = ctypes.c_int64()
    rc = lib.w3d_read_colmap_points3d(
        path.encode(), xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_pts, ctypes.byref(n),
    )
    if rc != 0:
        return None
    return xyz[: n.value].copy(), rgb[: n.value].copy()
