"""ctypes bindings for the native grid-hash library (grid_hash.cpp).

Builds on first import with g++ if the shared object is missing or stale;
falls back gracefully (``available() == False``) so pure-python paths keep
working on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "grid_hash.cpp")
_SO = osp.join(_DIR, "libgridhash.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        log.warning("native grid_hash build failed: %s", e)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_SO) or os.stat(_SO).st_mtime < os.stat(_SRC).st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        log.warning("native grid_hash load failed: %s", e)
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.voxel_sample_last.restype = ctypes.c_int64
    lib.voxel_sample_last.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_double, i64p, i64p, i64p,
    ]
    lib.grid2d_build.restype = ctypes.c_void_p
    lib.grid2d_build.argtypes = [f32p, ctypes.c_int64, ctypes.c_double]
    lib.grid2d_free.argtypes = [ctypes.c_void_p]
    lib.grid2d_cylinder_query.restype = ctypes.c_int64
    lib.grid2d_cylinder_query.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_double, i64p,
    ]
    lib.knn1.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_double, i64p, f32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def voxel_sample_last(
    pos: np.ndarray, size: float, perm: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (sel, inv): kept original indices and point->voxel map."""
    lib = _load()
    pos = np.ascontiguousarray(pos, np.float32)
    perm = np.ascontiguousarray(perm, np.int64)
    n = len(pos)
    sel = np.empty(n, np.int64)
    inv = np.empty(n, np.int64)
    m = lib.voxel_sample_last(
        _f32p(pos), n, float(size), _i64p(perm), _i64p(sel), _i64p(inv)
    )
    return sel[:m].copy(), inv


class Grid2D:
    """Persistent 2D grid hash over xy for repeated cylinder queries."""

    def __init__(self, xy: np.ndarray, cell: float):
        self._lib = _load()
        self._xy = np.ascontiguousarray(xy, np.float32)
        self._n = len(xy)
        self._h = self._lib.grid2d_build(_f32p(self._xy), self._n, float(cell))

    def cylinder_query(self, cx: float, cy: float, radius: float) -> np.ndarray:
        out = np.empty(self._n, np.int64)
        cnt = self._lib.grid2d_cylinder_query(
            self._h, float(cx), float(cy), float(radius), _i64p(out)
        )
        return out[:cnt].copy()

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.grid2d_free(self._h)
            self._h = None


def knn1(
    ref: np.ndarray, query: np.ndarray, cell: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """1-NN (index, distance) from each query to the reference set."""
    lib = _load()
    ref = np.ascontiguousarray(ref, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    if cell is None:
        # heuristic: average spacing from the bounding volume
        extent = ref.max(0) - ref.min(0) + 1e-6
        cell = float(np.cbrt(extent.prod() / max(len(ref), 1))) * 2 + 1e-6
    idx = np.empty(len(query), np.int64)
    dist = np.empty(len(query), np.float32)
    lib.knn1(
        _f32p(ref), len(ref), _f32p(query), len(query), float(cell),
        _i64p(idx), _f32p(dist),
    )
    return idx, dist
