"""Native (C++) host kernels with ctypes bindings.

The reference delegates its host-side heavy lifting to PETSc's C
layer (DMPlex geometry, partitioners, orderings — SURVEY §2.8); this
package is our native equivalent: mesh geometry, face-key sorting,
RCM ordering and graph partitioning compiled from topology.cpp.

The shared library is built on demand with g++ (cached next to the
source; rebuilt when the source is newer) and loaded via ctypes. If
compilation fails or WAIWERA_TPU_NATIVE=0, everything falls back to
the numpy implementations in mesh/core.py & parallel/partition.py —
`available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "topology.cpp")
_LIB = os.path.join(_HERE, "_libwaiwera_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", _SRC, "-o", _LIB,
    ]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=240
        )
        if r.returncode != 0:
            # retry without openmp/march (portability)
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", _LIB,
            ]
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=240
            )
        return r.returncode == 0
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("WAIWERA_TPU_NATIVE", "1").lower() in (
            "0", "off", "false",
        ):
            return None
        try:
            need_build = (not os.path.exists(_LIB)) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            )
            if need_build and not _build():
                return None
            lib = ctypes.CDLL(_LIB)
        except Exception:
            return None
        lib.ww_cell_geom_3d.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _i64p, _f64p,
            ctypes.c_int64, _i64p, _i64p, _f64p, _f64p,
        ]
        lib.ww_cell_geom_2d.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _i64p, _f64p, _f64p, _f64p,
        ]
        lib.ww_polygon_geom.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _i64p, _f64p, _f64p, _f64p,
        ]
        lib.ww_sort_rows.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _i64p, _i64p,
        ]
        lib.ww_rcm.argtypes = [ctypes.c_int64, _i64p, _i64p, _i64p]
        lib.ww_partition_graph.argtypes = [
            ctypes.c_int64, _i64p, _i64p, ctypes.c_int64, _i64p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ip(a: np.ndarray):
    return a.ctypes.data_as(_i64p)


def _fp(a: np.ndarray):
    return a.ctypes.data_as(_f64p)


def _c_i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def _c_f64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


def cell_geom_3d(conn, verts, templates):
    """(centroid [nc,3], volume [nc]) for 3D cells; templates is the
    face-template list for the element type (mesh/core._FACES_3D)."""
    lib = _load()
    conn = _c_i64(conn)
    verts = _c_f64(verts)
    nc, kv = conn.shape
    sizes = _c_i64([len(t) for t in templates])
    flat = _c_i64([v for t in templates for v in t])
    centroid = np.empty((nc, 3))
    volume = np.empty(nc)
    lib.ww_cell_geom_3d(
        nc, kv, _ip(conn), _fp(verts), len(templates), _ip(sizes),
        _ip(flat), _fp(centroid), _fp(volume),
    )
    return centroid, volume


def cell_geom_2d(conn, verts):
    lib = _load()
    conn = _c_i64(conn)
    verts = _c_f64(verts)
    nc, kv = conn.shape
    centroid = np.empty((nc, 3))
    volume = np.empty(nc)
    lib.ww_cell_geom_2d(
        nc, kv, _ip(conn), _fp(verts), _fp(centroid), _fp(volume)
    )
    return centroid, volume


def polygon_geom(fv, verts):
    """(area_normal [n,3], centroid [n,3]) of padded polygon rows
    (pads -1 at the front), matching mesh/core._polygon_geometry."""
    lib = _load()
    fv = _c_i64(fv)
    verts = _c_f64(verts)
    n, kmax = fv.shape
    area_normal = np.empty((n, 3))
    centroid = np.empty((n, 3))
    lib.ww_polygon_geom(
        n, kmax, _ip(fv), _fp(verts), _fp(area_normal), _fp(centroid)
    )
    return area_normal, centroid


def sort_rows(keys) -> np.ndarray:
    """Stable lexicographic argsort of integer rows (np.lexsort of
    keys.T[::-1] equivalent)."""
    lib = _load()
    keys = _c_i64(keys)
    n, k = keys.shape
    order = np.empty(n, np.int64)
    lib.ww_sort_rows(n, k, _ip(keys), _ip(order))
    return order


def rcm(indptr, indices, n: int) -> np.ndarray:
    """Reverse Cuthill-McKee permutation of a CSR graph."""
    lib = _load()
    indptr = _c_i64(indptr)
    indices = _c_i64(indices)
    perm = np.empty(n, np.int64)
    lib.ww_rcm(n, _ip(indptr), _ip(indices), _ip(perm))
    return perm


def partition_graph(indptr, indices, n: int, nparts: int) -> np.ndarray:
    """Greedy graph-growing partition with refinement; [n] part ids."""
    lib = _load()
    indptr = _c_i64(indptr)
    indices = _c_i64(indices)
    part = np.empty(n, np.int64)
    lib.ww_partition_graph(
        n, _ip(indptr), _ip(indices), nparts, _ip(part)
    )
    return part
