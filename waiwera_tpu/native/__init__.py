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
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "topology.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_f64p = ctypes.POINTER(ctypes.c_double)


def _lib_path() -> str:
    """Library path keyed on a content hash of the source, so a stale
    binary (e.g. from a fresh checkout where git equalises mtimes, or
    built on another machine with different ISA extensions) is never
    loaded — the library is always compiled locally."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"_libwaiwera_native_{digest}.so")


def _build(lib_path: str) -> bool:
    tmp = lib_path + ".tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", _SRC, "-o", tmp,
    ]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=240
        )
        if r.returncode != 0:
            # retry without openmp/march (portability)
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", tmp,
            ]
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=240
            )
        if r.returncode != 0:
            return False
        os.replace(tmp, lib_path)
        return True
    except Exception:
        return False


def _self_test(lib) -> bool:
    """Known-answer check so a miscompiled/incompatible library is
    rejected before any real call."""
    try:
        keys = np.array([[2, 1], [0, 3], [2, 0], [0, 1]], np.int64)
        order = np.empty(4, np.int64)
        lib.ww_sort_rows(4, 2, _ip(keys), _ip(order))
        if not np.array_equal(order, np.lexsort(keys.T[::-1])):
            return False
        # RCM on a 4-path graph must be a permutation of 0..3
        indptr = np.array([0, 1, 3, 5, 6], np.int64)
        indices = np.array([1, 0, 2, 1, 3, 2], np.int64)
        perm = np.empty(4, np.int64)
        lib.ww_rcm(4, _ip(indptr), _ip(indices), _ip(perm))
        return np.array_equal(np.sort(perm), np.arange(4))
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
            lib_path = _lib_path()
            if not os.path.exists(lib_path) and not _build(lib_path):
                return None
            lib = ctypes.CDLL(lib_path)
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
        if not _self_test(lib):
            return None
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
