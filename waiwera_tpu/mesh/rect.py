"""Structured rectilinear mesh generators (hexahedral 3D / quad 2D /
1-D columns), for tests and simple models.

Cells are numbered x-fastest, then y, then z (natural order).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from waiwera_tpu.mesh.core import Mesh, build_mesh


def _spacing(spec) -> np.ndarray:
    """Edge coordinates from a spacing spec: list of widths."""
    widths = np.asarray(spec, dtype=np.float64)
    return np.concatenate([[0.0], np.cumsum(widths)])


def rectangular_mesh(
    dx: Sequence[float],
    dy: Optional[Sequence[float]] = None,
    dz: Optional[Sequence[float]] = None,
    origin=None,
    gravity=None,
    radial: bool = False,
    thickness: float = 1.0,
) -> Mesh:
    """Rectilinear mesh from per-axis cell widths.

    - dx only: 1-D horizontal column modelled as 2D quads of unit height.
    - dx + dy: 2D quad mesh in (x, y).
    - dx + dy + dz: 3D hexahedral mesh.
    """
    if dy is None and dz is None:
        return rectangular_mesh(
            dx, [1.0], None, origin=origin, gravity=gravity,
            radial=radial, thickness=thickness,
        )
    x = _spacing(dx)
    y = _spacing(dy)
    if origin is not None:
        origin = np.asarray(origin, dtype=np.float64)
    if dz is None:
        nx, ny = len(x) - 1, len(y) - 1
        if origin is not None:
            x = x + origin[0]
            y = y + origin[1]
        X, Y = np.meshgrid(x, y, indexing="xy")
        verts = np.stack([X.ravel(), Y.ravel()], axis=1)

        def vid(i, j):
            return j * (nx + 1) + i

        conn = np.empty((ny * nx, 4), dtype=np.int64)
        c = 0
        for j in range(ny):
            for i in range(nx):
                conn[c] = [vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)]
                c += 1
        return build_mesh(
            verts, [("quad", conn)], gravity=gravity, radial=radial,
            thickness=thickness,
        )

    z = _spacing(dz)
    if origin is not None:
        x = x + origin[0]
        y = y + origin[1]
        z = z + origin[2]
    nx, ny, nz = len(x) - 1, len(y) - 1, len(z) - 1
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    # vertex id (i, j, k) -> flat with k fastest? use functional map
    nvx, nvy, nvz = nx + 1, ny + 1, nz + 1
    verts = np.empty((nvx * nvy * nvz, 3))

    def vid(i, j, k):
        return (k * nvy + j) * nvx + i

    for k in range(nvz):
        for j in range(nvy):
            verts[vid(np.arange(nvx), j, k)] = np.stack(
                [x, np.full(nvx, y[j]), np.full(nvx, z[k])], axis=1
            )

    conn = np.empty((nz * ny * nx, 8), dtype=np.int64)
    c = 0
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                conn[c] = [
                    vid(i, j, k),
                    vid(i + 1, j, k),
                    vid(i + 1, j + 1, k),
                    vid(i, j + 1, k),
                    vid(i, j, k + 1),
                    vid(i + 1, j, k + 1),
                    vid(i + 1, j + 1, k + 1),
                    vid(i, j + 1, k + 1),
                ]
                c += 1
    return build_mesh(verts, [("hexahedron", conn)], gravity=gravity)


def column_mesh(
    dz: Sequence[float],
    area: float = 1.0,
    gravity=None,
    top: float = 0.0,
) -> Mesh:
    """1-D vertical column of quad cells (2D mesh of width sqrt(area),
    thickness sqrt(area)): cell 0 at the top, z decreasing downward.

    Gravity defaults to (0, -9.8) in the 2D plane, so the column's y
    axis is depth.
    """
    dz = np.asarray(dz, dtype=np.float64)
    w = float(np.sqrt(area))
    n = len(dz)
    zedges = top - np.concatenate([[0.0], np.cumsum(dz)])
    verts = np.empty((2 * (n + 1), 2))
    verts[0::2, 0] = 0.0
    verts[1::2, 0] = w
    verts[0::2, 1] = zedges
    verts[1::2, 1] = zedges
    conn = np.empty((n, 4), dtype=np.int64)
    for c in range(n):
        v0 = 2 * c
        conn[c] = [v0, v0 + 1, v0 + 3, v0 + 2]
    if gravity is None:
        gravity = [0.0, -9.8]
    return build_mesh(verts, [("quad", conn)], gravity=gravity, thickness=w)
