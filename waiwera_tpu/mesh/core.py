"""Finite-volume mesh geometry and connectivity.

Host-side (NumPy) replacement for the reference's PETSc DMPlex stack:
- cell/face connectivity by vectorised face dedup (DMPlex cones/supports)
- FV geometry equivalent to DMPlexComputeGeometryFVM + Waiwera's
  modifications (mesh.F90:341-580): 2D thickness / radial Pappus
  corrections, non-orthogonal distance correction, gravity normals,
  permeability directions
- Dirichlet boundaries as appended ghost cells with zero volume and
  centroid on the face (mesh.F90:583-667)

Cell order is the input (natural) order, so output is partition
invariant by construction (replaces the AO machinery, dm_utils.F90:782).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# face templates per element type: local vertex indices per face.
# Orientation is normalised numerically (outward check), so only the
# cyclic vertex order of each face matters.
_FACES_3D = {
    "tetra": [(0, 2, 1), (0, 1, 3), (1, 2, 3), (2, 0, 3)],
    "pyramid": [(0, 3, 2, 1), (0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4)],
    "wedge": [(0, 2, 1), (3, 4, 5), (0, 1, 4, 3), (1, 2, 5, 4), (2, 0, 3, 5)],
    "hexahedron": [
        (0, 3, 2, 1),
        (4, 5, 6, 7),
        (0, 1, 5, 4),
        (1, 2, 6, 5),
        (2, 3, 7, 6),
        (3, 0, 4, 7),
    ],
}
_EDGES_2D = {
    "triangle": [(0, 1), (1, 2), (2, 0)],
    "quad": [(0, 1), (1, 2), (2, 3), (3, 0)],
}

ELEMENT_NUM_VERTICES = {
    "tetra": 4,
    "pyramid": 5,
    "wedge": 6,
    "hexahedron": 8,
    "triangle": 3,
    "quad": 4,
}


@dataclass
class BoundarySpec:
    """One 'boundaries' entry from JSON: Dirichlet condition applied in
    ghost cells across the listed faces."""

    primary: np.ndarray  # [npv] boundary primary variables
    region: int
    cells: np.ndarray  # ghost cell indices (into the padded cell range)
    faces: np.ndarray  # face indices of the boundary faces
    tracer: Optional[np.ndarray] = None


@dataclass
class Mesh:
    dim: int
    vertices: np.ndarray  # [nv, dim]
    cell_blocks: List[Tuple[str, np.ndarray]]  # (type, [nc_e, nvpe])

    # geometry (filled by build)
    num_interior_cells: int = 0
    num_cells: int = 0  # interior + boundary ghost
    cell_centroid: np.ndarray = None  # [N, 3]
    cell_volume: np.ndarray = None  # [N]
    face_cells: np.ndarray = None  # [F, 2]
    face_area: np.ndarray = None  # [F]
    face_distance: np.ndarray = None  # [F, 2]
    face_distance12: np.ndarray = None  # [F]
    face_normal: np.ndarray = None  # [F, 3]
    face_gravity_normal: np.ndarray = None  # [F]
    face_centroid: np.ndarray = None  # [F, 3]
    face_permeability_direction: np.ndarray = None  # [F] int (0-based)
    is_ghost: np.ndarray = None  # [N] bool
    boundaries: List[BoundarySpec] = field(default_factory=list)
    gravity: np.ndarray = None  # [3]
    radial: bool = False
    thickness: float = 1.0
    # exterior faces of the input mesh that did not get a boundary
    # condition (closed / no-flux): [Fb] rows of (cell, face_key_index)
    exterior_faces: np.ndarray = None
    exterior_face_cell: np.ndarray = None
    exterior_face_centroid: np.ndarray = None
    exterior_face_normal: np.ndarray = None
    exterior_face_area: np.ndarray = None

    @property
    def num_faces(self) -> int:
        return len(self.face_area)

    @property
    def interior_cell_mask(self) -> np.ndarray:
        return ~self.is_ghost


def _pad3(x: np.ndarray) -> np.ndarray:
    """Pad [n, dim] coordinates to [n, 3]."""
    if x.shape[1] == 3:
        return x
    out = np.zeros((x.shape[0], 3))
    out[:, : x.shape[1]] = x
    return out


def _polygon_geometry(verts: np.ndarray):
    """Area vector and centroid of polygons given as [n, k, 3] vertex
    coords (k >= 3). Fan triangulation around the vertex mean, as in
    PETSc's FV geometry. Returns (area_normal [n,3], centroid [n,3])."""
    mean = verts.mean(axis=1, keepdims=True)  # [n, 1, 3]
    k = verts.shape[1]
    areas = np.zeros((verts.shape[0], 3))
    cent = np.zeros((verts.shape[0], 3))
    total = np.zeros(verts.shape[0])
    for i in range(k):
        a = verts[:, i] - mean[:, 0]
        b = verts[:, (i + 1) % k] - mean[:, 0]
        tri_n = 0.5 * np.cross(a, b)  # [n, 3]
        tri_c = (verts[:, i] + verts[:, (i + 1) % k] + mean[:, 0]) / 3.0
        tri_a = np.linalg.norm(tri_n, axis=1)
        areas += tri_n
        cent += tri_c * tri_a[:, None]
        total += tri_a
    total = np.where(total > 0, total, 1.0)
    return areas, cent / total[:, None]


def _edge_geometry(verts: np.ndarray, dim: int = 2):
    """2D 'faces' are edges: [n, 2, dim]. Returns (area_normal [n,3]
    with in-plane normal scaled by length, centroid [n,3])."""
    v = _pad3(verts.reshape(-1, verts.shape[-1])).reshape(
        verts.shape[0], 2, 3
    )
    d = v[:, 1] - v[:, 0]
    # normal perpendicular to edge in the xy-plane
    n = np.stack([d[:, 1], -d[:, 0], np.zeros(len(d))], axis=1)
    c = 0.5 * (v[:, 0] + v[:, 1])
    return n, c


def _extract_faces(dim: int, cell_blocks, cell_offsets):
    """Enumerate all (cell, face) pairs with padded sorted vertex keys.

    Returns (keys [nf_all, kmax], cell_index [nf_all],
             face_vertex_lists as object array)."""
    all_keys = []
    all_cells = []
    all_faces = []  # [nf_all, kmax] vertex ids, -1 padded, in cyclic order
    kmax = 4 if dim == 3 else 2
    for (etype, conn), off in zip(cell_blocks, cell_offsets):
        templates = _FACES_3D[etype] if dim == 3 else _EDGES_2D[etype]
        nc = len(conn)
        for tmpl in templates:
            fv = conn[:, list(tmpl)]  # [nc, k]
            k = fv.shape[1]
            keys = np.sort(fv, axis=1)
            pad = np.full((nc, kmax - k), -1, dtype=fv.dtype)
            all_keys.append(np.concatenate([pad, keys], axis=1))
            all_faces.append(np.concatenate([np.full((nc, kmax - k), -1, dtype=fv.dtype), fv], axis=1))
            all_cells.append(off + np.arange(nc))
    return (
        np.concatenate(all_keys),
        np.concatenate(all_cells),
        np.concatenate(all_faces),
    )


def build_mesh(
    vertices: np.ndarray,
    cell_blocks: Sequence[Tuple[str, np.ndarray]],
    gravity=None,
    radial: bool = False,
    thickness: float = 1.0,
) -> Mesh:
    """Build mesh connectivity and FV geometry from vertices and cells.

    cell_blocks: [(element_type, connectivity [nc_e, nvpe])], vertex
    indices 0-based. Cells are numbered block by block in input order
    (this is the natural order).
    """
    vertices = np.asarray(vertices, dtype=np.float64)
    dim = vertices.shape[1]
    if gravity is None:
        gravity = np.zeros(3)
        if dim == 3:
            gravity[2] = -9.8
        else:
            gravity[1] = -9.8
    g3 = np.zeros(3)
    g3[: len(np.asarray(gravity))] = np.asarray(gravity, dtype=np.float64)

    cell_blocks = [
        (etype, np.asarray(conn, dtype=np.int64)) for etype, conn in cell_blocks
    ]
    ncells_per_block = [len(c) for _, c in cell_blocks]
    cell_offsets = np.concatenate([[0], np.cumsum(ncells_per_block)])[:-1]
    num_cells = int(sum(ncells_per_block))

    # ---- cell geometry -------------------------------------------
    cell_centroid = np.zeros((num_cells, 3))
    cell_volume = np.zeros(num_cells)
    v3 = _pad3(vertices)

    from waiwera_tpu import native

    use_native = native.available()
    for (etype, conn), off in zip(cell_blocks, cell_offsets):
        nc = len(conn)
        if use_native:
            # C++ geometry kernels (waiwera_tpu/native/topology.cpp):
            # same tet-fan / shoelace formulas, ~20x the numpy path
            if dim == 2:
                cent, vol = native.cell_geom_2d(conn, vertices[:, :2])
            else:
                cent, vol = native.cell_geom_3d(
                    conn, v3, _FACES_3D[etype]
                )
            cell_centroid[off : off + nc] = cent
            cell_volume[off : off + nc] = vol
            continue
        pts = v3[conn]  # [nc, nv, 3]
        vmean = pts.mean(axis=1)  # [nc, 3]
        if dim == 2:
            # polygon area and centroid (shoelace via triangles)
            k = conn.shape[1]
            area = np.zeros(nc)
            cent = np.zeros((nc, 3))
            for i in range(k):
                a = pts[:, i] - vmean
                b = pts[:, (i + 1) % k] - vmean
                tri = 0.5 * (a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0])
                tri_c = (pts[:, i] + pts[:, (i + 1) % k] + vmean) / 3.0
                area += tri
                cent += tri[:, None] * tri_c
            area_abs = np.abs(area)
            cell_volume[off : off + nc] = area_abs
            safe = np.where(area != 0, area, 1.0)
            cell_centroid[off : off + nc] = cent / safe[:, None]
        else:
            vol = np.zeros(nc)
            cent = np.zeros((nc, 3))
            for tmpl in _FACES_3D[etype]:
                fverts = pts[:, list(tmpl)]  # [nc, k, 3]
                fmean = fverts.mean(axis=1)
                k = fverts.shape[1]
                for i in range(k):
                    a = fverts[:, i]
                    b = fverts[:, (i + 1) % k]
                    # tetrahedron (vmean, fmean, a, b)
                    d1 = fmean - vmean
                    d2 = a - vmean
                    d3 = b - vmean
                    tv = np.einsum(
                        "ij,ij->i", d1, np.cross(d2, d3)
                    ) / 6.0
                    tc = (vmean + fmean + a + b) / 4.0
                    vol += tv
                    cent += tv[:, None] * tc
            sgn = np.sign(np.where(vol != 0, vol, 1.0))
            cell_volume[off : off + nc] = np.abs(vol)
            cent = cent / np.where(vol != 0, vol, 1.0)[:, None]
            cell_centroid[off : off + nc] = cent

    # ---- face extraction + dedup ---------------------------------
    keys, fcells, fverts = _extract_faces(dim, cell_blocks, cell_offsets)
    order = (
        native.sort_rows(keys)
        if use_native
        else np.lexsort(keys.T[::-1])
    )
    keys_s = keys[order]
    fcells_s = fcells[order]
    fverts_s = fverts[order]
    new_face = np.ones(len(keys_s), dtype=bool)
    if len(keys_s) > 1:
        new_face[1:] = np.any(keys_s[1:] != keys_s[:-1], axis=1)
    face_id = np.cumsum(new_face) - 1
    num_unique = face_id[-1] + 1 if len(face_id) else 0
    counts = np.bincount(face_id, minlength=num_unique)
    if np.any(counts > 2):
        raise ValueError("mesh has faces shared by more than two cells")

    first = new_face
    second = np.zeros_like(first)
    second[1:] = ~new_face[1:]

    # interior faces: two supports
    interior_ids = np.nonzero(counts == 2)[0]
    first_idx = np.nonzero(first)[0]
    cell_a = fcells_s[first_idx[interior_ids]]
    idx_second = np.nonzero(second)[0]
    face_of_second = face_id[idx_second]
    cell_b = np.full(num_unique, -1, dtype=np.int64)
    cell_b[face_of_second] = fcells_s[idx_second]
    cell_b = cell_b[interior_ids]
    face_vert_int = fverts_s[first_idx[interior_ids]]

    # exterior faces: one support
    ext_ids = np.nonzero(counts == 1)[0]
    ext_cell = fcells_s[first_idx[ext_ids]]
    ext_verts = fverts_s[first_idx[ext_ids]]

    def face_geom(fv):
        """Geometry of faces given padded vertex id rows [n, kmax]."""
        if dim == 2:
            pts = v3[fv[:, -2:]]
            return _edge_geometry(pts[:, :, :3])
        if use_native:
            return native.polygon_geom(fv, v3)
        n = len(fv)
        area_n = np.zeros((n, 3))
        cent = np.zeros((n, 3))
        tri_mask = fv[:, 0] < 0  # first slot padded -> triangle
        if np.any(tri_mask):
            a_n, c = _polygon_geometry(v3[fv[tri_mask][:, 1:]])
            area_n[tri_mask] = a_n
            cent[tri_mask] = c
        if np.any(~tri_mask):
            a_n, c = _polygon_geometry(v3[fv[~tri_mask]])
            area_n[~tri_mask] = a_n
            cent[~tri_mask] = c
        return area_n, cent

    area_normal, fcentroid = face_geom(face_vert_int)
    ext_area_normal, ext_centroid = face_geom(ext_verts)

    # orient interior normals from cell_a to cell_b
    d12 = cell_centroid[cell_b] - cell_centroid[cell_a]
    flip = np.einsum("ij,ij->i", d12, area_normal) < 0
    area_normal[flip] *= -1.0
    # orient exterior normals outward
    d_out = ext_centroid - cell_centroid[ext_cell]
    eflip = np.einsum("ij,ij->i", d_out, ext_area_normal) < 0
    ext_area_normal[eflip] *= -1.0

    area = np.linalg.norm(area_normal, axis=1)
    normal = area_normal / np.where(area > 0, area, 1.0)[:, None]
    ext_area = np.linalg.norm(ext_area_normal, axis=1)
    ext_normal = ext_area_normal / np.where(ext_area > 0, ext_area, 1.0)[
        :, None
    ]

    mesh = Mesh(
        dim=dim,
        vertices=vertices,
        cell_blocks=list(cell_blocks),
        num_interior_cells=num_cells,
        num_cells=num_cells,
        cell_centroid=cell_centroid,
        cell_volume=cell_volume,
        face_cells=np.stack([cell_a, cell_b], axis=1),
        face_area=area,
        face_normal=normal,
        face_centroid=fcentroid,
        gravity=g3,
        radial=radial,
        thickness=thickness,
        is_ghost=np.zeros(num_cells, dtype=bool),
        exterior_face_cell=ext_cell,
        exterior_face_centroid=ext_centroid,
        exterior_face_normal=ext_normal,
        exterior_face_area=ext_area,
    )

    # 2D / radial corrections (mesh.F90:341-440)
    if dim == 2:
        if radial:
            r_c = np.abs(cell_centroid[:num_cells, 0])
            mesh.cell_volume = mesh.cell_volume * 2.0 * np.pi * r_c
            mesh.face_area = mesh.face_area * 2.0 * np.pi * np.abs(
                mesh.face_centroid[:, 0]
            )
            mesh.exterior_face_area = (
                mesh.exterior_face_area
                * 2.0
                * np.pi
                * np.abs(mesh.exterior_face_centroid[:, 0])
            )
        else:
            mesh.cell_volume = mesh.cell_volume * thickness
            mesh.face_area = mesh.face_area * thickness
            mesh.exterior_face_area = mesh.exterior_face_area * thickness

    _finish_face_geometry(mesh)
    return mesh


def set_gravity(mesh: Mesh, gravity) -> None:
    """Set the gravity vector and recompute face gravity normals
    (including boundary faces added so far)."""
    g3 = np.zeros(3)
    g = np.asarray(gravity, dtype=np.float64)
    g3[: len(g)] = g
    mesh.gravity = g3
    mesh.face_gravity_normal = mesh.face_normal @ g3


def _finish_face_geometry(mesh: Mesh):
    """Distances (with non-orthogonal correction, face.F90:230-249),
    gravity normal, permeability direction."""
    c1 = mesh.cell_centroid[mesh.face_cells[:, 0]]
    c2 = mesh.cell_centroid[mesh.face_cells[:, 1]]
    n = mesh.face_normal
    d1 = np.einsum("ij,ij->i", mesh.face_centroid - c1, n)
    d2 = np.einsum("ij,ij->i", c2 - mesh.face_centroid, n)
    d12 = np.einsum("ij,ij->i", c2 - c1, n)
    s = d1 + d2
    corr = d12 / np.where(s != 0, s, 1.0)
    mesh.face_distance = np.stack([d1 * corr, d2 * corr], axis=1)
    mesh.face_distance12 = d12
    mesh.face_gravity_normal = n @ mesh.gravity
    mesh.face_permeability_direction = np.argmax(
        np.abs(n[:, : mesh.dim]), axis=1
    ).astype(np.int32)


def add_boundaries(mesh: Mesh, boundary_specs: List[dict], npv: int):
    """Create Dirichlet ghost cells from JSON 'boundaries' entries.

    Each spec: {"primary": [...], "region": r,
                "faces": {"cells": [...], "normal": [...]}}
    For each listed cell, its exterior face whose outward normal best
    matches the given normal is opened (mesh.F90:1069-1264 analogue).
    Ghost cells get zero volume and centroid on the face
    (mesh.F90:583-667).
    """
    if not boundary_specs:
        return
    new_centroids = []
    new_rows = []  # (face data appended)
    ghost_index = mesh.num_cells
    n_ext = len(mesh.exterior_face_cell)

    add_face_cells = []
    add_area = []
    add_normal = []
    add_centroid = []
    specs_out = []

    for spec in boundary_specs:
        faces_spec = spec.get("faces", {})
        if isinstance(faces_spec, list):
            face_groups = faces_spec
        else:
            face_groups = [faces_spec]
        cells_all = []
        ghosts_all = []
        for fg in face_groups:
            cells = np.atleast_1d(np.asarray(fg.get("cells", []), dtype=np.int64))
            normal_spec = np.asarray(fg.get("normal", [0.0] * mesh.dim), float)
            n3 = np.zeros(3)
            n3[: len(normal_spec)] = normal_spec
            nrm = np.linalg.norm(n3)
            if nrm > 0:
                n3 = n3 / nrm
            for c in cells:
                # candidate exterior faces of cell c
                cand = np.nonzero(mesh.exterior_face_cell == c)[0]
                if len(cand) == 0:
                    raise ValueError(
                        f"boundary cell {c} has no exterior face"
                    )
                dots = mesh.exterior_face_normal[cand] @ n3
                best = cand[np.argmax(dots)]
                gi = ghost_index
                ghost_index += 1
                new_centroids.append(mesh.exterior_face_centroid[best])
                add_face_cells.append([c, gi])
                add_area.append(mesh.exterior_face_area[best])
                add_normal.append(mesh.exterior_face_normal[best])
                add_centroid.append(mesh.exterior_face_centroid[best])
                cells_all.append(c)
                ghosts_all.append(gi)
        primary = np.asarray(
            spec.get("primary", np.zeros(npv)), dtype=np.float64
        )
        if primary.ndim == 0:
            primary = primary[None]
        specs_out.append(
            BoundarySpec(
                primary=primary,
                region=int(spec.get("region", 1)),
                cells=np.asarray(ghosts_all, dtype=np.int64),
                faces=np.arange(
                    mesh.num_faces,
                    mesh.num_faces + len(ghosts_all),
                    dtype=np.int64,
                ),
                tracer=(
                    np.atleast_1d(
                        np.asarray(spec["tracer"], dtype=np.float64)
                    )
                    if spec.get("tracer") is not None
                    else None
                ),
            )
        )

    n_new = ghost_index - mesh.num_cells
    if n_new == 0:
        mesh.boundaries.extend(specs_out)
        return

    # extend cell arrays
    mesh.cell_centroid = np.concatenate(
        [mesh.cell_centroid, np.asarray(new_centroids)]
    )
    mesh.cell_volume = np.concatenate([mesh.cell_volume, np.zeros(n_new)])
    mesh.is_ghost = np.concatenate(
        [mesh.is_ghost, np.ones(n_new, dtype=bool)]
    )
    mesh.num_cells = ghost_index

    # extend face arrays; boundary face distances: [d1, 0]
    add_face_cells = np.asarray(add_face_cells, dtype=np.int64)
    add_area = np.asarray(add_area)
    add_normal = np.asarray(add_normal)
    add_centroid = np.asarray(add_centroid)
    c1 = mesh.cell_centroid[add_face_cells[:, 0]]
    d1 = np.einsum("ij,ij->i", add_centroid - c1, add_normal)

    mesh.face_cells = np.concatenate([mesh.face_cells, add_face_cells])
    mesh.face_area = np.concatenate([mesh.face_area, add_area])
    mesh.face_normal = np.concatenate([mesh.face_normal, add_normal])
    mesh.face_centroid = np.concatenate([mesh.face_centroid, add_centroid])
    mesh.face_distance = np.concatenate(
        [mesh.face_distance, np.stack([d1, np.zeros_like(d1)], axis=1)]
    )
    mesh.face_distance12 = np.concatenate([mesh.face_distance12, d1])
    mesh.face_gravity_normal = np.concatenate(
        [mesh.face_gravity_normal, add_normal @ mesh.gravity]
    )
    mesh.face_permeability_direction = np.concatenate(
        [
            mesh.face_permeability_direction,
            np.argmax(np.abs(add_normal[:, : mesh.dim]), axis=1).astype(
                np.int32
            ),
        ]
    )
    mesh.boundaries.extend(specs_out)
