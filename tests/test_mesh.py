"""Mesh connectivity and FV geometry tests."""

import numpy as np

from waiwera_tpu.mesh import rectangular_mesh, column_mesh
from waiwera_tpu.mesh.core import add_boundaries, build_mesh


def test_column_geometry():
    m = column_mesh([10.0] * 5, area=1.0)
    assert m.num_cells == 5
    assert m.num_faces == 4
    np.testing.assert_allclose(m.cell_volume, 10.0)
    np.testing.assert_allclose(m.face_area, 1.0)
    np.testing.assert_allclose(m.face_distance12, -np.diff(m.cell_centroid[:, 1]) * 0 + 10.0)
    np.testing.assert_allclose(np.abs(m.face_distance), 5.0)
    # cells ordered top down; faces vertical; gravity normal = +-9.8
    np.testing.assert_allclose(np.abs(m.face_gravity_normal), 9.8)
    # normal oriented cell0 -> cell1 (downwards, -y)
    sign = np.sign(
        m.cell_centroid[m.face_cells[:, 1], 1]
        - m.cell_centroid[m.face_cells[:, 0], 1]
    )
    np.testing.assert_allclose(np.sign(m.face_gravity_normal), -sign * np.sign(-9.8) * -1)


def test_rect3d_geometry():
    m = rectangular_mesh([1.0, 2.0], [3.0], [4.0, 5.0])
    assert m.num_cells == 4
    np.testing.assert_allclose(
        np.sort(m.cell_volume), [12.0, 15.0, 24.0, 30.0]
    )
    # internal faces: 2 vertical pairs (area 3*4, 3*5) + 2 horizontal
    # (1*3, 2*3)
    assert m.num_faces == 4
    np.testing.assert_allclose(
        np.sort(m.face_area), [3.0, 6.0, 12.0, 15.0]
    )
    np.testing.assert_allclose(m.cell_centroid[0], [0.5, 1.5, 2.0])
    # gravity normal nonzero only for horizontal faces
    gnorm = np.sort(np.abs(m.face_gravity_normal))
    np.testing.assert_allclose(gnorm, [0.0, 0.0, 9.8, 9.8])


def test_face_count_box():
    m = rectangular_mesh([1.0] * 3, [1.0] * 4, [1.0] * 5)
    n = 3 * 4 * 5
    assert m.num_cells == n
    expected_faces = 2 * 4 * 5 + 3 * 3 * 5 + 3 * 4 * 4
    assert m.num_faces == expected_faces
    np.testing.assert_allclose(m.cell_volume, 1.0)
    np.testing.assert_allclose(m.face_distance12, 1.0)


def test_tet_geometry():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]],
        dtype=float,
    )
    conn = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
    m = build_mesh(verts, [("tetra", conn)])
    np.testing.assert_allclose(m.cell_volume[0], 1.0 / 6.0, rtol=1e-12)
    assert m.num_faces == 1  # shared face (1,2,3)
    # shared face area: triangle (1,0,0),(0,1,0),(0,0,1) = sqrt(3)/2
    np.testing.assert_allclose(m.face_area[0], np.sqrt(3) / 2, rtol=1e-12)


def test_radial_mesh():
    # 2D radial (r, z): one ring cell from r=1..2, z=0..1
    m = rectangular_mesh([1.0, 1.0], [1.0], None, radial=True)
    # volume = area * 2*pi*r_centroid
    np.testing.assert_allclose(
        m.cell_volume, [2 * np.pi * 0.5, 2 * np.pi * 1.5], rtol=1e-12
    )
    # internal face at r=1: area = 1 * 2*pi*1
    np.testing.assert_allclose(m.face_area, [2 * np.pi], rtol=1e-12)


def test_boundaries():
    m = column_mesh([10.0] * 3)
    add_boundaries(
        m,
        [
            {
                "primary": [1.0e5, 20.0],
                "region": 1,
                "faces": {"cells": [0], "normal": [0.0, 1.0]},
            }
        ],
        npv=2,
    )
    assert m.num_cells == 4
    assert m.is_ghost[3]
    assert m.cell_volume[3] == 0.0
    # new face connects cell 0 to ghost 3 with distance [5, 0]
    fc = m.face_cells[-1]
    np.testing.assert_array_equal(fc, [0, 3])
    np.testing.assert_allclose(m.face_distance[-1], [5.0, 0.0])
    np.testing.assert_allclose(m.face_distance12[-1], 5.0)
    # ghost centroid on the face (top of column, y=0)
    np.testing.assert_allclose(m.cell_centroid[3, 1], 0.0, atol=1e-14)
    b = m.boundaries[0]
    np.testing.assert_array_equal(b.cells, [3])
    assert b.region == 1


def test_nonorthogonal_distance_correction():
    # skewed quad mesh: distances scaled so d1+d2 = d12
    verts = np.array(
        [[0, 0], [1, 0], [2, 0], [0, 1], [1.2, 1], [2.2, 1]], dtype=float
    )
    conn = np.array([[0, 1, 4, 3], [1, 2, 5, 4]])
    m = build_mesh(verts, [("quad", conn)])
    np.testing.assert_allclose(
        m.face_distance.sum(axis=1), m.face_distance12, rtol=1e-12
    )


def test_gmsh_41_binary_matches_ascii(tmp_path):
    """The same 2x2 quad mesh written as gmsh 4.1 ASCII and 4.1 binary
    (and 2.2 ASCII) reads to identical geometry."""
    import struct

    from waiwera_tpu.mesh.gmsh import read_gmsh

    # 3x3 node grid, 4 quads
    coords = [(float(i), float(j), 0.0) for j in range(3) for i in range(3)]
    quads = [
        (1, 2, 5, 4), (2, 3, 6, 5), (4, 5, 8, 7), (5, 6, 9, 8)
    ]

    asc22 = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat",
             "$Nodes", "9"]
    for i, (x, y, z) in enumerate(coords):
        asc22.append(f"{i+1} {x} {y} {z}")
    asc22 += ["$EndNodes", "$Elements", "4"]
    for k, q in enumerate(quads):
        asc22.append(f"{k+1} 3 2 0 0 " + " ".join(map(str, q)))
    asc22 += ["$EndElements", ""]
    p22 = tmp_path / "m22.msh"
    p22.write_text("\n".join(asc22))

    asc41 = ["$MeshFormat", "4.1 0 8", "$EndMeshFormat",
             "$Nodes", "1 9 1 9", "2 1 0 9"]
    asc41 += [str(i + 1) for i in range(9)]
    asc41 += [f"{x} {y} {z}" for x, y, z in coords]
    asc41 += ["$EndNodes", "$Elements", "1 4 1 4", "2 1 3 4"]
    for k, q in enumerate(quads):
        asc41.append(f"{k+1} " + " ".join(map(str, q)))
    asc41 += ["$EndElements", ""]
    p41 = tmp_path / "m41.msh"
    p41.write_text("\n".join(asc41))

    # 4.1 binary (little-endian, size_t = 8)
    b = bytearray()
    b += b"$MeshFormat\n4.1 1 8\n"
    b += struct.pack("<i", 1)
    b += b"\n$EndMeshFormat\n$Nodes\n"
    b += struct.pack("<4Q", 1, 9, 1, 9)
    b += struct.pack("<3iQ", 2, 1, 0, 9)
    b += struct.pack("<9Q", *range(1, 10))
    for x, y, z in coords:
        b += struct.pack("<3d", x, y, z)
    b += b"$EndNodes\n$Elements\n"
    b += struct.pack("<4Q", 1, 4, 1, 4)
    b += struct.pack("<3iQ", 2, 1, 3, 4)
    for k, q in enumerate(quads):
        b += struct.pack("<5Q", k + 1, *q)
    b += b"$EndElements\n"
    p41b = tmp_path / "m41b.msh"
    p41b.write_bytes(bytes(b))

    meshes = [read_gmsh(str(p)) for p in (p22, p41, p41b)]
    ref = meshes[0]
    assert ref.num_cells == 4
    for m in meshes[1:]:
        assert m.num_cells == ref.num_cells
        assert m.num_faces == ref.num_faces
        np.testing.assert_allclose(m.cell_centroid, ref.cell_centroid)
        np.testing.assert_allclose(m.cell_volume, ref.cell_volume)
        np.testing.assert_array_equal(m.face_cells, ref.face_cells)
        np.testing.assert_allclose(m.face_area, ref.face_area)


def test_block3_fixture_geometry():
    """Reference fixture block3.exo: golden face/cell geometry from
    the reference's test_mesh_init (mesh_test.F90:147-253) — dim 3,
    3 cells, interior face area 200, per-side distances (5,10) and
    (10,15), face centroids (5,10,50)/(5,10,30)."""
    from waiwera_tpu.mesh.exodus import read_exodus

    m = read_exodus("/root/reference/test/unit/data/mesh/block3.exo")
    assert m.dim == 3
    assert m.num_cells == 3
    fc = np.asarray(m.face_cells)
    assert fc.shape[0] == 2
    np.testing.assert_allclose(np.asarray(m.face_area), [200.0, 200.0])
    # order faces by first cell (natural pairs (0,1), (1,2))
    order = np.argsort(fc.min(axis=1))
    dist = np.asarray(m.face_distance)[order]
    np.testing.assert_allclose(dist, [[5.0, 10.0], [10.0, 15.0]])
    np.testing.assert_allclose(
        np.asarray(m.face_distance12)[order], [15.0, 25.0]
    )
    np.testing.assert_allclose(
        np.asarray(m.face_centroid)[order],
        [[5.0, 10.0, 50.0], [5.0, 10.0, 30.0]],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(m.cell_volume), [2000.0, 4000.0, 6000.0]
    )


def test_col100_fixture_geometry():
    """Reference fixture col100.exo (the mesh the reference's rock
    assignment / natural-ordering tests run on, mesh_test.F90:
    1032-1501): a 100-cell vertical column of 10 m cubes in natural
    order along -z."""
    from waiwera_tpu.mesh.exodus import read_exodus

    m = read_exodus("/root/reference/test/unit/data/mesh/col100.exo")
    assert m.num_cells == 100
    fc = np.asarray(m.face_cells)
    assert fc.shape[0] == 99
    np.testing.assert_allclose(np.asarray(m.cell_volume), 1000.0)
    np.testing.assert_allclose(np.asarray(m.face_area), 100.0)
    np.testing.assert_allclose(np.asarray(m.face_distance), 5.0)
    np.testing.assert_allclose(np.asarray(m.face_distance12), 10.0)
    # natural order descends in z, 10 m per cell
    c = np.asarray(m.cell_centroid)
    np.testing.assert_allclose(c[:, 2], -5.0 - 10.0 * np.arange(100))
    # each face joins consecutive natural cells
    np.testing.assert_array_equal(
        np.sort(fc.min(axis=1)), np.arange(99)
    )
    np.testing.assert_array_equal(
        np.abs(fc[:, 1] - fc[:, 0]), np.ones(99, np.int64)
    )


def test_7x7grid_fixture_geometry():
    """Reference fixture 7x7grid.exo (zone/rock-assignment fixture,
    mesh_test.F90:503+): 7x7 areal grid, 200 m thick, edge cells
    1000 m wide and interior cells 500 m wide — so volumes are
    {5e7, 1e8, 2e8} m^3 and face areas {1e5, 2e5} m^2 with per-side
    distances {250, 500} m."""
    from waiwera_tpu.mesh.exodus import read_exodus

    m = read_exodus("/root/reference/test/unit/data/mesh/7x7grid.exo")
    assert m.num_cells == 49
    fc = np.asarray(m.face_cells)
    assert fc.shape[0] == 84  # 2 * 7 * 6 interior faces
    v = np.asarray(m.cell_volume)
    np.testing.assert_allclose(
        np.sort(np.unique(np.round(v, 3))), [5.0e7, 1.0e8, 2.0e8]
    )
    # total volume = (5*500 + 2*1000)^2 * 200
    np.testing.assert_allclose(v.sum(), (4500.0 ** 2) * 200.0)
    np.testing.assert_allclose(
        np.sort(np.unique(np.round(np.asarray(m.face_area), 3))),
        [1.0e5, 2.0e5],
    )
    np.testing.assert_allclose(
        np.sort(np.unique(np.round(np.asarray(m.face_distance), 3))),
        [250.0, 500.0],
    )
    # areal: single z layer at centroid 400
    np.testing.assert_allclose(np.asarray(m.cell_centroid)[:, 2], 400.0)
