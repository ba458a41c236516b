"""Gmsh .msh file reader (formats 2.2 ASCII and binary, 4.1 ASCII).

Replaces the reference's DMPlexCreateFromFile gmsh path (mesh.F90:940).
Only volumetric (3D) or surface (2D) elements become cells; lower-
dimensional elements are skipped. Cell numbering follows file order
(the natural order used for all I/O).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from waiwera_tpu.mesh.core import Mesh, build_mesh

# gmsh element type -> (name, num nodes)
_TYPES = {
    1: ("line", 2),
    2: ("triangle", 3),
    3: ("quad", 4),
    4: ("tetra", 4),
    5: ("hexahedron", 8),
    6: ("wedge", 6),
    7: ("pyramid", 5),
    15: ("point", 1),
}
_DIM = {
    "point": 0,
    "line": 1,
    "triangle": 2,
    "quad": 2,
    "tetra": 3,
    "hexahedron": 3,
    "wedge": 3,
    "pyramid": 3,
}


def _read_sections(data: bytes) -> Dict[str, Tuple[int, int]]:
    """Locate $Section ... $EndSection byte ranges."""
    sections = {}
    pos = 0
    while True:
        start = data.find(b"$", pos)
        if start < 0:
            break
        eol = data.find(b"\n", start)
        name = data[start + 1 : eol].strip().decode()
        if name.startswith("End"):
            pos = eol + 1
            continue
        end_tag = ("$End" + name).encode()
        end = data.find(end_tag, eol)
        if end < 0:
            raise ValueError(f"unterminated gmsh section {name}")
        sections[name] = (eol + 1, end)
        pos = end + len(end_tag)
    return sections


def read_gmsh(
    filename: str,
    gravity=None,
    radial: bool = False,
    thickness: float = 1.0,
) -> Mesh:
    with open(filename, "rb") as f:
        data = f.read()
    sections = _read_sections(data)
    if "MeshFormat" not in sections:
        raise ValueError("not a gmsh file (no $MeshFormat)")
    s, e = sections["MeshFormat"]
    fmt_line = data[s:e].split(b"\n")[0].split()
    version = float(fmt_line[0])
    binary = int(fmt_line[1]) == 1

    if version >= 4.0:
        if binary:
            # endianness probe: the int 1 follows the format line
            raw = data[s:e].split(b"\n", 1)[1][:4]
            swap = (
                len(raw) == 4
                and struct.unpack("<i", raw)[0] != 1
            )
            nodes, elements = _read_msh41_binary(data, sections, swap)
        else:
            nodes, elements = _read_msh41_ascii(data, sections)
    else:
        if binary:
            nodes, elements = _read_msh22_binary(data, sections)
        else:
            nodes, elements = _read_msh22_ascii(data, sections)

    return _mesh_from_elements(
        nodes, elements, gravity=gravity, radial=radial, thickness=thickness
    )


def _mesh_from_elements(nodes, elements, **kw):
    """nodes: {id: (x,y,z)}; elements: list of (type_name, [node ids])
    in file order."""
    max_dim = max((_DIM[t] for t, _ in elements), default=0)
    if max_dim < 2:
        raise ValueError("mesh has no 2D/3D cells")
    ids = np.array(sorted(nodes.keys()))
    remap = {nid: i for i, nid in enumerate(ids)}
    coords = np.array([nodes[nid] for nid in ids])
    # drop unused third coordinate for 2D meshes
    if max_dim == 2 and np.allclose(coords[:, 2], coords[0, 2]):
        coords = coords[:, :2]
    elif max_dim == 2:
        # 2D mesh embedded with varying z? keep x,y
        coords = coords[:, :2]

    # group consecutive same-type cells into blocks, preserving order
    blocks: List[Tuple[str, List[List[int]]]] = []
    for t, conn in elements:
        if _DIM[t] != max_dim:
            continue
        mapped = [remap[c] for c in conn]
        if blocks and blocks[-1][0] == t:
            blocks[-1][1].append(mapped)
        else:
            blocks.append((t, [mapped]))
    cell_blocks = [(t, np.asarray(c, dtype=np.int64)) for t, c in blocks]
    return build_mesh(coords, cell_blocks, **kw)


def _read_msh22_ascii(data, sections):
    s, e = sections["Nodes"]
    lines = data[s:e].decode().split()
    nn = int(lines[0])
    vals = lines[1:]
    nodes = {}
    for i in range(nn):
        nid = int(vals[4 * i])
        nodes[nid] = (
            float(vals[4 * i + 1]),
            float(vals[4 * i + 2]),
            float(vals[4 * i + 3]),
        )
    s, e = sections["Elements"]
    toks = data[s:e].decode().split()
    ne = int(toks[0])
    elements = []
    pos = 1
    for _ in range(ne):
        etype = int(toks[pos + 1])
        ntags = int(toks[pos + 2])
        name, nv = _TYPES[etype]
        conn = [int(x) for x in toks[pos + 3 + ntags : pos + 3 + ntags + nv]]
        elements.append((name, conn))
        pos += 3 + ntags + nv
    return nodes, elements


def _read_msh22_binary(data, sections):
    s, e = sections["Nodes"]
    nl = data.find(b"\n", s)
    nn = int(data[s:nl])
    rec = struct.Struct("<i3d")
    nodes = {}
    pos = nl + 1
    for _ in range(nn):
        nid, x, y, z = rec.unpack_from(data, pos)
        nodes[nid] = (x, y, z)
        pos += rec.size

    s, e = sections["Elements"]
    nl = data.find(b"\n", s)
    ne = int(data[s:nl])
    pos = nl + 1
    elements = []
    read = 0
    while read < ne:
        etype, nfollow, ntags = struct.unpack_from("<3i", data, pos)
        pos += 12
        name, nv = _TYPES[etype]
        stride = (1 + ntags + nv) * 4
        for _ in range(nfollow):
            vals = struct.unpack_from(f"<{1 + ntags + nv}i", data, pos)
            conn = list(vals[1 + ntags :])
            elements.append((name, conn))
            pos += stride
        read += nfollow
    return nodes, elements


def _read_msh41_binary(data, sections, swap=False):
    """Gmsh 4.1 binary: size_t (8-byte) counts/tags, int entity
    headers, double coordinates (gmsh doc 'MSH file format 4.1')."""
    end = ">" if swap else "<"
    u8 = struct.Struct(end + "Q")
    i4 = struct.Struct(end + "i")

    def read_u8(pos):
        return u8.unpack_from(data, pos)[0], pos + 8

    def read_i4(pos):
        return i4.unpack_from(data, pos)[0], pos + 4

    s, e = sections["Nodes"]
    pos = s
    num_blocks, pos = read_u8(pos)
    _num_nodes, pos = read_u8(pos)
    _min_tag, pos = read_u8(pos)
    _max_tag, pos = read_u8(pos)
    nodes = {}
    for _ in range(num_blocks):
        _dim, pos = read_i4(pos)
        _tag, pos = read_i4(pos)
        parametric, pos = read_i4(pos)
        nb, pos = read_u8(pos)
        tags = np.frombuffer(
            data, dtype=end + "u8", count=nb, offset=pos
        )
        pos += 8 * nb
        ncoord = 3 + (3 if parametric else 0)
        coords = np.frombuffer(
            data, dtype=end + "f8", count=nb * ncoord, offset=pos
        ).reshape(nb, ncoord)
        pos += 8 * nb * ncoord
        for t, c in zip(tags, coords):
            nodes[int(t)] = (c[0], c[1], c[2])

    s, e = sections["Elements"]
    pos = s
    num_blocks, pos = read_u8(pos)
    _num_elems, pos = read_u8(pos)
    _min_tag, pos = read_u8(pos)
    _max_tag, pos = read_u8(pos)
    elements = []
    for _ in range(num_blocks):
        _dim, pos = read_i4(pos)
        _tag, pos = read_i4(pos)
        etype, pos = read_i4(pos)
        nb, pos = read_u8(pos)
        name, nv = _TYPES[etype]
        block = np.frombuffer(
            data, dtype=end + "u8", count=nb * (1 + nv), offset=pos
        ).reshape(nb, 1 + nv)
        pos += 8 * nb * (1 + nv)
        for row in block:
            elements.append((name, [int(x) for x in row[1:]]))
    return nodes, elements


def _read_msh41_ascii(data, sections):
    s, e = sections["Nodes"]
    toks = data[s:e].decode().split()
    num_blocks = int(toks[0])
    pos = 4
    nodes = {}
    for _ in range(num_blocks):
        num_in_block = int(toks[pos + 3])
        pos += 4
        tags = [int(toks[pos + i]) for i in range(num_in_block)]
        pos += num_in_block
        for i in range(num_in_block):
            nodes[tags[i]] = (
                float(toks[pos]),
                float(toks[pos + 1]),
                float(toks[pos + 2]),
            )
            pos += 3
    s, e = sections["Elements"]
    toks = data[s:e].decode().split()
    num_blocks = int(toks[0])
    pos = 4
    elements = []
    for _ in range(num_blocks):
        etype = int(toks[pos + 2])
        num_in_block = int(toks[pos + 3])
        pos += 4
        name, nv = _TYPES[etype]
        for _ in range(num_in_block):
            conn = [int(toks[pos + 1 + i]) for i in range(nv)]
            elements.append((name, conn))
            pos += 1 + nv
    return nodes, elements
