"""Block-DIA (diagonal-band) SpMV and preconditioners: gather- and
scatter-free.

On rectilinear meshes in natural (x-fastest) ordering — the dominant
production case and every reference benchmark geometry — the Jacobian's
nonzero blocks sit on a handful of diagonals: offsets {0, ±1, ±nx,
±nx·ny} (ghost-coupled blocks are structurally present but always
zero: system.py zeroes them, mirroring the reference's boundary-ghost
decoupling, mesh.F90:228-265). Detecting this from the assembled BSR
sparsity turns SpMV into

    y[i] = sum_d  B_d[i] @ x[i + d]

i.e. static shifts + batched small matmuls: no index gather at all.
This is the TPU-shaped replacement for PETSc's MATBAIJ MatMult on
structured meshes; unstructured meshes fall back to the ELL gather
path (ops.ell).

Band data is packed once per Jacobian as [D, b*b, N_pad] with cells on
the minor (lane) axis — the gather from assembled BSR data produces
this layout directly, so per-matvec work is pure shifts + multiply
-adds. Two executions of the same layout:
- a pure-jnp path (shift via pad/slice; XLA fuses the band
  multiply-adds into one memory-bound pass) — works on any backend;
- a Pallas TPU kernel (pallas_matvec): per output tile, band tiles
  stream through VMEM and ONE lane-aligned x window is DMA'd, each
  band's shifted view being a static in-VMEM slice.

The same band layout powers a DILU/block-SGS preconditioner
(dia_dilu) whose triangular sweeps are shift-based fixed-point
iterations — the TPU answer to PETSc's ASM/ILU(0) default
(timestepper.F90:1743-1835) without a sequential SpTRSV.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

Array = jnp.ndarray

MAX_BANDS = 16
_TILE = 2048  # pallas lanes per grid step (multiple of 128)


class DIAStructure(NamedTuple):
    """Static band tables (host-built from a BSRStructure)."""

    offsets: tuple  # D static python ints, sorted
    band_pos: Array  # [D, N_pad] int32 into BSR data padded by one
    # trailing zero block (absent/pad entries point at nnzb)
    num_rows: int  # true N (<= N_pad)
    block_size: int


class DIAMatrix(NamedTuple):
    offsets: tuple
    bands: Array  # [D, b*b, N_pad]; row ii*b+j holds block elem (i,j)
    block_size: int
    num_rows: int

    def matvec(self, x: Array) -> Array:
        """y = A @ x, x and y of shape [N, b]."""
        if _use_pallas(self.bands.dtype):
            return pallas_matvec(self, x)
        return jnp_matvec(self, x)


def _use_pallas(dtype) -> bool:
    env = os.environ.get("WAIWERA_TPU_PALLAS", "auto").lower()
    if env in ("0", "off", "false"):
        return False
    if dtype != jnp.float32:
        return False  # the kernel is f32-only (TPU-native precision)
    if env in ("1", "on", "true", "force"):
        return True
    return jax.default_backend() == "tpu"


def dia_structure(
    structure, is_ghost: np.ndarray, max_bands: int = MAX_BANDS
) -> Optional[DIAStructure]:
    """Detect a banded sparsity and build band tables, or None.

    Blocks coupling a ghost cell to another cell are excluded from the
    band set: their values are identically zero (system.py ghost
    decoupling), so dropping them from the DIA representation is
    exact. Ghost diagonal (identity) blocks live on offset 0.
    """
    rows = np.asarray(structure.rows)
    cols = np.asarray(structure.indices)
    is_ghost = np.asarray(is_ghost)
    live = (rows == cols) | ~(is_ghost[rows] | is_ghost[cols])
    offs = np.unique(cols[live].astype(np.int64) - rows[live])
    if len(offs) > max_bands:
        return None
    n = structure.num_rows
    n_pad = -(-n // _TILE) * _TILE
    nnzb = len(rows)
    band_pos = np.full((len(offs), n_pad), nnzb, dtype=np.int64)
    idx = np.nonzero(live)[0]
    k = np.searchsorted(offs, cols[idx].astype(np.int64) - rows[idx])
    band_pos[k, rows[idx]] = idx
    return DIAStructure(
        offsets=tuple(int(d) for d in offs),
        band_pos=jnp.asarray(band_pos, jnp.int32),
        num_rows=n,
        block_size=structure.block_size,
    )


class BandPlan(NamedTuple):
    """Host-built recipe for packing per-face Jacobian blocks straight
    into DIA bands with reshapes/pads only — no gather/scatter.

    TPU gathers run at a tiny fraction of HBM bandwidth, so the
    BSR-assemble-then-gather pack (bsr.assemble + to_dia) costs ~1.5 s
    per Newton iteration on a 512k-cell Jacobian (measured r4) while
    this path is pure data movement (~ms). Valid when, for every
    nonzero band offset d, the contributing faces form one contiguous
    slice of the face array whose rows advance in a periodic
    pattern r0 + (i//q)*p + i%q — true for rectilinear meshes in
    natural order (the dominant production geometry and every
    reference benchmark, mesh.F90 natural ordering).

    entries: one per band, aligned with DIAStructure.offsets:
      ("diag",)                      — the diagonal band
      ("seg", side, f0, S, q, p, r0) — S segments of q faces starting
        at face f0, rows r0 + m*p + j; side 0 = J[l,r] blocks (rows l),
        side 1 = J[r,l] blocks (rows r)
    """

    entries: tuple


def band_plan(
    dia: DIAStructure, face_cells: np.ndarray, is_ghost: np.ndarray
):
    """Detect the periodic-slice structure for each band, or None."""
    a = np.asarray(face_cells[:, 0], np.int64)
    b = np.asarray(face_cells[:, 1], np.int64)
    is_ghost = np.asarray(is_ghost)
    live = ~(is_ghost[a] | is_ghost[b])
    entries = []
    for d in dia.offsets:
        if d == 0:
            entries.append(("diag",))
            continue
        sel_lr = np.nonzero(live & (b - a == d))[0]
        sel_rl = np.nonzero(live & (a - b == d))[0]
        if len(sel_lr) and len(sel_rl):
            return None  # mixed orientations within a band
        if len(sel_lr):
            sel, side, rows = sel_lr, 0, a[sel_lr]
        elif len(sel_rl):
            sel, side, rows = sel_rl, 1, b[sel_rl]
        else:
            return None
        f0 = int(sel[0])
        if not np.array_equal(sel, np.arange(f0, f0 + len(sel))):
            return None  # faces not contiguous
        r0 = int(rows[0])
        diffs = np.diff(rows)
        if np.all(diffs == 1):
            q = len(rows)
            p = q
        else:
            q = int(np.argmax(diffs != 1)) + 1
            if len(rows) % q != 0:
                return None
            p = int(rows[q] - r0)
            if p <= q:
                return None
        S = len(rows) // q
        i = np.arange(len(rows))
        if not np.array_equal(rows, r0 + (i // q) * p + i % q):
            return None
        if r0 + (S - 1) * p + q > dia.band_pos.shape[1]:
            return None
        entries.append(("seg", side, f0, S, q, p, r0))
    return BandPlan(entries=tuple(entries))


def bands_from_blocks(
    dia: DIAStructure,
    plan: BandPlan,
    diag2: Array,
    lr2: Array,
    rl2: Array,
    dtype=None,
) -> DIAMatrix:
    """Pack element-major block parts (diag2 [b*b, N], per-face
    off-diagonal lr2/rl2 [b*b, F]) into the band layout
    [D, b*b, N_pad] by static slices/reshapes/pads on the LAST axis —
    no gathers, no [*, b, b] intermediates (which tile to a 57x
    padded layout on TPU)."""
    b = dia.block_size
    bb = b * b
    n = dia.num_rows
    n_pad = dia.band_pos.shape[1]
    if dtype is not None:
        diag2 = diag2.astype(dtype)
        lr2 = lr2.astype(dtype)
        rl2 = rl2.astype(dtype)
    def _place(side, f0, S, q, p, r0):
        src = lr2 if side == 0 else rl2
        v = src[:, f0 : f0 + S * q].reshape(bb, S, q)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, p - q)))
        v = v.reshape(bb, S * p)
        # The final segment's q->p zero-padding may extend past n_pad
        # when the padding slack is small (e.g. n == n_pad). Real rows
        # are always < num_rows <= n_pad, so any overflow columns are
        # zeros — clamp them off instead of producing a negative pad.
        width = min(S * p, n_pad - r0)
        v = v[:, :width]
        return jnp.pad(v, ((0, 0), (r0, n_pad - r0 - width)))

    out = []
    for entry in plan.entries:
        if entry[0] == "diag":
            v = jnp.pad(diag2, ((0, 0), (0, n_pad - n)))
        elif entry[0] == "segs":
            # piecewise-periodic band (hybrid meshes): one band from
            # several disjoint-row segments
            v = None
            for seg in entry[1]:
                pv = _place(*seg)
                v = pv if v is None else v + pv
        else:
            _, side, f0, S, q, p, r0 = entry
            v = _place(side, f0, S, q, p, r0)
        out.append(v)  # [bb, N_pad]
    return DIAMatrix(
        offsets=dia.offsets,
        bands=jnp.stack(out, axis=0),
        block_size=b,
        num_rows=n,
    )


def plan_scatter_add_cells_last(
    fp: FacePlan, vals: Array, n: int, shift_by_d: bool
) -> Array:
    """plan_scatter_add_cells with the face/cell axis LAST:
    [..., f_live] -> [..., n]."""
    lead = vals.shape[:-1]
    total = n + fp.pad
    zpad = ((0, 0),) * len(lead)
    acc = None
    for (d, f0, S, q, p, r0) in fp.entries:
        seg = vals[..., f0 : f0 + S * q].reshape(lead + (S, q))
        seg = jnp.pad(seg, zpad + ((0, 0), (0, p - q)))
        flat = seg.reshape(lead + (S * p,))
        start = r0 + (d if shift_by_d else 0)
        flat = jnp.pad(flat, zpad + ((start, total - start - S * p),))
        acc = flat if acc is None else acc + flat
    return acc[..., :n]


class FacePlan(NamedTuple):
    """Periodic-slice recipe for face<->cell data movement on canonical
    (offset,row)-sorted faces: cell->face gathers and face->cell
    scatter-adds become static slices/reshapes/pads instead of 10s-of-
    millions-of-element gathers (measured r4: face-state gathers +
    inflow scatter were ~0.85 s of the ~0.95 s f64 RHS on the
    512k-cell flagship).

    entries: per positive band in face order: (d, f0, S, q, p, r0) —
    faces f0..f0+S*q connect cells (r0 + m*p + j) -> (.. + d).
    f_live: faces covered (the tail f_live..F-1 holds ghost faces,
    handled by the caller with plain indexing)."""

    entries: tuple
    f_live: int
    pad: int


def face_plan(plan, offsets) -> Optional[FacePlan]:
    """Derive the face-coverage plan from a BandPlan, or None."""
    if plan is None:
        return None
    entries = []
    for off, e in zip(offsets, plan.entries):
        if e[0] != "seg":
            continue
        _, side, f0, S, q, p, r0 = e
        if int(off) <= 0:
            continue
        if side != 0:
            return None  # canonical orientation: rows on the l side
        entries.append((int(off), f0, S, q, p, r0))
    if not entries:
        return None
    entries.sort(key=lambda t: t[1])
    f = 0
    for (d, f0, S, q, p, r0) in entries:
        if f0 != f:
            return None  # faces not contiguous from 0 in band order
        f += S * q
    pad = max(d + p for (d, f0, S, q, p, r0) in entries)
    return FacePlan(entries=tuple(entries), f_live=f, pad=pad)


MAX_PLAN_SEGMENTS = 32


def _periodic_segments(rows: np.ndarray):
    """Split strictly ascending rows into (S, q, p, r0) periodic
    chunks: rows[i] = r0 + (i//q)*p + i%q within each chunk."""
    segs = []
    i = 0
    L = len(rows)
    while i < L:
        r0 = int(rows[i])
        q = 1
        while i + q < L and rows[i + q] == r0 + q:
            q += 1
        if i + q < L:
            p = int(rows[i + q] - r0)
        else:
            p = q
        if p < q or p <= 0:
            return None  # duplicate or non-ascending rows
        S = 1
        while True:
            nxt = i + S * q
            if nxt + q > L:
                break
            if not np.array_equal(
                rows[nxt : nxt + q], r0 + S * p + np.arange(q)
            ):
                break
            S += 1
        segs.append((S, q, p, r0))
        i += S * q
        if len(segs) > MAX_PLAN_SEGMENTS:
            return None
    return segs


def face_plan_direct(
    face_cells: np.ndarray, is_ghost: np.ndarray, num_rows: int
) -> Optional[FacePlan]:
    """Detect the periodic-slice face plan directly from the face
    array (no DIA/BSR detection needed): greedily cover the longest
    prefix of canonically ordered faces with per-offset
    piecewise-periodic runs; everything after it (MINC
    fracture-matrix connections with per-parent offsets, boundary
    ghost faces, irregular connections) becomes the indexed tail.

    This is what makes MINC meshes ride the fast path: the fracture
    lattice's bands and the matrix-chain bands are (piecewise)
    periodic, and only the fracture->matrix coupling faces land in
    the tail (r4: the pure-ELL MINC step ran ~200x slower than the
    banded flagship)."""
    a = np.asarray(face_cells[:, 0], np.int64)
    b = np.asarray(face_cells[:, 1], np.int64)
    is_ghost = np.asarray(is_ghost)
    live = ~(is_ghost[a] | is_ghost[b])
    F = len(a)
    d = b - a
    entries = []
    f = 0
    used = set()
    while f < F:
        if not live[f] or d[f] <= 0:
            break
        off = int(d[f])
        if off in used:
            break
        end = f
        while end < F and live[end] and d[end] == off:
            end += 1
        segs = _periodic_segments(a[f:end])
        if segs is None:
            break
        if (end - f) < 8 * len(segs):
            # unproductive run (e.g. per-parent fracture->matrix
            # couplings, one face per offset): leave it — and
            # everything after — to the indexed tail rather than
            # burning band/segment budget
            break
        if len(entries) + len(segs) > MAX_PLAN_SEGMENTS:
            break  # budget reached: the rest becomes the tail
        if any(
            r0 + off + (S - 1) * p + q > num_rows
            for (S, q, p, r0) in segs
        ):
            break  # right side out of range
        fseg = f
        for (S, q, p, r0) in segs:
            entries.append((off, fseg, S, q, p, r0))
            fseg += S * q
        used.add(off)
        f = end
    if not entries or f < F // 2:
        return None  # cover too little to be worth a hybrid
    pad = max(dd + p for (dd, f0, S, q, p, r0) in entries)
    return FacePlan(entries=tuple(entries), f_live=f, pad=pad)


def hybrid_band_structures(
    fp: FacePlan, num_rows: int, block_size: int
):
    """(DIAStructure, BandPlan) synthesized from a direct face plan,
    for packing the planned-prefix blocks into DIA bands
    (bands_from_blocks) while tail blocks stay with the caller.

    The returned DIAStructure carries no band_pos gather table (the
    hybrid path never packs from BSR data); only offsets / num_rows /
    block_size / padded width are meaningful."""
    n_pad = -(-num_rows // _TILE) * _TILE
    while any(
        max(r0, r0 + d) + S * p > n_pad
        for (d, f0, S, q, p, r0) in fp.entries
    ):
        n_pad += _TILE
    by_off = {}
    for e in fp.entries:
        by_off.setdefault(e[0], []).append(e)
    offsets = sorted({0} | set(by_off) | {-d for d in by_off})
    if len(offsets) > MAX_BANDS:
        return None  # face plan still useful for gathers; no bands
    entries = []
    for off in offsets:
        if off == 0:
            entries.append(("diag",))
        elif off > 0:
            entries.append((
                "segs",
                tuple(
                    (0, f0, S, q, p, r0)
                    for (d, f0, S, q, p, r0) in by_off[off]
                ),
            ))
        else:
            entries.append((
                "segs",
                tuple(
                    (1, f0, S, q, p, r0 + d)
                    for (d, f0, S, q, p, r0) in by_off[-off]
                ),
            ))
    struct = DIAStructure(
        offsets=tuple(int(d) for d in offsets),
        band_pos=jnp.zeros((len(offsets), n_pad), jnp.int32),
        num_rows=num_rows,
        block_size=block_size,
    )
    return struct, BandPlan(entries=tuple(entries))


def plan_gather_cells(fp: FacePlan, x: Array, shift_by_d: bool) -> Array:
    """x [N, ...] -> per-face values [f_live, ...]: x[cell_l] when
    shift_by_d is False, x[cell_r] (= cell_l + d) when True."""
    tail_shape = x.shape[1:]
    xp = jnp.concatenate(
        [x, jnp.zeros((fp.pad,) + tail_shape, x.dtype)], axis=0
    )
    pieces = []
    for (d, f0, S, q, p, r0) in fp.entries:
        start = r0 + (d if shift_by_d else 0)
        seg = xp[start : start + S * p]
        seg = seg.reshape((S, p) + tail_shape)[:, :q]
        pieces.append(seg.reshape((S * q,) + tail_shape))
    return jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else pieces[0]


def plan_scatter_add_cells(
    fp: FacePlan, vals: Array, n: int, shift_by_d: bool
) -> Array:
    """Transpose of plan_gather_cells: accumulate per-face values
    [f_live, ...] into cells [n, ...] at cell_l (shift_by_d False) or
    cell_r (True). Pure pads/reshapes + D-way add."""
    tail_shape = vals.shape[1:]
    total = n + fp.pad
    acc = None
    for (d, f0, S, q, p, r0) in fp.entries:
        seg = vals[f0 : f0 + S * q].reshape((S, q) + tail_shape)
        seg = jnp.pad(
            seg, ((0, 0), (0, p - q)) + ((0, 0),) * len(tail_shape)
        )
        flat = seg.reshape((S * p,) + tail_shape)
        start = r0 + (d if shift_by_d else 0)
        flat = jnp.pad(
            flat,
            ((start, total - start - S * p),)
            + ((0, 0),) * len(tail_shape),
        )
        acc = flat if acc is None else acc + flat
    return acc[:n]


def to_dia(mat, dia: DIAStructure, dtype=None) -> DIAMatrix:
    """Pack assembled BSR data into band layout [D, b*b, N_pad].

    One fused gather per Jacobian (indices computed by broadcast
    arithmetic, so the gather writes the lane-major layout directly —
    no transpose), amortised over the whole Krylov solve.
    """
    b = dia.block_size
    bb = b * b
    flat = jnp.concatenate(
        [mat.data.reshape(-1), jnp.zeros((bb,), mat.data.dtype)]
    )
    # idx[k, e, i] = band_pos[k, i] * bb + e
    idx = (
        dia.band_pos[:, None, :] * bb
        + jnp.arange(bb, dtype=jnp.int32)[None, :, None]
    )
    bands = flat[idx]  # [D, bb, N_pad]
    if dtype is not None:
        bands = bands.astype(dtype)
    return DIAMatrix(
        offsets=dia.offsets,
        bands=bands,
        block_size=b,
        num_rows=dia.num_rows,
    )


def _shift_rows(x: Array, d: int) -> Array:
    """xs[i] = x[i + d] along axis 0, zero-filled out of range."""
    if d == 0:
        return x
    pad = jnp.zeros((abs(d),) + x.shape[1:], x.dtype)
    if d > 0:
        return jnp.concatenate([x[d:], pad], axis=0)
    return jnp.concatenate([pad, x[:d]], axis=0)


def jnp_matvec(m: DIAMatrix, x: Array) -> Array:
    """Portable band SpMV: static shifts + fused multiply-adds."""
    b = m.block_size
    n = x.shape[0]
    x = x.astype(m.bands.dtype)
    acc = [jnp.zeros((n,), m.bands.dtype) for _ in range(b)]
    for k, d in enumerate(m.offsets):
        xs = _shift_rows(x, int(d))  # [N, b]
        for ii in range(b):
            row = acc[ii]
            for j in range(b):
                row = row + m.bands[k, ii * b + j, :n] * xs[:, j]
            acc[ii] = row
    return jnp.stack(acc, axis=1)


def diag_band_blocks(m: DIAMatrix) -> Array:
    """Diagonal blocks [N, b, b] extracted from the offset-0 band."""
    b = m.block_size
    k0 = m.offsets.index(0)
    n = m.num_rows
    return (
        m.bands[k0, :, :n].reshape(b, b, n).transpose(2, 0, 1)
    )


# ---------------------------------------------------------------------
# DIA preconditioners
# ---------------------------------------------------------------------


def dia_block_jacobi(dinv: Array, dtype=None):
    """z = D^{-1} r from prefactored inverse diagonal blocks [N,b,b]."""
    if dtype is not None:
        dinv = dinv.astype(dtype)

    def apply(r: Array) -> Array:
        return jnp.einsum("nij,nj->ni", dinv, r.astype(dinv.dtype))

    return apply


def dia_line_pc_em(m: DIAMatrix, dtype=None, offset: int = None):
    """Exact block-tridiagonal LINE preconditioner along one band
    direction (default: the outermost positive band — the z direction
    in natural rectilinear order): z = M^{-1} r solves
    (L_p + D + U_p) z = r exactly per line via a batched block Thomas
    factorisation + substitution (lax.scan over the Z layers,
    vectorised over the p lines per layer and the b*b block elements).

    Rationale: the reference's default ASM/ILU(0) (timestepper.F90:
    1743-1835) propagates information across the whole domain per
    application, which is what keeps BiCGStab iteration counts low; a
    sequential SpTRSV is TPU-hostile, but the tridiagonal of ONE mesh
    direction IS solvable exactly with Z scan steps of [b*b, p]
    batched small ops — and on the flagship the z direction carries
    the largest transmissibility (k_z A_z / d_z) plus the gravity
    equilibration, so capturing it exactly attacks the dominant error
    modes. Returns None when the band set has no symmetric +-offset
    pair to build lines from.
    """
    from waiwera_tpu.solver.smallblocks import (
        apply_blocks_em,
        invert_blocks_em,
        matmul_em,
    )

    offs = [int(d) for d in m.offsets]
    pos = [d for d in offs if d > 0 and -d in offs]
    if not pos:
        return None
    p = max(pos) if offset is None else int(offset)
    if p not in offs or -p not in offs:
        return None
    b = m.block_size
    bb = b * b
    n = m.num_rows
    Z = -(-n // p)
    npad = Z * p

    def pad3(x2, fill_eye=False):
        x2 = x2[:, :n]
        pad = npad - n
        if pad:
            if fill_eye:
                eye = jnp.eye(b, dtype=x2.dtype).reshape(bb, 1)
                x2 = jnp.concatenate(
                    [x2, jnp.tile(eye, (1, pad))], axis=1
                )
            else:
                x2 = jnp.pad(x2, ((0, 0), (0, pad)))
        return x2.reshape(bb, Z, p).transpose(1, 0, 2)  # [Z, bb, p]

    d3 = pad3(m.bands[offs.index(0)], fill_eye=True)
    up3 = pad3(m.bands[offs.index(p)])  # A[(z,l),(z+1,l)] at layer z
    lo3 = pad3(m.bands[offs.index(-p)])  # A[(z,l),(z-1,l)] at layer z

    # block Thomas factorisation: W_z = (d_z - lo_z W_{z-1} up_{z-1})^-1
    up_prev = jnp.concatenate([jnp.zeros_like(up3[:1]), up3[:-1]], 0)

    def fac(W_prev, x):
        d_z, lo_z, upp = x
        dmod = d_z - matmul_em(matmul_em(lo_z, W_prev), upp)
        W = invert_blocks_em(dmod)
        return W, W

    _, W3 = jax.lax.scan(
        fac, jnp.zeros((bb, p), d3.dtype), (d3, lo3, up_prev)
    )  # [Z, bb, p]

    if dtype is not None:
        W3 = W3.astype(dtype)
        lo3 = lo3.astype(dtype)
        up3 = up3.astype(dtype)

    def apply(r: Array) -> Array:
        rp = r.astype(W3.dtype)
        rp = jnp.pad(rp, ((0, npad - n), (0, 0)))
        r3 = rp.reshape(Z, p, b)

        # forward: y_z = W_z (r_z - lo_z y_{z-1})
        def fwd(y_prev, x):
            W, lo, rz = x
            y = apply_blocks_em(W, rz - apply_blocks_em(lo, y_prev))
            return y, y

        _, y3 = jax.lax.scan(
            fwd, jnp.zeros((p, b), W3.dtype), (W3, lo3, r3)
        )

        # backward: x_z = y_z - W_z up_z x_{z+1}
        def bwd(x_next, x):
            W, up, yz = x
            xz = yz - apply_blocks_em(W, apply_blocks_em(up, x_next))
            return xz, xz

        _, x3 = jax.lax.scan(
            bwd, jnp.zeros((p, b), W3.dtype), (W3, up3, y3),
            reverse=True,
        )
        return x3.reshape(npad, b)[:n]

    return apply


def dia_block_jacobi_em(dinv2: Array, dtype=None):
    """z = D^{-1} r from element-major inverse diagonal blocks
    [b*b, N] (no [N, b, b] materialisation)."""
    from waiwera_tpu.solver.smallblocks import apply_blocks_em

    if dtype is not None:
        dinv2 = dinv2.astype(dtype)

    def apply(r: Array) -> Array:
        return apply_blocks_em(dinv2, r.astype(dinv2.dtype))

    return apply


def _shift_last(x: Array, d: int) -> Array:
    """xs[..., i] = x[..., i + d], zero-filled out of range."""
    if d == 0:
        return x
    pad = jnp.zeros(x.shape[:-1] + (abs(d),), x.dtype)
    if d > 0:
        return jnp.concatenate([x[..., d:], pad], axis=-1)
    return jnp.concatenate([pad, x[..., :d]], axis=-1)


def dia_dilu_em(m: DIAMatrix, sweeps: int = 3, dtype=None):
    """dia_dilu on element-major band data: factorisation and both
    triangular sweeps stay in [b*b, N] layout (the batch-first block
    arrays the original used tile to 57x padded buffers on TPU)."""
    from waiwera_tpu.solver.smallblocks import (
        apply_blocks_em,
        invert_blocks_em,
        matmul_em,
    )

    b = m.block_size
    n = m.num_rows

    def band2(k) -> Array:
        return m.bands[k][:, :n]  # [bb, n]

    diag2 = band2(m.offsets.index(0))
    inv0 = invert_blocks_em(diag2)
    dmod = diag2
    neg = [(k, int(d)) for k, d in enumerate(m.offsets) if int(d) < 0]
    pos = [(k, int(d)) for k, d in enumerate(m.offsets) if int(d) > 0]
    off_index = {int(d): k for k, d in enumerate(m.offsets)}
    for k, d in neg:
        kt = off_index.get(-d)
        if kt is None:
            continue
        bl = band2(k)  # A_{i, i+d}
        inv_s = _shift_last(inv0, d)
        bu_s = _shift_last(band2(kt), d)  # A_{i+d, i}
        dmod = dmod - matmul_em(matmul_em(bl, inv_s), bu_s)
    dinv = invert_blocks_em(dmod)

    if dtype is not None:
        dinv_a = dinv.astype(dtype)
        bands_a = m.bands.astype(dtype)
    else:
        dinv_a = dinv
        bands_a = m.bands

    def band_apply(sel, v: Array) -> Array:
        out = [
            jnp.zeros((v.shape[0],), bands_a.dtype) for _ in range(b)
        ]
        for k, d in sel:
            vs = _shift_rows(v, d)
            for ii in range(b):
                row = out[ii]
                for j in range(b):
                    row = row + bands_a[k, ii * b + j, : v.shape[0]] * vs[:, j]
                out[ii] = row
        return jnp.stack(out, axis=1)

    def dsolve(v: Array) -> Array:
        return apply_blocks_em(dinv_a, v)

    def apply(r: Array) -> Array:
        r = r.astype(bands_a.dtype)
        # forward: (D~ + L) y = r via y <- D~^{-1} (r - L y)
        y = dsolve(r)
        for _ in range(sweeps):
            y = dsolve(r - band_apply(neg, y))
        # backward: (I + D~^{-1} U) z = y via z <- y - D~^{-1} U z
        z = y
        for _ in range(sweeps):
            z = y - dsolve(band_apply(pos, z))
        return z

    return apply


def dia_dilu(
    m64: DIAMatrix, invert_blocks, sweeps: int = 3, dtype=None
):
    """DILU / block-SGS with shift-based fixed-point triangular sweeps.

    M = (D~ + L) D~^{-1} (D~ + U), D~_i = A_ii - sum_{d<0} A_{i,i+d}
    inv(A_{i+d,i+d}) A_{i+d,i} (one Jacobi pass, as in
    solver.precond.dilu), with L/U the negative/positive bands. The
    two triangular solves run as `sweeps` data-parallel fixed-point
    iterations built from the same shift + multiply-add primitive as
    the band SpMV — no scatter, no sequential SpTRSV.

    m64: the band matrix in solve precision f64 (factorisation
    robustness); returned apply operates in `dtype`.
    """
    b = m64.block_size
    n = m64.num_rows

    def band_block(k) -> Array:
        return (
            m64.bands[k, :, :n].reshape(b, b, n).transpose(2, 0, 1)
        )

    diag = diag_band_blocks(m64)
    inv0 = invert_blocks(diag)
    dmod = diag
    neg = [
        (k, int(d)) for k, d in enumerate(m64.offsets) if int(d) < 0
    ]
    pos = [
        (k, int(d)) for k, d in enumerate(m64.offsets) if int(d) > 0
    ]
    off_index = {int(d): k for k, d in enumerate(m64.offsets)}
    for k, d in neg:
        kt = off_index.get(-d)
        if kt is None:
            continue
        bl = band_block(k)  # A_{i, i+d}
        # inv(D_{i+d}) and A_{i+d, i} both gathered by shifting rows
        inv_s = _shift_rows(inv0, d)
        bu_s = _shift_rows(band_block(kt), d)  # A_{i+d, i}
        corr = jnp.einsum("nij,njl,nlm->nim", bl, inv_s, bu_s)
        # out-of-range shifts contribute zero blocks already
        dmod = dmod - corr
    dinv = invert_blocks(dmod)

    if dtype is not None:
        dinv_a = dinv.astype(dtype)
        bands_a = m64.bands.astype(dtype)
    else:
        dinv_a = dinv
        bands_a = m64.bands

    def band_apply(sel, v: Array) -> Array:
        """sum over selected bands of B_d[i] @ v[i+d]."""
        out = [
            jnp.zeros((v.shape[0],), bands_a.dtype) for _ in range(b)
        ]
        for k, d in sel:
            vs = _shift_rows(v, d)
            for ii in range(b):
                row = out[ii]
                for j in range(b):
                    row = row + bands_a[k, ii * b + j, : v.shape[0]] * vs[:, j]
                out[ii] = row
        return jnp.stack(out, axis=1)

    def dsolve(v: Array) -> Array:
        return jnp.einsum("nij,nj->ni", dinv_a, v)

    def apply(r: Array) -> Array:
        r = r.astype(bands_a.dtype)
        # forward: (D~ + L) y = r via y <- D~^{-1} (r - L y)
        y = dsolve(r)
        for _ in range(sweeps):
            y = dsolve(r - band_apply(neg, y))
        # backward: (I + D~^{-1} U) z = y via z <- y - D~^{-1} U z
        z = y
        for _ in range(sweeps):
            z = y - dsolve(band_apply(pos, z))
        return z

    return apply


# ---------------------------------------------------------------------
# Pallas TPU kernel (8-way interleaved band layout)
# ---------------------------------------------------------------------
#
# Cells are mapped to a (sublane, lane) coordinate: cell c = q*8 + s
# lives at sublane s, lane q. Every array (bands, x, y) uses this
# layout, so each band's multiply-add is a fully-packed [8, T] VPU op
# (the earlier cells-on-lanes-only layout ran 1-D [T] vectors at 1/8
# VPU utilisation and needed sublane-padded x DMAs at 8/b bandwidth
# waste). A shift by band offset d decomposes into a lane shift by
# d//8 plus a sublane rotation by d%8 — and the far mesh bands
# (±nx, ±nx·ny) are almost always multiples of 8, i.e. pure
# (free) lane shifts. x windows arrive as pipelined BlockSpec streams
# (one per distinct block offset), so Pallas double-buffers them with
# the band stream; there are no manual DMAs and no alignment hazards.

_Q = 8  # sublane interleave factor (f32 sublane tile)


class PallasDIAMatrix(NamedTuple):
    """Band matrix pre-packed in the interleaved Pallas layout.

    bands8[(k*b + ii)*b + j, s, q] = block element (ii, j) of band k
    at cell q*8+s. Built once per Jacobian (to_dia_pallas) and reused
    across all Krylov iterations.
    """

    offsets: tuple
    bands8: Array  # [D*b*b*8, n_pad//8]
    block_size: int
    num_rows: int
    n_pad: int

    def matvec(self, x: Array) -> Array:
        return _pallas_matvec8(self, x)

    def matvec_il(self, x_il: Array) -> Array:
        """SpMV staying in the interleaved layout (il_encode /
        il_decode at the Krylov-solve boundary only)."""
        return _pallas_matvec8_il(self, x_il)


def to_dia_pallas(
    mat, dia: DIAStructure, dtype=jnp.float32
) -> PallasDIAMatrix:
    """Pack assembled BSR data directly into the interleaved Pallas
    band layout (one fused gather, like to_dia)."""
    b = dia.block_size
    bb = b * b
    D = len(dia.offsets)
    n_pad = dia.band_pos.shape[1]
    nq = n_pad // _Q
    flat = jnp.concatenate(
        [mat.data.reshape(-1), jnp.zeros((bb,), mat.data.dtype)]
    )
    # pos_il[k, s, q] = band_pos[k, q*8+s]
    pos_il = dia.band_pos.reshape(D, nq, _Q).transpose(0, 2, 1)
    idx = (
        pos_il[:, None, :, :] * bb
        + jnp.arange(bb, dtype=jnp.int32)[None, :, None, None]
    )  # [D, bb, 8, nq]
    bands8 = flat[idx].reshape(D * bb * _Q, nq)
    if dtype is not None:
        bands8 = bands8.astype(dtype)
    return PallasDIAMatrix(
        offsets=dia.offsets,
        bands8=bands8,
        block_size=b,
        num_rows=dia.num_rows,
        n_pad=n_pad,
    )


def _interleave_bands(m: DIAMatrix) -> PallasDIAMatrix:
    """Relayout a natural-order DIAMatrix (tests / ad-hoc use; one
    extra pass over the band data — production packs directly via
    to_dia_pallas)."""
    D = len(m.offsets)
    b = m.block_size
    n_pad = m.bands.shape[2]
    nq = n_pad // _Q
    bands8 = (
        m.bands.reshape(D * b * b, nq, _Q)
        .transpose(0, 2, 1)
        .reshape(D * b * b * _Q, nq)
        .astype(jnp.float32)
    )
    return PallasDIAMatrix(
        offsets=m.offsets,
        bands8=bands8,
        block_size=b,
        num_rows=m.num_rows,
        n_pad=n_pad,
    )


def _x_block_plan(offsets: Sequence[int], tq: int):
    """Which x blocks (relative block offsets, in units of the [*, tq]
    lane tile) each band offset needs, and how to slice them.

    For band offset d: dq = d // 8 lane shift, ds = d % 8 sublane
    rotation. The needed lanes are [i*tq + dq, +tq) (+1 lane when the
    sublane rotation wraps), i.e. blocks r0 = dq // tq and r0+1 when
    the intra-block offset a = dq % tq is nonzero or ds > 0.

    Returns (rel_blocks, per_offset) with per_offset[k] = (r0, a, ds).
    """
    rel = set()
    per = []
    for d in offsets:
        d = int(d)
        dq = d // _Q
        ds = d - _Q * dq
        r0 = dq // tq
        a = dq - r0 * tq
        rel.add(r0)
        if a > 0 or ds > 0:
            rel.add(r0 + 1)
        per.append((r0, a, ds))
    return sorted(rel), per


def _dia_kernel8(offsets, per_offset, rel_blocks, b: int, tq: int):
    """Kernel factory for the interleaved layout. All refs are VMEM
    blocks fed by the Pallas pipeline: bands [D*b*b*8, tq], one x ref
    [b*8, tq] per relative block, y [b*8, tq]."""
    from jax.experimental.pallas import tpu as pltpu

    r_index = {r: i for i, r in enumerate(rel_blocks)}
    interpret = jax.default_backend() != "tpu"

    def _roll_sub(v, ds):
        # output row s holds source row (s + ds) % 8
        if interpret:
            return jnp.roll(v, -ds, axis=0)
        # pltpu.roll requires a non-negative shift: -ds == 8-ds (mod 8)
        return pltpu.roll(v, _Q - ds, axis=0)

    def kernel(bands_ref, *rest):
        xrefs = rest[:-1]
        y_ref = rest[-1]

        def xslice(j, r0, a, ds):
            """x values of component j shifted by band offset d, as a
            fully packed [8, tq] chunk in cell-interleaved order."""
            lo = xrefs[r_index[r0]][j * _Q : (j + 1) * _Q, :]
            if a == 0 and ds == 0:
                return lo
            hi = xrefs[r_index[r0 + 1]][j * _Q : (j + 1) * _Q, :]
            w = jnp.concatenate([lo, hi], axis=1)  # [8, 2*tq]
            if ds == 0:
                return w[:, a : a + tq]
            # sublane rotation: output row s reads source row
            # (s + ds) % 8; rows that wrapped advance one lane
            v0 = _roll_sub(w[:, a : a + tq], ds)
            v1 = _roll_sub(w[:, a + 1 : a + 1 + tq], ds)
            srow = jax.lax.broadcasted_iota(jnp.int32, (_Q, tq), 0)
            return jnp.where(srow < _Q - ds, v0, v1)

        acc = [jnp.zeros((_Q, tq), jnp.float32) for _ in range(b)]
        for k, (r0, a, ds) in enumerate(per_offset):
            for j in range(b):
                xs = xslice(j, r0, a, ds)
                for ii in range(b):
                    row = ((k * b + ii) * b + j) * _Q
                    acc[ii] = acc[ii] + bands_ref[row : row + _Q, :] * xs
        for ii in range(b):
            y_ref[ii * _Q : (ii + 1) * _Q, :] = acc[ii]

    return kernel


def il_encode(x: Array, n_pad: int) -> Array:
    """Natural [n, b] -> interleaved [b*8, n_pad//8] (f32), zero
    padding rows n..n_pad. The Krylov solvers can run ENTIRELY in this
    layout (encode b once, decode x once): all padding stays zero
    under matvec/block-Jacobi/axpy, so dot products and norms are
    exact, and the per-iteration relayout that dominated the natural-
    layout matvec (569 us/apply vs ~200 us kernel time on the 512k-
    cell flagship) disappears."""
    n, b = x.shape
    nq = n_pad // _Q
    xp = jnp.zeros((n_pad, b), jnp.float32)
    xp = jax.lax.dynamic_update_slice(
        xp, x.astype(jnp.float32), (0, 0)
    )
    return xp.T.reshape(b, nq, _Q).transpose(0, 2, 1).reshape(b * _Q, nq)


def il_decode(y: Array, n: int) -> Array:
    """Interleaved [b*8, nq] -> natural [n, b]."""
    bq, nq = y.shape
    b = bq // _Q
    yn = y.reshape(b, _Q, nq).transpose(0, 2, 1).reshape(b, nq * _Q)
    return yn[:, :n].T


def il_block_jacobi_em(dinv2: Array, n_pad: int, dtype=None):
    """Block-Jacobi apply in the interleaved layout: z_il = D^{-1} r_il
    with prefactored element-major inverse diagonal blocks [b*b, N].
    The blocks are interleaved once at build time; each application is
    b*b fused multiply-adds on [8, nq] tiles (fuses into the
    surrounding Krylov vector ops)."""
    bb, ncols = dinv2.shape
    b = int(round(bb ** 0.5))
    nq = n_pad // _Q
    if dtype is not None:
        dinv2 = dinv2.astype(dtype)
    dpad = jnp.pad(dinv2.astype(jnp.float32),
                   ((0, 0), (0, n_pad - ncols)))
    d_il = dpad.reshape(bb, nq, _Q).transpose(0, 2, 1).reshape(
        bb * _Q, nq
    )

    def apply(r_il: Array) -> Array:
        outs = []
        for i in range(b):
            acc = None
            for j in range(b):
                k = i * b + j
                t = (
                    d_il[k * _Q : (k + 1) * _Q, :]
                    * r_il[j * _Q : (j + 1) * _Q, :]
                )
                acc = t if acc is None else acc + t
            outs.append(acc)
        return jnp.concatenate(outs, axis=0)

    return apply


def _pallas_matvec8_il(m: PallasDIAMatrix, x_il: Array) -> Array:
    """Band SpMV on an already-interleaved x [b*8, nq] -> y [b*8, nq]
    (no layout conversion; the production Krylov path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets = m.offsets
    D = len(offsets)
    b = m.block_size
    n_pad = m.n_pad
    tq = _TILE // _Q  # lanes per block (multiple of 128)
    nq = n_pad // _Q

    rel_blocks, per_offset = _x_block_plan(offsets, tq)
    hb = max(max(abs(r) for r in rel_blocks), 1)
    pad_q = hb * tq

    # zero halo both sides for the shifted x windows
    xt = jnp.zeros((b * _Q, nq + 2 * pad_q), jnp.float32)
    xt = jax.lax.dynamic_update_slice(
        xt, x_il.astype(jnp.float32), (0, pad_q)
    )

    kernel = _dia_kernel8(offsets, per_offset, rel_blocks, b, tq)
    grid = (nq // tq,)
    interpret = jax.default_backend() != "tpu"

    def x_spec(r):
        return pl.BlockSpec(
            (b * _Q, tq),
            lambda i, r=r: (0, i + r + hb),
            memory_space=pltpu.VMEM,
        )

    # x64 mode poisons Pallas's grid/index plumbing with i64 values
    # Mosaic cannot legalize; the kernel itself is pure f32/int32
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b * _Q, nq), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (D * b * b * _Q, tq),
                    lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                )
            ]
            + [x_spec(r) for r in rel_blocks],
            out_specs=pl.BlockSpec(
                (b * _Q, tq), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(m.bands8, *([xt] * len(rel_blocks)))
    return y


def _pallas_matvec8(m: PallasDIAMatrix, x: Array) -> Array:
    """Natural-layout wrapper: encode x, run the interleaved kernel,
    decode y."""
    n = x.shape[0]
    return il_decode(_pallas_matvec8_il(m, il_encode(x, m.n_pad)), n)


def pallas_matvec(m, x: Array) -> Array:
    """Band SpMV on TPU (f32). Accepts a pre-packed PallasDIAMatrix
    (production path) or a natural-order DIAMatrix (relayout on the
    fly — tests / ad-hoc use)."""
    if isinstance(m, PallasDIAMatrix):
        return _pallas_matvec8(m, x)
    return _pallas_matvec8(_interleave_bands(m), x)
