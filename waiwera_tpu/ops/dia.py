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
        halo = max((abs(int(d)) for d in self.offsets), default=0)
        # window DMA waste grows with the largest band offset; past
        # one tile of halo the fused-XLA path wins
        if halo <= _TILE and _use_pallas(self.bands.dtype):
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
# Pallas TPU kernel
# ---------------------------------------------------------------------


def _dia_kernel(offsets: Sequence[int], b: int, halo_al: int, tile: int):
    """Kernel factory. Band data arrives as [D*b*b, T] tiles in VMEM;
    x stays in HBM ([b, Npad + 2*halo_al]) and ONE lane-aligned window
    [b, T + 2*halo_al] is DMA'd per tile (Mosaic requires 128-aligned
    DMA lane offsets); each band's shifted view is then a static
    in-VMEM slice."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = len(offsets)
    window = tile + 2 * halo_al

    def kernel(x_hbm, bands_ref, y_ref, xw, sem):
        # i32 indices throughout: Mosaic's memref ops reject i64 (which
        # python ints promote to under jax_enable_x64)
        start = pl.program_id(0) * jnp.int32(tile)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(start, window)], xw, sem
        )
        dma.start()
        dma.wait()
        w = xw[:, :]  # [b, window]
        acc = [jnp.zeros((tile,), jnp.float32) for _ in range(b)]
        for k, d in enumerate(offsets):
            # shifted[j] = x[start + j + d] = w[halo_al + j + d]:
            # a static (compile-time) unaligned slice of the window
            xs = w[:, halo_al + int(d) : halo_al + int(d) + tile]
            for ii in range(b):
                row = acc[ii]
                for j in range(b):
                    row = row + bands_ref[(k * b + ii) * b + j, :] * xs[j, :]
                acc[ii] = row
        for ii in range(b):
            y_ref[ii, :] = acc[ii]

    return kernel, D


def pallas_matvec(m: DIAMatrix, x: Array) -> Array:
    """One-HBM-pass band SpMV on TPU. f32 only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets = m.offsets
    D = len(offsets)
    n, b = x.shape
    tile = _TILE
    n_pad = m.bands.shape[2]
    halo = max(abs(int(d)) for d in offsets) if offsets else 0
    halo_al = max(-(-halo // 128) * 128, 128)  # lane-aligned halo

    xt = jnp.zeros((b, n_pad + 2 * halo_al), jnp.float32)
    xt = jax.lax.dynamic_update_slice(
        xt, x.T.astype(jnp.float32), (0, halo_al)
    )
    bands = m.bands.reshape(D * b * b, n_pad)

    kernel, _ = _dia_kernel(offsets, b, halo_al, tile)
    grid = (n_pad // tile,)
    interpret = jax.default_backend() != "tpu"
    # x64 mode poisons Pallas's grid/index plumbing with i64 values
    # Mosaic cannot legalize; the kernel itself is pure f32/int32
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (D * b * b, tile),
                    lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (b, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((b, tile + 2 * halo_al), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(xt, bands)
    return y[:, :n].T
