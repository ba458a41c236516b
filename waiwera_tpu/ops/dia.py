"""Block-DIA (diagonal-band) SpMV: gather- and scatter-free.

On rectilinear meshes in natural (x-fastest) ordering — the dominant
production case and every reference benchmark geometry — the Jacobian's
nonzero blocks sit on a handful of diagonals: offsets {0, ±1, ±nx,
±nx·ny} (cell ghost-coupled blocks are structurally present but always
zero: system.py zeroes them, mirroring the reference's boundary-ghost
decoupling, mesh.F90:228-265). Detecting this from the assembled BSR
sparsity turns SpMV into

    y[i] = sum_d  B_d[i] @ x[i + d]

i.e. static shifts + batched small matmuls: no index gather at all.
This is the TPU-shaped replacement for PETSc's MATBAIJ MatMult on
structured meshes; unstructured meshes fall back to the ELL gather
path (ops.ell).

Two executions of the same layout:
- a pure-jnp path (shift via pad/slice; XLA fuses the band
  multiply-adds into one memory-bound pass) — works on any backend;
- a Pallas TPU kernel (pallas_matvec) that reads each band tile and
  DMAs the D shifted x windows into VMEM once, accumulating on the
  VPU — one HBM pass over the matrix at speed of light.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

Array = jnp.ndarray

MAX_BANDS = 16


class DIAStructure(NamedTuple):
    """Static band tables (host-built from a BSRStructure)."""

    offsets: tuple  # D static python ints, sorted
    band_pos: Array  # [D, N] int32 into BSR data padded by one
    # trailing zero block (absent entries point at nnzb)
    num_rows: int
    block_size: int


class DIAMatrix(NamedTuple):
    offsets: tuple
    data: Array  # [D, N, b, b] (absent entries zero)

    def matvec(self, x: Array) -> Array:
        """y = A @ x, x and y of shape [N, b]."""
        halo = max((abs(int(d)) for d in self.offsets), default=0)
        # window DMA waste grows with the largest band offset; past
        # one tile of halo the fused-XLA path wins
        if halo <= _TILE and _use_pallas(self.data.dtype):
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
    nnzb = len(rows)
    band_pos = np.full((len(offs), n), nnzb, dtype=np.int64)
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
    """Lay assembled BSR data out into bands (one gather per Jacobian,
    amortised over the whole Krylov solve)."""
    b = dia.block_size
    data = jnp.concatenate(
        [mat.data, jnp.zeros((1, b, b), mat.data.dtype)], axis=0
    )
    d = data[dia.band_pos]  # [D, N, b, b]
    if dtype is not None:
        d = d.astype(dtype)
    return DIAMatrix(offsets=dia.offsets, data=d)


def _shift(x: Array, d: int) -> Array:
    """xs[i] = x[i + d], zero-filled out of range."""
    if d == 0:
        return x
    n = x.shape[0]
    pad = jnp.zeros((abs(d),) + x.shape[1:], x.dtype)
    if d > 0:
        return jnp.concatenate([x[d:], pad], axis=0)
    return jnp.concatenate([pad, x[:d]], axis=0)


def jnp_matvec(m: DIAMatrix, x: Array) -> Array:
    x = x.astype(m.data.dtype)
    y = jnp.zeros_like(x)
    for k, d in enumerate(m.offsets):
        y = y + jnp.einsum("nij,nj->ni", m.data[k], _shift(x, d))
    return y


# ---------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------

_TILE = 2048  # lanes per grid step (multiple of 128)


def _dia_kernel(offsets: Sequence[int], b: int, halo_al: int, tile: int):
    """Kernel factory. Band data arrives as [D*b*b, T] tiles in VMEM;
    x stays in HBM ([b, Npad + 2*halo_al]) and ONE lane-aligned window
    [b, T + 2*halo_al] is DMA'd per tile (Mosaic requires 128-aligned
    DMA lane offsets); each band's shifted view is then a static
    in-VMEM lane roll + aligned slice."""
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
    n_pad = -(-n // tile) * tile
    halo = max(abs(int(d)) for d in offsets) if offsets else 0
    halo_al = max(-(-halo // 128) * 128, 128)  # lane-aligned halo

    xt = jnp.zeros((b, n_pad + 2 * halo_al), jnp.float32)
    xt = jax.lax.dynamic_update_slice(
        xt, x.T.astype(jnp.float32), (0, halo_al)
    )
    # bands: [D, N, b, b] -> [D*b*b, n_pad] (row (k*b+i)*b+j holds
    # band k, block element (i, j))
    bands = jnp.transpose(m.data, (0, 2, 3, 1)).reshape(D * b * b, n)
    bands = jnp.pad(bands, ((0, 0), (0, n_pad - n)))

    kernel, _ = _dia_kernel(offsets, b, halo_al, tile)
    grid = (n_pad // tile,)
    interpret = jax.default_backend() != "tpu"
    # x64 mode poisons Pallas's grid/index plumbing with i64 values
    # Mosaic cannot legalize; the kernel itself is pure f32/int32
    with jax.enable_x64(False):
        y = _call(
            pl, pltpu, kernel, grid, D, b, tile, halo_al, n_pad,
            interpret, xt, bands,
        )
    return y[:, :n].T


def _call(
    pl, pltpu, kernel, grid, D, b, tile, halo_al, n_pad, interpret,
    xt, bands,
):
    return pl.pallas_call(
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
