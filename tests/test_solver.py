"""BSR matrix, Krylov solver and preconditioner tests."""

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.solver import bsr, krylov, precond


def laplacian_1d(n, b=2, seed=0):
    """Block 1-D Laplacian-ish SPD-ish test matrix + structure."""
    rng = np.random.default_rng(seed)
    face_cells = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    structure = bsr.build_structure(n, face_cells, b)
    diag = np.zeros((n, b, b))
    base = 2.0 * np.eye(b) + 0.1 * rng.standard_normal((b, b))
    for i in range(n):
        diag[i] = base * (2.0 + 0.05 * i)
    off = -np.tile(np.eye(b), (n - 1, 1, 1)) * 0.9
    pos_lr, pos_rl = bsr.face_block_positions(structure, face_cells)
    mat = bsr.assemble(
        structure,
        jnp.asarray(diag),
        jnp.asarray(off),
        jnp.asarray(off),
        jnp.asarray(pos_lr),
        jnp.asarray(pos_rl),
    )
    return mat, face_cells


def dense_of(mat):
    s = mat.structure
    n, b = s.num_rows, s.block_size
    d = np.zeros((n * b, n * b))
    rows = np.asarray(s.rows)
    cols = np.asarray(s.indices)
    data = np.asarray(mat.data)
    for k in range(len(rows)):
        i, j = rows[k], cols[k]
        d[i * b : (i + 1) * b, j * b : (j + 1) * b] += data[k]
    return d


def test_spmv_matches_dense():
    mat, _ = laplacian_1d(7, b=3)
    x = np.random.default_rng(1).standard_normal((7, 3))
    y = np.asarray(mat.matvec(jnp.asarray(x)))
    yd = (dense_of(mat) @ x.ravel()).reshape(7, 3)
    np.testing.assert_allclose(y, yd, rtol=1e-12, atol=1e-12)


def test_bicgstab():
    mat, _ = laplacian_1d(50, b=2)
    rng = np.random.default_rng(2)
    xstar = rng.standard_normal((50, 2))
    b = mat.matvec(jnp.asarray(xstar))
    res = krylov.bicgstab(mat.matvec, b, rtol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-6, atol=1e-8)


def test_bicgstab_with_bjacobi():
    mat, _ = laplacian_1d(80, b=3)
    rng = np.random.default_rng(3)
    xstar = rng.standard_normal((80, 3))
    b = mat.matvec(jnp.asarray(xstar))
    pc = precond.block_jacobi(mat)
    res = krylov.bicgstab(mat.matvec, b, precond=pc, rtol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-6, atol=1e-8)


def test_gmres():
    mat, _ = laplacian_1d(40, b=2)
    rng = np.random.default_rng(4)
    xstar = rng.standard_normal((40, 2))
    b = mat.matvec(jnp.asarray(xstar))
    res = krylov.gmres(mat.matvec, b, rtol=1e-10, restart=20)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-6, atol=1e-8)


def test_dilu_preconditioner():
    mat, _ = laplacian_1d(60, b=2)
    rng = np.random.default_rng(5)
    xstar = rng.standard_normal((60, 2))
    b = mat.matvec(jnp.asarray(xstar))
    pc = precond.make_preconditioner("ilu", mat)
    res = krylov.bicgstab(mat.matvec, b, precond=pc, rtol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-6, atol=1e-8)
    # DILU should beat plain bjacobi on iteration count
    res_bj = krylov.bicgstab(
        mat.matvec, b, precond=precond.block_jacobi(mat), rtol=1e-10
    )
    assert int(res.iterations) <= int(res_bj.iterations)


def test_diag_blocks():
    mat, _ = laplacian_1d(5, b=2)
    d = np.asarray(mat.diag_blocks())
    dd = dense_of(mat)
    for i in range(5):
        np.testing.assert_allclose(d[i], dd[2 * i : 2 * i + 2, 2 * i : 2 * i + 2])
