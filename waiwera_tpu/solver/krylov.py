"""Krylov solvers: BiCGStab (reference default) and restarted GMRES.

jnp replacements for the PETSc KSP types Waiwera configures
(timestepper.F90:1725-1739: bcgs default, gmres alternative). Both are
right-preconditioned and run under lax.while_loop with early exit, so a
whole Newton step stays on device.

Vectors are [N, b] (block rows); dot products reduce over everything.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

DEFAULT_RTOL = 1e-5  # PETSc KSP default relative tolerance
DEFAULT_ATOL = 1e-50


class KrylovResult(NamedTuple):
    x: Array
    iterations: Array  # int32
    residual_norm: Array
    converged: Array  # bool


def _identity(x: Array) -> Array:
    return x


def bicgstab(
    matvec: Callable[[Array], Array],
    b: Array,
    x0: Optional[Array] = None,
    precond: Optional[Callable[[Array], Array]] = None,
    rtol: float = DEFAULT_RTOL,
    atol: float = DEFAULT_ATOL,
    max_iterations: int = 1000,
    reduce_sum: Callable[[Array], Array] = _identity,
) -> KrylovResult:
    """Right-preconditioned BiCGStab for A x = b.

    reduce_sum: combines partial reductions across devices (lax.psum
    under shard_map; identity on a single device). All dot products /
    norms are local contractions followed by reduce_sum, so the solver
    runs unchanged over domain-decomposed vectors.
    """
    if precond is None:
        precond = lambda v: v

    def _dot(a: Array, b_: Array) -> Array:
        return reduce_sum(jnp.vdot(a, b_))

    def _norm(a: Array) -> Array:
        return jnp.sqrt(jnp.real(_dot(a, a)))
    tiny = float(jnp.finfo(b.dtype).tiny)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    r0 = r
    bnorm = _norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    rho = _dot(r0, r)
    p = r

    def cond(state):
        x, r, p, rho, k, rnorm = state
        return (rnorm > tol) & (k < max_iterations) & jnp.isfinite(rnorm)

    def body(state):
        x, r, p, rho, k, _ = state
        phat = precond(p)
        v = matvec(phat)
        denom = _dot(r0, v)
        alpha = rho / jnp.where(denom != 0, denom, tiny)
        s = r - alpha * v
        shat = precond(s)
        t = matvec(shat)
        tt = _dot(t, t)
        omega = _dot(t, s) / jnp.where(tt != 0, tt, tiny)
        x_new = x + alpha * phat + omega * shat
        r_new = s - omega * t
        rho_new = _dot(r0, r_new)
        beta = (rho_new / jnp.where(rho != 0, rho, tiny)) * (
            alpha / jnp.where(omega != 0, omega, tiny)
        )
        p_new = r_new + beta * (p - omega * v)
        return (x_new, r_new, p_new, rho_new, k + 1, _norm(r_new))

    state = (x, r, p, rho, jnp.int32(0), _norm(r))
    x, r, p, rho, k, rnorm = lax.while_loop(cond, body, state)
    return KrylovResult(
        x=x,
        iterations=k,
        residual_norm=rnorm,
        converged=(rnorm <= tol) & jnp.isfinite(rnorm),
    )


def gmres(
    matvec: Callable[[Array], Array],
    b: Array,
    x0: Optional[Array] = None,
    precond: Optional[Callable[[Array], Array]] = None,
    rtol: float = DEFAULT_RTOL,
    atol: float = DEFAULT_ATOL,
    restart: int = 30,
    max_restarts: int = 40,
    reduce_sum: Callable[[Array], Array] = _identity,
) -> KrylovResult:
    """Right-preconditioned restarted GMRES(m).

    Arnoldi with two-pass classical Gram-Schmidt (CGS2): fully
    vectorised over the basis, which maps to batched matmuls on TPU
    rather than a sequential MGS scan. reduce_sum as in bicgstab: all
    basis contractions are local matmuls + one cross-device reduction.
    """
    if precond is None:
        precond = lambda v: v

    def _dot(a: Array, b_: Array) -> Array:
        return reduce_sum(jnp.vdot(a, b_))

    def _norm(a: Array) -> Array:
        return jnp.sqrt(jnp.real(_dot(a, a)))
    tiny = float(jnp.finfo(b.dtype).tiny)
    x = jnp.zeros_like(b) if x0 is None else x0
    shape = b.shape
    n = b.size
    bnorm = _norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)
    m = restart

    def flat(v):
        return v.reshape(n)

    def unflat(v):
        return v.reshape(shape)

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = _norm(r)

        V = jnp.zeros((m + 1, n), b.dtype)
        H = jnp.zeros((m + 1, m), b.dtype)
        V = V.at[0].set(flat(r) / jnp.where(beta != 0, beta, tiny))

        def body(j, carry):
            V, H, brk = carry
            v_j = unflat(V[j])
            w = flat(matvec(precond(v_j)))
            # CGS2 against the full basis (rows > j are zero);
            # V @ w is a local contraction, reduced across devices
            h1 = reduce_sum(V @ w)  # [m+1]
            w = w - V.T @ h1
            h2 = reduce_sum(V @ w)
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = jnp.sqrt(reduce_sum(w @ w))
            H_new = H.at[:, j].set(h)
            H_new = H_new.at[j + 1, j].set(wnorm)
            V_new = V.at[j + 1].set(
                w / jnp.where(wnorm > tiny, wnorm, 1.0)
            )
            return (V_new, H_new, brk | (wnorm <= tiny))

        V, H, _ = lax.fori_loop(0, m, body, (V, H, False))

        # solve least squares min ||beta e1 - H y|| by Givens rotations
        # (no LAPACK custom calls: TPU has no f64 QR/SVD)
        from waiwera_tpu.solver.smallblocks import hessenberg_lstsq

        y = hessenberg_lstsq(H, beta, m).astype(b.dtype)
        dx = V[:m].T @ y  # [n]
        x_new = x + precond(unflat(dx))
        return x_new

    def cond(state):
        x, k, rnorm = state
        return (rnorm > tol) & (k < max_restarts) & jnp.isfinite(rnorm)

    def body(state):
        x, k, _ = state
        x_new = arnoldi_cycle(x)
        rnorm = _norm(b - matvec(x_new))
        return (x_new, k + 1, rnorm)

    r0n = _norm(b - matvec(x))
    x, k, rnorm = lax.while_loop(cond, body, (x, jnp.int32(0), r0n))
    return KrylovResult(
        x=x,
        iterations=k * restart,
        residual_norm=rnorm,
        converged=(rnorm <= tol) & jnp.isfinite(rnorm),
    )


def solve(
    method: str,
    matvec,
    b,
    precond=None,
    rtol: float = DEFAULT_RTOL,
    **kw,
) -> KrylovResult:
    if method in ("bcgs", "bicgstab"):
        return bicgstab(matvec, b, precond=precond, rtol=rtol, **kw)
    if method in ("gmres", "lgmres", "bcgsl"):
        return gmres(matvec, b, precond=precond, rtol=rtol, **kw)
    raise ValueError(f"unknown linear solver: {method!r}")
