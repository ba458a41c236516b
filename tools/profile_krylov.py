"""Bisect the per-Krylov-iteration cost on the flagship Jacobian.

VERDICT r3 weak #3: BiCGStab runs ~17 ms/iteration while its component
cost (2 matvecs + 2 bjacobi applies + ~6 dots) is ~1.5 ms. This script
times each layer separately on the attached device:

  1. pallas band SpMV alone            (fori chain)
  2. bjacobi apply alone               (fori chain)
  3. dots/norms alone                  (fori chain)
  4. full bicgstab body via fori_loop  (no early exit)
  5. full bicgstab via lax.while_loop  (production path)

Slope timing (two chain lengths) cancels fixed launch + host RTT.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax


def _force(x):
    return float(np.asarray(x.reshape(-1)[0]))


def time_fori(make_chain, k1=5, k2=25):
    ts = {}
    for k in (k1, k2):
        f = make_chain(k)
        _force(f())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _force(f())
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return max((ts[k2] - ts[k1]) / (k2 - k1), 1e-12)


def main():
    nx = int(os.environ.get("BENCH_NX", 128))
    ny = int(os.environ.get("BENCH_NY", 64))
    nz = int(os.environ.get("BENCH_NZ", 64))
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import build_sim
    from waiwera_tpu.solver.system import MethodCoeffs
    from waiwera_tpu.solver import bsr as bsr_mod
    from waiwera_tpu.solver.smallblocks import invert_blocks
    from waiwera_tpu.ops import dia as ops_dia

    sim, n = build_sim(nx, ny, nz)
    npv = sim.eos.num_primary_variables
    system = sim.system
    lhs0, fluid0, _ = sim.lhs_at(sim.y0, sim.region0)
    dt = jnp.asarray(1.0e5)
    coeffs = MethodCoeffs(c_lhs=jnp.asarray(1.0), dt_eff=dt, const=-lhs0)

    @jax.jit
    def assemble(y):
        r, L, fx, err, mat = system.residual_and_jacobian(
            y, sim.region0, sim.rock, coeffs, jnp.asarray(0.0), dt,
            tangent_dtype=jnp.float32,
        )
        return r, mat.data.reshape(-1)

    r0, data_flat = assemble(sim.y0)
    data_flat.block_until_ready()
    nrows = system.structure.num_rows
    print(f"cells={n} npv={npv} nnzb={system.structure.indices.shape[0]}")

    def _mat():
        return bsr_mod.BSRMatrix(
            structure=system.structure,
            data=data_flat.reshape(-1, npv, npv),
        )

    b_rhs = (-r0).astype(jnp.float32)

    # 1. matvec alone -------------------------------------------------
    def make_mv_chain(k):
        @jax.jit
        def run(flat):
            mat = bsr_mod.BSRMatrix(
                structure=system.structure,
                data=flat.reshape(-1, npv, npv),
            )
            mv = system.make_matvec(mat, jnp.float32)
            x0 = jnp.full((nrows, npv), 1e-3, jnp.float32)

            def body(i, x):
                y = mv(x)
                return y * jnp.float32(0.999)

            return lax.fori_loop(0, k, body, x0)

        return lambda: run(data_flat)

    t_mv = time_fori(make_mv_chain)
    print(f"matvec alone:        {t_mv*1e3:8.3f} ms/it")

    # 2. bjacobi apply alone ------------------------------------------
    def make_pc_chain(k):
        @jax.jit
        def run(flat):
            mat = bsr_mod.BSRMatrix(
                structure=system.structure,
                data=flat.reshape(-1, npv, npv),
            )
            m64 = ops_dia.to_dia(mat, system.dia)
            dinv = invert_blocks(ops_dia.diag_band_blocks(m64))
            pc = ops_dia.dia_block_jacobi(dinv, jnp.float32)
            x0 = jnp.full((nrows, npv), 1e-3, jnp.float32)

            def body(i, x):
                return pc(x) * jnp.float32(0.999)

            return lax.fori_loop(0, k, body, x0)

        return lambda: run(data_flat)

    t_pc = time_fori(make_pc_chain)
    print(f"bjacobi alone:       {t_pc*1e3:8.3f} ms/it")

    # 3. dots alone ---------------------------------------------------
    def make_dot_chain(k):
        @jax.jit
        def run():
            x0 = jnp.full((nrows, npv), 1e-3, jnp.float32)
            y0 = jnp.full((nrows, npv), 2e-3, jnp.float32)

            def body(i, carry):
                x, y = carry
                d1 = jnp.vdot(x, y)
                d2 = jnp.vdot(x, x)
                d3 = jnp.vdot(y, y)
                d4 = jnp.vdot(x, y)
                d5 = jnp.vdot(x, x)
                d6 = jnp.vdot(y, y)
                s = d1 + d2 + d3 + d4 + d5 + d6
                return (x * (1.0 + 1e-12 * s), y)

            return lax.fori_loop(0, k, body, (x0, y0))[0]

        return run

    t_dot = time_fori(make_dot_chain)
    print(f"6 dots alone:        {t_dot*1e3:8.3f} ms/it")

    # 4. full bicgstab body via fori (no early exit) ------------------
    from waiwera_tpu.solver import krylov

    def make_body_chain(k):
        @jax.jit
        def run(flat, b):
            mat = bsr_mod.BSRMatrix(
                structure=system.structure,
                data=flat.reshape(-1, npv, npv),
            )
            mv, pc = system.make_linear_operator(
                mat, "bjacobi", dtype=jnp.float32
            )
            tiny = float(jnp.finfo(b.dtype).tiny)

            def _dot(a, b_):
                return jnp.vdot(a, b_)

            x = jnp.zeros_like(b)
            r = b - mv(x)
            r0v = r
            rho = _dot(r0v, r)
            p = r

            def body(i, st):
                x, r, p, rho = st
                phat = pc(p)
                v = mv(phat)
                denom = _dot(r0v, v)
                alpha = rho / jnp.where(denom != 0, denom, tiny)
                s = r - alpha * v
                shat = pc(s)
                t = mv(shat)
                tt = _dot(t, t)
                omega = _dot(t, s) / jnp.where(tt != 0, tt, tiny)
                x = x + alpha * phat + omega * shat
                r_new = s - omega * t
                rho_new = _dot(r0v, r_new)
                beta = (rho_new / jnp.where(rho != 0, rho, tiny)) * (
                    alpha / jnp.where(omega != 0, omega, tiny)
                )
                p_new = r_new + beta * (p - omega * v)
                return (x, r_new, p_new, rho_new)

            st = lax.fori_loop(0, k, body, (x, r, p, rho))
            return st[0]

        return lambda: run(data_flat, b_rhs)

    t_body = time_fori(make_body_chain)
    print(f"bicgstab body fori:  {t_body*1e3:8.3f} ms/it")

    # 5. production while_loop path -----------------------------------
    def make_while_chain(maxit):
        @jax.jit
        def run(flat, b):
            mat = bsr_mod.BSRMatrix(
                structure=system.structure,
                data=flat.reshape(-1, npv, npv),
            )
            mv, pc = system.make_linear_operator(
                mat, "bjacobi", dtype=jnp.float32
            )
            res = krylov.solve(
                "bcgs", mv, b, precond=pc, rtol=1e-30,
                max_iterations=maxit,
            )
            return res.x

        return lambda: run(data_flat, b_rhs)

    t_while = time_fori(make_while_chain)
    print(f"bicgstab while_loop: {t_while*1e3:8.3f} ms/it")

    print(
        f"\ncomponents 2mv+2pc+dots = "
        f"{(2*t_mv + 2*t_pc + t_dot)*1e3:.3f} ms/it"
    )


if __name__ == "__main__":
    main()
