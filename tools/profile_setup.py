"""Split the linear solve into setup (band pack + factorisation) vs
per-iteration cost at flagship size, by slope between two maxit values.

Also times the packing pieces (to_dia f64, to_dia_pallas f32,
invert_blocks) standalone, and one assemble without shipping the
Jacobian across the jit boundary.
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


def timeit(f, reps=3):
    _force(f())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(f())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    nx = int(os.environ.get("BENCH_NX", 128))
    ny = int(os.environ.get("BENCH_NY", 64))
    nz = int(os.environ.get("BENCH_NZ", 64))
    from bench import build_sim
    from waiwera_tpu.solver.system import MethodCoeffs
    from waiwera_tpu.solver import bsr as bsr_mod
    from waiwera_tpu.solver import krylov
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
    print(f"cells={n} npv={npv} nnzb={system.structure.indices.shape[0]}")

    # assemble, consuming the result on device (scalar out)
    @jax.jit
    def assemble_sum(y):
        r, data = (lambda rr, dd: (rr, dd))(*assemble(y))
        return jnp.sum(data[:128]) + jnp.sum(r[:1])

    t = timeit(lambda: assemble_sum(sim.y0))
    print(f"assemble (scalar out):      {t*1e3:9.1f} ms")

    def _mat(flat, dtype):
        return bsr_mod.BSRMatrix(
            structure=system.structure,
            data=flat.reshape(-1, npv, npv).astype(dtype),
        )

    # packing pieces
    @jax.jit
    def pack64(flat):
        m64 = ops_dia.to_dia(_mat(flat, jnp.float64), system.dia)
        return m64.bands.reshape(-1)[:1]

    t = timeit(lambda: pack64(data_flat))
    print(f"to_dia f64 pack:            {t*1e3:9.1f} ms")

    @jax.jit
    def pack32(flat):
        mp = ops_dia.to_dia_pallas(
            _mat(flat, jnp.float32), system.dia, jnp.float32
        )
        return mp.bands8.reshape(-1)[:1]

    t = timeit(lambda: pack32(data_flat))
    print(f"to_dia_pallas f32 pack:     {t*1e3:9.1f} ms")

    @jax.jit
    def factor(flat):
        m64 = ops_dia.to_dia(_mat(flat, jnp.float64), system.dia)
        dinv = invert_blocks(ops_dia.diag_band_blocks(m64))
        return dinv.reshape(-1)[:1]

    t = timeit(lambda: factor(data_flat))
    print(f"pack64 + invert_blocks f64: {t*1e3:9.1f} ms")

    b_rhs = (-r0).astype(jnp.float32)

    def make_solver(maxit):
        @jax.jit
        def run(flat, b):
            mat = _mat(flat, jnp.float64)
            mv, pc = system.make_linear_operator(
                mat, "bjacobi", dtype=jnp.float32
            )
            res = krylov.solve(
                "bcgs", mv, b, precond=pc, rtol=1e-30,
                max_iterations=maxit,
            )
            return res.x

        return lambda: run(data_flat, b_rhs)

    t5 = timeit(make_solver(5))
    t55 = timeit(make_solver(55))
    per = (t55 - t5) / 50
    setup = t5 - 5 * per
    print(f"solve maxit=5:              {t5*1e3:9.1f} ms")
    print(f"solve maxit=55:             {t55*1e3:9.1f} ms")
    print(f"per-iteration (slope):      {per*1e3:9.3f} ms")
    print(f"per-solve setup:            {setup*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
