"""Per-iteration Krylov cost on the flagship operator: matvec-only,
pc-only, mv+pc chains at two depths (slope = per-apply), and real
bcgs solves at two max_iterations (slope = per-iteration)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def _force(x):
    return float(np.asarray(x).reshape(-1)[0])


def timeit(f, *a, reps=5):
    _force(f(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    nx = int(os.environ.get("BENCH_NX", 128))
    ny = int(os.environ.get("BENCH_NY", 64))
    nz = int(os.environ.get("BENCH_NZ", 64))
    from bench import build_sim
    from waiwera_tpu.solver.system import MethodCoeffs
    from waiwera_tpu.solver import krylov

    sim, n = build_sim(nx, ny, nz)
    npv = sim.eos.num_primary_variables
    system = sim.system
    lhs0, fluid0, _ = sim.lhs_at(sim.y0, sim.region0)
    dt = jnp.asarray(1.0e5)
    coeffs = MethodCoeffs(c_lhs=jnp.asarray(1.0), dt_eff=dt,
                          const=-lhs0)
    t0 = jnp.asarray(0.0)

    parts = jax.jit(lambda y: system.jacobian_parts(
        y, sim.region0, sim.rock, coeffs, t0, dt,
        tangent_dtype=jnp.float32))(sim.y0)
    parts = jax.block_until_ready(parts)

    r0 = jax.jit(lambda y: system.residual(
        y, sim.region0, sim.rock, coeffs, t0, dt)[0]
    )(sim.y0).astype(jnp.float32)
    r0 = jax.block_until_ready(r0)

    nbytes = sum(int(np.prod(p.shape)) * 4 for p in parts)
    print(f"cells={n} dofs={n*npv} parts_bytes={nbytes/1e6:.0f} MB")

    def chain(which, k):
        @jax.jit
        def run(parts, v0):
            mv, pc = system.linear_operator_from_parts(
                parts, "bjacobi", dtype=jnp.float32
            )

            def body(i, x):
                if which == "mv":
                    return mv(x)
                if which == "pc":
                    return pc(x)
                return mv(pc(x))

            v = jax.lax.fori_loop(0, k, body, v0)
            return jnp.sum(v[:1])

        return run

    v0 = r0 * 1e-3
    for which in ("mv", "pc", "mvpc"):
        t1 = timeit(chain(which, 8), parts, v0)
        t2 = timeit(chain(which, 40), parts, v0)
        per = (t2 - t1) / 32.0
        print(f"{which:5s} per apply: {per*1e6:8.1f} us "
              f"(8: {t1*1e3:.1f} ms, 40: {t2*1e3:.1f} ms)")

    # real bcgs at fixed iteration counts (rtol tiny so it never
    # converges; slope = true per-iteration cost)
    def solve_k(k):
        @jax.jit
        def run(parts, b):
            mv, pc = system.linear_operator_from_parts(
                parts, "bjacobi", dtype=jnp.float32
            )
            res = krylov.bicgstab(
                mv, b, precond=pc, rtol=1e-30, max_iterations=k
            )
            return jnp.sum(res.x[:1]) + res.iterations.astype(jnp.float32)

        return run

    t1 = timeit(solve_k(10), parts, r0)
    t2 = timeit(solve_k(60), parts, r0)
    per = (t2 - t1) / 50.0
    print(f"bcgs per iteration: {per*1e6:8.1f} us "
          f"(10: {t1*1e3:.1f} ms, 60: {t2*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
