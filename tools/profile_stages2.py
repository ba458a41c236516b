"""Fine-grained stage timings for the flagship step: transitions,
jacobian-parts alone, matvec / PC apply on pre-packed bands, and the
Newton loop with the Krylov iteration count capped — to account for
every millisecond of the 1.1 s step.
"""

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


def timeit(f, reps=5):
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
    from waiwera_tpu.solver.newton import NewtonParams, newton_solve
    from waiwera_tpu.solver.system import MethodCoeffs

    sim, n = build_sim(nx, ny, nz)
    npv = sim.eos.num_primary_variables
    system = sim.system
    eos = sim.eos
    print(f"cells={n} dofs={n * npv}")
    lhs0, fluid0, _ = sim.lhs_at(sim.y0, sim.region0)
    dt = jnp.asarray(1.0e5)
    coeffs = MethodCoeffs(c_lhs=jnp.asarray(1.0), dt_eff=dt,
                          const=-lhs0)
    t0 = jnp.asarray(0.0)
    t1 = dt

    # transitions + bounds + scale (the fluid_trans block of the loop)
    @jax.jit
    def trans(y):
        old_primary = eos.unscale(y, sim.region0)
        primary_raw = eos.unscale(y * 1.0001, sim.region0)
        new_primary, new_region, _, terr = eos.transition(
            old_primary, primary_raw, sim.region0, fluid0.temperature
        )
        new_primary, berr = eos.check_primary_variables(
            new_primary, new_region
        )
        y_new = eos.scale(new_primary, new_region)
        return jnp.sum(y_new[:1]) + jnp.sum(terr[:1]) + jnp.sum(berr[:1])

    print(f"transitions+bounds:  {timeit(lambda: trans(sim.y0))*1e3:9.1f} ms")

    # derived_state + lhs + rhs (the f64 post-linesearch residual chain)
    @jax.jit
    def dsr(y):
        fluid, cond_, perr = system.derived_state(y, sim.region0, sim.rock)
        L = system.lhs(fluid, sim.rock)
        R, fx = system.rhs(fluid, cond_, sim.rock, t0, t1)
        r = coeffs.c_lhs * L + coeffs.const - coeffs.dt_eff * R
        return jnp.sum(r[:1]) + jnp.sum(fx[:1])

    print(f"derived+lhs+rhs f64: {timeit(lambda: dsr(sim.y0))*1e3:9.1f} ms")

    # jacobian parts alone (f32 tangents), no residual
    @jax.jit
    def jac(y):
        parts = system.jacobian_parts(
            y, sim.region0, sim.rock, coeffs, t0, t1,
            tangent_dtype=jnp.float32,
        )
        return jnp.sum(parts[0][:1])

    print(f"jac parts f32:       {timeit(lambda: jac(sim.y0))*1e3:9.1f} ms")

    # pack + matvec/pc on fixed parts: measure apply costs alone
    parts_c = jax.jit(lambda y: system.jacobian_parts(
        y, sim.region0, sim.rock, coeffs, t0, t1,
        tangent_dtype=jnp.float32))(sim.y0)
    parts_c = jax.tree.map(lambda a: jax.device_put(a), parts_c)

    @jax.jit
    def pack_only(parts):
        mv, pc = system.linear_operator_from_parts(
            parts, "bjacobi", dtype=jnp.float32
        )
        v = jnp.ones((system.structure.num_rows, npv), jnp.float32)
        return jnp.sum(pc(v)[:1])

    print(f"pack+1 pc apply:     {timeit(lambda: pack_only(parts_c))*1e3:9.1f} ms")

    def chain(k):
        @jax.jit
        def run(parts):
            mv, pc = system.linear_operator_from_parts(
                parts, "bjacobi", dtype=jnp.float32
            )
            v = jnp.ones((system.structure.num_rows, npv), jnp.float32)

            def body(i, x):
                return mv(pc(x)) * 0.999

            v = jax.lax.fori_loop(0, k, body, v)
            return jnp.sum(v[:1])

        return run

    r10 = timeit(lambda: chain(10)(parts_c))
    r60 = timeit(lambda: chain(60)(parts_c))
    per_apply = (r60 - r10) / 50.0
    print(f"mv+pc per apply:     {per_apply*1e6:9.1f} us")

    # Newton with capped Krylov its: everything except most of the solve
    params_cap = NewtonParams(
        max_iterations=2, min_iterations=2,
        linear_dtype="float32", linear_pc="bjacobi",
        jacobian_dtype="float32", linear_max_iterations=1,
    )

    @jax.jit
    def newton_capped(y):
        res = newton_solve(
            system, y, sim.region0, fluid0.temperature, sim.rock,
            coeffs, t0, t1, lhs_scale=lhs0, params=params_cap,
        )
        return jnp.sum(res.y[:1]) + res.linear_iterations.astype(jnp.float64)

    tcap = timeit(lambda: newton_capped(sim.y0))
    print(f"newton 2it, krylov<=1: {tcap*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
