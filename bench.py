"""Benchmark: full nonlinear timestep throughput at production scale.

Flagship model (BASELINE.md north star): a 3D water+CO2+energy
(eos_wge, 3 unknowns/cell) box reservoir — default 512k cells / 1.57M
unknowns — with an atmosphere-pressure boundary on the top surface,
a deliverability production well and a cold reinjection well. One
implicit timestep = residuals + AD block-Jacobian + BiCGStab Krylov
solves + phase-transition passes, all on the attached accelerator.

Timing methodology: on tunneled/async backends `block_until_ready` may
ack before the device finishes, so every measured region is forced by a
real data dependency — each launch consumes a scalar derived from the
previous launch's output, and the region ends with a host transfer.
Sub-millisecond ops (SpMV, triad) are chained inside one jit via
lax.fori_loop and measured by the slope between two chain lengths,
which also cancels the host round-trip latency.

Reported alongside the headline dof/s (extra keys in the same JSON
line):
- spmv_nnz_per_s + spmv_roofline_fraction: the assembled Jacobian's
  DIA/Pallas SpMV rate vs the memory-bandwidth speed of light, where
  the light speed is MEASURED on the same device with a streaming
  triad (bytes = matrix bands + x read + y write).
- assembly_seconds / linear_seconds: one residual+Jacobian evaluation
  vs one full linear solve (where the reference says the time goes,
  doc/user/methods.rst:176).
- spmv_path: which SpMV implementation the flagship solve used
  (pallas-dia / jnp-dia / ell).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The headline keys are computed first; every extra section is
best-effort (a failure there annotates the JSON instead of losing the
headline). Baseline: BASELINE.json has no published numbers (the
reference publishes none); vs_baseline is measured against the
previous recorded value in bench_history.json when present, else 1.0.
"""

import json
import os
import time

import numpy as np


def _is_oom(e: Exception) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(
        k in s
        for k in (
            "RESOURCE_EXHAUSTED",
            "Out of memory",
            "out of memory",
            "OOM",
            "Resource exhausted",
        )
    )


def _dep_scalar(x):
    """A tiny eager program depending on x: forces ordering on any
    backend when added (times 0) to the next launch's input."""
    return x.reshape(-1)[0] * 0.0


def _force(x) -> float:
    """Host transfer: completes every program x depends on."""
    return float(np.asarray(x.reshape(-1)[0]))


def time_chained(launch, reps, warmed_out):
    """seconds/launch for a python-level launch loop.

    launch(dep) -> output array; each launch's input is perturbed by
    +0.0*dep (a scalar from the previous output), building a real
    dependency chain; the region ends with a host pull. One extra
    round-trip (~tens of ms over a tunnel) is amortised over reps.
    """
    best = float("inf")
    for _ in range(2):
        dep = _dep_scalar(warmed_out)
        t0 = time.perf_counter()
        out = warmed_out
        for _ in range(reps):
            out = launch(dep)
            dep = _dep_scalar(out)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def time_fori(make_chain, k1=5, k2=55):
    """seconds/iteration for a jitted fori_loop chain; slope between
    two chain lengths cancels fixed costs and the host round-trip."""
    ts = {}
    for k in (k1, k2):
        f = make_chain(k)
        _force(f())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _force(f())
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return max((ts[k2] - ts[k1]) / (k2 - k1), 1e-12)


def build_sim(nx, ny, nz):
    import jax

    jax.config.update("jax_enable_x64", True)
    from waiwera_tpu.mesh.rect import rectangular_mesh
    from waiwera_tpu.sim.simulation import Simulation

    mesh = rectangular_mesh(
        [50.0] * nx, [50.0] * ny, [20.0] * nz, origin=[0, 0, -20.0 * nz]
    )
    n = nx * ny * nz
    top0 = n - nx * ny  # first cell of the top layer
    config = {
        "eos": {"name": "wge"},
        "initial": {"primary": [5.0e6, 220.0, 1.0e5], "region": 1},
        "rock": {
            "types": [
                {
                    "name": "res",
                    "permeability": [5e-14, 5e-14, 2e-14],
                    "porosity": 0.1,
                }
            ]
        },
        "boundaries": [
            {
                "primary": [1.0e5, 20.0, 1.0e3],
                "region": 1,
                "faces": {
                    "cells": list(range(top0, n)),
                    "normal": [0.0, 0.0, 1.0],
                },
            }
        ],
        "source": [
            {
                "cell": top0 + nx * (ny // 2) + nx // 2,
                "deliverability": {"productivity": 1e-12,
                                   "pressure": 5.0e5},
                "direction": "production",
            },
            {"cell": nx * (ny // 2) + nx // 4, "rate": 20.0,
             "enthalpy": 500.0e3},
        ],
        "time": {"step": {"size": 1.0e5}},
    }
    return Simulation(config, mesh=mesh), n


def measure_bandwidth():
    """Measured streaming-triad bandwidth (bytes/s): the memory
    speed-of-light reference for the SpMV roofline."""
    import jax
    import jax.numpy as jnp

    n = 16 * 1024 * 1024  # 64 MB per f32 array
    b = jnp.full(n, 1e-9, jnp.float32)

    def make_chain(k):
        @jax.jit
        def run(c):
            a0 = jnp.ones(n, jnp.float32)

            def body(i, a):
                # multiply-accumulate recurrence a' = a*c + b with a
                # traced scalar c: unlike a' = a + const*b, repeated
                # applications have no reassociation to a closed form,
                # so XLA cannot fold the chain (which it did to a plain
                # triad, reporting 2e11 GB/s). Reads a, b; writes a.
                return a * c + b

            return jax.lax.fori_loop(0, k, body, a0)[:1]

        return lambda: run(jnp.float32(1.0 - 1e-7))

    per = time_fori(make_chain)
    return 3.0 * 4.0 * n / per


def main():
    import jax
    import jax.numpy as jnp

    from waiwera_tpu.solver.newton import NewtonParams
    from waiwera_tpu.solver import krylov
    from waiwera_tpu.solver.system import MethodCoeffs

    # flagship size with a fallback ladder so the driver always gets a
    # number even on a memory-constrained device
    sizes = [(128, 64, 64), (64, 64, 32), (32, 32, 16)]
    if "BENCH_NX" in os.environ:
        sizes = [(
            int(os.environ["BENCH_NX"]),
            int(os.environ.get("BENCH_NY", 32)),
            int(os.environ.get("BENCH_NZ", 16)),
        )]

    # inner Krylov precision: f32 is TPU-native (f64 is software
    # -emulated); Newton residual/convergence stay f64
    linear_dtype = os.environ.get("BENCH_LINEAR_DTYPE", "float32")
    linear_pc = os.environ.get("BENCH_PC", "bjacobi")
    jacobian_dtype = os.environ.get("BENCH_JAC_DTYPE", "float32")
    params = NewtonParams(
        max_iterations=8,
        min_iterations=1,
        linear_dtype=linear_dtype,
        linear_pc=linear_pc,
        jacobian_dtype=jacobian_dtype,
    )

    sim = None
    for nx, ny, nz in sizes:
        try:
            sim, n = build_sim(nx, ny, nz)
            npv = sim.eos.num_primary_variables
            step = sim.make_step_fn(params, "beuler")
            lhs0, fluid0, _ = sim.lhs_at(sim.y0, sim.region0)
            dt = jnp.asarray(1.0e5)

            def launch_step(dep, _step=step, _sim=sim, _f0=fluid0,
                            _lhs0=lhs0, _dt=dt):
                res, fluid, lhs_new, fluxes = _step(
                    _sim.y0 + dep, _sim.region0, _f0.temperature,
                    _lhs0, _lhs0, jnp.asarray(0.0), _dt, _dt,
                    jnp.asarray(1.0),
                )
                return res.y

            out = launch_step(jnp.asarray(0.0))
            _force(out)  # compile + run once, catches OOM
            res, _, _, _ = step(
                sim.y0, sim.region0, fluid0.temperature, lhs0, lhs0,
                jnp.asarray(0.0), dt, dt, jnp.asarray(1.0),
            )
            iterations = int(res.iterations)
            break
        except Exception as e:
            if not _is_oom(e):
                raise
            print(f"# bench size {nx}x{ny}x{nz} OOM: {e!r}", flush=True)
            sim = None
    if sim is None:
        raise SystemExit("no bench size fits the device")

    reps = int(os.environ.get("BENCH_REPS", 5))
    step_seconds = time_chained(launch_step, reps, out)
    dof_per_s = n * npv / step_seconds

    hist_file = os.path.join(os.path.dirname(__file__),
                             "bench_history.json")
    baseline = None
    if os.path.exists(hist_file):
        try:
            baseline = json.load(open(hist_file)).get("dof_step_per_s")
        except Exception:
            baseline = None
    vs = dof_per_s / baseline if baseline else 1.0

    # ---- headline exists from here; extras are best-effort -----------
    result = {
        "metric": "implicit_timestep_dof_per_s",
        "value": dof_per_s,
        "unit": "dof/s",
        "vs_baseline": vs,
        "cells": n,
        "unknowns": n * npv,
        "eos": "wge",
        "newton_iterations": iterations,
        "step_seconds": step_seconds,
    }

    # NOTE on jit boundaries: a [nnzb, b, b] block array must never
    # cross a jit boundary (input, output, or closure capture) — XLA
    # copies boundary arrays into tiled layouts, and T(4,128) tiling on
    # trailing (3, 3) dims pads 3->4 x 3->128 (a 57x expansion; 28 GB
    # for the flagship Jacobian, the round-2.5 OOM). Block data always
    # travels flat 1-D and is reshaped inside the traced program, where
    # fusion avoids materialising the padded form.
    from waiwera_tpu.solver import bsr as bsr_mod

    system = sim.system
    coeffs = MethodCoeffs(c_lhs=jnp.asarray(1.0), dt_eff=dt,
                          const=-lhs0)
    tangent = (
        jnp.float32
        if "32" in jacobian_dtype
        else None
    )

    def _mat_of(flat, dtype):
        return bsr_mod.BSRMatrix(
            structure=system.structure,
            data=flat.reshape(-1, npv, npv).astype(dtype),
        )

    try:
        @jax.jit
        def assemble(y):
            r, L, fx, err, mat = system.residual_and_jacobian(
                y, sim.region0, sim.rock, coeffs, jnp.asarray(0.0), dt,
                tangent_dtype=tangent,
            )
            return r, mat.data.reshape(-1)

        def launch_assemble(dep):
            r, data = assemble(sim.y0 + dep)
            return data

        a_out = launch_assemble(jnp.asarray(0.0))
        _force(a_out)
        result["assembly_seconds"] = time_chained(
            launch_assemble, reps, a_out
        )
    except Exception as e:
        result["assembly_error"] = repr(e)

    r0, data_flat = assemble(sim.y0)
    ldtype = jnp.float32 if "32" in linear_dtype else jnp.float64
    b_rhs = -r0.astype(ldtype)

    try:
        @jax.jit
        def linsolve(flat, b):
            mat = _mat_of(flat, jnp.float64)
            mv, pc = system.make_linear_operator(
                mat, linear_pc, dtype=ldtype
            )
            res = krylov.solve("bcgs", mv, b, precond=pc, rtol=1e-5)
            return res.x, res.iterations

        def launch_linsolve(dep):
            x, its = linsolve(data_flat, b_rhs + dep)
            return x

        l_out = launch_linsolve(jnp.asarray(0.0, b_rhs.dtype))
        _force(l_out)
        result["linear_solve_seconds"] = time_chained(
            launch_linsolve, reps, l_out
        )
        result["linear_iterations"] = int(
            linsolve(data_flat, b_rhs)[1]
        )
    except Exception as e:
        result["split_error"] = repr(e)

    # ---- SpMV roofline ------------------------------------------------
    try:
        from waiwera_tpu.ops import dia as ops_dia

        nnzb = int(system.structure.indices.shape[0])
        nnz = nnzb * npv * npv
        if system.dia is None:
            result["spmv_path"] = "ell"
        elif ops_dia._use_pallas(jnp.float32):
            result["spmv_path"] = "pallas-dia"
        else:
            result["spmv_path"] = "jnp-dia"

        # scale so chained applications neither overflow nor denormal
        # -underflow: measured matvec work is unchanged
        nrows = system.structure.num_rows

        def make_chain(k):
            @jax.jit
            def run(flat):
                mv32 = system.make_matvec(
                    _mat_of(flat, jnp.float32), jnp.float32
                )
                x0 = jnp.full((nrows, npv), 1.0, jnp.float32)

                def body(i, x):
                    y = mv32(x)
                    m = jnp.max(jnp.abs(y)) + jnp.float32(1e-30)
                    return y * (jnp.float32(1.0) / m)

                return jax.lax.fori_loop(0, k, body, x0)

            return lambda: run(data_flat)

        per = time_fori(make_chain)
        # subtract the normalisation cost (max + rescale: ~2 extra
        # passes over x) measured on its own
        def make_norm_chain(k):
            @jax.jit
            def run():
                x0 = jnp.full((nrows, npv), 1.0, jnp.float32)

                def body(i, x):
                    m = jnp.max(jnp.abs(x)) + jnp.float32(1e-30)
                    return x * (jnp.float32(1.0) / m)

                return jax.lax.fori_loop(0, k, body, x0)

            return run

        norm_per = time_fori(make_norm_chain)
        spmv_seconds = max(per - norm_per, 1e-12)
        result["spmv_nnz_per_s"] = nnz / spmv_seconds
        # bytes at speed of light: band data + one x read + one y write
        spmv_bytes = 4.0 * (nnz + 2 * nrows * npv)
        bw = measure_bandwidth()
        result["spmv_roofline_fraction"] = (
            (spmv_bytes / spmv_seconds) / bw if bw else 0.0
        )
        result["measured_bandwidth_gb_s"] = bw / 1e9
    except Exception as e:
        result["spmv_error"] = repr(e)

    try:
        json.dump({"dof_step_per_s": dof_per_s,
                   "cells": n, "newton_iterations": iterations,
                   "step_seconds": step_seconds},
                  open(hist_file, "w"))
    except Exception:
        pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
