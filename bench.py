"""Benchmark: full nonlinear timestep throughput at production scale.

Flagship model (BASELINE.md north star): a 3D water+CO2+energy
(eos_wge, 3 unknowns/cell) box reservoir — default 512k cells / 1.57M
unknowns — with an atmosphere-pressure boundary on the top surface,
a deliverability production well and a cold reinjection well. One
implicit timestep = residuals + AD block-Jacobian + BiCGStab Krylov
solves + phase-transition passes, all on the attached accelerator.

Reported alongside the headline dof/s (extra keys in the same JSON
line):
- spmv_nnz_per_s + spmv_roofline_fraction: the assembled Jacobian's
  DIA/Pallas SpMV rate vs the memory-bandwidth speed of light, where
  the light speed is MEASURED on the same device with a streaming
  triad (bytes = matrix bands + x read + y write).
- assembly_seconds / linear_seconds: one residual+Jacobian evaluation
  vs one full linear solve (where the reference says the time goes,
  doc/user/methods.rst:176).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: BASELINE.json has no published numbers (the reference
publishes none); vs_baseline is measured against the previous recorded
value in bench_history.json when present, else 1.0.
"""

import json
import os
import time

import numpy as np


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


def measure_bandwidth(reps=10):
    """Measured streaming-triad bandwidth (bytes/s) on the device —
    the memory speed-of-light reference for the SpMV roofline."""
    import jax
    import jax.numpy as jnp

    n = 32 * 1024 * 1024  # 128 MB per f32 array
    a = jnp.ones(n, jnp.float32)
    b = jnp.full(n, 2.0, jnp.float32)

    @jax.jit
    def triad(a, b):
        return a + 1.5 * b

    triad(a, b).block_until_ready()
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        triad(a, b).block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, 3.0 * 4.0 * n / dt)
    return best


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
            args = (
                sim.y0, sim.region0, fluid0.temperature, lhs0, lhs0,
                jnp.asarray(0.0), dt, dt, jnp.asarray(1.0),
            )
            res, fluid, lhs_new, fluxes = step(*args)  # compile+warmup
            res.y.block_until_ready()
            break
        except Exception as e:  # OOM etc: drop a size
            print(f"# bench size {nx}x{ny}x{nz} failed: {e!r}", flush=True)
            sim = None
    if sim is None:
        raise SystemExit("no bench size fits the device")
    iterations = int(res.iterations)

    reps = int(os.environ.get("BENCH_REPS", 5))
    t0 = time.perf_counter()
    for _ in range(reps):
        res, fluid, lhs_new, fluxes = step(*args)
        res.y.block_until_ready()
    step_seconds = (time.perf_counter() - t0) / reps
    dof_per_s = n * npv / step_seconds

    # ---- assembly / linear-solve split -------------------------------
    system = sim.system
    coeffs = MethodCoeffs(c_lhs=jnp.asarray(1.0), dt_eff=dt, const=-lhs0)

    @jax.jit
    def assemble(y):
        r, L, fx, err, mat = system.residual_and_jacobian(
            y, sim.region0, sim.rock, coeffs, jnp.asarray(0.0), dt,
            tangent_dtype=(
                jnp.float32 if jacobian_dtype.startswith("f") and
                "32" in jacobian_dtype else None
            ),
        )
        return r, mat.data

    r0, _ = assemble(sim.y0)
    r0.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        r, data = assemble(sim.y0)
        data.block_until_ready()
    assembly_seconds = (time.perf_counter() - t0) / reps

    _, _, _, _, mat = system.residual_and_jacobian(
        sim.y0, sim.region0, sim.rock, coeffs, jnp.asarray(0.0), dt
    )
    ldtype = jnp.float32 if "32" in linear_dtype else None
    mv, pc = system.make_linear_operator(mat, linear_pc, dtype=ldtype)
    b_rhs = -r0.astype(ldtype or r0.dtype)

    @jax.jit
    def linsolve(b):
        return krylov.solve("bcgs", mv, b, precond=pc, rtol=1e-5)

    lr = linsolve(b_rhs)
    lr.x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        lr = linsolve(b_rhs)
        lr.x.block_until_ready()
    linear_seconds = (time.perf_counter() - t0) / reps
    linear_its = int(lr.iterations)

    # ---- SpMV roofline ------------------------------------------------
    # nnz of the block Jacobian (diag + 2 blocks/interior face)
    nnzb = int(system.structure.indices.shape[0])
    nnz = nnzb * npv * npv
    mv32 = system.make_matvec(mat, jnp.float32)
    x = jnp.ones((mat.structure.num_rows, npv), jnp.float32)

    @jax.jit
    def spmv(x):
        return mv32(x)

    y = spmv(x)
    y.block_until_ready()
    sp_reps = 50
    t0 = time.perf_counter()
    for _ in range(sp_reps):
        y = spmv(y / jnp.float32(2.0))
        y.block_until_ready()
    spmv_seconds = (time.perf_counter() - t0) / sp_reps
    nnz_per_s = nnz / spmv_seconds
    # bytes at speed of light: band data + one x read + one y write
    spmv_bytes = 4.0 * (nnz + 2 * mat.structure.num_rows * npv)
    bw = measure_bandwidth()
    roofline = (spmv_bytes / spmv_seconds) / bw if bw else 0.0

    hist_file = os.path.join(os.path.dirname(__file__),
                             "bench_history.json")
    baseline = None
    if os.path.exists(hist_file):
        try:
            baseline = json.load(open(hist_file)).get("dof_step_per_s")
        except Exception:
            baseline = None
    vs = dof_per_s / baseline if baseline else 1.0
    try:
        json.dump({"dof_step_per_s": dof_per_s,
                   "cells": n, "newton_iterations": iterations,
                   "step_seconds": step_seconds},
                  open(hist_file, "w"))
    except Exception:
        pass

    print(json.dumps({
        "metric": "implicit_timestep_dof_per_s",
        "value": dof_per_s,
        "unit": "dof/s",
        "vs_baseline": vs,
        "cells": n,
        "unknowns": n * npv,
        "eos": "wge",
        "newton_iterations": iterations,
        "step_seconds": step_seconds,
        "assembly_seconds": assembly_seconds,
        "linear_solve_seconds": linear_seconds,
        "linear_iterations": linear_its,
        "spmv_nnz_per_s": nnz_per_s,
        "spmv_roofline_fraction": roofline,
        "measured_bandwidth_gb_s": bw / 1e9,
    }))


if __name__ == "__main__":
    main()
