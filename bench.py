"""Benchmark: full nonlinear timestep throughput on the flagship model.

Runs a 3D two-phase water+energy (eos_we) box model and measures the
wall-clock of complete implicit timesteps (residuals, AD block-Jacobian
assembly, BiCGStab+block-Jacobi solves, phase-transition passes) on the
attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json has no published numbers (the reference
publishes none); vs_baseline is measured against the previous recorded
value in bench_history.json when present, else 1.0.
"""

import json
import os
import time

import numpy as np


def build_sim(nx=32, ny=32, nz=16):
    import jax

    jax.config.update("jax_enable_x64", True)
    from waiwera_tpu.mesh.rect import rectangular_mesh
    from waiwera_tpu.sim.simulation import Simulation

    mesh = rectangular_mesh(
        [50.0] * nx, [50.0] * ny, [20.0] * nz, origin=[0, 0, -320.0]
    )
    n = nx * ny * nz
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [5.0e6, 220.0], "region": 1},
        "rock": {
            "types": [
                {
                    "name": "res",
                    "cells": list(range(n)),
                    "permeability": [5e-14, 5e-14, 2e-14],
                    "porosity": 0.1,
                }
            ]
        },
        "source": [
            {"cell": n - nx * ny + nx * (ny // 2) + nx // 2,
             "rate": -20.0},
            {"cell": nx * (ny // 2) + nx // 4, "rate": 10.0,
             "enthalpy": 1.2e6},
        ],
        "time": {"step": {"size": 1.0e5}},
    }
    return Simulation(config, mesh=mesh), n


def main():
    import jax
    import jax.numpy as jnp

    from waiwera_tpu.solver.newton import NewtonParams

    nx = int(os.environ.get("BENCH_NX", 32))
    ny = int(os.environ.get("BENCH_NY", 32))
    nz = int(os.environ.get("BENCH_NZ", 16))
    sim, n = build_sim(nx, ny, nz)
    npv = sim.eos.num_primary_variables
    # inner Krylov precision: f32 is TPU-native (f64 is software
    # -emulated); Newton residual/Jacobian/convergence stay f64
    linear_dtype = os.environ.get("BENCH_LINEAR_DTYPE", "float32")
    # bjacobi beats DILU on TPU at these sizes: DILU's triangular
    # sweeps cost ~6 band-applies per iteration and the iteration
    # -count reduction does not pay for them on the VPU
    linear_pc = os.environ.get("BENCH_PC", "bjacobi")
    jacobian_dtype = os.environ.get("BENCH_JAC_DTYPE", "float32")
    params = NewtonParams(
        max_iterations=8,
        min_iterations=1,
        linear_dtype=linear_dtype,
        linear_pc=linear_pc,
        jacobian_dtype=jacobian_dtype,
    )
    step = sim.make_step_fn(params, "beuler")
    lhs0, fluid0, _ = sim.lhs_at(sim.y0, sim.region0)

    dt = jnp.asarray(1.0e5)
    args = (
        sim.y0,
        sim.region0,
        fluid0.temperature,
        lhs0,
        lhs0,
        jnp.asarray(0.0),
        dt,
        dt,
        jnp.asarray(1.0),
    )
    # warmup / compile
    res, fluid, lhs_new, fluxes = step(*args)
    res.y.block_until_ready()
    iterations = int(res.iterations)

    reps = int(os.environ.get("BENCH_REPS", 5))
    t0 = time.time()
    for _ in range(reps):
        res, fluid, lhs_new, fluxes = step(*args)
        res.y.block_until_ready()
    elapsed = (time.time() - t0) / reps

    dof_per_s = n * npv / elapsed

    hist_file = os.path.join(os.path.dirname(__file__), "bench_history.json")
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
                   "step_seconds": elapsed},
                  open(hist_file, "w"))
    except Exception:
        pass

    print(json.dumps({
        "metric": "implicit_timestep_dof_per_s",
        "value": dof_per_s,
        "unit": "dof/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
