"""End-to-end simulation tests: the minimum slice of SURVEY.md section 7
build stage 5 — JSON -> mesh -> EOS -> assembly -> Newton -> Krylov ->
timestepper, validated against physics (hydrostatic equilibrium,
conduction steady states, mass/energy conservation).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from waiwera_tpu.mesh.rect import column_mesh
from waiwera_tpu.sim.simulation import Simulation
from waiwera_tpu.sim.timestepper import Timestepper
from waiwera_tpu.thermo import iapws97


def test_gravity_column_eos_w():
    """Isothermal water column reaches hydrostatic equilibrium:
    dP/dz = -rho g."""
    nz = 20
    dz = 10.0
    mesh = column_mesh([dz] * nz)
    config = {
        "eos": {"name": "w", "temperature": 20.0},
        "initial": {"primary": [1.0e5], "region": 1},
        "boundaries": [
            {
                "primary": [1.0e5],
                "region": 1,
                "faces": {"cells": [0], "normal": [0.0, 1.0]},
            }
        ],
        "time": {
            "start": 0.0,
            "stop": 1.0e9,
            "step": {
                "size": 1.0e4,
                "adapt": {"on": True, "method": "iteration"},
                "maximum": {"number": 200},
            },
        },
    }
    sim = Simulation(config, mesh=mesh)
    ts = Timestepper(config, sim)
    ok = ts.run()
    assert ok
    p = np.asarray(ts.final_fluid.pressure)[:nz]
    z = mesh.cell_centroid[:nz, 1]
    rho, _, _ = iapws97.region1_properties(p, np.full(nz, 20.0))
    rho = np.asarray(rho)
    # hydrostatic: dP/dz ~ -rho*g between adjacent cells
    dpdz = np.diff(p) / np.diff(z)
    rho_mid = 0.5 * (rho[1:] + rho[:-1])
    np.testing.assert_allclose(dpdz, rho_mid * (-9.8), rtol=1e-3)
    # top cell pressure anchored near boundary + half-cell of water
    assert abs(p[0] - (1.0e5 + rho[0] * 9.8 * dz / 2)) < 500.0


def test_heat_conduction_column_eos_we():
    """Pure conduction (zero permeability) between fixed-temperature
    boundaries reaches the linear steady profile."""
    nz = 10
    dz = 10.0
    mesh = column_mesh([dz] * nz)
    t_top, t_bottom = 30.0, 90.0
    p0 = 10.0e6  # high pressure: keep single-phase liquid
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [p0, 60.0], "region": 1},
        "rock": {
            "types": [
                {
                    "name": "rock",
                    "cells": list(range(nz)),
                    "permeability": [1e-30, 1e-30],
                    "porosity": 0.01,
                    "wet_conductivity": 2.0,
                    "dry_conductivity": 2.0,
                }
            ]
        },
        "boundaries": [
            {
                "primary": [p0, t_top],
                "region": 1,
                "faces": {"cells": [0], "normal": [0.0, 1.0]},
            },
            {
                "primary": [p0, t_bottom],
                "region": 1,
                "faces": {"cells": [nz - 1], "normal": [0.0, -1.0]},
            },
        ],
        "gravity": [0.0, 0.0],
        "time": {
            "start": 0.0,
            "stop": 1.0e12,
            "step": {
                "size": 1.0e6,
                "adapt": {"on": True, "method": "iteration"},
                "maximum": {"number": 300, "size": 1.0e11},
            },
        },
    }
    sim = Simulation(config, mesh=mesh)
    ts = Timestepper(config, sim)
    ok = ts.run()
    assert ok
    t = np.asarray(ts.final_fluid.temperature)[:nz]
    # steady linear profile through cell centres
    expected = t_top + (t_bottom - t_top) * (np.arange(nz) + 0.5) / nz
    np.testing.assert_allclose(t, expected, atol=0.05)


def test_mass_conservation_closed_box():
    """Injection into a closed isothermal box: total water mass grows
    by exactly rate * time."""
    nz = 4
    mesh = column_mesh([5.0] * nz)
    rate = 0.005  # kg/s (small enough to stay within liquid bounds)
    config = {
        "eos": {"name": "w"},
        "initial": {"primary": [1.0e6], "region": 1},
        "gravity": [0.0, 0.0],
        "source": [{"cell": 1, "rate": rate}],
        "time": {
            "start": 0.0,
            "stop": 2000.0,
            "step": {"size": 100.0, "maximum": {"number": 50}},
        },
    }
    sim = Simulation(config, mesh=mesh)
    fluid0, _ = sim.initial_fluid()
    lhs0, _, _ = sim.lhs_at(sim.y0, sim.region0)
    vol = mesh.cell_volume[:nz]
    mass0 = float(np.sum(np.asarray(lhs0)[:nz, 0] * vol))
    ts = Timestepper(config, sim)
    ok = ts.run()
    assert ok
    assert ts.final_time == 2000.0
    lhs1, _, _ = sim.lhs_at(ts.final_y, ts.final_region)
    mass1 = float(np.sum(np.asarray(lhs1)[:nz, 0] * vol))
    np.testing.assert_allclose(
        mass1 - mass0, rate * 2000.0, rtol=2e-3
    )


def test_two_phase_boiling_cell():
    """Producing from a single hot liquid cell depressurises it across
    the saturation line: the 1 -> 4 transition fires and the state
    lands on the saturation curve (like the reference's boiling column
    benchmarks)."""
    mesh = column_mesh([10.0])
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [10.0e5, 175.0], "region": 1},
        "gravity": [0.0, 0.0],
        "rock": {
            "types": [
                {
                    "name": "r",
                    "cells": [0],
                    "porosity": 0.1,
                }
            ]
        },
        "source": [{"cell": 0, "rate": -0.05}],
        "time": {
            "start": 0.0,
            "stop": 4.0e3,
            "step": {
                "size": 1.0e2,
                "adapt": {"on": True},
                "maximum": {"number": 100, "tries": 10},
            },
        },
    }
    sim = Simulation(config, mesh=mesh)
    ts = Timestepper(config, sim)
    ok = ts.run()
    assert ok
    region = int(np.asarray(ts.final_region)[0])
    assert region == 4  # boiling
    p = float(np.asarray(ts.final_fluid.pressure)[0])
    t = float(np.asarray(ts.final_fluid.temperature)[0])
    psat, _ = iapws97.saturation_pressure(t)
    np.testing.assert_allclose(p, float(psat), rtol=1e-9)
    sv = float(np.asarray(ts.final_fluid.saturation)[0, 1])
    assert 0.0 < sv < 1.0
