"""Rock property controls: time-dependent permeability/porosity
tables on rock types (rock_control.F90, rock_setup.F90:304-324,
applied at pre-try-timestep, flow_simulation.F90:2040-2094)."""

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.mesh.rect import column_mesh
from waiwera_tpu.sim.simulation import Simulation
from waiwera_tpu.sim.timestepper import Timestepper


def _column_config(nz, rock_types):
    return {
        "eos": {"name": "w", "temperature": 20.0},
        "initial": {"primary": [1.0e5], "region": 1},
        "rock": {"types": rock_types},
        "boundaries": [
            {
                "primary": [1.0e5],
                "region": 1,
                "faces": {"cells": [0], "normal": [0.0, 1.0]},
            }
        ],
        "time": {
            "start": 0.0,
            "stop": 4.0e4,
            "step": {"size": 1.0e4, "maximum": {"number": 10}},
        },
    }


def test_rock_control_tables_parsed_and_interpolated():
    """A rank-2 permeability / porosity entry becomes a time table;
    rock_for(t) interpolates it (rock_setup.F90:304-312)."""
    nz = 5
    mesh = column_mesh([10.0] * nz)
    cfg = _column_config(
        nz,
        [
            {
                "name": "r1",
                "cells": list(range(nz)),
                "permeability": [[0.0, 1e-13], [1.0e4, 3e-13]],
                "porosity": [[0.0, 0.1], [1.0e4, 0.2]],
            }
        ],
    )
    sim = Simulation(cfg, mesh=mesh)
    assert len(sim.rock_controls) == 2
    r0 = sim.rock_for(0.0)
    r_half = sim.rock_for(5.0e3)
    r1 = sim.rock_for(1.0e4)
    np.testing.assert_allclose(
        np.asarray(r0.permeability)[:nz, 0], 1e-13
    )
    np.testing.assert_allclose(
        np.asarray(r_half.permeability)[:nz, 0], 2e-13
    )
    np.testing.assert_allclose(
        np.asarray(r1.permeability)[:nz, 0], 3e-13
    )
    np.testing.assert_allclose(np.asarray(r_half.porosity)[:nz], 0.15)
    # past the table end: clamped
    np.testing.assert_allclose(
        np.asarray(sim.rock_for(9.9e9).porosity)[:nz], 0.2
    )
    # ghost cells follow their interior cell
    g = np.flatnonzero(np.asarray(mesh.is_ghost))
    if len(g):
        np.testing.assert_allclose(
            np.asarray(r_half.permeability)[g, 0], 2e-13
        )
    # scalar-permeability types produce no controls
    cfg2 = _column_config(
        nz, [{"name": "r1", "cells": list(range(nz)),
              "permeability": 1e-13, "porosity": 0.1}]
    )
    sim2 = Simulation(cfg2, mesh=mesh)
    assert sim2.rock_controls == []
    assert sim2.rock_for(123.0) is sim2.rock


def test_rock_control_affects_timestep():
    """The step function uses the per-try rock: with a permeability
    table collapsing to near-zero, gravity equilibration stalls
    relative to the constant-permeability run."""
    nz = 8
    dz = 10.0

    def run(rock_types):
        mesh = column_mesh([dz] * nz)
        cfg = _column_config(nz, rock_types)
        sim = Simulation(cfg, mesh=mesh)
        ts = Timestepper(cfg, sim)
        assert ts.run()
        return np.asarray(ts.final_fluid.pressure)[:nz]

    p_const = run(
        [{"name": "r", "cells": list(range(nz)),
          "permeability": 1e-12, "porosity": 0.1}]
    )
    # table: permeability shut off before the first try's end time
    # (controls interpolate at the try end, pre_try_timestep)
    p_tab = run(
        [{"name": "r", "cells": list(range(nz)),
          "permeability": [[0.0, 1e-22], [1.0e9, 1e-22]],
          "porosity": 0.1}]
    )
    # constant-k column equilibrates towards hydrostatic: bottom
    # pressure rises well above the initial 1e5; the shut-off run
    # stays at the initial uniform pressure
    assert p_const[-1] > 1.7e5
    assert abs(p_tab[-1] - 1.0e5) < 1e3
