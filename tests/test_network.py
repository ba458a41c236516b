"""Source-network vectorisation unit tests.

The reference is built for production fields with hundreds of wells
(source_network.F90:91-120); the network update must therefore trace
to a jaxpr whose size is independent of the number of sources. These
tests pin that property and check the batched table stacks reproduce
per-table evaluation exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from waiwera_tpu.mesh.rect import rectangular_mesh
from waiwera_tpu.sim.simulation import Simulation
from waiwera_tpu.utils.interpolation import (
    InterpolationTable,
    StackedTables,
)


def test_stacked_tables_match_single():
    rng = np.random.RandomState(0)
    tables = []
    for i in range(7):
        n = rng.randint(1, 6)
        x = np.sort(rng.uniform(0.0, 10.0, n))
        y = rng.uniform(-2.0, 2.0, (n, 1))
        tables.append(
            InterpolationTable(
                np.concatenate([x[:, None], y], axis=1),
                interpolation="linear",
                averaging="integrate",
            )
        )
    stack = StackedTables(tables)
    xi = rng.uniform(-1.0, 12.0, 7)
    batched = np.asarray(stack(xi))
    single = np.stack([np.asarray(t(xi[i])) for i, t in enumerate(tables)])
    np.testing.assert_allclose(batched, single, rtol=1e-10, atol=1e-12)
    a, b = 1.3, 8.6
    batched_avg = np.asarray(stack.average(a, b))
    single_avg = np.stack([np.asarray(t.average(a, b)) for t in tables])
    np.testing.assert_allclose(batched_avg, single_avg, rtol=1e-9,
                               atol=1e-12)


def test_stacked_tables_pchip_step():
    rng = np.random.RandomState(1)
    for variant in ("pchip", "step"):
        tables = []
        for i in range(5):
            n = rng.randint(2, 7)
            x = np.sort(rng.uniform(0.0, 10.0, n))
            y = rng.uniform(-2.0, 2.0, (n, 1))
            tables.append(
                InterpolationTable(
                    np.concatenate([x[:, None], y], axis=1),
                    interpolation=variant,
                )
            )
        stack = StackedTables(tables)
        xi = rng.uniform(0.5, 9.5, 5)
        batched = np.asarray(stack(xi))
        single = np.stack(
            [np.asarray(t(xi[i])) for i, t in enumerate(tables)]
        )
        np.testing.assert_allclose(batched, single, rtol=1e-9, atol=1e-12)
        avg = np.asarray(stack.average(2.0, 7.0))
        savg = np.stack([np.asarray(t.average(2.0, 7.0)) for t in tables])
        np.testing.assert_allclose(avg, savg, rtol=1e-8, atol=1e-11)


def _many_well_sim(ns):
    nx = ny = 16
    mesh = rectangular_mesh(
        [50.0] * nx, [50.0] * ny, [20.0]
    )
    sources = []
    for i in range(ns):
        kind = i % 3
        if kind == 0:
            sources.append(
                {
                    "name": f"w{i}",
                    "cell": i % (nx * ny),
                    "rate": [[0.0, -0.1 - 0.001 * i], [1e6, -0.2]],
                    "separator": {"pressure": 0.55e6},
                }
            )
        elif kind == 1:
            sources.append(
                {
                    "name": f"w{i}",
                    "cell": i % (nx * ny),
                    "deliverability": {
                        "productivity": 1e-12,
                        "pressure": 2.0e5,
                    },
                    "limiter": {"limit": 5.0},
                }
            )
        else:
            sources.append(
                {
                    "name": f"w{i}",
                    "cell": i % (nx * ny),
                    "rate": 0.05,
                    "enthalpy": [[0.0, 500e3], [1e6, 600e3]],
                }
            )
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [30e5, 150.0], "region": 1},
        "source": sources,
    }
    return Simulation(config, mesh=mesh)


def test_many_source_jaxpr_size_constant():
    """The traced network update must not grow with source count."""
    sims = {}
    sizes = {}
    for ns in (20, 200):
        sim = _many_well_sim(ns)
        fluid, _ = sim.initial_fluid()
        jaxpr = jax.make_jaxpr(
            lambda t: sim.sources.flows(fluid, t, t + 100.0)
        )(jnp.asarray(0.0))
        sizes[ns] = len(jaxpr.jaxpr.eqns)
        sims[ns] = sim
    # vectorised: equation count independent of ns (allow tiny slack)
    assert sizes[200] <= sizes[20] + 5, sizes

    # and the values are right: spot-check each control kind
    sim = sims[200]
    fluid, _ = sim.initial_fluid()
    q, h = sim.sources.flows(fluid, jnp.asarray(0.0), jnp.asarray(1e5))
    q = np.asarray(q)
    h = np.asarray(h)
    # kind 0: rate table average over [0, 1e5] of linear(-0.1-0.001i, ...)
    i = 0
    r0, r1 = -0.1 - 0.001 * i, -0.2
    expect = r0 + (r1 - r0) * (0.5e5 / 1e6)
    np.testing.assert_allclose(q[0], expect, rtol=1e-12)
    # kind 2: constant injection 0.05 with enthalpy table
    np.testing.assert_allclose(q[2], 0.05, rtol=1e-12)
    np.testing.assert_allclose(h[2], 500e3 + 100e3 * (0.5e5 / 1e6),
                               rtol=1e-12)
    # kind 1: deliverability against 2 bar with limiter cap 5 kg/s
    cell = 1 % (16 * 16)
    P = float(np.asarray(fluid.pressure)[cell])
    mob = float(np.asarray(fluid.mobility())[cell].sum())
    qd = -1e-12 * mob * (P - 2.0e5)
    expect1 = np.sign(qd) * min(abs(qd), 5.0)
    np.testing.assert_allclose(q[1], expect1, rtol=1e-9)


def test_zone_based_source_placement():
    """'zones' in a source spec places a source in every zone cell
    (source_setup.F90:250-345, setup_sources.rst)."""
    from waiwera_tpu.mesh.rect import column_mesh

    mesh = column_mesh([10.0] * 12)
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [5.0e6, 180.0], "region": 1},
        "mesh": {"zones": {"lower": {"cells": [8, 9, 10, 11]}}},
        "source": [
            {"name": "inj", "zones": "lower", "rate": 2.0,
             "enthalpy": 500e3},
            {"name": "top", "cell": 0, "rate": -1.0},
        ],
    }
    sim = Simulation(config, mesh=mesh)
    net = sim.sources
    assert net.num_sources == 5
    np.testing.assert_array_equal(
        np.sort(np.asarray(net.arrays.cell)), [0, 8, 9, 10, 11]
    )
    fluid0, _ = sim.initial_fluid()
    q, h = net.flows(fluid0, 0.0, 1.0)
    q = np.asarray(q)
    cells = np.asarray(net.arrays.cell)
    # each zone cell carries the full specified rate
    np.testing.assert_allclose(q[cells != 0], 2.0)
    np.testing.assert_allclose(q[cells == 0], -1.0)
