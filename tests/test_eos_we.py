"""eos_we golden-value tests.

Expected values from the reference's test/unit/src/eos_we_test.F90
(fluid properties at a two-phase state, transitions in all directions,
effective conductivity).
"""

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.thermo import IAPWS97
from waiwera_tpu.eos.we import EOSWaterEnergy
from waiwera_tpu.physics import relperm, capillarity
from waiwera_tpu.physics.state import RockState, default_rock, empty_fluid

SMALL = 1e-6


def make_eos(rp=None, cp=None):
    return EOSWaterEnergy(
        {},
        IAPWS97(),
        rp or relperm.FullyMobile(),
        cp or capillarity.Zero(),
    )


def test_fluid_properties_two_phase():
    rp = relperm.Linear([0.2, 0.8], [0.2, 0.8])
    eos = make_eos(rp=rp)
    pressure = 27.967924557686445e5
    sv = 0.25
    primary = jnp.array([[pressure, sv]])
    region = jnp.array([4], dtype=jnp.int32)
    rock = default_rock(1)
    fluid, err = eos.properties(primary, region, rock)
    assert not bool(err[0])
    f = lambda a: float(np.asarray(a)[0])
    np.testing.assert_allclose(f(fluid.pressure), pressure)
    np.testing.assert_allclose(f(fluid.temperature), 230.0, rtol=1e-9)
    assert int(fluid.phase_composition[0]) == 0b011
    liq = np.asarray(
        [
            fluid.density[0, 0],
            fluid.internal_energy[0, 0],
            fluid.specific_enthalpy[0, 0],
            fluid.viscosity[0, 0],
            fluid.saturation[0, 0],
            fluid.relative_permeability[0, 0],
        ]
    )
    np.testing.assert_allclose(
        liq,
        [
            827.12247049977032,
            986828.18916209263,
            990209.54144729744,
            1.1619412513757267e-4,
            0.75,
            11.0 / 12.0,
        ],
        rtol=1e-8,
    )
    vap = np.asarray(
        [
            fluid.density[0, 1],
            fluid.internal_energy[0, 1],
            fluid.specific_enthalpy[0, 1],
            fluid.viscosity[0, 1],
            fluid.saturation[0, 1],
            fluid.relative_permeability[0, 1],
        ]
    )
    np.testing.assert_allclose(
        vap,
        [
            13.984012253728331,
            2603010.010356456,
            2803009.2956133024,
            1.6704837258831552e-5,
            0.25,
            1.0 / 12.0,
        ],
        rtol=1e-8,
    )
    # primary variable round trip
    p2 = np.asarray(eos.primary_variables(fluid))
    np.testing.assert_allclose(p2, [[pressure, sv]], rtol=1e-12)


def run_transition(eos, old_primary, primary, old_region, old_temperature):
    return eos.transition(
        jnp.asarray(old_primary, jnp.float64),
        jnp.asarray(primary, jnp.float64),
        jnp.asarray(old_region, jnp.int32),
        jnp.asarray(old_temperature, jnp.float64),
    )


def test_transitions():
    eos = make_eos()
    # cases: (old_primary, primary, old_region, old_T,
    #         expected_primary, expected_region, expected_transition)
    cases = [
        ([1e5, 20.0], [1e5, 20.0], 1, 20.0, [1e5, 20.0], 1, False),
        (
            [20.0e5, 210.0],
            [15.0e5, 200.0],
            1,
            210.0,
            [16.647121334271149e5, SMALL],
            4,
            True,
        ),
        ([1e5, 120.0], [1e5, 120.0], 2, 120.0, [1e5, 120.0], 2, False),
        (
            [84.0e5, 302.0],
            [86.0e5, 299.27215502281706],
            2,
            302.0,
            [85.621455812056474e5, 1.0 - SMALL],
            4,
            True,
        ),
        ([1e5, 0.5], [1e5, 0.5], 4, 99.6, [1e5, 0.5], 4, False),
        (
            [85.0e5, 0.1],
            [86.0e5, -0.01],
            4,
            299.27215502281706,
            [85.90917681818182e5, 300.02645326107097],
            1,
            True,
        ),
        (
            [20.0e5, 0.9],
            [20.1e5, 1.02],
            4,
            212.38453531849041,
            [20.08331325e5, 212.59487472987195],
            2,
            True,
        ),
    ]
    old_primary = np.array([c[0] for c in cases])
    primary = np.array([c[1] for c in cases])
    old_region = np.array([c[2] for c in cases])
    old_t = np.array([c[3] for c in cases])
    expected_primary = np.array([c[4] for c in cases])
    expected_region = np.array([c[5] for c in cases])
    expected_tr = np.array([c[6] for c in cases])

    new_primary, new_region, tr, err = run_transition(
        eos, old_primary, primary, old_region, old_t
    )
    assert not np.any(np.asarray(err))
    np.testing.assert_array_equal(np.asarray(new_region), expected_region)
    np.testing.assert_array_equal(np.asarray(tr), expected_tr)
    np.testing.assert_allclose(
        np.asarray(new_primary), expected_primary, rtol=1e-7
    )


def test_property_errors():
    eos = make_eos()
    primary = jnp.array([[20e6, 360.0], [101e6, 20.0]])
    region = jnp.array([1, 2], dtype=jnp.int32)
    fluid, err = eos.properties(primary, region, default_rock(2))
    assert np.all(np.asarray(err))


def test_conductivity():
    eos = make_eos()
    n = 5
    rock = default_rock(n)._replace(
        wet_conductivity=jnp.full(n, 1.5), dry_conductivity=jnp.full(n, 1.0)
    )
    fluid = empty_fluid(n, 2, 1)
    sat = np.zeros((n, 2))
    sat[:, 0] = [0.0, 0.25, 0.5, 0.75, 1.0]
    fluid = fluid._replace(saturation=jnp.asarray(sat))
    cond = np.asarray(eos.conductivity(rock, fluid))
    np.testing.assert_allclose(
        cond, [1.0, 1.25, 1.3535534, 1.4330127, 1.5], rtol=1e-6
    )


def test_scaling_round_trip():
    eos = make_eos()
    primary = jnp.array([[5e6, 200.0], [3e6, 0.5]])
    region = jnp.array([1, 4], dtype=jnp.int32)
    scaled = eos.scale(primary, region)
    np.testing.assert_allclose(
        np.asarray(scaled), [[5.0, 2.0], [3.0, 0.5]], rtol=1e-12
    )
    back = eos.unscale(scaled, region)
    np.testing.assert_allclose(np.asarray(back), np.asarray(primary))


def test_check_primary_variables():
    eos = make_eos()
    primary = jnp.array(
        [[1e5, 20.0], [-1.0, 20.0], [1e5, 900.0], [1e5, 1.5], [1e5, 2.5]]
    )
    region = jnp.array([1, 1, 1, 4, 4], dtype=jnp.int32)
    _, err = eos.check_primary_variables(primary, region)
    err = np.asarray(err)
    np.testing.assert_array_equal(err, [False, True, True, False, True])
