"""Golden-value tests for salt (NaCl) thermodynamics against the
reference's unit tests (salt_thermodynamics_test.F90), and basic wse
EOS property/transition checks."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def thermo():
    from waiwera_tpu import thermo as thermo_mod

    return thermo_mod.from_name("ifc67")


def test_halite_solubility():
    from waiwera_tpu.thermo import salt as sm

    t = jnp.asarray([20.0, 100.0, 200.0, 300.0, 400.0])
    sol, err = sm.halite_solubility(t)
    np.testing.assert_allclose(
        np.asarray(sol),
        [0.26420860, 0.28062682, 0.31730904, 0.37747855, 0.47145444],
        rtol=1e-7,
    )
    _, err = sm.halite_solubility(jnp.asarray([-1.0]))
    assert bool(err[0])


def test_halite_properties(thermo):
    from waiwera_tpu.thermo import salt as sm

    t = jnp.asarray([20.0, 100.0, 200.0, 300.0, 350.0])
    ps, _ = thermo.saturation_pressure(t)
    d, u = sm.halite_properties(ps, t)
    np.testing.assert_allclose(
        np.asarray(d),
        [2.16544208e3, 2.14485199e3, 2.11751462e3, 2.08882457e3,
         2.07423883e3],
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(u),
        [-5.44002467e5, -4.73170767e5, -3.83011549e5, -2.90739752e5,
         -2.43776955e5],
        rtol=1e-8,
    )


def test_brine_saturation_pressure(thermo):
    from waiwera_tpu.thermo import salt as sm

    cases = [
        (20.0, 0.0, 2.33656155e3),
        (100.0, 0.0, 1.01325262e5),
        (350.0, 0.0, 1.65351241e7),
        (20.0, 0.1, 2.18332495e3),
        (200.0, 0.1, 1.45229349e6),
        (100.0, 0.2, 8.55888487e4),
        (300.0, 0.2, 7.26807523e6),
        (20.0, 0.3, 1.57322067e3),
        (350.0, 0.3, 1.24826404e7),
    ]
    t = jnp.asarray([c[0] for c in cases])
    xs = jnp.asarray([c[1] for c in cases])
    ps, err = sm.brine_saturation_pressure(thermo, t, xs)
    assert not bool(err.any())
    np.testing.assert_allclose(
        np.asarray(ps), [c[2] for c in cases], rtol=1e-8
    )
    # inverse
    ts, terr = sm.brine_saturation_temperature(thermo, ps, xs)
    assert not bool(terr.any())
    np.testing.assert_allclose(np.asarray(ts), np.asarray(t), rtol=1e-7)


def test_brine_viscosity(thermo):
    from waiwera_tpu.thermo import salt as sm

    cases = [
        (20.0, 0.0, 1.00174876e-03),
        (200.0, 0.0, 1.33827807e-04),
        (100.0, 0.1, 3.47717807e-4),
        (300.0, 0.2, 1.58754327e-4),
        (350.0, 0.3, 1.98459127e-4),
    ]
    t = jnp.asarray([c[0] for c in cases])
    xs = jnp.asarray([c[1] for c in cases])
    ps, _ = thermo.saturation_pressure(t)
    mu, err = sm.brine_viscosity(thermo, t, ps, xs)
    assert not bool(err.any())
    np.testing.assert_allclose(
        np.asarray(mu), [c[2] for c in cases], rtol=1e-7
    )


def test_brine_properties(thermo):
    """Density/enthalpy grid vs salt_thermodynamics_test.F90:438-524."""
    from waiwera_tpu.thermo import salt as sm

    p = [1.0e5, 10.0e5, 100.0e5]
    t = [10.0, 100.0, 200.0, 300.0]
    xs = [0.0, 0.1, 0.2, 0.25]
    expected_density = np.array([
        0.99979351e3, 0.10739598e4, 0.11529153e4, 0.11933788e4,
        0.95812176e3, 0.10272547e4, 0.11027768e4, 0.11433353e4,
        0.85626589e3, 0.93720194e3, 0.10191556e4, 0.10620991e4,
        0.70015006e3, 0.80298857e3, 0.90027464e3, 0.94946347e3,
        0.10002189e4, 0.10743439e4, 0.11531331e4, 0.11935841e4,
        0.95855591e3, 0.10275680e4, 0.11029480e4, 0.11434872e4,
        0.86275186e3, 0.94343137e3, 0.10250794e4, 0.10680578e4,
        0.68154614e3, 0.79377210e3, 0.89628366e3, 0.94706615e3,
        0.10044352e4, 0.10781109e4, 0.11561697e4, 0.11969145e4,
        0.96282473e3, 0.10314023e4, 0.11060135e4, 0.11461556e4,
        0.87107596e3, 0.94917659e3, 0.10293831e4, 0.10716744e4,
        0.71538348e3, 0.82526593e3, 0.92194681e3, 0.97012926e3,
    ]).reshape(len(p), len(t), len(xs))
    expected_enthalpy = np.array([
        0.42090543e5, 0.47403251e5, 0.54240665e5, 0.58259798e5,
        0.41906369e6, 0.39316472e6, 0.37156721e6, 0.36193592e6,
        0.85178481e6, 0.78747999e6, 0.73169015e6, 0.70586576e6,
        0.13586546e7, 0.12268205e7, 0.11217912e7, 0.10746141e7,
        0.42969298e5, 0.48328407e5, 0.55213434e5, 0.59256807e5,
        0.41973864e6, 0.39389202e6, 0.37234207e6, 0.36273464e6,
        0.85214645e6, 0.78794005e6, 0.73222111e6, 0.70642830e6,
        0.13568585e7, 0.12262123e7, 0.11216359e7, 0.10745992e7,
        0.51707550e5, 0.57543140e5, 0.64919394e5, 0.69213759e5,
        0.42650354e6, 0.40118549e6, 0.38012053e6, 0.37075751e6,
        0.85592476e6, 0.79266142e6, 0.73763322e6, 0.71215154e6,
        0.13433636e7, 0.12215744e7, 0.11207975e7, 0.10749918e7,
    ]).reshape(len(p), len(t), len(xs))
    pv, tv, xv = np.meshgrid(p, t, xs, indexing="ij")
    d, u, err = sm.brine_properties(
        thermo, jnp.asarray(pv.ravel()), jnp.asarray(tv.ravel()),
        jnp.asarray(xv.ravel()),
    )
    assert not bool(err.any())
    h = np.asarray(u) + pv.ravel() / np.asarray(d)
    np.testing.assert_allclose(
        np.asarray(d), expected_density.ravel(), rtol=1e-6
    )
    np.testing.assert_allclose(
        h, expected_enthalpy.ravel(), rtol=2e-6
    )


def test_wse_properties_and_transitions():
    """Region mapping, saturations and halite precipitation in the
    wse EOS."""
    from waiwera_tpu import thermo as thermo_mod
    from waiwera_tpu.eos.wse import EOSWaterSaltEnergy
    from waiwera_tpu.physics import relperm, capillarity
    from waiwera_tpu.physics.state import default_rock

    thermo = thermo_mod.from_name("ifc67")
    eos = EOSWaterSaltEnergy(
        {}, thermo, relperm.from_json({"type": "fully_mobile"}),
        capillarity.from_json(None),
    )
    rock = default_rock(4)
    # region 1 liquid brine, region 5 liquid+halite,
    # region 4 two-phase, region 2 dry steam
    primary = jnp.asarray(
        [
            [10e5, 80.0, 0.1],
            [10e5, 200.0, 0.05],  # solid saturation
            [10e5, 0.5, 0.1],
            [1e5, 150.0, 0.0],
        ]
    )
    region = jnp.asarray([1, 5, 4, 2], jnp.int32)
    fluid, err = eos.properties(primary, region, rock)
    assert not bool(np.asarray(err).any())
    sat = np.asarray(fluid.saturation)
    np.testing.assert_allclose(sat[0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(sat[1], [0.95, 0.0, 0.05])
    np.testing.assert_allclose(sat[3], [0.0, 1.0, 0.0])
    # two-phase: temperature from brine saturation line, below pure
    # water Tsat at this pressure
    t2 = float(np.asarray(fluid.temperature)[2])
    tw = float(np.asarray(thermo.saturation_temperature(
        jnp.asarray([10e5]))[0])[0])
    assert t2 > tw  # vapour-pressure lowering -> higher Tsat at same P
    # scale/unscale roundtrip
    y = eos.scale(primary, region)
    back = np.asarray(eos.unscale(y, region))
    np.testing.assert_allclose(back, np.asarray(primary), rtol=1e-12)

    # supersaturated liquid precipitates halite: region 1 -> 5
    old_primary = jnp.asarray([[10e5, 80.0, 0.2]])
    new_primary = jnp.asarray([[10e5, 80.0, 0.5]])
    region1 = jnp.asarray([1], jnp.int32)
    pnew, rnew, trans, terr = eos.transition(
        old_primary, new_primary, region1, jnp.asarray([80.0])
    )
    assert int(rnew[0]) == 5
    assert bool(trans[0]) and not bool(terr[0])


def test_wse_transition_golden():
    """Golden-value transition tests mirroring the reference's
    eos_wse_test.F90:205-524 (test_eos_wse_transition): every case and
    expected primary/region from the Fortran asserts, tol 1e-6
    (unit_test_utils.F90 transition_compare). Covers no-salt 1<->4,
    2<->4, salt-in-brine 1->4/2->4 with salt repartitioning, halite
    precipitation/dissolution 1<->5, 2<->6, 4<->8, and all null
    transitions."""
    from waiwera_tpu import thermo as thermo_mod
    from waiwera_tpu.eos.wse import EOSWaterSaltEnergy
    from waiwera_tpu.physics import relperm, capillarity

    thermo = thermo_mod.from_name("iapws")
    eos = EOSWaterSaltEnergy(
        {}, thermo, relperm.from_json({"type": "fully_mobile"}),
        capillarity.from_json(None),
    )
    small = 1.0e-6
    # (title, old_region, old_primary, primary, old_T,
    #  expected_region, expected_primary, expected_transition)
    cases = [
        ("r1 null Xs=0", 1, [1e5, 20.0, 0.0], [1e5, 20.0, 0.0],
         20.0, 1, [1e5, 20.0, 0.0], False),
        ("r1->4 Xs=0", 1, [20.0e5, 210.0, 0.0], [15.0e5, 200.0, 0.0],
         210.0, 4, [16.647121334271149e5, small, 0.0], True),
        ("r2 null Xs=0", 2, [1e5, 120.0, 0.0], [1e5, 120.0, 0.0],
         120.0, 2, [1e5, 120.0, 0.0], False),
        ("r2->4 Xs=0", 2, [84.0e5, 302.0, 0.0],
         [86.0e5, 299.27215502281706, 0.0], 302.0, 4,
         [85.621455812056474e5, 1.0 - small, 0.0], True),
        ("r4 null Xs=0", 4, [1e5, 0.5, 0.0], [1e5, 0.5, 0.0],
         99.6059, 4, [1e5, 0.5, 0.0], False),
        ("r4->1 Xs=0", 4, [85.0e5, 0.1, 0.0], [86.0e5, -0.01, 0.0],
         299.27215502281706, 1,
         [85.90917681818182e5, 300.02645326107097, 0.0], True),
        ("r4->2 Xs=0", 4, [20.0e5, 0.9, 0.0], [20.1e5, 1.02, 0.0],
         212.38453531849041, 2,
         [20.08331325e5, 212.59487472987195, 0.0], True),
        ("r1 null Xs>0", 1, [1e5, 20.0, 0.2], [1e5, 20.0, 0.2],
         20.0, 1, [1e5, 20.0, 0.2], False),
        ("r1->4 Xs>0", 1, [20.0e5, 210.0, 0.01],
         [15.0e5, 200.0, 0.05], 210.0, 4,
         [1.52428924e6, small, 4.80568610e-2], True),
        ("r2 Xs>0 -> 6", 2, [1e5, 120.0, small], [1e5, 120.0, small],
         120.0, 6, [1e5, 120.0, small], True),
        ("r2->4 Xs>0", 2, [84.0e5, 302.0, 0.01],
         [86.0e5, 299.27215502281706, 0.05], 302.0, 4,
         [85.621455812056474e5, 1.0 - small, 4.2429116241129744e-2],
         True),
        ("r4 null Xs>0", 4, [1e5, 0.5, 0.2], [1e5, 0.5, 0.2],
         99.6059, 4, [1e5, 0.5, 0.2], False),
        ("r4->1 Xs>0", 4, [85.0e5, 0.1, 0.01], [86.0e5, -0.01, 0.03],
         299.27215502281706, 1,
         [85.90917681818182e5, 301.26248746444287,
          0.028181818181818], True),
        ("r5 null", 5, [1e5, 20.0, 0.1], [1e5, 20.0, 0.1],
         20.0, 5, [1e5, 20.0, 0.1], False),
        ("r6 null", 6, [1e5, 120.0, 0.2], [1e5, 120.0, 0.2],
         120.0, 6, [1e5, 120.0, 0.2], False),
        ("r8 null", 8, [1e5, 0.5, 0.25], [1e5, 0.5, 0.25],
         99.6059, 8, [1e5, 0.5, 0.25], False),
        ("r1->5", 1, [20.0e5, 210.0, 0.32], [20.0e5, 210.0, 0.325],
         210.0, 5, [20.0e5, 210.0, small], True),
        ("r5->1", 5, [20.0e5, 210.0, 0.05], [20.0e5, 210.0, -0.01],
         210.0, 1, [20.0e5, 210.0, 0.3220677667197454], True),
        ("r2->6", 2, [60.0e5, 302.0, 0.1], [60.0e5, 302.0, 0.1],
         302.0, 6, [60.0e5, 302.0, small], True),
        ("r6->2", 6, [55.0e5, 302.0, 0.1], [55.0e5, 302.0, -0.05],
         302.0, 2, [55.0e5, 302.0, 0.0], True),
        ("r4->8", 4, [10.0e5, 0.1, 0.25], [10.0e5, 0.1, 0.33],
         200.0, 8, [10.0e5, 0.1, small], True),
        ("r8->4", 8, [1.116895574534e6, 0.1, 0.01],
         [1.116895574534e6, 0.1, -0.01], 200.0, 4,
         [1.116895574534e6, 0.1, 0.3172414011477263], True),
    ]
    old_primary = jnp.asarray([c[2] for c in cases])
    primary = jnp.asarray([c[3] for c in cases])
    region = jnp.asarray([c[1] for c in cases], jnp.int32)
    old_t = jnp.asarray([c[4] for c in cases])
    pnew, rnew, trans, terr = eos.transition(
        old_primary, primary, region, old_t
    )
    pnew = np.asarray(pnew)
    rnew = np.asarray(rnew)
    trans = np.asarray(trans)
    terr = np.asarray(terr)
    for i, c in enumerate(cases):
        title, _, _, _, _, exp_region, exp_primary, exp_trans = c
        assert not terr[i], title
        assert int(rnew[i]) == exp_region, (
            f"{title}: region {rnew[i]} != {exp_region}"
        )
        assert bool(trans[i]) == exp_trans, title
        np.testing.assert_allclose(
            pnew[i], exp_primary, rtol=1e-6, atol=1e-9,
            err_msg=title,
        )


def test_wsge_transition_golden():
    """Golden-value transition tests mirroring the reference's
    eos_wsge_test.F90:255-684 (test_eos_wsge_transition), Pg > 0
    cases (the Pg = 0 cases duplicate eos_wse_test and are covered by
    test_wse_transition_golden; partial pressure interpolates linearly
    along the Newton path through the transition). tol 1e-6."""
    from waiwera_tpu import thermo as thermo_mod
    from waiwera_tpu.eos.wsge import EOSWaterSaltGasEnergy
    from waiwera_tpu.physics import relperm, capillarity

    thermo = thermo_mod.from_name("iapws")
    eos = EOSWaterSaltGasEnergy(
        {}, thermo, relperm.from_json({"type": "fully_mobile"}),
        capillarity.from_json(None),
    )
    small = 1.0e-6
    cases = [
        ("r1 null Pg>0", 1, [1e5, 20.0, 0.0, 0.2e5],
         [1e5, 20.0, 0.0, 0.2e5], 20.0, 1,
         [1e5, 20.0, 0.0, 0.2e5], False),
        ("r1->4 Pg>0", 1, [21.0e5, 210.0, 0.0, 1.0e5],
         [17.0e5, 200.0, 0.0, 2.0e5], 210.0, 4,
         [18.31769706741692e5, small, 0.0, 1.6705757331457702e5],
         True),
        ("r2 null Pg>0", 2, [1e5, 120.0, 0.0, 0.2e5],
         [1e5, 120.0, 0.0, 0.2e5], 120.0, 2,
         [1e5, 120.0, 0.0, 0.2e5], False),
        ("r2->4 Pg>0", 2, [86.0e5, 302.0, 0.0, 2.0e5],
         [87.0e5, 299.27215502281706, 0.0, 1.0e5], 302.0, 4,
         [86.810727906028237e5, 1.0 - small, 0.0,
          1.1892720939717567e5], True),
        ("r4 null Pg>0", 4, [1e5, 0.5, 0.0, 0.2e5],
         [1e5, 0.5, 0.0, 0.2e5], 99.6059, 4,
         [1e5, 0.5, 0.0, 0.2e5], False),
        ("r4->1 Pg>0", 4, [88.0e5, 0.1, 0.0, 3.0e5],
         [87.5e5, -0.01, 0.0, 1.5e5], 299.27215502281706, 1,
         [87.545540454545449e5, 300.02645326107097, 0.0,
          1.6363636363636365e5], True),
        ("r4->2 Pg>0", 4, [22.0e5, 0.9, 0.0, 2.0e5],
         [24.1e5, 1.02, 0.0, 4.0e5], 212.38453531849041, 2,
         [23.749979916666667e5, 212.59487472987195, 0.0,
          3.6666666666666663e5], True),
        ("r1->4 Xs>0 Pg>0", 1, [21.0e5, 210.0, 0.01, 1.0e5],
         [16.0e5, 200.0, 0.05, 1.0e5], 210.0, 4,
         [1.62428924e6, small, 4.80568610e-2, 1.0e5], True),
        ("r2->4 Xs>0 Pg>0", 2, [85.0e5, 302.0, 0.01, 1.0e5],
         [87.0e5, 299.27215502281706, 0.05, 1.0e5], 302.0, 4,
         [8.6621455812056493e6, 1.0 - small,
          4.2429116241129744e-2, 1.0e5], True),
        ("r4->1 Xs>0 Pg>0", 4, [86.0e5, 0.1, 0.01, 1.0e5],
         [87.0e5, -0.01, 0.03, 1.0e5], 299.27215502281706, 1,
         [86.90917681818182e5, 301.26248746444287,
          0.028181818181818, 1.0e5], True),
        ("r1->5 Pg>0", 1, [21.0e5, 210.0, 0.32, 1.0e5],
         [21.0e5, 210.0, 0.325, 1.0e5], 210.0, 5,
         [21.0e5, 210.0, small, 1.0e5], True),
    ]
    old_primary = jnp.asarray([c[2] for c in cases])
    primary = jnp.asarray([c[3] for c in cases])
    region = jnp.asarray([c[1] for c in cases], jnp.int32)
    old_t = jnp.asarray([c[4] for c in cases])
    pnew, rnew, trans, terr = eos.transition(
        old_primary, primary, region, old_t
    )
    pnew = np.asarray(pnew)
    rnew = np.asarray(rnew)
    trans = np.asarray(trans)
    terr = np.asarray(terr)
    for i, c in enumerate(cases):
        title, _, _, _, _, exp_region, exp_primary, exp_trans = c
        assert not terr[i], title
        assert int(rnew[i]) == exp_region, (
            f"{title}: region {rnew[i]} != {exp_region}"
        )
        assert bool(trans[i]) == exp_trans, title
        np.testing.assert_allclose(
            pnew[i], exp_primary, rtol=1e-6, atol=1e-9,
            err_msg=title,
        )
