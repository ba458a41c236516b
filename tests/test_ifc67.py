"""IFC-67 golden-value tests (values from the reference's
test/unit/src/IFC67_test.F90, i.e. the published IFC-67 formulation)."""

import numpy as np

from waiwera_tpu.thermo import ifc67
from waiwera_tpu.thermo.base import TC_K


def test_region1():
    p = np.array([3e6, 80e6, 3e6])
    t = np.array([300.0, 300.0, 500.0]) - TC_K
    rho = np.array(
        [997.95721560998174, 1029.7256888266911, 831.84196191567298]
    )
    u = np.array(
        [112247.43313085975, 106310.47344628950, 971985.91117384087]
    )
    d, e, err = ifc67.region1_properties(p, t)
    np.testing.assert_allclose(np.asarray(d), rho, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e), u, rtol=1e-10)
    assert not np.any(np.asarray(err))
    _, _, err = ifc67.region1_properties(
        np.array([20e6, 101e6]), np.array([360.0, 60.0])
    )
    assert np.all(np.asarray(err))


def test_region2():
    p = np.array([0.0035e6, 0.0035e6, 30e6])
    t = np.array([300.0, 700.0, 700.0]) - TC_K
    rho = np.array(
        [2.5316826343790743e-2, 1.0834441421293962e-2, 183.90041953968711]
    )
    u = np.array(
        [2412405.0932077002, 3012229.4965919587, 2474981.3799304822]
    )
    d, e, err = ifc67.region2_properties(p, t)
    np.testing.assert_allclose(np.asarray(d), rho, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e), u, rtol=1e-10)
    assert not np.any(np.asarray(err))
    _, _, err = ifc67.region2_properties(
        np.array([20e6, 101e6]), np.array([801.0, 60.0])
    )
    assert np.all(np.asarray(err))


def test_saturation():
    t = np.array([300.0, 500.0, 600.0]) - TC_K
    p = np.array([0.35323426e4, 0.263961572e7, 0.123493902e8])
    # golden values rounded to ~8 significant digits
    ps, err = ifc67.saturation_pressure(t)
    np.testing.assert_allclose(np.asarray(ps), p, rtol=3e-8)
    assert not np.any(np.asarray(err))
    # golden pressures are rounded to 9 digits, so the exact inverse
    # differs from t at the 1e-7 K level
    ts, err = ifc67.saturation_temperature(p)
    np.testing.assert_allclose(np.asarray(ts), t, atol=1e-6)
    assert not np.any(np.asarray(err))
    _, err = ifc67.saturation_pressure(np.array([380.0]))
    assert np.all(np.asarray(err))
    _, err = ifc67.saturation_temperature(np.array([30e6]))
    assert np.all(np.asarray(err))


def test_viscosity():
    t1 = np.array([298.15, 373.15]) - TC_K
    p1 = np.array([1977563.58349, 99834578.2816])
    v1 = np.asarray(ifc67.viscosity_liquid(t1, p1))
    np.testing.assert_allclose(v1, [8.903129e-4, 2.988268e-4], rtol=1e-6)
    t2 = np.array([873.15, 873.15]) - TC_K
    d2 = np.array([1.0, 100.0])
    v2 = np.asarray(ifc67.viscosity_steam(t2, d2))
    np.testing.assert_allclose(v2, [3.249537e-5, 3.667671e-5], rtol=1e-6)


def test_phase_composition():
    th = ifc67.IFC67()
    import jax.numpy as jnp

    region = jnp.array([1, 2, 4])
    phases = np.asarray(
        th.phase_composition(region, jnp.zeros(3), jnp.zeros(3))
    )
    np.testing.assert_array_equal(phases, [0b01, 0b10, 0b11])
