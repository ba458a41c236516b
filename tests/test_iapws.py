"""IAPWS-97 golden-value tests.

Verification values are the published IF97 standard check values (also
used by the reference's test/unit/src/IAPWS_test.F90).
"""

import numpy as np
import pytest

from waiwera_tpu.thermo import iapws97
from waiwera_tpu.thermo.base import TC_K


def test_region1():
    p = np.array([3e6, 80e6, 3e6])
    t = np.array([300.0, 300.0, 500.0]) - TC_K
    nu = np.array([0.100215168e-2, 0.971180894e-3, 0.120241800e-2])
    u = np.array([0.112324818e6, 0.106448356e6, 0.971934985e6])
    d, e, err = iapws97.region1_properties(p, t)
    np.testing.assert_allclose(np.asarray(d), 1.0 / nu, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(e), u, rtol=1e-8)
    assert not np.any(np.asarray(err))


def test_region1_errors():
    _, _, err = iapws97.region1_properties(
        np.array([20e6, 101e6]), np.array([360.0, 60.0])
    )
    assert np.all(np.asarray(err))


def test_region2():
    p = np.array([0.0035e6, 0.0035e6, 30e6])
    t = np.array([300.0, 700.0, 700.0]) - TC_K
    nu = np.array([0.394913866e2, 0.923015898e2, 0.542946619e-2])
    u = np.array([0.241169160e7, 0.301262819e7, 0.246861076e7])
    d, e, err = iapws97.region2_properties(p, t)
    np.testing.assert_allclose(np.asarray(d), 1.0 / nu, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(e), u, rtol=1e-8)
    assert not np.any(np.asarray(err))


def test_region2_errors():
    _, _, err = iapws97.region2_properties(
        np.array([20e6, 101e6]), np.array([801.0, 60.0])
    )
    assert np.all(np.asarray(err))


def test_region3():
    d = np.array([500.0, 200.0, 500.0])
    t = np.array([650.0, 650.0, 750.0]) - TC_K
    p = np.array([0.255837018e8, 0.222930643e8, 0.783095639e8])
    u = np.array([0.181226279e7, 0.226365868e7, 0.210206932e7])
    pr, e, err = iapws97.region3_properties(d, t)
    np.testing.assert_allclose(np.asarray(pr), p, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(e), u, rtol=1e-8)
    assert not np.any(np.asarray(err))


def test_region3_density_inversion():
    d = np.array([500.0, 200.0, 500.0])
    t = np.array([650.0, 650.0, 750.0]) - TC_K
    p = np.array([0.255837018e8, 0.222930643e8, 0.783095639e8])
    dsol, err = iapws97.region3_density(p, t, d * 1.2)
    np.testing.assert_allclose(np.asarray(dsol), d, rtol=1e-7)
    assert not np.any(np.asarray(err))


def test_saturation():
    t = np.array([300.0, 500.0, 600.0]) - TC_K
    p = np.array([0.353658941e4, 0.263889776e7, 0.123443146e8])
    ps, err = iapws97.saturation_pressure(t)
    np.testing.assert_allclose(np.asarray(ps), p, rtol=1e-8)
    assert not np.any(np.asarray(err))
    ts, err = iapws97.saturation_temperature(p)
    np.testing.assert_allclose(np.asarray(ts), t, rtol=1e-8, atol=1e-7)
    assert not np.any(np.asarray(err))


def test_saturation_errors():
    _, err = iapws97.saturation_pressure(380.0)
    assert np.asarray(err)
    _, err = iapws97.saturation_temperature(30e6)
    assert np.asarray(err)


def test_viscosity():
    t = (
        np.array([
            298.15, 298.15, 373.15, 433.15, 433.15, 873.15, 873.15, 873.15,
            1173.15, 1173.15, 1173.15,
        ])
        - TC_K
    )
    d = np.array([
        998.0, 1200.0, 1000.0, 1.0, 1000.0, 1.0, 100.0, 600.0, 1.0, 100.0,
        400.0,
    ])
    mu = (
        np.array([
            889.735100, 1437.649467, 307.883622, 14.538324, 217.685358,
            32.619287, 35.802262, 77.430195, 44.217245, 47.640433, 64.154608,
        ])
        * 1e-6
    )
    v = iapws97.viscosity(t, d)
    np.testing.assert_allclose(np.asarray(v), mu, rtol=1e-7)


def test_boundary23():
    # IF97 eq. (5)-(6) verification point
    t = 0.623150000e3 - TC_K
    p = 0.165291643e8
    np.testing.assert_allclose(
        float(iapws97.boundary23_pressure(t)), p, rtol=1e-8
    )
    np.testing.assert_allclose(
        float(iapws97.boundary23_temperature(p)), t, rtol=1e-8
    )


def test_no_nan_out_of_range():
    # out-of-range inputs must flag err but never produce NaN/Inf
    d, e, err = iapws97.region1_properties(
        np.array([200e6, -1.0]), np.array([900.0, -50.0])
    )
    assert np.all(np.isfinite(np.asarray(d)))
    assert np.all(np.isfinite(np.asarray(e)))
    ps, err = iapws97.saturation_pressure(np.array([-10.0, 500.0]))
    assert np.all(np.isfinite(np.asarray(ps)))


def test_phase_composition():
    from waiwera_tpu.thermo import IAPWS97

    th = IAPWS97()
    region = np.array([1, 2, 4, 3, 3, 2, 2])
    p = np.array([1e5, 1e5, 30e5, 20e6, 25e6, 22.5e6, 1e5])
    t = np.array([20.0, 120.0, 133.5, 370.0, 360.0, 380.0, 380.0])
    phases = np.asarray(th.phase_composition(region, p, t))
    # region1 -> liquid; region2 -> vapour; region4 -> both
    assert phases[0] == 0b001
    assert phases[1] == 0b010
    assert phases[2] == 0b011
    # region 3 below critical T: compare with saturation pressure
    # t=370: psat(370) ~ 21.0e6 > 20e6 -> vapour side
    assert phases[3] == 0b010
    # t=360: psat(360) ~ 18.7e6 < 25e6 -> liquid side
    assert phases[4] == 0b001
    # above critical temperature: by pressure vs pcritical
    assert phases[5] == 0b100
    assert phases[6] == 0b010
