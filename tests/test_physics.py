"""Relative permeability, capillary pressure and interpolation tests."""

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.physics import relperm, capillarity
from waiwera_tpu.utils.interpolation import InterpolationTable


def test_fully_mobile():
    rp = relperm.FullyMobile()
    v = np.asarray(rp(jnp.array([0.0, 0.5, 1.0])))
    np.testing.assert_allclose(v, 1.0)


def test_linear():
    rp = relperm.Linear([0.1, 0.9], [0.1, 0.9])
    v = np.asarray(rp(jnp.array([0.0, 0.1, 0.5, 0.9, 1.0])))
    np.testing.assert_allclose(v[:, 0], [0.0, 0.0, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(v[:, 1], [1.0, 1.0, 0.5, 0.0, 0.0])


def test_corey():
    rp = relperm.Corey(slr=0.3, ssr=0.05)
    sl = np.array([0.2, 0.5, 0.96, 0.99])
    v = np.asarray(rp(jnp.asarray(sl)))
    # below slr: immobile liquid
    np.testing.assert_allclose(v[0], [0.0, 1.0])
    # sv < ssr: liquid fully mobile
    np.testing.assert_allclose(v[3], [1.0, 0.0])
    sstar = (0.5 - 0.3) / (1 - 0.3 - 0.05)
    np.testing.assert_allclose(v[1, 0], sstar**4, rtol=1e-12)
    np.testing.assert_allclose(
        v[1, 1], (1 - sstar) ** 2 * (1 - sstar**2), rtol=1e-12
    )


def test_grant():
    rp = relperm.Grant(slr=0.3, ssr=0.3)
    v = np.asarray(rp(jnp.array([0.5])))
    sstar = (0.5 - 0.3) / (1 - 0.3 - 0.3)
    np.testing.assert_allclose(v[0, 0], sstar**4, rtol=1e-12)
    np.testing.assert_allclose(v[0, 1], 1 - sstar**4, rtol=1e-12)


def test_van_genuchten_relperm():
    rp = relperm.VanGenuchten(lam=0.45, slr=1e-3, sls=1.0, sum_unity=True)
    sl = np.array([0.0, 0.3, 0.7, 1.0])
    v = np.asarray(rp(jnp.asarray(sl)))
    assert v[0, 0] == 0.0
    assert v[-1, 0] == 1.0
    np.testing.assert_allclose(v[:, 0] + v[:, 1], 1.0, rtol=1e-12)
    sstar = (0.3 - 1e-3) / (1 - 1e-3)
    expected = (
        np.sqrt(sstar) * (1 - (1 - sstar ** (1 / 0.45)) ** 0.45) ** 2
    )
    np.testing.assert_allclose(v[1, 0], expected, rtol=1e-10)


def test_van_genuchten_cp():
    cp = capillarity.VanGenuchtenCP(P0=0.125e5, lam=0.45, slr=1e-3, sls=1.0)
    sl = np.array([0.3, 0.9, 1.0])
    v = np.asarray(cp(jnp.asarray(sl), jnp.zeros(3)))
    sstar = (0.3 - 1e-3) / (1 - 1e-3)
    expected = -0.125e5 * (sstar ** (-1 / 0.45) - 1) ** (1 - 0.45)
    np.testing.assert_allclose(v[0], expected, rtol=1e-10)
    assert v[2] == 0.0
    assert np.all(v <= 0.0)


def test_cp_pmax():
    cp = capillarity.VanGenuchtenCP(P0=1e5, lam=0.45, Pmax=2e4)
    v = np.asarray(cp(jnp.array([0.05, 0.5]), jnp.zeros(2)))
    assert np.all(v >= -2e4)


def test_interpolation_linear():
    tab = InterpolationTable([[0.0, 1.0], [1.0, 3.0], [2.0, 2.0]])
    xi = np.array([-1.0, 0.0, 0.5, 1.5, 3.0])
    v = np.asarray(tab(jnp.asarray(xi)))[:, 0]
    np.testing.assert_allclose(v, [1.0, 1.0, 2.0, 2.5, 2.0])


def test_interpolation_step():
    tab = InterpolationTable(
        [[0.0, 1.0], [1.0, 3.0], [2.0, 2.0]], interpolation="step"
    )
    v = np.asarray(tab(jnp.array([0.5, 1.5, 2.5])))[:, 0]
    np.testing.assert_allclose(v, [1.0, 3.0, 2.0])


def test_interpolation_pchip_monotone():
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 0.5, 1.8, 2.0])
    tab = InterpolationTable(
        np.column_stack([x, y]), interpolation="pchip"
    )
    xi = np.linspace(0, 3, 61)
    v = np.asarray(tab(jnp.asarray(xi)))[:, 0]
    # interpolates the knots
    np.testing.assert_allclose(
        np.asarray(tab(jnp.asarray(x)))[:, 0], y, atol=1e-12
    )
    # monotone data -> monotone interpolant
    assert np.all(np.diff(v) >= -1e-12)


def test_average_integrate_linear():
    tab = InterpolationTable([[0.0, 0.0], [2.0, 2.0]])
    # integral of y=x over [0,2] = 2 -> average 1
    np.testing.assert_allclose(float(tab.average(0.0, 2.0)[0]), 1.0)
    np.testing.assert_allclose(float(tab.average(0.5, 1.5)[0]), 1.0)
    # beyond table: clamped end values
    np.testing.assert_allclose(float(tab.average(2.0, 4.0)[0]), 2.0)
    # degenerate interval -> point value
    np.testing.assert_allclose(float(tab.average(1.0, 1.0)[0]), 1.0)


def test_average_endpoint():
    tab = InterpolationTable(
        [[0.0, 0.0], [2.0, 2.0]], averaging="endpoint"
    )
    np.testing.assert_allclose(float(tab.average(0.0, 2.0)[0]), 1.0)


def test_average_integrate_step():
    tab = InterpolationTable(
        [[0.0, 1.0], [1.0, 3.0]], interpolation="step"
    )
    # y=1 on [0,1), then 3 -> integral over [0.5, 1.5] = 0.5 + 1.5 = 2
    np.testing.assert_allclose(float(tab.average(0.5, 1.5)[0]), 2.0)


def test_inverse():
    tab = InterpolationTable([[0.0, 10.0], [1.0, 20.0], [2.0, 40.0]])
    np.testing.assert_allclose(float(tab.inverse(15.0)), 0.5)
    np.testing.assert_allclose(float(tab.inverse(30.0)), 1.5)


def test_relperm_from_json():
    rp = relperm.from_json({"type": "corey", "slr": 0.2, "ssr": 0.1})
    assert isinstance(rp, relperm.Corey)
    assert rp.slr == 0.2
    rp = relperm.from_json(None)
    assert isinstance(rp, relperm.FullyMobile)


def test_cp_from_json():
    cp = capillarity.from_json({"type": "zero"})
    assert isinstance(cp, capillarity.Zero)
    cp = capillarity.from_json(None)
    assert isinstance(cp, capillarity.Zero)
