"""NCG thermodynamics golden-value tests (values from the reference's
ncg_co2_thermodynamics_test.F90 / ncg_air_thermodynamics_test.F90)."""

import numpy as np

from waiwera_tpu.thermo.ncg import AirNCG, CO2NCG


def test_co2_henrys_constant():
    gas = CO2NCG()
    np.testing.assert_allclose(
        float(gas.henrys_constant(20.0)), 1.44811504032e8, rtol=1e-10
    )
    np.testing.assert_allclose(
        float(gas.henrys_constant(100.0)), 5.50571700000e8, rtol=1e-10
    )
    np.testing.assert_allclose(
        float(gas.henrys_constant(240.0)), 5.21847810624e8, rtol=1e-10
    )
    np.testing.assert_allclose(
        float(gas.henrys_constant(300.0)), 3.71913900000e8, rtol=1e-10
    )


def test_co2_energy_solution():
    gas = CO2NCG()
    np.testing.assert_allclose(
        float(gas.energy_solution(20.0)), -495750.87299689, rtol=1e-9
    )


def test_co2_properties():
    gas = CO2NCG()
    # (pc, t, enthalpy, density)
    data = np.array([
        [0.0, 20.0, 17140.18077231938, 0.0],
        [100000.0, 20.0, 16142.247883091828, 1.8142044368713437],
        [0.0, 100.0, 87450.99131436742, 0.0],
        [100000.0, 100.0, 87004.524163092, 1.4213754811567743],
        [4000000.0, 100.0, 64355.3813832885, 62.608990505735434],
        [9000000.0, 100.0, 20379.357776952613, 184.7959892299282],
        [0.0, 240.0, 223594.37705727902, 0.0],
        [100000.0, 240.0, 223439.99865083068, 1.0324489144812645],
        [4000000.0, 240.0, 215608.4290498441, 42.27375154306431],
        [9000000.0, 240.0, 200402.49860929986, 100.70459422220841],
        [0.0, 300.0, 286380.4950504236, 0.0],
        [100000.0, 300.0, 286273.71092985675, 0.9242369906584087],
        [4000000.0, 300.0, 280856.58497462136, 37.5055455044134],
        [9000000.0, 300.0, 270338.58607276645, 87.3627658128452],
    ])
    d, h, err = gas.properties(data[:, 0], data[:, 1])
    np.testing.assert_allclose(np.asarray(h), data[:, 2], rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d), data[:, 3], rtol=1e-9, atol=1e-12
    )
    assert not np.any(np.asarray(err))


def test_air_properties_ideal_gas():
    gas = AirNCG()
    d, h, err = gas.properties(np.array([1e5]), np.array([20.0]))
    # ideal gas density at 1 bar, 20 C
    expected = 1e5 * 28.96 / (1e3 * 8.3144598 * 293.15)
    np.testing.assert_allclose(float(d[0]), expected, rtol=1e-12)
    # enthalpy zero at the triple point by construction
    d0, h0, _ = gas.properties(np.array([1e5]), np.array([0.01]))
    np.testing.assert_allclose(float(h0[0]), 0.0, atol=1e-6)


def test_air_henry_mixture():
    gas = AirNCG()
    h = float(gas.henrys_constant(25.0))
    # air Henry's constant at 25 C is of order 1e10 Pa
    assert 5e9 < h < 2e10
    es = float(gas.energy_solution(25.0))
    assert es < 0  # dissolution exothermic at low temperature


def test_air_mixture_viscosity():
    gas = AirNCG()
    wv = np.array([1.2e-5])
    v, err = gas.mixture_viscosity(wv, np.array([120.0]), np.array([1e5]),
                                   np.array([0.5]), 1)
    assert not np.any(np.asarray(err))
    assert 0.5e-5 < float(v[0]) < 5e-5
    # zero gas fraction -> close to water viscosity (within formulation
    # accuracy ~4%)
    v0, _ = gas.mixture_viscosity(wv, np.array([120.0]), np.array([0.0]),
                                  np.array([0.0]), 1)
    np.testing.assert_allclose(float(v0[0]), 1.2e-5, rtol=0.05)


def test_co2_gas_viscosity_range():
    gas = CO2NCG()
    v, err = gas.gas_viscosity(np.array([1e5, 1e6, 31e6]),
                               np.array([50.0, 50.0, 50.0]))
    assert not np.asarray(err)[0] and not np.asarray(err)[1]
    assert np.asarray(err)[2]  # > 300 bar out of range
    assert 1e-5 < float(v[0]) < 2e-5
