"""Thermodynamic constants and the backend interface.

Constants follow the reference (/root/reference/src/thermodynamics.F90:37-41).
All temperatures in the public API are in degrees Celsius, pressures in Pa,
matching the reference convention.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

Array = jnp.ndarray

# Physical constants (thermodynamics.F90:37-41)
RCONST = 0.461526e3  # specific gas constant of water (J/kg/K)
TC_K = 273.15  # Celsius -> Kelvin offset
WATER_MOLECULAR_WEIGHT = 18.01528  # g/mol
GAS_CONSTANT = 8.3144598  # J/mol/K
TTRIPLE = 0.01  # triple point of water (deg C)

# Critical point (IAPWS.F90:283-286)
TCRITICAL_K = 647.096
TCRITICAL = TCRITICAL_K - TC_K
PCRITICAL = 22.064e6
DCRITICAL = 322.0

# Phase-composition bitmask (IAPWS.F90:317-325): bit 0 = liquid,
# bit 1 = vapour, bit 2 = supercritical.
PHASE_LIQUID = 0b001
PHASE_VAPOUR = 0b010
PHASE_SUPERCRITICAL = 0b100


class Thermodynamics:
    """Interface of a pure-water thermodynamics backend.

    Concrete backends (IAPWS97, IFC67) provide pure elementwise functions:

    - ``saturation_pressure(t) -> (p, err)``
    - ``saturation_temperature(p) -> (t, err)``
    - ``water_properties(p, t) -> (density, internal_energy, err)``
    - ``steam_properties(p, t) -> (density, internal_energy, err)``
    - ``supercritical_properties(d, t) -> (pressure, internal_energy, err)``
    - ``viscosity(region, t, p, density) -> mu``
    - ``phase_composition(region, p, t) -> bitmask``

    ``err`` outputs are boolean arrays (True = out of operating range);
    out-of-range results are finite garbage, never NaN, so that domain
    errors can propagate as flags through jitted code (the analogue of
    the reference's collective error-flag handling, mpi_utils.F90:37-56).
    """

    name: str = "abstract"
    tcritical: float = TCRITICAL
    tcritical_k: float = TCRITICAL_K
    pcritical: float = PCRITICAL
    dcritical: float = DCRITICAL

    # Region indices follow the reference: 1 = liquid water, 2 = dry steam,
    # 3 = supercritical, 4 = two-phase (not a property region).
    def region_properties(self, region: Array, p: Array, t: Array):
        raise NotImplementedError

    def phase_composition(self, region: Array, p: Array, t: Array) -> Array:
        """Phase-composition bitmask per cell (IAPWS.F90:317-364)."""
        ps, ps_err = self.saturation_pressure(t)
        subcritical = t <= self.tcritical
        r3_phase = jnp.where(p >= ps, PHASE_LIQUID, PHASE_VAPOUR)
        sub = jnp.where(
            region == 1,
            PHASE_LIQUID,
            jnp.where(region == 2, PHASE_VAPOUR, r3_phase),
        )
        sup = jnp.where(p <= self.pcritical, PHASE_VAPOUR, PHASE_SUPERCRITICAL)
        phases = jnp.where(
            region == 4,
            PHASE_LIQUID | PHASE_VAPOUR,
            jnp.where(subcritical, sub, sup),
        )
        return phases.astype(jnp.int32)
