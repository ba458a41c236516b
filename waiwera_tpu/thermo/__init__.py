"""Thermodynamics formulations (pure-water property backends).

Mirrors the role of the reference's thermodynamics layer
(/root/reference/src/thermodynamics.F90, IAPWS.F90, IFC67.F90) as pure,
vectorised JAX functions over arrays of (pressure, temperature).
"""

from waiwera_tpu.thermo.base import (
    TC_K,
    RCONST,
    TCRITICAL,
    TCRITICAL_K,
    PCRITICAL,
    DCRITICAL,
    PHASE_LIQUID,
    PHASE_VAPOUR,
    PHASE_SUPERCRITICAL,
    Thermodynamics,
)
from waiwera_tpu.thermo import iapws97
from waiwera_tpu.thermo.iapws97 import IAPWS97


def from_name(name: str) -> Thermodynamics:
    """Thermodynamics backend selection by JSON name.

    Reference: thermodynamics_setup.F90:18-95 (names "iapws"/"ifc67").
    """
    key = name.strip().lower()
    if key in ("iapws", "iapws97", "iapws-97"):
        return IAPWS97()
    if key in ("ifc67", "ifc-67"):
        from waiwera_tpu.thermo.ifc67 import IFC67

        return IFC67()
    raise ValueError(f"unknown thermodynamics: {name!r}")
