"""Capillary pressure functions.

Vectorised counterparts of the reference models
(/root/reference/src/capillary_pressure.F90:396-402): zero, linear,
van_genuchten, table. Each maps (sl, t) [...] -> capillary pressure of
the liquid phase (Pa, <= 0).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.utils.interpolation import InterpolationTable

Array = jnp.ndarray


class CapillaryPressure:
    name = "abstract"

    def __call__(self, sl: Array, t: Array) -> Array:
        raise NotImplementedError


class Zero(CapillaryPressure):
    name = "zero"

    def __call__(self, sl, t):
        return jnp.zeros_like(jnp.asarray(sl, jnp.float64))


class LinearCP(CapillaryPressure):
    """Linear in sl between saturation limits, from -pressure to 0
    (capillary_pressure.F90:186-214)."""

    name = "linear"

    def __init__(self, saturation_limits=(0.0, 1.0), pressure=0.125e5):
        lo, hi = map(float, saturation_limits)
        if hi <= lo:
            # degenerate limits (e.g. [0, 0]): step from -P to 0 at lo
            hi = lo + 1e-10
        self.table = InterpolationTable(
            np.array([[lo, -float(pressure)], [hi, 0.0]])
        )

    def __call__(self, sl, t):
        return self.table.component(jnp.asarray(sl, jnp.float64), 0)


class VanGenuchtenCP(CapillaryPressure):
    """van Genuchten capillary pressure
    (capillary_pressure.F90:274-305)."""

    name = "van_genuchten"

    def __init__(self, P0=0.125e5, lam=0.45, slr=1e-3, sls=1.0, Pmax=None):
        self.P0 = float(P0)
        self.lam = float(lam)
        self.slr = float(slr)
        self.sls = float(sls)
        self.apply_Pmax = Pmax is not None
        self.Pmax = abs(float(Pmax)) if Pmax is not None else 0.0

    def __call__(self, sl, t):
        sl = jnp.asarray(sl, jnp.float64)
        eps = 1e-3
        sstar = (sl - self.slr) / (self.sls - self.slr)
        ss = jnp.clip(sstar, 1e-10, 1.0 - 1e-14)
        cp_mid = -self.P0 * (ss ** (-1.0 / self.lam) - 1.0) ** (1.0 - self.lam)
        cp = jnp.where(
            sstar < 0.0, -self.Pmax, jnp.where(sstar < 1.0, cp_mid, 0.0)
        )
        cp = jnp.minimum(0.0, cp)
        if self.apply_Pmax:
            cp = jnp.maximum(-self.Pmax, cp)
        cp = jnp.where(sl > 1.0 - eps, cp * (1.0 - sl) / eps, cp)
        return jnp.where(sl < 1.0, cp, 0.0)


class TableCP(CapillaryPressure):
    """Tabulated cp(sl) (capillary_pressure.F90:324-356)."""

    name = "table"

    def __init__(self, pressure, interpolation="linear"):
        self.table = InterpolationTable(
            np.asarray(pressure), interpolation=interpolation
        )

    def __call__(self, sl, t):
        return self.table.component(jnp.asarray(sl, jnp.float64), 0)


def from_json(spec: dict | None) -> CapillaryPressure:
    """Construct from the JSON 'rock.capillary_pressure' object
    (capillary_pressure.F90:380-453)."""
    if not spec:
        return Zero()
    kind = spec.get("type", "zero").lower().replace(" ", "_").replace(
        "-", "_"
    )
    if kind == "zero":
        return Zero()
    if kind == "linear":
        return LinearCP(
            spec.get("saturation_limits", [0.0, 1.0]),
            spec.get("pressure", 0.125e5),
        )
    if kind == "van_genuchten":
        return VanGenuchtenCP(
            spec.get("P0", 0.125e5),
            spec.get("lambda", 0.45),
            spec.get("slr", 1e-3),
            spec.get("sls", 1.0),
            spec.get("Pmax", None),
        )
    if kind == "table":
        return TableCP(
            spec.get("pressure", [[0.0, 0.0], [1.0, 0.0]]),
            spec.get("interpolation", "linear"),
        )
    raise ValueError(f"unknown capillary pressure type: {kind!r}")
