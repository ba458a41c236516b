"""Non-isothermal pure water EOS ("we").

Counterpart of eos_we.F90: 2 primary variables ([P, T] single-phase,
[P, S_v] two-phase), regions 1 (liquid), 2 (steam), 4 (two-phase), with
saturation-line transitions that interpolate the Newton path
(eos_we.F90:149-323).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from waiwera_tpu.eos.base import EOS
from waiwera_tpu.physics.state import FluidState, RockState

Array = jnp.ndarray

_SMALL = 1e-6  # transition nudge (eos_we.F90 parameter small)


class EOSWaterEnergy(EOS):
    name = "we"
    description = "Pure water and energy"
    num_primary_variables = 2
    num_phases = 2
    num_mobile_phases = 2
    num_components = 1
    phase_names = ("liquid", "vapour")
    component_names = ("water",)
    primary_variable_names = ("pressure", "temperature/vapour_saturation")
    default_region = 1
    isothermal = False
    required_output_fluid_fields = (
        "pressure",
        "temperature",
        "region",
        "vapour_saturation",
    )
    default_output_fluid_fields = required_output_fluid_fields

    def __init__(self, config, thermo, relperm, capillarity):
        super().__init__(thermo, relperm, capillarity)
        eos_cfg = config.get("eos", {}) if config else {}
        primary_cfg = (
            eos_cfg.get("primary", {}) if isinstance(eos_cfg, dict) else {}
        )
        scale_cfg = primary_cfg.get("scale", {})
        p_scale = float(scale_cfg.get("pressure", 1.0e6))
        t_scale = float(scale_cfg.get("temperature", 1.0e2))
        # [region, var]; region 4 scales S_v by 1 (eos_we.F90:106-112)
        self.primary_scale = np.array(
            [
                [p_scale, t_scale],
                [p_scale, t_scale],
                [0.0, 0.0],  # region 3 unused
                [p_scale, 1.0],
            ]
        )
        self.default_primary = np.array([1.0e5, 20.0])

    # -- properties --------------------------------------------------

    def temperature_of(self, primary: Array, region: Array):
        """Per-cell temperature: primary T if single-phase, Tsat(P) in
        two-phase (eos_we.F90 bulk_properties)."""
        p = primary[:, 0]
        tsat, sat_err = self.thermo.saturation_temperature(p)
        two_phase = region == 4
        t = jnp.where(two_phase, tsat, primary[:, 1])
        err = two_phase & sat_err
        return t, err

    def phase_saturations(self, primary: Array, region: Array) -> Array:
        """[N, 2] (liquid, vapour) saturations (eos_we.F90:376-399)."""
        sv = jnp.where(
            region == 4,
            primary[:, 1],
            jnp.where(region == 2, 1.0, 0.0),
        )
        return jnp.stack([1.0 - sv, sv], axis=-1)

    def properties(self, primary: Array, region: Array, rock: RockState):
        p = primary[:, 0]
        t, err = self.temperature_of(primary, region)
        phases = self.phase_composition(region, p, t)
        sat = self.phase_saturations(primary, region)
        sl = sat[:, 0]

        relperm = self.relative_permeability(sl)  # [N, 2]
        cp_l = self.capillary_pressure(sl, t)
        cap = jnp.stack([cp_l, jnp.zeros_like(cp_l)], axis=-1)

        dl, ul, el = self.thermo.water_properties(p, t)
        dv, uv, ev = self.thermo.steam_properties(p, t)

        present = (phases[:, None] >> jnp.arange(2, dtype=jnp.int32)) & 1 > 0
        density = jnp.stack([dl, dv], axis=-1)
        energy = jnp.stack([ul, uv], axis=-1)
        enthalpy = energy + p[:, None] / jnp.where(density > 0, density, 1.0)
        visc = jnp.stack(
            [
                self.thermo.phase_viscosity(0, t, p, dl),
                self.thermo.phase_viscosity(1, t, p, dv),
            ],
            axis=-1,
        )
        prop_err = jnp.stack([el, ev], axis=-1)
        err = err | jnp.any(present & prop_err, axis=-1)

        zero = jnp.zeros_like(density)
        fluid = FluidState(
            pressure=p,
            temperature=t,
            region=region.astype(jnp.int32),
            old_region=region.astype(jnp.int32),
            phase_composition=phases,
            permeability_factor=jnp.ones_like(p),
            partial_pressure=p[:, None],
            density=jnp.where(present, density, zero),
            viscosity=jnp.where(present, visc, zero),
            saturation=sat,
            relative_permeability=jnp.where(present, relperm, zero),
            capillary_pressure=jnp.where(present, cap, zero),
            specific_enthalpy=jnp.where(present, enthalpy, zero),
            internal_energy=jnp.where(present, energy, zero),
            mass_fraction=jnp.where(present, 1.0, 0.0)[:, :, None],
        )
        return fluid, err

    # -- transitions (eos_we.F90:149-323) ---------------------------

    def transition(self, old_primary, primary, region, old_temperature):
        p = primary[:, 0]
        second = primary[:, 1]
        old_region = region

        was_two_phase = old_region == 4

        # --- two-phase -> single-phase -----------------------------
        to_liquid = was_two_phase & (second < 0.0)
        to_vapour = was_two_phase & (second > 1.0)
        bound = jnp.where(to_liquid, 0.0, 1.0)
        pressure_factor = jnp.where(
            to_liquid, 1.0 + _SMALL, 1.0 - _SMALL
        )
        ds = second - old_primary[:, 1]
        xi = jnp.where(jnp.abs(ds) > 1e-30, (bound - old_primary[:, 1]) / jnp.where(jnp.abs(ds) > 1e-30, ds, 1.0), -1.0)
        xi_ok = (xi >= 0.0) & (xi <= 1.0)
        p_interp = old_primary[:, 0] + xi * (p - old_primary[:, 0])
        t_interp, terr = self.thermo.saturation_temperature(p_interp)
        # fallback: old fluid temperature's saturation pressure
        p_old_sat, perr = self.thermo.saturation_pressure(old_temperature)
        sp_pressure = jnp.where(
            xi_ok & ~terr, pressure_factor * p_interp,
            pressure_factor * p_old_sat,
        )
        sp_temperature = jnp.where(xi_ok & ~terr, t_interp, old_temperature)
        sp_err = jnp.where(xi_ok & ~terr, jnp.zeros_like(terr), perr)
        sp_region = jnp.where(to_liquid, 1, 2)

        # --- single-phase -> two-phase -----------------------------
        psat_new, psat_err = self.thermo.saturation_pressure(second)
        crossing = (~was_two_phase) & ~psat_err & (
            ((old_region == 1) & (p < psat_new))
            | ((old_region == 2) & (p > psat_new))
        )
        # root find along the straight line from old to new primaries of
        # f(x) = P(x) - Psat(T(x)) by fixed-iteration bisection
        # (replaces the reference's saturation_line_finder).
        p0 = old_primary[:, 0]
        t0 = old_primary[:, 1]
        dp = p - p0
        dt = second - t0

        def f_of(x):
            ps, _ = self.thermo.saturation_pressure(t0 + x * dt)
            return (p0 + x * dp) - ps

        f0 = f_of(jnp.zeros_like(p))
        f1 = f_of(jnp.ones_like(p))
        bracket = f0 * f1 < 0.0

        def bisect_body(_, ab):
            a, b, fa = ab
            m = 0.5 * (a + b)
            fm = f_of(m)
            go_left = fa * fm <= 0.0
            return (
                jnp.where(go_left, a, m),
                jnp.where(go_left, m, b),
                jnp.where(go_left, fa, fm),
            )

        a, b, _ = lax.fori_loop(
            0,
            50,
            bisect_body,
            (jnp.zeros_like(p), jnp.ones_like(p), f0),
        )
        x_root = 0.5 * (a + b)
        tp_pressure = jnp.where(
            bracket, p0 + x_root * dp, psat_new
        )
        old_single_liquid = old_region == 1
        tp_sv = jnp.where(old_single_liquid, _SMALL, 1.0 - _SMALL)

        # --- combine -----------------------------------------------
        goes_single = to_liquid | to_vapour
        new_region = jnp.where(
            goes_single,
            sp_region,
            jnp.where(crossing, 4, old_region),
        ).astype(jnp.int32)
        new_p = jnp.where(
            goes_single,
            sp_pressure,
            jnp.where(crossing, tp_pressure, p),
        )
        new_second = jnp.where(
            goes_single,
            sp_temperature,
            jnp.where(crossing, tp_sv, second),
        )
        transition = goes_single | crossing
        err = jnp.where(goes_single, sp_err, jnp.zeros_like(sp_err))
        new_primary = jnp.stack([new_p, new_second], axis=-1)
        return new_primary, new_region, transition, err

    def check_primary_variables(self, primary, region):
        """Bounds (eos_we.F90:474-516): P in [0, 100e6]; T in [0, 800]
        single-phase; S_v in [-1, 2] two-phase."""
        p = primary[:, 0]
        x = primary[:, 1]
        p_bad = (p < 0.0) | (p > 100.0e6)
        two_phase = region == 4
        x_bad = jnp.where(
            two_phase,
            (x < -1.0) | (x > 2.0),
            (x < 0.0) | (x > 800.0),
        )
        return primary, p_bad | x_bad

    def primary_from_output_fields(self, fields):
        import numpy as np

        p = np.asarray(fields["pressure"], dtype=np.float64)
        t = np.asarray(fields["temperature"], dtype=np.float64)
        sv = np.asarray(fields["vapour_saturation"], dtype=np.float64)
        region = np.asarray(fields["region"], dtype=np.int32)
        second = np.where(region == 4, sv, t)
        return np.stack([p, second], axis=-1), region

    def primary_variables(self, fluid: FluidState) -> Array:
        second = jnp.where(
            fluid.region == 4, fluid.saturation[:, 1], fluid.temperature
        )
        return jnp.stack([fluid.pressure, second], axis=-1)
