"""Water + non-condensible gas + energy EOS ("wge", with "wae" = air
and "wce" = CO2 bindings).

Counterpart of eos_wge.F90 (and the thin eos_wae.F90 / eos_wce.F90
subclasses): 3 primary variables [P, T|S_v, Pg], regions 1/2/4, Henry's
law gas dissolution in the liquid phase, gas/steam mixtures in the
vapour phase, and saturation-line transitions expressed in terms of the
water partial pressure P - Pg.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from waiwera_tpu.eos.base import EOS
from waiwera_tpu.physics.state import FluidState, RockState
from waiwera_tpu.thermo import ncg as ncg_mod

Array = jnp.ndarray

_SMALL = 1e-6


class EOSWaterGasEnergy(EOS):
    num_primary_variables = 3
    num_phases = 2
    num_mobile_phases = 2
    num_components = 2
    phase_names = ("liquid", "vapour")
    component_names = ("water", "gas")
    primary_variable_names = (
        "pressure",
        "temperature/vapour_saturation",
        "gas partial pressure",
    )
    default_region = 1
    isothermal = False
    required_output_fluid_fields = (
        "pressure",
        "temperature",
        "region",
        "gas_partial_pressure",
        "vapour_saturation",
    )
    default_output_fluid_fields = required_output_fluid_fields

    def __init__(self, config, thermo, relperm, capillarity, name="wge"):
        super().__init__(thermo, relperm, capillarity)
        self.name = name
        gas_name = {"wge": None, "wae": "air", "wce": "co2"}[name]
        if gas_name is None:
            # generic gas selected by eos.gas (defaults to air)
            eos_cfg = config.get("eos", {}) if config else {}
            gas_name = (
                eos_cfg.get("gas", "air")
                if isinstance(eos_cfg, dict)
                else "air"
            )
        self.gas = ncg_mod.from_name(gas_name)
        self.description = f"Water, {self.gas.name} and energy"
        self.component_names = ("water", self.gas.name)

        eos_cfg = config.get("eos", {}) if config else {}
        primary_cfg = (
            eos_cfg.get("primary", {}) if isinstance(eos_cfg, dict) else {}
        )
        scale_cfg = primary_cfg.get("scale", {})
        p_scale = float(scale_cfg.get("pressure", 1.0e6))
        t_scale = float(scale_cfg.get("temperature", 1.0e2))
        pp_spec = scale_cfg.get("partial_pressure", "adaptive")
        self.adaptive_pp_scale = not isinstance(pp_spec, (int, float))
        pp_scale = (
            float(pp_spec) if not self.adaptive_pp_scale else 1.0e6
        )
        self.primary_scale = np.array(
            [
                [p_scale, t_scale, pp_scale],
                [p_scale, t_scale, pp_scale],
                [0.0, 0.0, 0.0],
                [p_scale, 1.0, pp_scale],
            ]
        )
        self.default_primary = np.array([1.0e5, 20.0, 0.0])

    # -- adaptive partial-pressure scaling (eos_wge.F90:639-674) ------

    def scale(self, primary: Array, region: Array) -> Array:
        s = jnp.asarray(self.primary_scale)[region - 1]
        scaled = primary / s
        if self.adaptive_pp_scale:
            p = primary[..., 0]
            pp = primary[..., 2] / jnp.where(p > 0, p, 1.0)
            scaled = scaled.at[..., 2].set(pp)
        return scaled

    def unscale(self, scaled: Array, region: Array) -> Array:
        s = jnp.asarray(self.primary_scale)[region - 1]
        primary = scaled * s
        if self.adaptive_pp_scale:
            p = primary[..., 0]
            primary = primary.at[..., 2].set(scaled[..., 2] * p)
        return primary

    # -- properties ----------------------------------------------------

    def phase_saturations(self, primary, region):
        sv = jnp.where(
            region == 4,
            primary[:, 1],
            jnp.where(region == 2, 1.0, 0.0),
        )
        return jnp.stack([1.0 - sv, sv], axis=-1)

    def properties(self, primary: Array, region: Array, rock: RockState):
        p = primary[:, 0]
        pg = primary[:, 2]
        pw = p - pg
        tsat, sat_err = self.thermo.saturation_temperature(pw)
        two_phase = region == 4
        t = jnp.where(two_phase, tsat, primary[:, 1])
        err = two_phase & sat_err

        phases = self.phase_composition(region, p, t)
        sat = self.phase_saturations(primary, region)
        sl = sat[:, 0]

        relperm = self.relative_permeability(sl)
        cp_l = self.capillary_pressure(sl, t)
        cap = jnp.stack([cp_l, jnp.zeros_like(cp_l)], axis=-1)

        # gas properties at (Pg, T) (eos_wge.F90:435-438)
        gd, gh, gerr = self.gas.properties(pg, t)
        henry = self.gas.henrys_constant(t)
        esol = self.gas.energy_solution(t)

        # liquid phase: water at total pressure
        dl, ul, el = self.thermo.water_properties(p, t)
        hl_w = ul + p / jnp.where(dl > 0, dl, 1.0)
        xg_l = self.gas.mass_fraction(pg, t, 0, 0.0, dl, henry)
        rho_l = dl  # gas density effectively 0 in liquid
        h_l = hl_w * (1.0 - xg_l) + (gh + esol) * xg_l
        u_l = h_l - p / jnp.where(rho_l > 0, rho_l, 1.0)
        visc_w_l = self.thermo.phase_viscosity(0, t, p, dl)
        visc_l, verr_l = self.gas.mixture_viscosity(visc_w_l, t, pg, xg_l, 0)

        # vapour phase: steam at water partial pressure + gas
        dv, uv, ev = self.thermo.steam_properties(pw, t)
        hv_w = uv + pw / jnp.where(dv > 0, dv, 1.0)
        rho_v = dv + gd
        xg_v = self.gas.mass_fraction(pg, t, 1, gd, dv, henry)
        h_v = hv_w * (1.0 - xg_v) + gh * xg_v
        u_v = h_v - p / jnp.where(rho_v > 0, rho_v, 1.0)
        visc_w_v = self.thermo.phase_viscosity(1, t, p, dv)
        visc_v, verr_v = self.gas.mixture_viscosity(visc_w_v, t, pg, xg_v, 1)

        present = (phases[:, None] >> jnp.arange(2, dtype=jnp.int32)) & 1 > 0
        in_l = present[:, 0]
        in_v = present[:, 1]
        err = err | gerr
        err = err | (in_l & (el | verr_l)) | (in_v & (ev | verr_v))

        density = jnp.stack([rho_l, rho_v], axis=-1)
        energy = jnp.stack([u_l, u_v], axis=-1)
        enthalpy = jnp.stack([h_l, h_v], axis=-1)
        visc = jnp.stack([visc_l, visc_v], axis=-1)
        xg = jnp.stack([xg_l, xg_v], axis=-1)
        mass_frac = jnp.stack([1.0 - xg, xg], axis=-1)  # [N, np, nc]

        zero = jnp.zeros_like(density)
        fluid = FluidState(
            pressure=p,
            temperature=t,
            region=region.astype(jnp.int32),
            old_region=region.astype(jnp.int32),
            phase_composition=phases,
            permeability_factor=jnp.ones_like(p),
            partial_pressure=jnp.stack([pw, pg], axis=-1),
            density=jnp.where(present, density, zero),
            viscosity=jnp.where(present, visc, zero),
            saturation=sat,
            relative_permeability=jnp.where(present, relperm, zero),
            capillary_pressure=jnp.where(present, cap, zero),
            specific_enthalpy=jnp.where(present, enthalpy, zero),
            internal_energy=jnp.where(present, energy, zero),
            mass_fraction=jnp.where(present[:, :, None], mass_frac, 0.0),
        )
        return fluid, err

    # -- transitions (eos_wge.F90:130-345) ----------------------------

    def transition(self, old_primary, primary, region, old_temperature):
        p = primary[:, 0]
        second = primary[:, 1]
        pg = jnp.clip(primary[:, 2], 0.0, p)
        old_region = region
        was_two_phase = old_region == 4

        # --- two-phase -> single-phase -------------------------------
        to_liquid = was_two_phase & (second < 0.0)
        to_vapour = was_two_phase & (second > 1.0)
        bound = jnp.where(to_liquid, 0.0, 1.0)
        pressure_factor = jnp.where(to_liquid, 1.0 + _SMALL, 1.0 - _SMALL)
        ds = second - old_primary[:, 1]
        xi = jnp.where(
            jnp.abs(ds) > 1e-30,
            (bound - old_primary[:, 1]) / jnp.where(jnp.abs(ds) > 1e-30, ds, 1.0),
            -1.0,
        )
        xi_ok = (xi >= 0.0) & (xi <= 1.0)
        p_i = old_primary[:, 0] + xi * (p - old_primary[:, 0])
        pg_i = old_primary[:, 2] + xi * (pg - old_primary[:, 2])
        pw_i = p_i - pg_i
        t_i, terr = self.thermo.saturation_temperature(pw_i)
        p_old_sat, perr = self.thermo.saturation_pressure(old_temperature)
        ok = xi_ok & ~terr
        sp_pressure = jnp.where(
            ok,
            pressure_factor * pw_i + pg_i,
            pressure_factor * p_old_sat + pg,
        )
        sp_pg = jnp.where(ok, pg_i, pg)
        sp_temperature = jnp.where(ok, t_i, old_temperature)
        sp_err = jnp.where(ok, jnp.zeros_like(terr), perr)
        sp_region = jnp.where(to_liquid, 1, 2)

        # --- single-phase -> two-phase -------------------------------
        psat_new, psat_err = self.thermo.saturation_pressure(second)
        pw_new = p - pg
        crossing = (~was_two_phase) & ~psat_err & (
            ((old_region == 1) & (pw_new < psat_new))
            | ((old_region == 2) & (pw_new > psat_new))
        )
        p0 = old_primary[:, 0]
        t0 = old_primary[:, 1]
        g0 = old_primary[:, 2]
        dp = p - p0
        dt = second - t0
        dg = pg - g0

        def f_of(x):
            ps, _ = self.thermo.saturation_pressure(t0 + x * dt)
            return (p0 + x * dp) - (g0 + x * dg) - ps

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
            0, 50, bisect_body, (jnp.zeros_like(p), jnp.ones_like(p), f0)
        )
        x_root = 0.5 * (a + b)
        tp_pressure = jnp.where(bracket, p0 + x_root * dp, psat_new + pg)
        tp_pg = jnp.where(bracket, g0 + x_root * dg, pg)
        tp_sv = jnp.where(old_region == 1, _SMALL, 1.0 - _SMALL)

        # --- combine --------------------------------------------------
        goes_single = to_liquid | to_vapour
        new_region = jnp.where(
            goes_single, sp_region, jnp.where(crossing, 4, old_region)
        ).astype(jnp.int32)
        new_p = jnp.where(
            goes_single, sp_pressure, jnp.where(crossing, tp_pressure, p)
        )
        new_second = jnp.where(
            goes_single, sp_temperature, jnp.where(crossing, tp_sv, second)
        )
        new_pg = jnp.where(
            goes_single, sp_pg, jnp.where(crossing, tp_pg, pg)
        )
        transition = goes_single | crossing
        err = jnp.where(goes_single, sp_err, jnp.zeros_like(sp_err))
        new_primary = jnp.stack([new_p, new_second, new_pg], axis=-1)
        return new_primary, new_region, transition, err

    def check_primary_variables(self, primary, region):
        """Bounds with partial-pressure clamping
        (eos_wge.F90:573-634)."""
        p = primary[:, 0]
        x = primary[:, 1]
        pg = primary[:, 2]
        p_bad = p <= 0.0
        pg_max = (1.0 - _SMALL) * jnp.maximum(p, 0.0)
        pg_new = jnp.clip(pg, 0.0, pg_max)
        pw = p - pg_new
        pw_bad = pw > 100.0e6
        two_phase = region == 4
        x_bad = jnp.where(
            two_phase,
            (x < -1.0) | (x > 2.0),
            (x < 0.0) | (x > 800.0),
        )
        out = jnp.stack([p, x, pg_new], axis=-1)
        return out, p_bad | pw_bad | x_bad

    def primary_from_output_fields(self, fields):
        p = np.asarray(fields["pressure"], dtype=np.float64)
        t = np.asarray(fields["temperature"], dtype=np.float64)
        sv = np.asarray(fields["vapour_saturation"], dtype=np.float64)
        pg = np.asarray(fields["gas_partial_pressure"], dtype=np.float64)
        region = np.asarray(fields["region"], dtype=np.int32)
        second = np.where(region == 4, sv, t)
        return np.stack([p, second, pg], axis=-1), region

    def primary_variables(self, fluid: FluidState) -> Array:
        second = jnp.where(
            fluid.region == 4, fluid.saturation[:, 1], fluid.temperature
        )
        return jnp.stack(
            [fluid.pressure, second, fluid.partial_pressure[:, 1]], axis=-1
        )
