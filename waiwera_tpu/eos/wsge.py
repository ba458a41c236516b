"""Water + salt + non-condensible gas + energy EOS ("wsge", with
"wsae" = air and "wsce" = CO2 bindings).

Counterpart of eos_wsge.F90 (+ thin eos_wsae.F90 / eos_wsce.F90):
4 primary variables [P, T|S_v, X_salt|S_solid, Pg], 3 phases, 3
components (water, salt, gas). Extends the wse salt machinery with
the wge gas machinery: water partial pressure Pw = P - Pg drives the
brine saturation line (eos_wsge.F90:625-671), gas dissolves in brine
by Henry's law with salting-out correction
(ncg_*_henrys_constant_salt), and the vapour phase is a steam(Pw) +
gas(Pg) mixture.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from waiwera_tpu.eos.wse import (
    EOSWaterSaltEnergy,
    WATER_REGION,
    HALITE,
    _SMALL,
)
from waiwera_tpu.physics.state import FluidState, RockState
from waiwera_tpu.thermo import ncg as ncg_mod
from waiwera_tpu.thermo import salt as salt_mod

Array = jnp.ndarray


class EOSWaterSaltGasEnergy(EOSWaterSaltEnergy):
    name = "wsge"
    description = "Water, salt, non-condensible gas and energy"
    num_primary_variables = 4
    num_components = 3
    component_names = ("water", "salt", "gas")
    primary_variable_names = (
        "pressure",
        "temperature/vapour_saturation",
        "salt_mass_fraction/solid_saturation",
        "gas partial pressure",
    )
    required_output_fluid_fields = (
        "pressure",
        "temperature",
        "region",
        "vapour_saturation",
        "liquid_salt_mass_fraction",
        "solid_saturation",
        "gas_partial_pressure",
    )
    default_output_fluid_fields = required_output_fluid_fields

    def __init__(self, config, thermo, relperm, capillarity, name="wsge"):
        super().__init__(config, thermo, relperm, capillarity)
        self.name = name
        gas_name = {"wsge": None, "wsae": "air", "wsce": "co2"}[name]
        if gas_name is None:
            eos_cfg = (config or {}).get("eos", {}) or {}
            gas_name = (
                eos_cfg.get("gas", "air") if isinstance(eos_cfg, dict)
                else "air"
            )
        self.gas = ncg_mod.from_name(gas_name)
        self.description = f"Water, salt, {self.gas.name} and energy"
        self.component_names = ("water", "salt", self.gas.name)

        eos_cfg = (config or {}).get("eos", {}) or {}
        if not isinstance(eos_cfg, dict):
            eos_cfg = {}
        scale_cfg = (eos_cfg.get("primary", {}) or {}).get("scale", {}) or {}
        ps = float(scale_cfg.get("pressure", 1.0e6))
        ts = float(scale_cfg.get("temperature", 1.0e2))
        pp_spec = scale_cfg.get("partial_pressure", "adaptive")
        self.adaptive_pp_scale = not isinstance(pp_spec, (int, float))
        pps = float(pp_spec) if not self.adaptive_pp_scale else 1.0e6
        row_sp = [ps, ts, 1.0, pps]
        row_tp = [ps, 1.0, 1.0, pps]
        zero = [1.0, 1.0, 1.0, 1.0]
        self.primary_scale = np.array(
            [row_sp, row_sp, zero, row_tp, row_sp, row_sp, zero, row_tp]
        )
        self.default_primary = np.array([1.0e5, 20.0, 0.0, 0.0])

    # adaptive partial-pressure scaling (eos_wsge.F90:963-1010)
    def scale(self, primary: Array, region: Array) -> Array:
        s = jnp.asarray(self.primary_scale)[region - 1]
        scaled = primary / s
        if self.adaptive_pp_scale:
            p = primary[..., 0]
            scaled = scaled.at[..., 3].set(
                primary[..., 3] / jnp.where(p > 0, p, 1.0)
            )
        return scaled

    def unscale(self, scaled: Array, region: Array) -> Array:
        s = jnp.asarray(self.primary_scale)[region - 1]
        primary = scaled * s
        if self.adaptive_pp_scale:
            p = primary[..., 0]
            primary = primary.at[..., 3].set(scaled[..., 3] * p)
        return primary

    def properties(self, primary: Array, region: Array, rock: RockState):
        thermo = self.thermo
        gas = self.gas
        p = primary[:, 0]
        pg = jnp.clip(primary[:, 3], 0.0, p)
        pw = p - pg
        wr = self._wr(region)
        hal = self._halite(region)
        two_phase = wr == 4

        # temperature: brine saturation line at the WATER partial
        # pressure (eos_wsge.F90:646-661)
        xs_tp, err_tp = salt_mod.halite_solubility_two_phase(thermo, pw)
        xs_guess = jnp.where(
            two_phase,
            jnp.where(hal, xs_tp, jnp.clip(primary[:, 2], 0.0, 1.0)),
            0.0,
        )
        t_brine, terr = salt_mod.brine_saturation_temperature(
            thermo, pw, xs_guess
        )
        t = jnp.where(two_phase, t_brine, primary[:, 1])
        err = two_phase & (terr | (hal & err_tp))

        xs_sol, serr = salt_mod.halite_solubility(t)
        xs = jnp.where(
            hal,
            xs_sol,
            jnp.where(region == 2, 0.0,
                      jnp.clip(primary[:, 2], 0.0, 1.0)),
        )
        err = err | (hal & serr)

        phases_w = thermo.phase_composition(wr, p, t)
        sl, sv, ss = self._saturations(primary, region)
        solid_present = hal | (region == 2)
        phases = phases_w | jnp.where(solid_present & (ss > 0.0), 4, 0)

        denom = jnp.where(ss < 1.0, 1.0 - ss, 1.0)
        sl_eff = sl / denom
        relperm2 = self.relative_permeability(sl_eff)
        cp_l = self.capillary_pressure(sl_eff, t)

        # gas properties at (Pg, T)
        gd, gh, gerr = gas.properties(pg, t)
        henry = gas.henrys_constant_salt(t, xs)
        esol = gas.energy_solution_salt(t, xs)

        # liquid: brine at total pressure + dissolved gas
        dl, ul, berr = salt_mod.brine_properties(thermo, p, t, xs)
        hl_b = ul + p / jnp.where(dl > 0, dl, 1.0)
        xg_l = gas.mass_fraction(pg, t, 0, 0.0, dl, henry)
        h_l = hl_b * (1.0 - xg_l) + (gh + esol) * xg_l
        rho_l = dl
        u_l = h_l - p / jnp.where(rho_l > 0, rho_l, 1.0)
        bvisc, bverr = salt_mod.brine_viscosity(thermo, t, p, xs)
        visc_l, verr_l = gas.mixture_viscosity(bvisc, t, pg, xg_l, 0)

        # vapour: steam at Pw + gas at Pg
        dv, uv, ev = thermo.steam_properties(pw, t)
        hv_w = uv + pw / jnp.where(dv > 0, dv, 1.0)
        rho_v = dv + gd
        xg_v = gas.mass_fraction(pg, t, 1, gd, dv, henry)
        h_v = hv_w * (1.0 - xg_v) + gh * xg_v
        u_v = h_v - p / jnp.where(rho_v > 0, rho_v, 1.0)
        visc_w_v = thermo.phase_viscosity(1, t, p, dv)
        visc_v, verr_v = gas.mixture_viscosity(visc_w_v, t, pg, xg_v, 1)

        # solid halite
        dsol, usol = salt_mod.halite_properties(p, t)
        hsol = usol + p / jnp.where(dsol > 0, dsol, 1.0)

        in_l = (phases & 1) > 0
        in_v = (phases & 2) > 0
        in_s = (phases & 4) > 0
        err = err | gerr
        err = err | (in_l & (berr | bverr | verr_l)) | (in_v & (ev | verr_v))

        zero = jnp.zeros_like(p)
        one = jnp.ones_like(p)
        density = jnp.stack(
            [
                jnp.where(in_l, rho_l, 0.0),
                jnp.where(in_v, rho_v, 0.0),
                jnp.where(in_s, dsol, 0.0),
            ],
            axis=-1,
        )
        energy = jnp.stack(
            [
                jnp.where(in_l, u_l, 0.0),
                jnp.where(in_v, u_v, 0.0),
                jnp.where(in_s, usol, 0.0),
            ],
            axis=-1,
        )
        enthalpy = jnp.stack(
            [
                jnp.where(in_l, h_l, 0.0),
                jnp.where(in_v, h_v, 0.0),
                jnp.where(in_s, hsol, 0.0),
            ],
            axis=-1,
        )
        visc = jnp.stack(
            [jnp.where(in_l, visc_l, 0.0), jnp.where(in_v, visc_v, 0.0),
             zero],
            axis=-1,
        )
        relperm = jnp.stack(
            [
                jnp.where(in_l, relperm2[:, 0], 0.0),
                jnp.where(in_v, relperm2[:, 1], 0.0),
                zero,
            ],
            axis=-1,
        )
        cap = jnp.stack([jnp.where(in_l, cp_l, 0.0), zero, zero], axis=-1)
        mass_frac = jnp.stack(
            [
                jnp.stack([1.0 - xs - xg_l, xs, xg_l], axis=-1),
                jnp.stack([1.0 - xg_v, zero, xg_v], axis=-1),
                jnp.stack([zero, one, zero], axis=-1),
            ],
            axis=1,
        )  # [N, 3, 3]
        present3 = jnp.stack([in_l, in_v, in_s], axis=-1)
        mass_frac = jnp.where(present3[:, :, None], mass_frac, 0.0)

        pf = self.permeability_modifier(sl, sv)

        fluid = FluidState(
            pressure=p,
            temperature=t,
            region=region.astype(jnp.int32),
            old_region=region.astype(jnp.int32),
            phase_composition=phases.astype(jnp.int32),
            permeability_factor=pf,
            partial_pressure=jnp.stack([pw, zero, pg], axis=-1),
            density=density,
            viscosity=visc,
            saturation=jnp.stack([sl, sv, ss], axis=-1),
            relative_permeability=relperm,
            capillary_pressure=cap,
            specific_enthalpy=enthalpy,
            internal_energy=energy,
            mass_fraction=mass_frac,
        )
        return fluid, err

    # -- transitions (eos_wsge.F90:187-621): wse transitions with the
    # saturation test on the water partial pressure ----------------

    def transition(self, old_primary, primary, region, old_temperature):
        thermo = self.thermo
        old_region = region
        wr_old = self._wr(old_region)
        hal_old = self._halite(old_region)
        offset = jnp.where(hal_old, 4, 0)

        p = primary[:, 0]
        second = primary[:, 1]
        salt = primary[:, 2]
        pg = jnp.clip(primary[:, 3], 0.0, p)
        pw = p - pg

        # ---- two-phase -> single-phase ------------------------------
        ss_tp = jnp.where(hal_old, jnp.clip(salt, 0.0, 1.0), 0.0)
        to_liquid = (wr_old == 4) & (second < 0.0)
        to_vapour = (wr_old == 4) & (second > 1.0 - ss_tp)
        goes_single = to_liquid | to_vapour
        bound = jnp.where(to_liquid, 0.0, 1.0 - ss_tp)
        pressure_factor = jnp.where(to_liquid, 1.0 + _SMALL, 1.0 - _SMALL)
        ds = second - old_primary[:, 1]
        xi = jnp.where(
            jnp.abs(ds) > 1e-30,
            (bound - old_primary[:, 1])
            / jnp.where(jnp.abs(ds) > 1e-30, ds, 1.0),
            -1.0,
        )
        xi_ok = (xi >= 0.0) & (xi <= 1.0)
        interp = old_primary + jnp.clip(xi, 0.0, 1.0)[:, None] * (
            primary - old_primary
        )
        p_i = interp[:, 0]
        pg_i = jnp.clip(interp[:, 3], 0.0, p_i)
        pw_i = p_i - pg_i
        salt_i = jnp.clip(interp[:, 2], 0.0, 1.0)
        xs_tp2, e_tp = salt_mod.halite_solubility_two_phase(thermo, pw_i)
        xs_i = jnp.where(hal_old, xs_tp2, salt_i)
        t_liq, e_liq = salt_mod.brine_saturation_temperature(
            thermo, pw_i, xs_i
        )
        t_vap, e_vap = thermo.saturation_temperature(pw_i)
        t_interp = jnp.where(to_liquid, t_liq, t_vap)
        interp_err = jnp.where(to_liquid, e_liq | (hal_old & e_tp), e_vap)
        ok = xi_ok & ~interp_err
        # fallback: old-state saturation pressure + current Pg
        xs_sol_old, e_sol = salt_mod.halite_solubility(old_temperature)
        xs_old = jnp.clip(
            jnp.where(hal_old, xs_sol_old, old_primary[:, 2]), 0.0, 1.0
        )
        ps_brine_old, e_pb = salt_mod.brine_saturation_pressure(
            thermo, old_temperature, xs_old
        )
        ps_w_old, e_pw = thermo.saturation_pressure(old_temperature)
        ps_old = jnp.where(to_liquid, ps_brine_old, ps_w_old)
        fb_err = jnp.where(to_liquid, e_pb | (hal_old & e_sol), e_pw)

        sp_pressure = jnp.where(
            ok,
            pressure_factor * pw_i + pg_i,
            pressure_factor * ps_old + pg,
        )
        sp_pg = jnp.where(ok, pg_i, pg)
        sp_temperature = jnp.where(ok, t_interp, old_temperature)
        sp_salt = jnp.where(ok, jnp.maximum(0.0, salt_i), salt)
        sp_err = jnp.where(ok, jnp.zeros_like(fb_err), fb_err)
        sp_region = jnp.where(to_liquid, offset + 1, offset + 2)

        # ---- single-phase -> two-phase ------------------------------
        single = (wr_old == 1) | (wr_old == 2)
        t_sp = second
        xs_sol_t, e_sol_t = salt_mod.halite_solubility(t_sp)
        xs_sp = jnp.clip(
            jnp.where(hal_old, xs_sol_t, jnp.maximum(salt, 0.0)), 0.0, 1.0
        )
        ps_brine, e_psb = salt_mod.brine_saturation_pressure(
            thermo, t_sp, xs_sp
        )
        ps_w, e_psw = thermo.saturation_pressure(t_sp)
        psat = jnp.where(wr_old == 1, ps_brine, ps_w)
        psat_err = jnp.where(wr_old == 1, e_psb | (hal_old & e_sol_t),
                             e_psw)
        crossing = single & ~psat_err & (
            ((wr_old == 1) & (pw < psat)) | ((wr_old == 2) & (pw > psat))
        )

        p0 = old_primary[:, 0]
        dvec = primary - old_primary

        def f_of(x):
            var = old_primary + x[:, None] * dvec
            tt = var[:, 1]
            pg_x = jnp.clip(var[:, 3], 0.0, var[:, 0])
            pw_x = var[:, 0] - pg_x
            xs_x, _ = salt_mod.halite_solubility(tt)
            xs_line = jnp.clip(
                jnp.where(hal_old, xs_x, jnp.maximum(var[:, 2], 0.0)),
                0.0, 1.0,
            )
            psb, _ = salt_mod.brine_saturation_pressure(thermo, tt,
                                                        xs_line)
            psw, _ = thermo.saturation_pressure(tt)
            ps = jnp.where(wr_old == 1, psb, psw)
            return pw_x - ps

        f0 = f_of(jnp.zeros_like(p))
        f1 = f_of(jnp.ones_like(p))
        bracket = f0 * f1 < 0.0

        def bisect_body(_, ab):
            a, b, fa = ab
            m = 0.5 * (a + b)
            fm = f_of(m)
            left = fa * fm <= 0.0
            return (
                jnp.where(left, a, m),
                jnp.where(left, m, b),
                jnp.where(left, fa, fm),
            )

        a, b, _ = lax.fori_loop(
            0, 40, bisect_body,
            (jnp.zeros_like(p), jnp.ones_like(p), f0),
        )
        x_root = 0.5 * (a + b)
        interp_r = old_primary + x_root[:, None] * dvec
        tp_pressure = jnp.where(bracket, interp_r[:, 0], psat + pg)
        tp_salt = jnp.where(bracket, interp_r[:, 2], salt)
        tp_pg = jnp.where(
            bracket, jnp.clip(interp_r[:, 3], 0.0, interp_r[:, 0]), pg
        )
        ss_sp = jnp.where(hal_old, jnp.clip(salt, 0.0, 1.0), 0.0)
        tp_sv = jnp.where(wr_old == 1, _SMALL, 1.0 - ss_sp - _SMALL)
        tp_region = jnp.where(hal_old, 8, 4)

        # ---- combine ------------------------------------------------
        new_region = jnp.where(
            goes_single,
            sp_region,
            jnp.where(crossing, tp_region, old_region),
        ).astype(jnp.int32)
        new_p = jnp.where(
            goes_single, sp_pressure, jnp.where(crossing, tp_pressure, p)
        )
        new_second = jnp.where(
            goes_single, sp_temperature,
            jnp.where(crossing, tp_sv, second),
        )
        new_salt = jnp.where(
            goes_single, sp_salt, jnp.where(crossing, tp_salt, salt)
        )
        new_pg = jnp.where(
            goes_single, sp_pg, jnp.where(crossing, tp_pg, pg)
        )
        transition = goes_single | crossing
        err = jnp.where(goes_single, sp_err, jnp.zeros_like(sp_err))

        (new_p, new_second, new_salt, new_region, htrans, herr) = (
            self._halite_transition(
                new_p, new_second, new_salt, new_region, old_region
            )
        )
        transition = transition | htrans
        err = err | herr

        new_primary = jnp.stack(
            [new_p, new_second, new_salt, new_pg], axis=-1
        )
        return new_primary, new_region, transition, err

    def check_primary_variables(self, primary, region):
        p = primary[:, 0]
        x = primary[:, 1]
        salt = primary[:, 2]
        pg = primary[:, 3]
        hal = self._halite(region)
        salt_new = jnp.where(~hal & (salt < 0.0), 0.0, salt)
        salt_bad = salt_new > 1.0
        pg_max = (1.0 - _SMALL) * jnp.maximum(p, 0.0)
        pg_new = jnp.clip(pg, 0.0, pg_max)
        pw = p - pg_new
        p_bad = (p <= 0.0) | (pw > 100.0e6)
        wr = self._wr(region)
        x_bad = jnp.where(
            wr == 4,
            (x < -1.0) | (x > 2.0),
            (x < 0.0) | (x > 800.0),
        )
        out = jnp.stack([p, x, salt_new, pg_new], axis=-1)
        return out, p_bad | x_bad | salt_bad

    def primary_variables(self, fluid: FluidState) -> Array:
        wr = self._wr(fluid.region)
        hal = self._halite(fluid.region)
        second = jnp.where(
            wr == 4, fluid.saturation[:, 1], fluid.temperature
        )
        third = jnp.where(
            hal, fluid.saturation[:, 2], fluid.mass_fraction[:, 0, 1]
        )
        return jnp.stack(
            [fluid.pressure, second, third, fluid.partial_pressure[:, 2]],
            axis=-1,
        )

    def primary_from_output_fields(self, fields):
        p = np.asarray(fields["pressure"], np.float64)
        t = np.asarray(fields["temperature"], np.float64)
        sv = np.asarray(fields["vapour_saturation"], np.float64)
        xs = np.asarray(fields["liquid_salt_mass_fraction"], np.float64)
        ss = np.asarray(fields["solid_saturation"], np.float64)
        pg = np.asarray(fields["gas_partial_pressure"], np.float64)
        region = np.asarray(fields["region"], np.int32)
        wr = WATER_REGION[region]
        hal = HALITE[region]
        second = np.where(wr == 4, sv, t)
        third = np.where(hal, ss, xs)
        return np.stack([p, second, third, pg], axis=-1), region
