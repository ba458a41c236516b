"""Water + salt (NaCl) + energy EOS ("wse").

Counterpart of eos_wse.F90: 3 primary variables
[P, T|S_v, X_salt|S_solid], 3 phases (liquid brine, vapour, solid
halite), 2 components (water, salt). Mixture regions 1..8 map to a
water region [1,2,-,4,1,2,-,4] with halite present for regions >= 5
(eos_wse.F90:133-136). Halite precipitation/dissolution switches the
third primary variable between liquid salt mass fraction and solid
saturation (eos_wse_halite_transition, :412-530), and an optional
permeability modifier (power law / Verma-Pruess, fluid.F90:121-150)
models permeability loss from precipitation.

All transitions are vectorised and branchless (jnp.where cascades over
the region index), with fixed-iteration root finds replacing the
reference's interpolator + root_finder machinery.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from waiwera_tpu.eos.base import EOS
from waiwera_tpu.physics.state import FluidState, RockState
from waiwera_tpu.thermo import salt as salt_mod

Array = jnp.ndarray

_SMALL = 1e-6

# region 1..8 -> water region / halite presence (eos_wse.F90:133-136)
WATER_REGION = np.array([0, 1, 2, 0, 4, 1, 2, 0, 4], np.int32)  # [region]
HALITE = np.array(
    [False, False, False, False, False, True, True, False, True]
)


class PermeabilityModifier:
    """Null modifier (factor 1)."""

    def __call__(self, sl, sv):
        return jnp.ones_like(sl)


class PowerLawModifier(PermeabilityModifier):
    """factor = (sl + sv)^exponent (fluid.F90 power modifier)."""

    def __init__(self, cfg):
        self.exponent = float((cfg or {}).get("exponent", 3.0))

    def __call__(self, sl, sv):
        return (sl + sv) ** self.exponent


class VermaPruessModifier(PermeabilityModifier):
    """Verma & Pruess (1988) fracture/tube permeability reduction."""

    def __init__(self, cfg):
        cfg = cfg or {}
        self.exponent = float(cfg.get("exponent", 2.0))
        self.phir = float(cfg.get("phir", 0.1))
        self.gamma = float(cfg.get("gamma", 0.7))
        self.omega = 1.0 + 1.0 / (self.gamma * (1.0 / self.phir - 1.0))

    def __call__(self, sl, sv):
        pf = sl + sv
        theta = jnp.clip((pf - self.phir) / (1.0 - self.phir), 1e-10, None)
        e = self.exponent
        num = 1.0 - self.gamma + self.gamma / self.omega ** e
        den = 1.0 - self.gamma + self.gamma * (
            theta / (theta + self.omega - 1.0)
        ) ** e
        return theta ** e * num / den


class EOSWaterSaltEnergy(EOS):
    name = "wse"
    description = "Water, salt and energy"
    num_primary_variables = 3
    num_phases = 3
    num_mobile_phases = 2
    num_components = 2
    phase_names = ("liquid", "vapour", "solid")
    component_names = ("water", "salt")
    primary_variable_names = (
        "pressure",
        "temperature/vapour_saturation",
        "salt_mass_fraction/solid_saturation",
    )
    default_region = 1
    default_tracer_phase = "liquid"
    isothermal = False
    required_output_fluid_fields = (
        "pressure",
        "temperature",
        "region",
        "vapour_saturation",
        "liquid_salt_mass_fraction",
        "solid_saturation",
    )
    default_output_fluid_fields = required_output_fluid_fields

    def __init__(self, config, thermo, relperm, capillarity):
        super().__init__(thermo, relperm, capillarity)
        eos_cfg = (config or {}).get("eos", {}) or {}
        if not isinstance(eos_cfg, dict):
            eos_cfg = {}
        scale_cfg = (eos_cfg.get("primary", {}) or {}).get("scale", {}) or {}
        ps = float(scale_cfg.get("pressure", 1.0e6))
        ts = float(scale_cfg.get("temperature", 1.0e2))
        row_sp = [ps, ts, 1.0]
        row_tp = [ps, 1.0, 1.0]
        zero = [1.0, 1.0, 1.0]
        self.primary_scale = np.array(
            [row_sp, row_sp, zero, row_tp, row_sp, row_sp, zero, row_tp]
        )
        self.default_primary = np.array([1.0e5, 20.0, 0.0])

        pm_cfg = eos_cfg.get("permeability_modifier", {}) or {}
        pm_type = str(pm_cfg.get("type", "none")).lower()
        if pm_type == "power":
            self.permeability_modifier = PowerLawModifier(pm_cfg)
        elif pm_type in ("verma-pruess", "verma_pruess"):
            self.permeability_modifier = VermaPruessModifier(pm_cfg)
        else:
            self.permeability_modifier = PermeabilityModifier()

    # -- helpers ------------------------------------------------------

    @staticmethod
    def _wr(region):
        return jnp.asarray(WATER_REGION)[region]

    @staticmethod
    def _halite(region):
        return jnp.asarray(HALITE)[region]

    def _saturations(self, primary, region):
        """(sl, sv, ss) (eos_wse_phase_saturations)."""
        wr = self._wr(region)
        hal = self._halite(region)
        ss = jnp.where(
            hal | (region == 2), jnp.clip(primary[:, 2], 0.0, 1.0), 0.0
        )
        fluid_sat = 1.0 - ss
        sv = jnp.where(
            wr == 4, primary[:, 1], jnp.where(wr == 2, fluid_sat, 0.0)
        )
        sl = jnp.where(
            wr == 1, fluid_sat, jnp.where(wr == 4, fluid_sat - sv, 0.0)
        )
        return sl, sv, ss

    def phase_saturations(self, primary, region):
        sl, sv, ss = self._saturations(primary, region)
        return jnp.stack([sl, sv, ss], axis=-1)

    def properties(self, primary: Array, region: Array, rock: RockState):
        thermo = self.thermo
        p = primary[:, 0]
        wr = self._wr(region)
        hal = self._halite(region)
        two_phase = wr == 4

        # liquid salt mass fraction (eos_wse_bulk/phase_properties):
        # region 4: primary(3); region 8: two-phase solubility(P);
        # regions 5,6: solubility(T); region 2: 0; regions 1: primary(3)
        xs_tp, err_tp = salt_mod.halite_solubility_two_phase(thermo, p)
        xs_guess = jnp.where(
            two_phase,
            jnp.where(hal, xs_tp, jnp.clip(primary[:, 2], 0.0, 1.0)),
            0.0,
        )
        t_brine, terr = salt_mod.brine_saturation_temperature(
            thermo, p, xs_guess
        )
        t = jnp.where(two_phase, t_brine, primary[:, 1])
        err = two_phase & (terr | (hal & err_tp))

        xs_sol, serr = salt_mod.halite_solubility(t)
        xs = jnp.where(
            hal,
            xs_sol,
            jnp.where(
                region == 2, 0.0, jnp.clip(primary[:, 2], 0.0, 1.0)
            ),
        )
        err = err | (hal & serr)

        phases_w = self.thermo.phase_composition(wr, p, t)
        sl, sv, ss = self._saturations(primary, region)
        solid_present = hal | (region == 2)
        phases = phases_w | jnp.where(solid_present & (ss > 0.0), 4, 0)

        denom = jnp.where(ss < 1.0, 1.0 - ss, 1.0)
        sl_eff = sl / denom
        relperm2 = self.relative_permeability(sl_eff)
        cp_l = self.capillary_pressure(sl_eff, t)

        # liquid brine
        dl, ul, berr = salt_mod.brine_properties(thermo, p, t, xs)
        hl = ul + p / jnp.where(dl > 0, dl, 1.0)
        visc_l, verr_l = salt_mod.brine_viscosity(thermo, t, p, xs)
        # vapour: pure steam
        dv, uv, ev = thermo.steam_properties(p, t)
        hv = uv + p / jnp.where(dv > 0, dv, 1.0)
        visc_v = thermo.phase_viscosity(1, t, p, dv)
        # solid halite
        dsol, usol = salt_mod.halite_properties(p, t)
        hsol = usol + p / jnp.where(dsol > 0, dsol, 1.0)

        in_l = (phases & 1) > 0
        in_v = (phases & 2) > 0
        in_s = (phases & 4) > 0
        err = err | (in_l & (berr | verr_l)) | (in_v & ev)

        zero = jnp.zeros_like(p)
        density = jnp.stack(
            [
                jnp.where(in_l, dl, 0.0),
                jnp.where(in_v, dv, 0.0),
                jnp.where(in_s, dsol, 0.0),
            ],
            axis=-1,
        )
        energy = jnp.stack(
            [
                jnp.where(in_l, ul, 0.0),
                jnp.where(in_v, uv, 0.0),
                jnp.where(in_s, usol, 0.0),
            ],
            axis=-1,
        )
        enthalpy = jnp.stack(
            [
                jnp.where(in_l, hl, 0.0),
                jnp.where(in_v, hv, 0.0),
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
        cap = jnp.stack(
            [jnp.where(in_l, cp_l, 0.0), zero, zero], axis=-1
        )
        mass_frac = jnp.stack(
            [
                jnp.stack([1.0 - xs, xs], axis=-1),
                jnp.stack([jnp.ones_like(xs), zero], axis=-1),
                jnp.stack([zero, jnp.ones_like(xs)], axis=-1),
            ],
            axis=1,
        )  # [N, 3, 2]
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
            partial_pressure=jnp.stack([p, zero], axis=-1),
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

    # -- transitions (eos_wse_transition, :545-616) -------------------

    def transition(self, old_primary, primary, region, old_temperature):
        thermo = self.thermo
        old_region = region
        wr_old = self._wr(old_region)
        hal_old = self._halite(old_region)
        offset = jnp.where(hal_old, 4, 0)

        p = primary[:, 0]
        second = primary[:, 1]
        salt = primary[:, 2]

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
        salt_i = jnp.clip(interp[:, 2], 0.0, 1.0)
        # liquid: brine saturation temperature at interpolated P
        xs_tp2, e_tp = salt_mod.halite_solubility_two_phase(thermo, p_i)
        xs_i = jnp.where(hal_old, xs_tp2, salt_i)
        t_liq, e_liq = salt_mod.brine_saturation_temperature(
            thermo, p_i, xs_i
        )
        t_vap, e_vap = thermo.saturation_temperature(p_i)
        t_interp = jnp.where(to_liquid, t_liq, t_vap)
        interp_err = jnp.where(
            to_liquid, e_liq | (hal_old & e_tp), e_vap
        )
        ok = xi_ok & ~interp_err
        # fallback from old state
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
            ok, pressure_factor * p_i, pressure_factor * ps_old
        )
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
            ((wr_old == 1) & (p < psat)) | ((wr_old == 2) & (p > psat))
        )

        # bisection for the saturation-line crossing along the Newton
        # path (saturation_line_finder; eos_wse.F90:920-960)
        p0 = old_primary[:, 0]
        dvec = primary - old_primary

        def f_of(x):
            var = old_primary + x[:, None] * dvec
            tt = var[:, 1]
            xs_x, _ = salt_mod.halite_solubility(tt)
            xs_line = jnp.clip(
                jnp.where(hal_old, xs_x, jnp.maximum(var[:, 2], 0.0)),
                0.0, 1.0,
            )
            psb, _ = salt_mod.brine_saturation_pressure(thermo, tt, xs_line)
            psw, _ = thermo.saturation_pressure(tt)
            ps = jnp.where(wr_old == 1, psb, psw)
            return var[:, 0] - ps

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
        tp_pressure = jnp.where(bracket, interp_r[:, 0], psat)
        tp_salt = jnp.where(bracket, interp_r[:, 2], salt)
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
            goes_single,
            sp_temperature,
            jnp.where(crossing, tp_sv, second),
        )
        new_salt = jnp.where(
            goes_single, sp_salt, jnp.where(crossing, tp_salt, salt)
        )
        transition = goes_single | crossing
        err = jnp.where(goes_single, sp_err, jnp.zeros_like(sp_err))

        # ---- halite transitions (:412-530) --------------------------
        (new_p, new_second, new_salt, new_region, htrans, herr) = (
            self._halite_transition(
                new_p, new_second, new_salt, new_region, old_region
            )
        )
        transition = transition | htrans
        err = err | herr

        new_primary = jnp.stack([new_p, new_second, new_salt], axis=-1)
        return new_primary, new_region, transition, err

    def _halite_transition(self, p, second, salt, region, old_region):
        thermo = self.thermo
        err = jnp.zeros(p.shape, bool)

        # temperature for solubility checks
        xs_for_t = jnp.clip(salt, 0.0, 1.0)
        t_b, e_tb = salt_mod.brine_saturation_temperature(thermo, p,
                                                          xs_for_t)
        t_check = jnp.where(region == 4, t_b, second)

        sol, e_sol = salt_mod.halite_solubility(t_check)
        sol_tp, e_tp = salt_mod.halite_solubility_two_phase(thermo, p)

        # case 1/4: liquid present without halite -> precipitation
        liq_noh = (region == 1) | (region == 4)
        precip_l = liq_noh & (salt > sol) & ~(
            (region == 4) & e_tb
        ) & ~e_sol
        # case 2: vapour only without halite -> any salt precipitates
        precip_v = (region == 2) & (salt > 0.0)
        # case 5/8: halite with liquid -> dissolution when Ss < 0
        dis_l = ((region == 5) | (region == 8)) & (salt < 0.0)
        from_dry = old_region == 6
        xs_dis = jnp.where(
            region == 5,
            sol - _SMALL,
            jnp.where(from_dry, _SMALL, sol_tp - _SMALL),
        )
        # case 6: vapour with halite -> halite disappears when Ss < 0
        dis_v = (region == 6) & (salt < 0.0)

        new_salt = salt
        new_region = region
        new_salt = jnp.where(precip_l | precip_v, _SMALL, new_salt)
        new_region = jnp.where(
            precip_l, region + 4, jnp.where(precip_v, 6, new_region)
        )
        new_salt = jnp.where(dis_l, xs_dis, new_salt)
        new_region = jnp.where(dis_l, region - 4, new_region)
        new_salt = jnp.where(dis_v, 0.0, new_salt)
        new_region = jnp.where(dis_v, 2, new_region)
        trans = precip_l | precip_v | dis_l | dis_v
        err = err | (dis_l & (region == 8) & ~from_dry & e_tp)
        return p, second, new_salt, new_region.astype(jnp.int32), trans, err

    def check_primary_variables(self, primary, region):
        """eos_wse_check_primary_variables: clamp salt < 0 handled by
        the halite transition; here salt is clamped at 0 for regions
        without halite and bounds are checked."""
        p = primary[:, 0]
        x = primary[:, 1]
        salt = primary[:, 2]
        hal = self._halite(region)
        # negative salt in non-halite regions is clamped to 0
        salt_new = jnp.where(~hal & (salt < 0.0), 0.0, salt)
        salt_bad = salt_new > 1.0
        p_bad = (p < 0.0) | (p > 100.0e6)
        wr = self._wr(region)
        x_bad = jnp.where(
            wr == 4,
            (x < -1.0) | (x > 2.0),
            (x < 0.0) | (x > 800.0),
        )
        out = jnp.stack([p, x, salt_new], axis=-1)
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
        return jnp.stack([fluid.pressure, second, third], axis=-1)

    def primary_from_output_fields(self, fields):
        p = np.asarray(fields["pressure"], np.float64)
        t = np.asarray(fields["temperature"], np.float64)
        sv = np.asarray(fields["vapour_saturation"], np.float64)
        xs = np.asarray(fields["liquid_salt_mass_fraction"], np.float64)
        ss = np.asarray(fields["solid_saturation"], np.float64)
        region = np.asarray(fields["region"], np.int32)
        wr = WATER_REGION[region]
        hal = HALITE[region]
        second = np.where(wr == 4, sv, t)
        third = np.where(hal, ss, xs)
        return np.stack([p, second, third], axis=-1), region
