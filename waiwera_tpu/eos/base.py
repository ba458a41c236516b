"""Abstract EOS interface.

Counterpart of the reference's eos_type (eos.F90:43-78). All methods are
vectorised over cells: primary variables are [N, npv] arrays, regions
[N] int32. Scaling tables are [max_region, npv], indexed by region - 1
(eos.F90:186-210).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.physics.state import FluidState, RockState

Array = jnp.ndarray


class EOS:
    name: str = "abstract"
    description: str = ""
    num_primary_variables: int
    num_phases: int
    num_mobile_phases: int
    num_components: int
    phase_names: tuple
    component_names: tuple
    primary_variable_names: tuple
    default_primary: np.ndarray
    default_region: int = 1
    default_tracer_phase: str = "liquid"
    isothermal: bool = False
    required_output_fluid_fields: tuple = ()
    default_output_fluid_fields: tuple = ()

    # [max_region, npv] scale factors; set by subclasses
    primary_scale: np.ndarray

    def __init__(self, thermo, relperm, capillarity):
        self.thermo = thermo
        self.relative_permeability = relperm
        self.capillary_pressure = capillarity

    # -- scaling (eos.F90:186-210) ----------------------------------

    def scale(self, primary: Array, region: Array) -> Array:
        s = jnp.asarray(self.primary_scale)[region - 1]
        return primary / s

    def unscale(self, scaled: Array, region: Array) -> Array:
        s = jnp.asarray(self.primary_scale)[region - 1]
        return scaled * s

    # -- properties --------------------------------------------------

    def properties(
        self, primary: Array, region: Array, rock: RockState
    ):
        """Full fluid recompute (bulk + phase properties) at the given
        unscaled primary variables and thermodynamic regions.

        Returns (FluidState, err[N] bool).
        """
        raise NotImplementedError

    def transition(
        self,
        old_primary: Array,
        primary: Array,
        region: Array,
        old_temperature: Array,
    ):
        """Check per-cell primary variables against their region and
        apply thermodynamic region transitions.

        old_primary/old_temperature are from the start of the Newton
        iteration (the reference's last_iteration_fluid). Returns
        (new_primary, new_region, transition_mask[N], err[N]).
        """
        del old_primary, old_temperature
        return primary, region, jnp.zeros(region.shape, bool), jnp.zeros(
            region.shape, bool
        )

    def check_primary_variables(self, primary: Array, region: Array):
        """Bounds check. Returns (primary, err[N]): some EOS clamp
        out-of-range variables (e.g. wge partial pressure,
        eos_wge.F90:573-634) rather than erroring."""
        raise NotImplementedError

    def primary_from_output_fields(self, fields):
        """Reconstruct (primary [n, npv], region [n]) from the
        required output fluid fields of a restart file
        (initial.F90:421-679 'minimal' restart)."""
        raise NotImplementedError

    def primary_variables(self, fluid: FluidState) -> Array:
        """Recover primary variables from fluid state (for restarts)."""
        raise NotImplementedError

    # -- misc --------------------------------------------------------

    def conductivity(self, rock: RockState, fluid: FluidState) -> Array:
        """Effective heat conductivity with sqrt(S_l) dependence
        (eos.F90:240-257)."""
        sl = jnp.clip(fluid.saturation[:, 0], 0.0, 1.0)
        # gradient-safe sqrt: d(sqrt)/dsl is unbounded at sl=0 (dry
        # cells, region 2), which would put NaN/inf into the AD
        # Jacobian; branch via where so the tangent at sl=0 is 0
        root = jnp.where(sl > 0.0, jnp.sqrt(jnp.where(sl > 0.0, sl, 1.0)),
                         0.0)
        return rock.dry_conductivity + root * (
            rock.wet_conductivity - rock.dry_conductivity
        )

    def phase_composition(self, region: Array, p: Array, t: Array) -> Array:
        return self.thermo.phase_composition(region, p, t)
