"""Fluid and rock state containers.

Struct-of-arrays pytrees replacing the reference's pointer-accessor
layer (fluid.F90:36-53, rock.F90:56-65): each field is a dense [N, ...]
array over cells, directly shardable across a device mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class FluidState(NamedTuple):
    """Per-cell fluid state.

    Layout mirrors fluid.F90:36-53: bulk variables plus per-phase
    variables; mass_fraction carries the component axis.
    Shapes: [N] bulk, [N, np] per-phase, [N, np, nc] mass fraction,
    [N, nc] partial pressure.
    """

    pressure: Array  # [N]
    temperature: Array  # [N]  (deg C)
    region: Array  # [N] int32 thermodynamic region
    old_region: Array  # [N] int32 region before last transition
    phase_composition: Array  # [N] int32 bitmask (bit p = phase p+1 present)
    permeability_factor: Array  # [N]
    partial_pressure: Array  # [N, nc]
    density: Array  # [N, np]
    viscosity: Array  # [N, np]
    saturation: Array  # [N, np]
    relative_permeability: Array  # [N, np]
    capillary_pressure: Array  # [N, np]
    specific_enthalpy: Array  # [N, np]
    internal_energy: Array  # [N, np]
    mass_fraction: Array  # [N, np, nc]

    @property
    def num_phases(self) -> int:
        return self.density.shape[-1]

    @property
    def num_components(self) -> int:
        return self.mass_fraction.shape[-1]

    def phase_present(self) -> Array:
        """[N, np] bool: is phase p present (bit p of composition)."""
        np_ = self.num_phases
        bits = jnp.arange(np_, dtype=jnp.int32)
        return (self.phase_composition[:, None] >> bits) & 1 > 0

    def component_density(self) -> Array:
        """[N, nc]: sum_p S_p rho_p X_pc (fluid.F90 component_density)."""
        w = self.saturation * self.density  # [N, np]
        return jnp.einsum("np,npc->nc", w, self.mass_fraction)

    def energy(self) -> Array:
        """[N]: sum_p S_p rho_p u_p (fluid.F90 energy)."""
        return jnp.sum(
            self.saturation * self.density * self.internal_energy, axis=-1
        )

    def mobility(self) -> Array:
        """[N, np]: kr rho / mu per phase (fluid.F90:197-206), 0 where
        phase absent."""
        mu = jnp.where(self.viscosity > 0.0, self.viscosity, 1.0)
        return jnp.where(
            self.viscosity > 0.0,
            self.relative_permeability * self.density / mu,
            0.0,
        )

    def phase_flow_fractions(self) -> Array:
        """[N, np]: mobility fractions (used for production flows)."""
        mob = self.mobility()
        total = jnp.sum(mob, axis=-1, keepdims=True)
        return jnp.where(total > 0.0, mob / jnp.where(total > 0, total, 1.0), 0.0)


def empty_fluid(num_cells: int, num_phases: int, num_components: int) -> FluidState:
    f = jnp.zeros
    return FluidState(
        pressure=f((num_cells,), jnp.float64),
        temperature=f((num_cells,), jnp.float64),
        region=jnp.ones((num_cells,), jnp.int32),
        old_region=jnp.ones((num_cells,), jnp.int32),
        phase_composition=f((num_cells,), jnp.int32),
        permeability_factor=jnp.ones((num_cells,), jnp.float64),
        partial_pressure=f((num_cells, num_components), jnp.float64),
        density=f((num_cells, num_phases), jnp.float64),
        viscosity=f((num_cells, num_phases), jnp.float64),
        saturation=f((num_cells, num_phases), jnp.float64),
        relative_permeability=f((num_cells, num_phases), jnp.float64),
        capillary_pressure=f((num_cells, num_phases), jnp.float64),
        specific_enthalpy=f((num_cells, num_phases), jnp.float64),
        internal_energy=f((num_cells, num_phases), jnp.float64),
        mass_fraction=f((num_cells, num_phases, num_components), jnp.float64),
    )


class RockState(NamedTuple):
    """Per-cell rock properties (rock.F90:56-76)."""

    permeability: Array  # [N, 3]
    wet_conductivity: Array  # [N]
    dry_conductivity: Array  # [N]
    porosity: Array  # [N]
    density: Array  # [N]
    specific_heat: Array  # [N]

    def energy(self, temperature: Array) -> Array:
        """Rock energy density rho_r c_r T (rock.F90 rock_energy)."""
        return self.density * self.specific_heat * temperature


# Default rock properties (rock.F90:68-76)
DEFAULT_PERMEABILITY = 1.0e-13
DEFAULT_POROSITY = 0.1
DEFAULT_ROCK_DENSITY = 2200.0
DEFAULT_SPECIFIC_HEAT = 1000.0
DEFAULT_HEAT_CONDUCTIVITY = 2.5


def default_rock(num_cells: int) -> RockState:
    ones = np.ones(num_cells)
    return RockState(
        permeability=jnp.asarray(
            np.full((num_cells, 3), DEFAULT_PERMEABILITY)
        ),
        wet_conductivity=jnp.asarray(ones * DEFAULT_HEAT_CONDUCTIVITY),
        dry_conductivity=jnp.asarray(ones * DEFAULT_HEAT_CONDUCTIVITY),
        porosity=jnp.asarray(ones * DEFAULT_POROSITY),
        density=jnp.asarray(ones * DEFAULT_ROCK_DENSITY),
        specific_heat=jnp.asarray(ones * DEFAULT_SPECIFIC_HEAT),
    )
