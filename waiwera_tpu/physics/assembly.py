"""Finite-volume assembly kernels: per-cell balances (LHS) and per-face
fluxes / per-cell inflows (RHS).

Vectorised counterparts of the reference's hot loops:
- cell_balance (cell.F90:114-142)
- face_flux (face.F90:443-515) with upstream weighting, harmonic
  permeability/conductivity averaging, saturation-weighted face density
  and capillary/gravity effective gradients
- cell_inflows (flow_simulation.F90:1334-1485): flux * area / volume
  scatter-added with sign -1 into cell 1 and +1 into cell 2

All functions are pure jnp over dense arrays and differentiate cleanly
(the AD block-Jacobian is built on them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from waiwera_tpu.mesh.device import MeshArrays
from waiwera_tpu.physics.state import FluidState, RockState

Array = jnp.ndarray


def cell_balances(
    fluid: FluidState, rock: RockState, num_primary: int
) -> Array:
    """[N, npv] mass (and energy) balances per unit volume
    (cell.F90:114-142)."""
    nc = fluid.num_components
    mass = rock.porosity[:, None] * fluid.component_density()  # [N, nc]
    if num_primary == nc:  # isothermal
        return mass
    energy = rock.porosity * fluid.energy() + (
        1.0 - rock.porosity
    ) * rock.energy(fluid.temperature)
    return jnp.concatenate([mass, energy[:, None]], axis=-1)


def _harmonic_average(x1, x2, d1, d2, d12):
    """Distance-weighted harmonic average (face.F90:361-379)."""
    wx = (d1 * x2 + d2 * x1) / d12
    return jnp.where(jnp.abs(wx) > 1e-30, x1 * x2 / jnp.where(jnp.abs(wx) > 1e-30, wx, 1.0), 0.0)


def gather_state(state, idx: Array):
    """Gather rows idx from every leaf of a state pytree.

    float0 leaves (tangents of integer fields under jvp) are reshaped
    without data movement.
    """
    import numpy as np

    def g(a):
        if isinstance(a, np.ndarray) and a.dtype == jax.dtypes.float0:
            return np.zeros((idx.shape[0],) + a.shape[1:], jax.dtypes.float0)
        return a[idx]

    return jax.tree_util.tree_map(g, state)


def face_fluxes_pairs(
    fl: FluidState,
    fr: FluidState,
    perm_l: Array,
    perm_r: Array,
    cond_l,
    cond_r,
    mesh: MeshArrays,
    num_primary: int,
    num_mobile_phases: int,
    isothermal: bool,
) -> Array:
    """[F, npv + num_mobile_phases] fluxes through each face from
    cell 1 to cell 2 (face.F90:443-515), given the two cells' fluid
    states gathered per face ([F]-shaped FluidStates): per-component
    mass fluxes, energy flux (non-isothermal), then per-phase total
    mass fluxes.

    perm_l/perm_r: direction-selected rock permeability per side [F].
    cond_l/cond_r: per-side effective heat conductivity [F] (or None
    when isothermal).

    Written over gathered pairs so that jvp against one side yields the
    face Jacobian blocks dflux/dy_side directly.
    """
    nc = fl.mass_fraction.shape[-1]
    d1 = mesh.face_distance[:, 0]
    d2 = mesh.face_distance[:, 1]
    d12 = mesh.face_distance12

    # permeability: direction-selected, harmonic (face.F90:381-398)
    k = _harmonic_average(
        perm_l * fl.permeability_factor,
        perm_r * fr.permeability_factor,
        d1,
        d2,
        d12,
    )

    phases_l = fl.phase_composition
    phases_r = fr.phase_composition
    nfaces = d12.shape[0]
    comp_flux = jnp.zeros((nfaces, nc))
    energy_flux = jnp.zeros(nfaces)
    phase_flux = []

    mob_l = fl.mobility()
    mob_r = fr.mobility()

    for p in range(num_mobile_phases):
        bit = 1 << p
        in_l = (phases_l & bit) > 0
        in_r = (phases_r & bit) > 0
        present = in_l | in_r

        s_l = fl.saturation[:, p]
        s_r = fr.saturation[:, p]
        wsum = s_l + s_r
        face_density = jnp.where(
            wsum > 0.0,
            (s_l * fl.density[:, p] + s_r * fr.density[:, p])
            / jnp.where(wsum > 0, wsum, 1.0),
            0.0,
        )

        dpdn = (
            (fr.pressure + fr.capillary_pressure[:, p])
            - (fl.pressure + fl.capillary_pressure[:, p])
        ) / d12
        g = dpdn - face_density * mesh.face_gravity_normal

        up_is_l = g <= 0.0  # upstream_index (face.F90:426-439)
        up_in = jnp.where(up_is_l, in_l, in_r)
        active = present & up_in

        mob_up = jnp.where(up_is_l, mob_l[:, p], mob_r[:, p])
        f = jnp.where(active, -k * mob_up * g, 0.0)
        xf_up = jnp.where(
            up_is_l[:, None],
            fl.mass_fraction[:, p, :],
            fr.mass_fraction[:, p, :],
        )
        pcf = f[:, None] * xf_up
        comp_flux = comp_flux + jnp.where(active[:, None], pcf, 0.0)
        if not isothermal:
            h_up = jnp.where(
                up_is_l,
                fl.specific_enthalpy[:, p],
                fr.specific_enthalpy[:, p],
            )
            energy_flux = energy_flux + jnp.where(active, h_up * f, 0.0)
        phase_flux.append(jnp.where(active, jnp.sum(pcf, axis=-1), 0.0))

    if not isothermal:
        cond = _harmonic_average(cond_l, cond_r, d1, d2, d12)
        dtdn = (fr.temperature - fl.temperature) / d12
        energy_flux = energy_flux - cond * dtdn
        return jnp.concatenate(
            [comp_flux, energy_flux[:, None]]
            + [pf[:, None] for pf in phase_flux],
            axis=-1,
        )
    return jnp.concatenate(
        [comp_flux] + [pf[:, None] for pf in phase_flux], axis=-1
    )


def face_permeability_sides(rock: RockState, mesh: MeshArrays):
    """Direction-selected rock permeability on each side of each face."""
    cl = mesh.face_cells[:, 0]
    cr = mesh.face_cells[:, 1]
    dir_ = mesh.face_permeability_direction[:, None]
    perm_l = jnp.take_along_axis(rock.permeability[cl], dir_, axis=1)[:, 0]
    perm_r = jnp.take_along_axis(rock.permeability[cr], dir_, axis=1)[:, 0]
    return perm_l, perm_r


def face_fluxes(
    fluid: FluidState,
    rock: RockState,
    conductivity,
    mesh: MeshArrays,
    num_primary: int,
    num_mobile_phases: int,
    isothermal: bool,
) -> Array:
    """Convenience wrapper of face_fluxes_pairs gathering both sides
    from full-mesh state arrays."""
    cl = mesh.face_cells[:, 0]
    cr = mesh.face_cells[:, 1]
    perm_l, perm_r = face_permeability_sides(rock, mesh)
    cond_l = conductivity[cl] if conductivity is not None else None
    cond_r = conductivity[cr] if conductivity is not None else None
    return face_fluxes_pairs(
        gather_state(fluid, cl),
        gather_state(fluid, cr),
        perm_l,
        perm_r,
        cond_l,
        cond_r,
        mesh,
        num_primary,
        num_mobile_phases,
        isothermal,
    )


def cell_inflows(
    fluxes: Array, mesh: MeshArrays, num_primary: int
) -> Array:
    """[N, npv] net inflow per unit volume from face fluxes
    (flow_simulation.F90:1429-1460): -flux*area/vol into cell 1,
    +flux*area/vol into cell 2, skipping ghost target cells."""
    flow = fluxes[:, :num_primary] * mesh.face_area[:, None]  # [F, npv]
    cl = mesh.face_cells[:, 0]
    cr = mesh.face_cells[:, 1]
    n = mesh.cell_volume.shape[0]
    rhs = jnp.zeros((n, num_primary))
    rhs = rhs.at[cl].add(-flow)
    rhs = rhs.at[cr].add(flow)
    vol = jnp.where(mesh.cell_volume > 0.0, mesh.cell_volume, 1.0)
    rhs = rhs / vol[:, None]
    # ghost (boundary) cells receive no inflow
    return jnp.where(mesh.is_ghost[:, None], 0.0, rhs)
