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


def face_fluxes(
    fluid: FluidState,
    rock: RockState,
    conductivity: Array,
    mesh: MeshArrays,
    num_primary: int,
    num_mobile_phases: int,
    isothermal: bool,
) -> Array:
    """[F, npv + num_mobile_phases] fluxes through each face from
    cell 1 to cell 2 (face.F90:443-515): per-component mass fluxes,
    energy flux (non-isothermal), then per-phase total mass fluxes.

    `conductivity` is the per-cell effective heat conductivity
    (eos.conductivity), gathered here per face.
    """
    nc = fluid.num_components
    np_ = num_primary
    cl = mesh.face_cells[:, 0]
    cr = mesh.face_cells[:, 1]
    d1 = mesh.face_distance[:, 0]
    d2 = mesh.face_distance[:, 1]
    d12 = mesh.face_distance12

    # permeability: direction-selected, harmonic (face.F90:381-398)
    perm_l = (
        jnp.take_along_axis(
            rock.permeability[cl],
            mesh.face_permeability_direction[:, None],
            axis=1,
        )[:, 0]
        * fluid.permeability_factor[cl]
    )
    perm_r = (
        jnp.take_along_axis(
            rock.permeability[cr],
            mesh.face_permeability_direction[:, None],
            axis=1,
        )[:, 0]
        * fluid.permeability_factor[cr]
    )
    k = _harmonic_average(perm_l, perm_r, d1, d2, d12)

    p_l = fluid.pressure[cl]
    p_r = fluid.pressure[cr]
    t_l = fluid.temperature[cl]
    t_r = fluid.temperature[cr]

    out = []

    # phase loop (static, <= 3 phases)
    phases_l = fluid.phase_composition[cl]
    phases_r = fluid.phase_composition[cr]
    comp_flux = jnp.zeros((cl.shape[0], nc))
    energy_flux = jnp.zeros(cl.shape[0])
    phase_flux = []

    sat = fluid.saturation
    rho = fluid.density
    mob = fluid.mobility()

    for p in range(num_mobile_phases):
        bit = 1 << p
        in_l = (phases_l & bit) > 0
        in_r = (phases_r & bit) > 0
        present = in_l | in_r

        s_l = sat[cl, p]
        s_r = sat[cr, p]
        r_l = rho[cl, p]
        r_r = rho[cr, p]
        wsum = s_l + s_r
        face_density = jnp.where(
            wsum > 0.0,
            (s_l * r_l + s_r * r_r) / jnp.where(wsum > 0, wsum, 1.0),
            0.0,
        )

        pc_l = fluid.capillary_pressure[cl, p]
        pc_r = fluid.capillary_pressure[cr, p]
        dpdn = ((p_r + pc_r) - (p_l + pc_l)) / d12
        g = dpdn - face_density * mesh.face_gravity_normal

        up_is_l = g <= 0.0  # upstream_index (face.F90:426-439)
        up_cell = jnp.where(up_is_l, cl, cr)
        up_in = jnp.where(up_is_l, in_l, in_r)
        active = present & up_in

        mob_up = mob[up_cell, p]
        f = jnp.where(active, -k * mob_up * g, 0.0)
        xf_up = fluid.mass_fraction[up_cell, p, :]  # [F, nc]
        pcf = f[:, None] * xf_up
        comp_flux = comp_flux + jnp.where(active[:, None], pcf, 0.0)
        if not isothermal:
            h_up = fluid.specific_enthalpy[up_cell, p]
            energy_flux = energy_flux + jnp.where(active, h_up * f, 0.0)
        phase_flux.append(jnp.where(active, jnp.sum(pcf, axis=-1), 0.0))

    if not isothermal:
        cond = _harmonic_average(
            conductivity[cl], conductivity[cr], d1, d2, d12
        )
        dtdn = (t_r - t_l) / d12
        energy_flux = energy_flux - cond * dtdn
        out = jnp.concatenate(
            [comp_flux, energy_flux[:, None]]
            + [pf[:, None] for pf in phase_flux],
            axis=-1,
        )
    else:
        out = jnp.concatenate(
            [comp_flux] + [pf[:, None] for pf in phase_flux], axis=-1
        )
    return out


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
