"""Source / sink terms.

Vectorised counterpart of the reference's source model
(source.F90:341-486): injection puts the specified rate into one mass
component with a specified enthalpy; production distributes the rate
over components by phase mobility fractions and produces the
corresponding flowing enthalpy. Component index num_primary_variables
means direct heat input.

Rates and enthalpies are computed by the source network
(sim/network.py: tables, deliverability, groups, reinjectors); this
module holds the per-source flow kernels and the cell scatter they
share.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.physics.state import FluidState

Array = jnp.ndarray


class SourceArrays(NamedTuple):
    """Static per-source data (device)."""

    cell: Array  # [ns] int32 cell index
    injection_component: Array  # [ns] int32 (1-based; 0 = default)
    production_component: Array  # [ns] int32 (1-based; 0 = distribute)
    volume: Array  # [ns] volume of host cell


class SourceCellState(NamedTuple):
    """Fluid state gathered at source cells [ns, ...].

    Decouples the network update from the cell layout: on a single
    device this is a plain gather; distributed, each device gathers
    its owned sources and a psum replicates the full per-source state
    (the analogue of the reference's MPI gathers in
    source_network.F90:91-127)."""

    pressure: Array  # [ns]
    permeability_factor: Array  # [ns]
    phase_flow_fractions: Array  # [ns, np]
    specific_enthalpy: Array  # [ns, np]
    mass_fraction: Array  # [ns, np, nc]
    mobility: Array  # [ns, np]


def gather_cell_state(fluid: FluidState, cell: Array) -> SourceCellState:
    return SourceCellState(
        pressure=fluid.pressure[cell],
        permeability_factor=fluid.permeability_factor[cell],
        phase_flow_fractions=fluid.phase_flow_fractions()[cell],
        specific_enthalpy=fluid.specific_enthalpy[cell],
        mass_fraction=fluid.mass_fraction[cell],
        mobility=fluid.mobility()[cell],
    )


def source_flows(
    fluid: FluidState,
    src: SourceArrays,
    rate: Array,
    injection_enthalpy: Array,
    num_primary: int,
    num_components: int,
    isothermal: bool,
) -> Array:
    """[ns, npv] per-source, per-equation flows (source.F90:386-486):
    injection puts the rate into one mass component; production
    distributes over components by phase mobility fractions; the last
    column carries the energy flow for non-isothermal EOSs."""
    ns = src.cell.shape[0]
    npv = num_primary
    nc = num_components
    injecting = rate >= 0.0

    # --- injection: rate into one component --------------------------
    inj_comp = src.injection_component - 1  # 0-based
    inj_flow = jnp.zeros((ns, npv)).at[
        jnp.arange(ns), jnp.clip(inj_comp, 0, npv - 1)
    ].set(rate)
    inj_enthalpy = injection_enthalpy

    # --- production: distribute by phase mobility fractions ----------
    cell = src.cell
    frac = fluid.phase_flow_fractions()[cell]  # [ns, np]
    h = fluid.specific_enthalpy[cell]  # [ns, np]
    xf = fluid.mass_fraction[cell]  # [ns, np, nc]
    prod_enthalpy = jnp.sum(frac * h, axis=-1)  # [ns]
    comp_frac = jnp.einsum("sp,spc->sc", frac, xf)  # [ns, nc]
    prod_comp = src.production_component  # 1-based; 0 = distribute
    distributed = jnp.zeros((ns, npv))
    distributed = distributed.at[:, :nc].set(rate[:, None] * comp_frac)
    single = jnp.zeros((ns, npv)).at[
        jnp.arange(ns), jnp.clip(prod_comp - 1, 0, npv - 1)
    ].set(rate)
    prod_flow = jnp.where((prod_comp <= 0)[:, None], distributed, single)

    flow = jnp.where(injecting[:, None], inj_flow, prod_flow)
    comp_eff = jnp.where(injecting, src.injection_component,
                         jnp.where(prod_comp <= 0, 1, prod_comp))
    if not isothermal:
        enthalpy = jnp.where(injecting, inj_enthalpy, prod_enthalpy)
        # energy flow only when not a direct-heat source
        # (component == npv means heat)
        mass_source = comp_eff < npv
        energy = jnp.where(mass_source, enthalpy * rate, 0.0)
        flow = flow.at[:, npv - 1].add(energy)
    return flow


def source_inflows(
    fluid: FluidState,
    src: SourceArrays,
    rate: Array,
    injection_enthalpy: Array,
    num_primary: int,
    num_components: int,
    num_cells: int,
    isothermal: bool,
) -> Array:
    """[N, npv] cell inflows (per unit volume) from sources
    (source.F90:386-486, source_network.F90 assemble_cell_inflows).

    Differentiable in `fluid` (production terms follow mobility), so
    source contributions enter the Jacobian's diagonal blocks through
    the same AD chain as the balances.
    """
    flow = source_flows(
        fluid, src, rate, injection_enthalpy, num_primary,
        num_components, isothermal,
    )
    # scatter q / V into cells
    inflow = jnp.zeros((num_cells, num_primary))
    inflow = inflow.at[src.cell].add(flow / src.volume[:, None])
    return inflow
