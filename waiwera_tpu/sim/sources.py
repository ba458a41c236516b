"""Source / sink terms.

Vectorised counterpart of the reference's source model
(source.F90:341-486): injection puts the specified rate into one mass
component with a specified enthalpy; production distributes the rate
over components by phase mobility fractions and produces the
corresponding flowing enthalpy. Component index num_primary_variables
means direct heat input.

Rates and enthalpies may be driven by time tables (source_control.F90
rate/enthalpy tables, averaged over the step interval). Deliverability
and network groups/reinjectors are later-stage features tracked in
SURVEY.md sections 2.4.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from waiwera_tpu.physics.state import FluidState
from waiwera_tpu.utils.interpolation import InterpolationTable, from_json as table_from_json

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


@dataclass
class SourceControls:
    """Host-side time controls for rates/enthalpies."""

    base_rate: np.ndarray  # [ns]
    base_enthalpy: np.ndarray  # [ns]
    rate_tables: List  # per source: InterpolationTable or None
    enthalpy_tables: List


class Sources:
    """Container combining static arrays + host controls."""

    def __init__(self, specs: List[dict], mesh, eos):
        ns = len(specs)
        self.num_sources = ns
        self.names = []
        cell = np.zeros(ns, dtype=np.int64)
        rate = np.zeros(ns)
        enthalpy = np.zeros(ns)
        inj_comp = np.zeros(ns, dtype=np.int64)
        prod_comp = np.zeros(ns, dtype=np.int64)
        rate_tables = []
        enthalpy_tables = []
        for i, spec in enumerate(specs):
            self.names.append(spec.get("name", f"source {i}"))
            if "cell" in spec:
                cell[i] = int(spec["cell"])
            elif "cells" in spec:
                cells = spec["cells"]
                if len(cells) != 1:
                    raise NotImplementedError(
                        "multi-cell sources not yet supported"
                    )
                cell[i] = int(cells[0])
            r = spec.get("rate", 0.0)
            if isinstance(r, (list, np.ndarray)):
                tab = table_from_json(r, spec.get("interpolation_spec"))
                rate_tables.append(tab)
            else:
                rate[i] = float(r)
                rate_tables.append(None)
            h = spec.get("enthalpy", 83.9e3)
            if isinstance(h, (list, np.ndarray)):
                enthalpy_tables.append(table_from_json(h))
            else:
                enthalpy[i] = float(h)
                enthalpy_tables.append(None)
            comp = int(spec.get("component", 0))
            # reference: "component" sets both injection and production
            # component; injection default 1, production default 0
            # (= distribute over components)
            inj_comp[i] = comp if comp > 0 else 1
            prod_comp[i] = comp
        self.arrays = SourceArrays(
            cell=jnp.asarray(cell, jnp.int32),
            injection_component=jnp.asarray(inj_comp, jnp.int32),
            production_component=jnp.asarray(prod_comp, jnp.int32),
            volume=jnp.asarray(mesh.cell_volume[cell]),
        )
        self.controls = SourceControls(
            base_rate=rate,
            base_enthalpy=enthalpy,
            rate_tables=rate_tables,
            enthalpy_tables=enthalpy_tables,
        )
        self.eos = eos

    def rates_at(self, t0: float, t1: float):
        """Evaluate rate/enthalpy controls averaged over the step
        interval (device arrays [ns], traced-time friendly)."""
        ns = self.num_sources
        rate = jnp.asarray(self.controls.base_rate)
        enthalpy = jnp.asarray(self.controls.base_enthalpy)
        for i, tab in enumerate(self.controls.rate_tables):
            if tab is not None:
                rate = rate.at[i].set(tab.average(t0, t1)[0])
        for i, tab in enumerate(self.controls.enthalpy_tables):
            if tab is not None:
                enthalpy = enthalpy.at[i].set(tab.average(t0, t1)[0])
        return rate, enthalpy


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
