"""HDF5 simulation output.

Mirrors the reference's output layout (hdf5io.F90, checked against the
CREDO reader used by the benchmark suite): groups /cell_fields,
/source_fields with [ntime, n] datasets named like fluid_pressure,
fluid_temperature, ...; a time dataset [ntime, 1]; and cell_index
giving the natural cell ordering. This file doubles as the restart
checkpoint (initial.F90:421-679).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from waiwera_tpu.physics.state import FluidState


class HDF5Output:
    def __init__(self, filename: str, simulation, fields=None):
        import h5py

        self.sim = simulation
        self.filename = filename
        self.file = h5py.File(filename, "w")
        self.n = simulation.mesh.num_interior_cells
        self.cell_group = self.file.create_group("cell_fields")
        self.time_ds = self.file.create_dataset(
            "time", shape=(0, 1), maxshape=(None, 1), dtype="f8"
        )
        self.file.create_dataset(
            "cell_index",
            data=np.arange(self.n, dtype=np.int64)[:, None],
        )
        if fields is None:
            cfg = (simulation.config.get("output", {}) or {}).get(
                "fields", {}
            ) or {}
            extra = cfg.get("fluid", []) if isinstance(cfg, dict) else []
            fields = list(simulation.eos.default_output_fluid_fields)
            # required fields always included; extras appended
            for f in extra:
                if f not in fields:
                    fields.append(f)
        self.fields = fields
        self._cell_ds = {}
        self.source_group = None
        if simulation.sources:
            self.source_group = self.file.create_group("source_fields")
            self._src_ds = {}

    def _cell_dataset(self, name):
        if name not in self._cell_ds:
            self._cell_ds[name] = self.cell_group.create_dataset(
                name,
                shape=(0, self.n),
                maxshape=(None, self.n),
                dtype="f8",
            )
        return self._cell_ds[name]

    def _field_values(self, fluid: FluidState, name: str) -> np.ndarray:
        f = np.asarray
        n = self.n
        if name == "pressure":
            return f(fluid.pressure)[:n]
        if name == "temperature":
            return f(fluid.temperature)[:n]
        if name == "region":
            return f(fluid.region)[:n].astype(np.float64)
        if name == "vapour_saturation":
            return f(fluid.saturation)[:n, 1]
        if name == "liquid_saturation":
            return f(fluid.saturation)[:n, 0]
        if name == "solid_saturation":
            return f(fluid.saturation)[:n, 2]
        if name == "gas_partial_pressure":
            return f(fluid.partial_pressure)[:n, -1]
        if name == "water_partial_pressure":
            return f(fluid.partial_pressure)[:n, 0]
        if name.startswith("liquid_"):
            return self._phase_field(fluid, 0, name[len("liquid_"):])
        if name.startswith("vapour_"):
            return self._phase_field(fluid, 1, name[len("vapour_"):])
        raise ValueError(f"unknown output field {name!r}")

    def _component_index(self, comp: str) -> int:
        names = [c.lower() for c in self.sim.eos.component_names]
        comp = comp.lower()
        if comp in names:
            return names.index(comp)
        if comp in ("gas", "ncg"):
            return len(names) - 1
        raise ValueError(f"unknown component {comp!r}")

    def _phase_field(self, fluid, p, attr):
        if attr.endswith("_mass_fraction"):
            comp = self._component_index(attr[: -len("_mass_fraction")])
            return np.asarray(fluid.mass_fraction)[: self.n, p, comp]
        if attr == "specific_enthalpy" or attr == "enthalpy":
            return np.asarray(fluid.specific_enthalpy)[: self.n, p]
        arr = getattr(fluid, attr)
        return np.asarray(arr)[: self.n, p]

    def write(self, index: int, time: float, fluid: FluidState,
              source_data: Optional[dict] = None, tracer=None):
        nt = self.time_ds.shape[0]
        self.time_ds.resize((nt + 1, 1))
        self.time_ds[nt, 0] = time
        for name in self.fields:
            ds = self._cell_dataset("fluid_" + name)
            ds.resize((nt + 1, self.n))
            ds[nt] = self._field_values(fluid, name)
        if tracer is not None and self.sim.tracers is not None:
            x = np.asarray(tracer)
            for k, nm in enumerate(self.sim.tracers.names):
                ds = self._cell_dataset(f"tracer_{nm}")
                ds.resize((nt + 1, self.n))
                ds[nt] = x[: self.n, k]
        if source_data and self.source_group is not None:
            for key, values in source_data.items():
                values = np.asarray(values).reshape(-1)
                name = "source_" + key
                if name not in self._src_ds:
                    ns = len(values)
                    self._src_ds[name] = self.source_group.create_dataset(
                        name, shape=(0, ns), maxshape=(None, ns), dtype="f8"
                    )
                ds = self._src_ds[name]
                ds.resize((ds.shape[0] + 1, ds.shape[1]))
                ds[-1] = values
        self.file.flush()

    def close(self):
        self.file.close()
