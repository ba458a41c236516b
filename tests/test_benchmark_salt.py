"""Benchmarks: water+salt+energy (wse) vs the reference's checked-in
AUTOUGH2 EWASG listings.

Counterparts of test/benchmark/salt/{column,production}. The reference
notes AUTOUGH2's EWASG brine thermodynamics differ, so only the final
state is compared for the column, with tolerances Pressure 1e-2,
Temperature 2e-2, saturations 5e-2, salt mass fraction 1e-2
(test_salt_column.py:78-82).
"""

import os

import numpy as np
import pytest

BASE = "/root/reference/test/benchmark/salt"


def run_case(tmp_path, json_path):
    from waiwera_tpu.cli import run_json

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ts = run_json(json_path)
    finally:
        os.chdir(cwd)
    return ts


def test_salt_column(tmp_path):
    """Vertical column with water+salt injection at the bottom:
    boiling concentrates brine to halite precipitation."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    d = os.path.join(BASE, "column/run")
    ts = run_case(tmp_path, os.path.join(d, "salt_column.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "salt_column.h5", "r")
    _, tab = read_listing(os.path.join(d, "salt_column.listing"))
    fields = [
        ("fluid_pressure", "Pressure", 1e5, 1e-2),
        ("fluid_temperature", "Temperature", 1.0, 2e-2),
        ("fluid_vapour_saturation", "Gas saturati", 1.0, 5e-2),
        ("fluid_liquid_salt_mass_fraction", "NaCl liquid", 1.0, 1e-2),
    ]
    for ds, ref_name, scale, tol in fields:
        mine = out["cell_fields"][ds][-1]
        ref = tab[ref_name][-1][1:]  # drop atmosphere block
        rel = np.abs(mine - ref) / np.maximum(np.abs(ref), scale)
        assert np.max(rel) < tol, f"{ds}: {np.max(rel)}"


def test_salt_co2_column(tmp_path):
    """Water+salt+CO2 column (wsce, 4 primary variables): gas
    dissolution with salting-out, brine saturation line at the water
    partial pressure. Reference tolerances: P 1e-2, T 2.5e-2,
    saturations 5e-2, salt 1e-2 (test_salt_co2_column.py:81-84)."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    d = os.path.join(BASE, "ncg/column/run")
    ts = run_case(tmp_path, os.path.join(d, "salt_co2_column.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "salt_co2_column.h5", "r")
    _, tab = read_listing(os.path.join(d, "salt_co2_column.listing"))
    fields = [
        ("fluid_pressure", "Pressure", 1e5, 1e-2),
        ("fluid_temperature", "Temperature", 1.0, 2.5e-2),
        ("fluid_vapour_saturation", "Gas saturati", 1.0, 5e-2),
        ("fluid_liquid_salt_mass_fraction", "NaCl liquid", 1.0, 1e-2),
    ]
    for ds, ref_name, scale, tol in fields:
        mine = out["cell_fields"][ds][-1]
        ref = tab[ref_name][-1][1:]
        rel = np.abs(mine - ref) / np.maximum(np.abs(ref), scale)
        assert np.max(rel) < tol, f"{ds}: {np.max(rel)}"


def test_salt_production(tmp_path):
    """High-rate production from brine with separator: boiling raises
    salt concentration near the well."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    d = os.path.join(BASE, "production/run")
    ts = run_case(tmp_path, os.path.join(d, "salt_production.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "salt_production.h5", "r")
    t_mine = out["time"][:, 0]
    tr, tab = read_listing(os.path.join(d, "salt_production.listing"))
    off = tab["Pressure"].shape[1] - out["cell_fields"][
        "fluid_pressure"
    ].shape[1]
    fields = [
        ("fluid_pressure", "Pressure", 1e5, 1e-2),
        ("fluid_temperature", "Temperature", 1.0, 2e-2),
        ("fluid_vapour_saturation", "Gas saturati", 1.0, 5e-2),
        ("fluid_liquid_salt_mass_fraction", "NaCl liquid", 1.0, 1e-2),
    ]
    for ds, ref_name, scale, tol in fields:
        mine = out["cell_fields"][ds][:]
        ref = tab[ref_name]
        for c in range(mine.shape[1]):
            mi = np.interp(tr, t_mine, mine[:, c])
            r = ref[:, c + off]
            err = np.max(np.abs(mi - r)) / max(np.max(np.abs(r)), scale)
            assert err < tol, f"{ds} cell {c}: {err}"
