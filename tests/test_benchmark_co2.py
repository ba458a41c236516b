"""Benchmark: NCG CO2 column (O'Sullivan et al. 1985), vs the
reference's checked-in AUTOUGH2 listings.

Counterpart of test/benchmark/ncg/co2_column/test_co2_column.py:
final-state profiles of pressure, temperature, vapour saturation and
total CO2 mass fraction, reference tolerance 1e-3 (test_co2_column.py:122).
"""

import os

import numpy as np
import pytest

BASE = "/root/reference/test/benchmark/ncg/co2_column/run"


def run_case(tmp_path, json_path):
    from waiwera_tpu.cli import run_json

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ts = run_json(json_path)
    finally:
        os.chdir(cwd)
    return ts


@pytest.mark.parametrize("case", ["1", "5"])
def test_co2_column(tmp_path, case):
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    ts = run_case(tmp_path, os.path.join(BASE, f"co2_column_{case}.json"))
    assert not ts.aborted

    _, tables = read_listing(os.path.join(BASE, f"co2_column_{case}.listing"))
    out = h5py.File(tmp_path / f"co2_column_{case}.h5", "r")
    cf = out["cell_fields"]
    sl = cf["fluid_liquid_saturation"][-1]
    sv = cf["fluid_vapour_saturation"][-1]
    rl = cf["fluid_liquid_density"][-1]
    rv = cf["fluid_vapour_density"][-1]
    xl = cf["fluid_liquid_CO2_mass_fraction"][-1]
    xv = cf["fluid_vapour_CO2_mass_fraction"][-1]
    xt = (sl * rl * xl + sv * rv * xv) / (sl * rl + sv * rv)
    fields = [
        ("Pressure", cf["fluid_pressure"][-1], 1e5),
        ("Temperature", cf["fluid_temperature"][-1], 1.0),
        ("Gas saturatio", sv, 1.0),
        ("CO2 mass fractio", xt, 1.0),
    ]
    for name, mine, scale in fields:
        ref = tables[name][-1]
        off = len(ref) - len(mine)  # listing includes the atmosphere block
        err = np.max(np.abs(mine - ref[off:])) / max(
            np.max(np.abs(ref)), scale
        )
        assert err < 1e-3, f"co2_column_{case} {name}: {err}"
