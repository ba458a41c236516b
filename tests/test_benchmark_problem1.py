"""Benchmark: Model Intercomparison Study problem 1 (radial Avdonin
injection problem), run from the reference's own input files and
compared against its checked-in AUTOUGH2 results, with the tolerances
the reference's CREDO test uses (test_problem1.py:88-99: history tol
1e-3, final-field tol 1e-4).
"""

import json
import os

import numpy as np
import pytest

REF = "/root/reference/test/benchmark/model_intercomparison_study/problem1/run"


@pytest.fixture(scope="module")
def results(tmp_path_factory):
    from waiwera_tpu.cli import run_json
    from waiwera_tpu.utils.autough2 import read_listing

    tmp = tmp_path_factory.mktemp("problem1")
    # run from the reference input (mesh path resolves relative to it)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        ts = run_json(os.path.join(REF, "problem1.json"))
    finally:
        os.chdir(cwd)
    import h5py

    out = h5py.File(tmp / "problem1.h5", "r")
    t_ref, tables = read_listing(os.path.join(REF, "problem1.listing"))
    return ts, out, t_ref, tables


def test_history_at_r37(results):
    ts, out, t_ref, tables = results
    assert not ts.aborted
    t_mine = out["time"][:, 0]
    obs = 1  # cell with centroid r = 37.5 m
    for mine_name, ref_name in [
        ("fluid_pressure", "Pressure"),
        ("fluid_temperature", "Temperature"),
    ]:
        mine = out["cell_fields"][mine_name][:, obs]
        ref = tables[ref_name][:, obs]
        # interpolate my history onto the AUTOUGH2 output times
        interp = np.interp(t_ref, t_mine, mine)
        scale = np.max(np.abs(ref))
        err = np.linalg.norm(interp - ref) / np.sqrt(len(ref)) / scale
        assert err < 1e-3, f"{ref_name} history error {err}"


def test_final_temperature_field(results):
    ts, out, t_ref, tables = results
    mine = out["cell_fields"]["fluid_temperature"][-1]
    ref = tables["Temperature"][-1][:40]
    scale = np.max(np.abs(ref))
    err = np.linalg.norm(mine - ref) / np.sqrt(len(ref)) / scale
    assert err < 1e-4, f"final temperature field error {err}"
