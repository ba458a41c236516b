"""Benchmarks: passive tracers vs analytic decay and the reference's
checked-in AUTOUGH2 listings.

Counterparts of test/benchmark/tracer/{decay,oned,doublet}. The oned
and doublet cases restart from the reference's checked-in steady-state
HDF5 files (exercising restart-from-file, initial.F90:421-679).
Reference tolerances 1e-2/2e-2 (test_tracer_1d.py, test_doublet.py).
"""

import os

import numpy as np
import pytest

BASE = "/root/reference/test/benchmark/tracer"


def run_case(tmp_path, json_path):
    from waiwera_tpu.cli import run_json

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ts = run_json(json_path)
    finally:
        os.chdir(cwd)
    return ts


def test_decay(tmp_path):
    """One-cell decay: no-decay, constant-rate and Arrhenius
    temperature-dependent tracers vs exact exponentials (BDF2)."""
    import h5py

    ts = run_case(tmp_path, os.path.join(BASE, "decay/run/decay.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "decay.h5", "r")
    t = out["time"][:, 0]
    temp = out["cell_fields"]["fluid_temperature"][0, 0]
    lam = 1e-6 * np.exp(-2000.0 / (8.3144598 * (temp + 273.15)))
    cases = [
        ("tracer_no_decay", np.full_like(t, 1e-3)),
        ("tracer_constant", 1e-3 * np.exp(-1e-6 * t)),
        ("tracer_temperature", 1e-3 * np.exp(-lam * t)),
    ]
    for name, exact in cases:
        x = out["cell_fields"][name][:, 0]
        assert np.max(np.abs(x - exact)) < 1e-5, name


def cell_history_errors(out_file, listing, fields):
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    out = h5py.File(out_file, "r")
    t_mine = out["time"][:, 0]
    tr, tab = read_listing(listing)
    errs = {}
    for ds, ref_name, scale in fields:
        mine = out["cell_fields"][ds][:]
        ref = tab[ref_name]
        for c in range(mine.shape[1]):
            mi = np.interp(tr, t_mine, mine[:, c])
            errs[(ds, c)] = np.max(np.abs(mi - ref[:, c])) / scale
    return errs


@pytest.mark.parametrize("case", ["oned_single_phase", "oned_two_phase"])
def test_oned(tmp_path, case):
    """1-D tracer advection with boundary inflow, restarting from the
    reference's steady-state file."""
    d = os.path.join(BASE, "oned/run")
    ts = run_case(tmp_path, os.path.join(d, f"{case}.json"))
    assert not ts.aborted
    errs = cell_history_errors(
        tmp_path / f"{case}.h5",
        os.path.join(d, f"{case}.listing"),
        [
            ("tracer_tracer", "Tracer/liquid", 1e-2),
            ("fluid_pressure", "Pressure", 1e5),
        ],
    )
    for k, v in errs.items():
        assert v < 1e-2, f"{case} {k}: {v}"


def test_doublet(tmp_path):
    """Injection/production doublet with pulse tracer injection (step
    table), deliverability production and tracer diffusion."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    d = os.path.join(BASE, "doublet/run")
    ts = run_case(tmp_path, os.path.join(d, "doublet.json"))
    assert not ts.aborted
    out = h5py.File(tmp_path / "doublet.h5", "r")
    t_mine = out["time"][:, 0]
    tr, tab = read_listing(os.path.join(d, "doublet.listing"))
    x = out["cell_fields"]["tracer_tracer1"][:]
    ref = tab["Tracer/liquid"]
    scale = np.max(np.abs(ref))
    for c in range(x.shape[1]):
        mi = np.interp(tr, t_mine, x[:, c])
        assert np.max(np.abs(mi - ref[:, c])) / scale < 1e-2, c
    # produced tracer mass flow at the production well
    tg, gen = read_listing(
        os.path.join(d, "doublet.listing"), table="generation"
    )
    tf = out["source_fields"]["source_tracer_flow"][:, 1]
    rf = gen["Tracer mass flow"][:, 1]
    ti = np.interp(tg, t_mine, tf)
    assert np.max(np.abs(ti - rf)) / np.max(np.abs(rf)) < 1e-2
