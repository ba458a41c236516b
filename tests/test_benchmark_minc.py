"""Benchmarks: MINC dual porosity vs the reference's checked-in
AUTOUGH2 listings.

Counterparts of test/benchmark/minc/{column,doublet_1d}: a production
column with a MINC zone (2 matrix levels, 3 fracture planes) and 1-D
thermal-breakthrough doublets at fracture spacings 50/100/200 m
(1 matrix level). History tolerance 1e-2 (test_minc_column.py,
test_minc_doublet.py use 2.5e-3..1e-2).
"""

import os

import numpy as np
import pytest

BASE = "/root/reference/test/benchmark/minc"


def run_case(tmp_path, json_path):
    from waiwera_tpu.cli import run_json

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ts = run_json(json_path)
    finally:
        os.chdir(cwd)
    return ts


def history_errors(out_file, listing, fields):
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    out = h5py.File(out_file, "r")
    t_mine = out["time"][:, 0]
    tr, tab = read_listing(listing)
    errs = {}
    for ds, ref_name, scale in fields:
        mine = out["cell_fields"][ds][:]
        ref = tab[ref_name]
        off = 1 if ref.shape[1] > mine.shape[1] else 0
        nc = min(mine.shape[1], ref.shape[1] - off)
        for c in range(nc):
            mi = np.interp(tr, t_mine, mine[:, c])
            r = ref[:, c + off]
            errs[(ds, c)] = np.max(np.abs(mi - r)) / max(
                np.max(np.abs(r)), scale
            )
    return errs


@pytest.mark.parametrize("case", ["minc_column_single", "minc_column_minc"])
def test_minc_column(tmp_path, case):
    """Production/injection column; the MINC variant compares fracture
    AND matrix cell histories (2 matrix levels per fracture cell)."""
    d = os.path.join(BASE, "column/run")
    ts = run_case(tmp_path, os.path.join(d, f"{case}.json"))
    assert not ts.aborted
    errs = history_errors(
        tmp_path / f"{case}.h5",
        os.path.join(d, f"{case}.listing"),
        [
            ("fluid_pressure", "Pressure", 1e5),
            ("fluid_temperature", "Temperature", 1.0),
            ("fluid_vapour_saturation", "Vapour saturation", 1.0),
        ],
    )
    for k, v in errs.items():
        assert v < 1e-2, f"{case} {k}: {v}"


@pytest.mark.parametrize("case", ["minc_1d_50", "minc_1d_200"])
def test_minc_doublet(tmp_path, case):
    """1-D doublet thermal breakthrough, sensitive to the
    fracture-matrix connection geometry (proximity-function areas and
    distances)."""
    d = os.path.join(BASE, "doublet_1d/run")
    ts = run_case(tmp_path, os.path.join(d, f"{case}.json"))
    assert not ts.aborted
    errs = history_errors(
        tmp_path / f"{case}.h5",
        os.path.join(d, f"{case}.listing"),
        [
            ("fluid_pressure", "Pressure", 1e5),
            ("fluid_temperature", "Temperature", 1.0),
        ],
    )
    for k, v in errs.items():
        assert v < 1e-2, f"{case} {k}: {v}"


def test_minc_production3d(tmp_path):
    """3-D MINC production model, base case: 5x5x5 grid + 2-level MINC
    zone, well on deliverability with time-dependent productivity index
    and a steam flow limiter (test_minc_3d.py:128-145, tol 1e-2)."""
    import h5py

    from waiwera_tpu.utils.autough2 import read_listing

    ts = run_case(
        tmp_path, os.path.join(BASE, "production3d/run/minc_3d_base.json")
    )
    assert not ts.aborted
    out = h5py.File(tmp_path / "minc_3d_base.h5", "r")
    t_mine = out["time"][:, 0]
    listing = os.path.join(BASE, "production3d/run/minc_3d_base.listing")
    t_ref, tab = read_listing(listing)
    off, n = 25, 161  # 25 atmosphere blocks; 125 cells + 36 MINC cells
    for ds, ref_name, scale in [
        ("fluid_pressure", "Pressure", 1e5),
        ("fluid_temperature", "Temperature", 1.0),
        ("fluid_vapour_saturation", "Vapour saturation", 1.0),
    ]:
        m = out["cell_fields"][ds][:]
        r = tab[ref_name][:, off : off + n]
        # final-time field over all cells (FieldWithinTolTC tol 1e-2)
        mi = np.array(
            [np.interp(t_ref[-1], t_mine, m[:, c]) for c in range(n)]
        )
        err = np.max(np.abs(mi - r[-1])) / max(np.max(np.abs(r[-1])), scale)
        assert err < 1e-2, f"minc3d {ref_name} field: {err}"
        # history at the production cell
        h = np.interp(t_ref, t_mine, m[:, 50])
        rh = r[:, 50]
        errh = np.max(np.abs(h - rh)) / max(np.max(np.abs(rh)), scale)
        assert errh < 1e-2, f"minc3d {ref_name} history: {errh}"
    # deliverability well (source index 25): rate and enthalpy histories
    tg, gtab = read_listing(listing, table="generation")
    for ds, ref_name, scale in [
        ("source_enthalpy", "Enthalpy", 1e3),
        ("source_rate", "Generation rate", 1.0),
    ]:
        mine = out["source_fields"][ds][:, 25]
        rr = gtab[ref_name][:, 25]
        h = np.interp(tg, t_mine, mine)
        err = np.max(np.abs(h - rr)) / max(np.max(np.abs(rr)), scale)
        assert err < 1e-2, f"minc3d {ref_name}: {err}"
