"""HDF5 output completeness: face flux fields, geometry datasets,
source/group/reinjector fields, constant index datasets — the layout of
hdf5io.F90 + flow_simulation.F90:2580-2994 that reference
post-processing tools read.
"""

import numpy as np
import pytest

from waiwera_tpu.mesh.rect import column_mesh
from waiwera_tpu.sim.simulation import Simulation
from waiwera_tpu.sim.output import HDF5Output
from waiwera_tpu.sim.timestepper import Timestepper


def _run(tmp_path, config, mesh):
    sim = Simulation(config, mesh=mesh)
    out = HDF5Output(str(tmp_path / "out.h5"), sim)
    ts = Timestepper(config, sim, output=out)
    ok = ts.run()
    out.close()
    assert ok
    import h5py

    return h5py.File(str(tmp_path / "out.h5"), "r")


def test_flux_and_geometry_output(tmp_path):
    nz = 12
    mesh = column_mesh([10.0] * nz)
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [5.0e6, 180.0], "region": 1},
        "boundaries": [
            {
                "primary": [5.0e6, 180.0],
                "region": 1,
                "faces": {"cells": [0], "normal": [0.0, 1.0]},
            }
        ],
        "output": {
            "fields": {
                "flux": ["water", "energy", "liquid"],
                "cell_geometry": ["centroid", "volume"],
            }
        },
        "time": {"stop": 2.0e4, "step": {"size": 1.0e4}},
    }
    f = _run(tmp_path, config, mesh)
    nt = f["time"].shape[0]
    nf = mesh.num_faces
    for nm in ("flux_water", "flux_energy", "flux_liquid"):
        assert f["face_fields"][nm].shape == (nt, nf)
    # gravity drives a nonzero initial water flux in the column
    assert np.any(np.abs(f["face_fields"]["flux_water"][0]) > 0.0)
    # geometry + face index datasets
    n = mesh.num_interior_cells
    assert f["cell_geometry_centroid"].shape == (n, 3)
    assert f["cell_geometry_volume"].shape == (n, 1)
    fc1 = f["face_cell_1"][...].ravel()
    fc2 = f["face_cell_2"][...].ravel()
    assert fc1.shape == (nf,)
    # boundary ghost cells are encoded as negative indices
    assert np.any(fc2 < 0) or np.any(fc1 < 0)
    interior = fc1[(fc1 >= 0) & (fc2 >= 0)]
    assert np.all(interior < n)
    f.close()


def test_source_network_output_fields(tmp_path):
    nz = 10
    mesh = column_mesh([10.0] * nz)
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [10.0e6, 250.0], "region": 1},
        "source": [
            {
                "name": "prod",
                "cell": 4,
                "rate": -5.0,
                "separator": {"pressure": 5.0e5},
            },
            {"name": "inj", "cell": 9, "rate": 2.0, "enthalpy": 400e3},
        ],
        "network": {
            "group": [{"name": "grp", "in": ["prod"]}],
        },
        "output": {
            "fields": {
                "source": [
                    "natural_cell_index", "component", "source_index",
                    "rate", "enthalpy", "steam_fraction", "water_rate",
                    "steam_rate", "water_enthalpy", "steam_enthalpy",
                    "water_flow", "heat_flow",
                ],
                "network_group": ["rate", "enthalpy", "water_rate",
                                  "steam_rate"],
            }
        },
        "time": {"stop": 2.0e4, "step": {"size": 1.0e4}},
    }
    f = _run(tmp_path, config, mesh)
    sf = f["source_fields"]
    nt = f["time"].shape[0]
    # constant index datasets, written once
    np.testing.assert_array_equal(
        sf["source_natural_cell_index"][...].ravel(), [4, 9]
    )
    assert sf["source_source_index"][...].ravel().tolist() == [0, 1]
    assert "source_component" in sf
    # time series per source
    for nm in (
        "source_rate", "source_enthalpy", "source_steam_fraction",
        "source_water_rate", "source_steam_rate",
        "source_water_enthalpy", "source_steam_enthalpy",
        "source_water_flow", "source_heat_flow",
    ):
        assert sf[nm].shape == (nt, 2), nm
    # the producer separates: steam fraction in (0, 1], water+steam
    # rates sum to the total rate
    q = sf["source_rate"][-1]
    qw = sf["source_water_rate"][-1]
    qs = sf["source_steam_rate"][-1]
    assert q[0] < 0.0
    np.testing.assert_allclose(qw[0] + qs[0], q[0], rtol=1e-10)
    assert sf["source_steam_fraction"][-1][0] > 0.0
    # component flow of water == total rate for single-component EOS
    np.testing.assert_allclose(
        sf["source_water_flow"][-1], q, rtol=1e-12
    )
    # group fields aggregate the producer
    for nm in (
        "network_group_rate", "network_group_enthalpy",
        "network_group_water_rate", "network_group_steam_rate",
    ):
        assert sf[nm].shape == (nt, 1), nm
    np.testing.assert_allclose(
        sf["network_group_rate"][-1][0], q[0], rtol=1e-10
    )
    f.close()


def test_jacobian_dump(tmp_path):
    """output.jacobian writes a loadable BSR dump of the Jacobian at
    output times (flow_simulation.F90:309-390,2989 MatView
    analogue)."""
    import os

    nz = 8
    mesh = column_mesh([10.0] * nz)
    jac_file = str(tmp_path / "jac.npz")
    config = {
        "eos": {"name": "we"},
        "initial": {"primary": [5.0e6, 180.0], "region": 1},
        "output": {"jacobian": {"filename": jac_file}},
        "time": {"stop": 2.0e4, "step": {"size": 1.0e4}},
    }
    f = _run(tmp_path, config, mesh)
    f.close()
    assert os.path.exists(jac_file)
    d = np.load(jac_file)
    n = int(d["num_rows"])
    b = int(d["block_size"])
    assert b == 2 and n == nz
    assert d["data"].shape == (len(d["indices"]), b, b)
    assert d["indptr"].shape == (n + 1,)
    # diagonal blocks must be nonsingular
    import scipy.sparse as sp

    A = sp.bsr_matrix(
        (d["data"], d["indices"], d["indptr"]), shape=(n * b, n * b)
    )
    assert np.all(np.abs(A.diagonal()) > 0.0)
