"""Surface-muon generator (parametrized secondaries) and event splitting."""
import numpy as np
import pytest

from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.utils import units

VOLUME = {"fiducial_rmin": 0, "fiducial_rmax": 2 * units.km,
          "fiducial_zmin": -2 * units.km, "fiducial_zmax": 0}


def test_surface_muons_parametrized(tmp_path):
    path = str(tmp_path / "mu.hdf5")
    data, attrs = evtgen.generate_surface_muons(
        path, 2000, 1e17, 1e19, VOLUME, thetamax=np.deg2rad(80),
        seed=5, secondaries="parametrized")
    assert attrs["simulation_mode"] == "atmospheric_muon"
    assert set(np.unique(data["flavors"])) <= {13, -13}
    # vertices inside the volume, below the surface entry
    assert np.all(data["zz"] <= 0)
    assert np.all(data["zz"] >= VOLUME["fiducial_zmin"] - 1e-6)
    # downward-going
    assert np.all(data["zeniths"] <= np.deg2rad(80) + 1e-9)
    # shower energies below muon energies
    assert np.all(data["shower_energies"] < data["energies"])


def test_proposal_required_raises():
    with pytest.raises((ImportError, NotImplementedError)):
        evtgen.generate_surface_muons(None, 10, 1e17, 1e18, VOLUME, seed=1,
                                      secondaries="proposal")


def test_group_into_events():
    times = np.array([0.0, 10.0, 3e6, 3e6 + 5, 9e6])
    idx = evtgen.group_into_events(times, split_time_gap=1e6)
    assert list(idx) == [0, 0, 1, 1, 2]
