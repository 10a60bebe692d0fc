"""CoREAS input machinery tests on a synthetic CORSIKA-7-format file."""
import h5py
import numpy as np
import pytest

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.sim import io_coreas
from nuradiomc_tpu.utils import units


@pytest.fixture
def corsika_file(tmp_path):
    path = str(tmp_path / "coreas.hdf5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        inputs = f.create_group("inputs")
        inputs.attrs["THETAP"] = np.array([35.0, 35.0])
        inputs.attrs["PHIP"] = np.array([120.0, 120.0])
        inputs.attrs["MAGNET"] = np.array([18.5, 48.3])  # By, -Bz in uT
        inputs.attrs["ERANGE"] = np.array([1e8, 1e8])    # GeV
        inputs.attrs["RUNNR"] = 1
        inputs.attrs["EVTNR"] = 7
        obs = f.create_group("CoREAS").create_group("observers")
        t = np.arange(256) * 2e-10  # 0.2 ns in seconds
        # star-shape positions in cm
        for i, (r, phi) in enumerate([(rr, pp) for rr in (2000, 8000, 20000)
                                      for pp in np.linspace(0, 2 * np.pi, 8, endpoint=False)]):
            data = np.zeros((256, 4))
            data[:, 0] = t
            amp = 1e-3 / (1 + (r / 10000) ** 2)
            pulse = amp * np.exp(-0.5 * ((np.arange(256) - 100) / 8.0) ** 2)
            data[:, 1] = pulse
            data[:, 2] = 0.3 * pulse
            data[:, 3] = 0.1 * pulse
            d = obs.create_dataset(f"obs_{i}", data=data)
            d.attrs["position"] = np.array([r * np.cos(phi), r * np.sin(phi), 0.0])
    return path


def test_read_corsika7(corsika_file):
    evt = io_coreas.read_CORSIKA7(corsika_file)
    shower = evt.get_first_sim_shower()
    np.testing.assert_allclose(shower[par.showerParameters.zenith],
                               np.deg2rad(35.0))
    # azimuth convention: 270 deg + PHIP
    np.testing.assert_allclose(
        shower[par.showerParameters.azimuth],
        np.mod(3 * np.pi / 2 + np.deg2rad(120.0), 2 * np.pi))
    sim = evt.get_station(0).get_sim_station()
    assert sim.is_cosmic_ray()
    efields = sim.get_electric_fields()
    assert len(efields) == 24
    ef = efields[0]
    # sampling rate 5 GHz (0.2 ns steps)
    np.testing.assert_allclose(ef.get_sampling_rate(), 5.0, rtol=1e-6)
    # CGS conversion: amplitude = input * c*1e10 uV/m factor
    amp = np.max(np.abs(np.asarray(ef.get_trace())))
    expected = 1e-3 * np.sqrt(1 + 0.3 ** 2 + 0.1 ** 2) * \
        io_coreas.conversion_fieldstrength_cgs_to_SI / (1 + 0.04)
    assert 0.5 * expected < amp < 2 * expected
    # position conversion: cm -> m, axis swap; first observer at (0, 2000, 0) cm
    # CORSIKA (x, y) = (2000*cos0, 0) -> NRR (x, y) = (-y, x) = (0, 20) m
    np.testing.assert_allclose(ef.get_position()[1], 20.0, atol=1e-9)


def test_interpolator_fluence(corsika_file):
    evt = io_coreas.read_CORSIKA7(corsika_file)
    interp = io_coreas.coreasInterpolator(evt)
    # fluence at a simulated observer reproduces that observer's fluence
    ef = evt.get_station(0).get_sim_station().get_electric_fields()[3]
    f_at = interp.get_interp_fluence_value(ef.get_position())
    f_true = np.sum(np.asarray(ef.get_trace()) ** 2)
    np.testing.assert_allclose(f_at, f_true, rtol=1e-6)
    # interpolated efield scales continuously between rings
    tr, fs = interp.get_interp_efield_value(ef.get_position() * 1.05)
    assert tr.shape[0] == 3 and fs == ef.get_sampling_rate()
