"""IFT-style MAP E-field reconstruction (iftElectricFieldReconstructor
counterpart): recover a smooth-spectrum pulse from noisy voltages."""
import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.ops import antenna as antenna_ops
from nuradiomc_tpu.reco.ift_efield import iftElectricFieldReconstructor
from nuradiomc_tpu.utils import units

from test_analytic_efield import _det_four_mixed

stnp = par.stationParameters
efp = par.electricFieldParameters


def test_recovers_spectrum_and_polarization():
    det = _det_four_mixed()
    zen, az = np.deg2rad(135.0), np.deg2rad(60.0)
    fs, n = 1.0, 512
    ff = np.fft.rfftfreq(n, 1.0 / fs)
    band = (ff >= 0.08) & (ff <= 0.45)

    # smooth true spectrum: falling exponential + linear phase (pulse at 250ns)
    E_true = np.zeros(len(ff), dtype=complex)
    E_true[band] = 1e-3 * np.exp(-(ff[band] - 0.08) * 6.0) \
        * np.exp(-2j * np.pi * ff[band] * 250.0)
    pol_true = 0.6   # mixing angle
    e_t = np.cos(pol_true) * E_true
    e_p = np.sin(pol_true) * E_true

    st = Station(7)
    st[stnp.zenith] = zen
    st[stnp.azimuth] = az
    rng = np.random.default_rng(0)
    noise_spec = 2e-6
    for cid in range(4):
        rot = antenna_ops.antenna_rotation_matrix(
            *det.get_antenna_orientation(7, cid))
        tpl = antenna_ops.build_analytic_template("analytic_LPDA", ff)
        vt, vp = antenna_ops.analytic_vel(zen, az, rot, tpl, 0)
        V = np.asarray(vt) * e_t + np.asarray(vp) * e_p
        V = V + noise_spec * (rng.normal(size=len(ff))
                              + 1j * rng.normal(size=len(ff)))
        ch = Channel(cid)
        ch.set_frequency_spectrum(V, fs)
        st.add_channel(ch)
    evt = Event(0, 0)
    evt.set_station(st)

    reco = iftElectricFieldReconstructor()
    reco.begin(passband=(0.08, 0.45), noise_rms=noise_spec,
               n_iterations=800, learning_rate=0.05)
    ef = reco.run(evt, st, det, use_channels=[0, 1, 2, 3])

    spec = np.asarray(ef.get_frequency_spectrum())
    amp_rec = np.sqrt(np.abs(spec[1][band]) ** 2 + np.abs(spec[2][band]) ** 2)
    amp_true = np.abs(E_true[band])
    # amplitude spectrum recovered over the band where SNR is decent
    good = amp_true > 10 * noise_spec
    ratio = amp_rec[good] / amp_true[good]
    assert np.median(np.abs(ratio - 1)) < 0.25
    # polarization mixing angle
    assert abs(ef[efp.polarization_angle] - pol_true) < 0.15
    assert len(st.get_electric_fields()) == 1
    assert np.isfinite(reco.final_loss)
