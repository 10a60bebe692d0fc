#!/usr/bin/env python3
"""Simple MC reconstruction chain (mirrors the reference
examples/SimpleMCReconstruction.py): forward-fold a known efield, add noise,
filter, reconstruct observables, unfold the efield and fit the direction."""
import numpy as np

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import ElectricField, Event, SimStation, Station
from nuradiomc_tpu.reco import channel_processing as cp
from nuradiomc_tpu.reco import efield_converters as ec
from nuradiomc_tpu.utils import units

efp = par.electricFieldParameters
stnp = par.stationParameters

det = Detector({
    "channels": {
        "1": {"adc_n_samples": 256, "adc_sampling_frequency": 1.0,
              "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
              "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": -10.0,
              "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
              "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 5.0,
              "channel_id": 0, "station_id": 42, "adc_nbits": None},
        "2": {"adc_n_samples": 256, "adc_sampling_frequency": 1.0,
              "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
              "ant_position_x": 1.0, "ant_position_y": 0.0, "ant_position_z": -10.0,
              "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
              "ant_type": "analytic_HPol", "amp_type": "", "cab_time_delay": 5.0,
              "channel_id": 1, "station_id": 42, "adc_nbits": None}},
    "stations": {"1": {"station_id": 42}},
})

# build a simulated event with a band-limited efield
evt = Event(0, 0)
station = Station(42)
sim = SimStation(42)
fs, N = 2.0, 512
ff = np.fft.rfftfreq(N, 1 / fs)
spec = np.zeros((3, len(ff)), dtype=complex)
band = (ff > 0.15) & (ff < 0.45)
spec[1, band] = np.exp(-((ff[band] - 0.25) / 0.1) ** 2)
spec[2, band] = 0.4 * np.exp(-((ff[band] - 0.3) / 0.08) ** 2)
ef = ElectricField([0, 1])
ef.set_frequency_spectrum(spec * 1e-4, fs)
ef[efp.zenith] = np.deg2rad(60.0)
ef[efp.azimuth] = np.deg2rad(30.0)
sim.add_electric_field(ef)
station.set_sim_station(sim)
station[stnp.zenith] = np.deg2rad(60.0)
station[stnp.azimuth] = np.deg2rad(30.0)
evt.set_station(station)

# forward fold
conv = ec.efieldToVoltageConverter()
conv.begin()
conv.run(evt, station, det)

# noise + filter + observables
noise = cp.channelGenericNoiseAdder()
noise.begin(seed=42)
noise.run(evt, station, det, amplitude=1e-6, type="rayleigh")
bp = cp.channelBandPassFilter()
bp.run(evt, station, det, passband=[0.1, 0.5], filter_type="butter", order=4)
rec = cp.channelSignalReconstructor()
rec.begin()
rec.run(evt, station, det)
for cid in det.get_channel_ids(42):
    ch = station.get_channel(cid)
    print(f"channel {cid}: max amp = {ch[par.channelParameters.maximum_amplitude]:.3e} V, "
          f"SNR(peak) = {ch[par.channelParameters.SNR]['peak_amplitude']:.1f}")

# unfold the efield back
unfold = ec.voltageToEfieldConverter()
unfold.begin()
unfold.run(evt, station, det, use_channels=[0, 1])
rec_ef = station.get_electric_fields()[-1]
print("reconstructed efield fluence ratio (phi/theta):",
      float(np.sum(np.abs(rec_ef.get_frequency_spectrum()[2]) ** 2)
            / np.sum(np.abs(rec_ef.get_frequency_spectrum()[1]) ** 2)))
