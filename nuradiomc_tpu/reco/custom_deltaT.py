"""Per-ray-solution amplitude after the antenna response.

Re-implementation of the reference custom module
(NuRadioReco/modules/custom/deltaT/calculateAmplitudePerRaySolution.py:13-86):
convolve each simulated efield (one per ray-tracing solution) with the
antenna response of every channel it maps to and store the max |V| and the
max Hilbert-envelope amplitude per (efield, channel).
"""

from __future__ import annotations

import numpy as np
from scipy import signal as scsig

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.reco.base import register_run
from nuradiomc_tpu.reco.efield_converters import get_channel_vel
from nuradiomc_tpu.utils import fft as fft_utils
from nuradiomc_tpu.utils import units

efp = par.electricFieldParameters


class calculateAmplitudePerRaySolution:
    """Max signal amplitude per ray solution after the antenna
    (calculateAmplitudePerRaySolution.py:13-86)."""

    def begin(self, debug=False, antenna_replacements=None):
        self._antenna_replacements = antenna_replacements

    @register_run()
    def run(self, evt, station, det):
        sim_station = station.get_sim_station()
        sim_station_id = sim_station.get_id()

        for efield in sim_station.get_electric_fields():
            for channel_id in efield.get_channel_ids():
                zenith = efield[efp.zenith]
                azimuth = efield[efp.azimuth]

                ff = np.asarray(efield.get_frequencies())
                efield_fft = np.asarray(efield.get_frequency_spectrum())

                vt, vp = get_channel_vel(
                    det, sim_station_id, channel_id, ff, zenith, azimuth,
                    antenna_replacements=self._antenna_replacements)

                # apply antenna response, remove the DC band (<5 MHz)
                voltage_fft = efield_fft[2] * vp + efield_fft[1] * vt
                voltage_fft = np.where(ff < 5 * units.MHz, 0.0, voltage_fft)

                voltage = np.asarray(fft_utils.freq2time(
                    voltage_fft, efield.get_sampling_rate()))
                envelope = np.abs(scsig.hilbert(voltage))

                if not efield.has_parameter(efp.max_amp_antenna):
                    efield[efp.max_amp_antenna] = {}
                    efield[efp.max_amp_antenna_envelope] = {}
                efield[efp.max_amp_antenna][channel_id] = float(np.abs(voltage).max())
                efield[efp.max_amp_antenna_envelope][channel_id] = float(envelope.max())

    def end(self):
        pass
