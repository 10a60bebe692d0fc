"""Direction reconstruction modules.

* correlationDirectionFitter: (zenith, azimuth) from maximizing the
  cross-correlation of two orthogonal channel pairs at plane-wave delays
  (modules/correlationDirectionFitter.py:33-260). The reference uses
  scipy.optimize.brute + fmin; here the likelihood is evaluated on a dense
  vectorized (zenith, azimuth) grid with one refinement stage — same
  objective, fully array-parallel.
* planeWaveDirectionFitter-style timing fit helper.
"""

from __future__ import annotations

import numpy as np
from scipy import signal

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.reco.base import register_run
from nuradiomc_tpu.utils import units
from nuradiomc_tpu.utils.constants import speed_of_light

stnp = par.stationParameters


def get_time_delay_from_direction(zenith, azimuth, p, n=None):
    """Arrival-time delay of a plane wave at position p
    (utilities/geometryUtilities.get_time_delay_from_direction)."""
    refraction = 1.0 if n is None else n
    v = np.array([np.sin(zenith) * np.cos(azimuth),
                  np.sin(zenith) * np.sin(azimuth),
                  np.cos(zenith)])
    return -refraction / speed_of_light * np.dot(v, p)


class correlationDirectionFitter:
    def begin(self, debug=False, log_level=None):
        pass

    @register_run()
    def run(self, evt, station, det, n_index=None, ZenLim=None, AziLim=None,
            channel_pairs=((0, 2), (1, 3)), use_envelope=False):
        if ZenLim is None:
            ZenLim = [0, 90 * units.deg]
        if AziLim is None:
            AziLim = [0, 360 * units.deg]
        station_id = station.get_id()

        positions = [[det.get_relative_position(station_id, channel_pairs[0][0]),
                      det.get_relative_position(station_id, channel_pairs[0][1])],
                     [det.get_relative_position(station_id, channel_pairs[1][0]),
                      det.get_relative_position(station_id, channel_pairs[1][1])]]
        fs = station.get_channel(channel_pairs[0][0]).get_sampling_rate()
        tstarts = [[station.get_channel(channel_pairs[0][0]).get_trace_start_time(),
                    station.get_channel(channel_pairs[0][1]).get_trace_start_time()],
                   [station.get_channel(channel_pairs[1][0]).get_trace_start_time(),
                    station.get_channel(channel_pairs[1][1]).get_trace_start_time()]]

        def get_trace(cid):
            tr = station.get_channel(cid).get_trace()
            if use_envelope:
                tr = np.abs(signal.hilbert(tr))
            return tr

        corr_02 = signal.correlate(get_trace(channel_pairs[0][0]),
                                   get_trace(channel_pairs[0][1]))
        corr_13 = signal.correlate(get_trace(channel_pairs[1][0]),
                                   get_trace(channel_pairs[1][1]))
        w02 = np.sum(np.abs(corr_02))
        w13 = np.sum(np.abs(corr_13))

        def neg_ll(zen, az):
            """Vectorized over same-shape zen/az grids (ll_regular_station)."""
            zen = np.asarray(zen)
            az = np.asarray(az)
            v = np.stack([np.sin(zen) * np.cos(az), np.sin(zen) * np.sin(az),
                          np.cos(zen)], axis=-1)
            n_ref = 1.0 if n_index is None else n_index

            def pair_pos(ipair):
                p0, p1 = positions[ipair]
                t0 = -n_ref / speed_of_light * (v @ p0)
                t1 = -n_ref / speed_of_light * (v @ p1)
                return (t1 - t0) - (tstarts[ipair][1] - tstarts[ipair][0])

            d02 = pair_pos(0) * fs
            d13 = pair_pos(1) * fs
            pos02 = np.clip((corr_02.shape[0] // 2 - d02).astype(int), 0, corr_02.shape[0] - 1)
            pos13 = np.clip((corr_13.shape[0] // 2 - d13).astype(int), 0, corr_13.shape[0] - 1)
            return -(corr_02[pos02] / w02 + corr_13[pos13] / w13)

        # stage 1: dense grid; stage 2: refine around the best point
        zen_g = np.arange(ZenLim[0], ZenLim[1] + 1e-9, 1.0 * units.deg)
        az_g = np.arange(AziLim[0], AziLim[1] + 1e-9, 1.0 * units.deg)
        ZZ, AA = np.meshgrid(zen_g, az_g, indexing="ij")
        ll = neg_ll(ZZ, AA)
        i, j = np.unravel_index(np.argmin(ll), ll.shape)
        zen0, az0 = ZZ[i, j], AA[i, j]

        dz = 1.2 * units.deg
        zen_f = np.linspace(max(zen0 - dz, ZenLim[0]), min(zen0 + dz, ZenLim[1]), 121)
        az_f = np.linspace(az0 - dz, az0 + dz, 121)
        ZZ, AA = np.meshgrid(zen_f, az_f, indexing="ij")
        ll = neg_ll(ZZ, AA)
        i, j = np.unravel_index(np.argmin(ll), ll.shape)

        station[stnp.zenith] = ZZ[i, j]
        station[stnp.azimuth] = np.mod(AA[i, j], 2 * np.pi)

    def end(self):
        pass
