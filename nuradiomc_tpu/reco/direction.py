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


def beamforming_score(zen, az, V, band, positions, t_starts, rots, templates,
                      kinds, pol, n_index, fs):
    """cc-beam score for a batch of candidate directions (vectorized).

    Semantics of beamFormingDirectionFitter.ll_regular_station
    (modules/beamFormingDirectionFitter.py:138-180): per channel, unfold the
    voltage spectrum to the chosen E-field polarization for the candidate
    direction, bandpass, time-align with plane-wave delays, form the
    pair-product cc-beam, sign*sqrt, smooth, and take the maximum.  The
    reference evaluates one direction per scipy.optimize.brute step; here the
    whole direction batch is one array program (vmap-able / jit-able).

    Parameters
    ----------
    zen, az : (D,) candidate directions
    V : (C, F) complex voltage spectra
    band : (F,) passband response (butterabs 120-300 MHz in the reference)
    positions : (C, 3) antenna positions; t_starts : (C,) trace start times
    rots, templates, kinds : per-channel antenna descriptions
    pol : 0 (eTheta) or 1 (ePhi)
    """
    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.ops import antenna as antenna_ops

    C, F = V.shape
    n_t = 2 * (F - 1)
    freqs = jnp.fft.rfftfreq(n_t, 1.0 / fs)

    def one_dir(zenith, azimuth):
        def one_ch(rot, tpl, kind, p, t0, v):
            vt, vp = antenna_ops.analytic_vel(zenith, azimuth, rot, tpl, kind)
            vel = jnp.where(pol == 0, vt, vp)
            good = jnp.abs(vel) > 1e-3 * jnp.max(jnp.abs(vel))
            E = jnp.where(good, v / jnp.where(good, vel, 1.0), 0.0) * band
            # align to the plane-wave arrival: x(t + tau) <-> X(f) e^{2pi i f tau}
            k = jnp.array([jnp.sin(zenith) * jnp.cos(azimuth),
                           jnp.sin(zenith) * jnp.sin(azimuth),
                           jnp.cos(zenith)])
            delay = -n_index / speed_of_light * jnp.dot(k, p)
            tau = delay - t0
            return jnp.fft.irfft(E * jnp.exp(2j * jnp.pi * freqs * tau), n_t)

        x = jax.vmap(one_ch)(rots, templates, kinds, positions, t_starts, V)
        x = x / jnp.max(jnp.abs(x))
        # all-pairs product beam: sum_{j<k} x_j x_k = ((sum x)^2 - sum x^2)/2
        s = jnp.sum(x, axis=0)
        cc = (s ** 2 - jnp.sum(x ** 2, axis=0)) / 2.0
        n_pairs = C * (C - 1) / 2.0
        cc = cc / n_pairs
        cc = jnp.abs(jnp.sign(cc) * jnp.sqrt(jnp.abs(cc)))
        # moving average (reference: np.convolve(ones(2000)/2000, 'same'))
        w = min(2000, n_t)
        csum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(cc)])
        lo = jnp.clip(jnp.arange(n_t) - w // 2, 0, n_t)
        hi = jnp.clip(jnp.arange(n_t) + (w - w // 2), 0, n_t)
        ave = (csum[hi] - csum[lo]) / w
        return jnp.max(ave)

    return jax.vmap(one_dir)(jnp.asarray(zen), jnp.asarray(az))


class beamFormingDirectionFitter:
    """Interferometric (cc-beam) direction fitter
    (modules/beamFormingDirectionFitter.py:84-231).  The reference brute-forces
    a 1-degree grid in Python (one antenna unfold + FFT per step); here each
    refinement stage is a single vectorized batch over directions."""

    def begin(self, debug=False, log_level=None):
        self._debug = debug

    @register_run()
    def run(self, evt, station, det, polarization=0, n_index=1.353,
            channels=None, ZenLim=None, AziLim=None,
            passband=(120 * units.MHz, 300 * units.MHz),
            antenna_replacements=None):
        from nuradiomc_tpu.ops import antenna as antenna_ops
        from nuradiomc_tpu.ops import filters

        if ZenLim is None:
            ZenLim = [90 * units.deg, 180 * units.deg]
        if AziLim is None:
            AziLim = [0, 360 * units.deg]
        station_id = station.get_id()
        if channels is None:
            channels = list(det.get_channel_ids(station_id))

        reps = antenna_replacements or {}
        V, positions, t_starts, rots, templates, kinds = [], [], [], [], [], []
        fs = station.get_channel(channels[0]).get_sampling_rate()
        F = None
        for cid in channels:
            ch = station.get_channel(cid)
            spec = np.asarray(ch.get_frequency_spectrum())
            F = len(spec) if F is None else F
            V.append(spec[:F])
            positions.append(det.get_relative_position(station_id, cid))
            t_starts.append(ch.get_trace_start_time())
            model = reps.get(det.get_antenna_model(station_id, cid),
                             det.get_antenna_model(station_id, cid))
            kind = antenna_ops.ANALYTIC_MODELS[model][0]
            freqs = np.fft.rfftfreq(2 * (F - 1), 1.0 / fs)
            tpl = antenna_ops.build_analytic_template(model, freqs)
            full = np.zeros((3, F), dtype=complex)
            full[:tpl.shape[0]] = tpl
            if tpl.shape[0] == 1:
                full[1:] = tpl[0]
            templates.append(full)
            rots.append(antenna_ops.antenna_rotation_matrix(
                *det.get_antenna_orientation(station_id, cid)))
            kinds.append(kind)

        V = np.asarray(V)
        freqs = np.fft.rfftfreq(2 * (F - 1), 1.0 / fs)
        band = filters.chain_response(freqs, [(passband, "butterabs", {"order": 10})])
        band = np.abs(band)
        args = (V, band, np.asarray(positions, dtype=float),
                np.asarray(t_starts, dtype=float), np.asarray(rots),
                np.asarray(templates), np.asarray(kinds, dtype=np.int32),
                polarization, n_index, fs)

        def batched_score(zz, aa, chunk=4096):
            out = np.zeros(len(zz))
            for i0 in range(0, len(zz), chunk):
                out[i0:i0 + chunk] = np.asarray(
                    beamforming_score(zz[i0:i0 + chunk], aa[i0:i0 + chunk], *args))
            return out

        # dense first stage (the cc-beam landscape is multimodal; the
        # reference brute-forces 1 degree), then two refinement stages
        step = 3 * units.deg
        zg = np.arange(ZenLim[0], ZenLim[1] + 1e-9, step)
        ag = np.arange(AziLim[0], AziLim[1] + 1e-9, step)
        ZZ, AA = np.meshgrid(zg, ag, indexing="ij")
        score = batched_score(ZZ.ravel(), AA.ravel())
        k = int(np.argmax(score))
        cz, ca = ZZ.ravel()[k], AA.ravel()[k]
        span_z = span_a = step * 1.5
        for n_pts in (15, 15):
            zg = np.linspace(max(cz - span_z, ZenLim[0]),
                             min(cz + span_z, ZenLim[1]), n_pts)
            ag = np.linspace(ca - span_a, ca + span_a, n_pts)
            ZZ, AA = np.meshgrid(zg, ag, indexing="ij")
            score = batched_score(ZZ.ravel(), AA.ravel())
            k = int(np.argmax(score))
            cz, ca = ZZ.ravel()[k], AA.ravel()[k]
            span_z = (zg[1] - zg[0]) * 1.5
            span_a = (ag[1] - ag[0]) * 1.5

        station[stnp.zenith] = float(np.clip(cz, ZenLim[0], ZenLim[1]))
        station[stnp.azimuth] = float(np.mod(ca, 2 * np.pi))

    def end(self):
        pass


def get_refractive_index(depth, site="southpole"):
    """Legacy two-value ice index used by the direction fitters
    (utilities/ice.get_refractive_index:17-51): n_air for land sites, 1.3
    below the surface of in-ice sites."""
    if str(site).lower() in ("lofar", "auger", "ska"):
        return 1.000293
    return 1.3 if depth <= 0 else 1.000293


class templateDirectionFitter:
    """Plane-wave (zenith, azimuth) fit from per-channel template
    cross-correlation times (modules/templateDirectionFitter.py:13-118).

    Consumes the ``{cr,nu}_ref_xcorr_time`` entries written by
    channelTemplateCorrelation; minimizes the mean-subtracted plane-wave
    arrival-time chi2 with a Nelder-Mead polish seeded by the best of four
    azimuth starts (templateDirectionFitter.py:89-99).
    """

    def begin(self):
        pass

    @register_run()
    def run(self, evt, station, det, channels_to_use=None, cosmic_ray=False):
        chp = par.channelParameters
        if channels_to_use is None:
            channels_to_use = [0, 1, 2, 3]
        type_str = "cr" if cosmic_ray else "nu"
        xcorrelations = chp.cr_xcorrelations if cosmic_ray else chp.nu_xcorrelations

        station_id = station.get_id()
        times, positions = [], []
        for channel_id in channels_to_use:
            channel = station.get_channel(channel_id)
            times.append(channel[xcorrelations][f"{type_str}_ref_xcorr_time"]
                         + channel.get_trace_start_time())
            positions.append(det.get_relative_position(station_id, channel_id))
        times = np.array(times)
        positions = np.array(positions)

        site = det.get_site(station_id)
        n_ice = get_refractive_index(-0.01, site)

        from scipy import optimize as opt

        def obj_plane(params):
            zenith, azimuth = params
            if cosmic_ray:
                if zenith < 0 or zenith > 0.5 * np.pi:
                    return np.inf
            elif zenith < 0.5 * np.pi or zenith > np.pi:
                return np.inf
            v = np.array([np.sin(zenith) * np.cos(azimuth),
                          np.sin(zenith) * np.sin(azimuth),
                          np.cos(zenith)])
            c = speed_of_light if cosmic_ray else speed_of_light / n_ice
            t_expected = -(positions @ v) / c
            sigma = 1 * units.ns
            return float(np.sum(((t_expected - t_expected.mean())
                                 - (times - times.mean())) ** 2 / sigma ** 2))

        zenith_start = (45 if cosmic_ray else 135) * units.deg
        starts = np.array([0, 90, 180, 270]) * units.deg
        azimuth_start = starts[int(np.argmin(
            [obj_plane((zenith_start, a)) for a in starts]))]
        res = opt.minimize(obj_plane, x0=[zenith_start, azimuth_start],
                           method="Nelder-Mead",
                           options={"maxiter": 1000, "disp": False})

        zen = float(res.x[0])
        az = float(np.mod(res.x[1], 2 * np.pi))
        station[stnp.zenith] = zen
        station[stnp.azimuth] = az
        if cosmic_ray:
            station[stnp.cr_zenith] = zen
            station[stnp.cr_azimuth] = az
        else:
            station[stnp.nu_zenith] = zen
            station[stnp.nu_azimuth] = az

    def end(self):
        pass
