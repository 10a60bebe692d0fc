"""Further reconstruction modules.

* channelTemplateCorrelation: normalized cross-correlation of channel traces
  against reference templates (modules/channelTemplateCorrelation.py).
* sphericalWaveFitter: source position from relative arrival times via a
  vectorized grid chi^2 (modules/sphericalWaveFitter.py semantics).
* planeWaveDirectionFitter: direction from arrival-time differences via
  least squares (LOFAR-style planeWaveDirectionFitter semantics).
* cosmicRayEnergyReconstructor: CR energy from the corrected radiation
  fluence (modules/cosmicRayEnergyReconstructor.py parametrization shape).
* channelGalacticNoiseAdder: galactic noise with an analytic isotropic
  sky-temperature parametrization (Cane 1979) as the built-in model; the
  reference's pygdsm/healpy sky-map folding
  (modules/channelGalacticNoiseAdder.py:54-508) plugs in when those optional
  packages are available.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as scsig

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.reco.base import register_run
from nuradiomc_tpu.utils import units
from nuradiomc_tpu.utils.constants import boltzmann, speed_of_light

chp = par.channelParameters
stnp = par.stationParameters


class channelTemplateCorrelation:
    def __init__(self, template_provider=None):
        self._templates = {}

    def begin(self, templates: dict):
        """templates: channel_id (or 'default') -> 1d trace."""
        self._templates = dict(templates)

    @register_run()
    def run(self, evt, station, det=None, cosmic_ray=True):
        type_str = "cr" if cosmic_ray else "nu"
        xcorr_param = chp.cr_xcorrelations if cosmic_ray else chp.nu_xcorrelations
        for channel in station.iter_channels():
            tpl = self._templates.get(channel.get_id(),
                                      self._templates.get("default"))
            if tpl is None:
                continue
            trace = channel.get_trace()
            a = (trace - np.mean(trace))
            b = (tpl - np.mean(tpl))
            denom = np.std(trace) * np.std(tpl) * len(tpl)
            xcorr = scsig.correlate(a, b, mode="full") / max(denom, 1e-300)
            imax = int(np.argmax(np.abs(xcorr)))
            # full-mode lag: template start aligned at sample imax-(len(tpl)-1)
            lag = (imax - (len(tpl) - 1)) / channel.get_sampling_rate()
            channel[xcorr_param] = {
                f"{type_str}_max_xcorr": float(np.max(np.abs(xcorr))),
                f"{type_str}_xcorr_time": imax,
                # time of the template arrival within the trace, as consumed
                # by templateDirectionFitter (templateDirectionFitter.py:60)
                f"{type_str}_ref_xcorr_time": float(lag),
            }

    def end(self):
        pass


class sphericalWaveFitter:
    """Source-position fit from signal arrival times (grid chi^2)."""

    def begin(self, channel_ids=None):
        self._channel_ids = channel_ids

    @register_run()
    def run(self, evt, station, det, start_pulser_position=None, n_index=1.75,
            debug=False):
        cids = self._channel_ids or station.get_channel_ids()
        positions = np.array([det.get_relative_position(station.get_id(), c)
                              for c in cids])
        times = np.array([station.get_channel(c)[chp.signal_time] for c in cids])

        center = np.asarray(start_pulser_position, dtype=float) \
            if start_pulser_position is not None else np.zeros(3)

        best = None
        for half, n_pts in ((200.0, 21), (20.0, 21), (2.0, 21)):
            xs = np.linspace(center[0] - half, center[0] + half, n_pts)
            ys = np.linspace(center[1] - half, center[1] + half, n_pts)
            zs = np.linspace(center[2] - half, center[2] + half, n_pts)
            XX, YY, ZZ = np.meshgrid(xs, ys, zs, indexing="ij")
            pts = np.stack([XX, YY, ZZ], axis=-1).reshape(-1, 3)
            d = np.linalg.norm(pts[:, None, :] - positions[None, :, :], axis=-1)
            t_pred = d * n_index / speed_of_light
            # chi2 of relative times (remove the mean offset per candidate)
            resid = (t_pred - times[None, :])
            resid -= resid.mean(axis=1, keepdims=True)
            chi2 = np.sum(resid ** 2, axis=1)
            k = int(np.argmin(chi2))
            center = pts[k]
            best = chi2[k]
        station[stnp.vertex_2D_fit] = center
        return center, best

    def end(self):
        pass


class planeWaveDirectionFitter:
    """(zenith, azimuth) least squares from arrival-time differences."""

    def begin(self):
        pass

    @register_run()
    def run(self, evt, station, det, channel_ids=None, n_index=1.0):
        cids = channel_ids or station.get_channel_ids()
        positions = np.array([det.get_relative_position(station.get_id(), c)
                              for c in cids])
        times = np.array([station.get_channel(c)[chp.signal_time] for c in cids])
        # t_i = t0 - n/c (r_i . u): linear in the direction vector u
        A = np.hstack([-n_index / speed_of_light * positions,
                       np.ones((len(cids), 1))])
        coeffs, *_ = np.linalg.lstsq(A, times, rcond=None)
        u = coeffs[:3]
        norm = np.linalg.norm(u)
        if norm > 0:
            u = u / norm
        zenith = np.arccos(np.clip(u[2], -1, 1))
        azimuth = np.mod(np.arctan2(u[1], u[0]), 2 * np.pi)
        station[stnp.zenith] = zenith
        station[stnp.azimuth] = azimuth

    def end(self):
        pass


# geomagnetic field vectors in Gauss, [East, North, Up] (IGRF values as
# bundled by the public radiotools.helper.get_magnetic_field_vector; the
# reference uses them through radiotools)
MAGNETIC_FIELD_VECTORS = {
    "auger": np.array([0.00871198, 0.19693423, 0.1413841]),
    "mooresbay": np.array([0.058457, -0.09042, 0.61439]),
    "summit": np.array([-0.037467, 0.075575, -0.539887]),
    "southpole": np.array([-0.14390398, 0.08590658, 0.52081228]),
    "lofar": np.array([0.004675, 0.186270, -0.456412]),
}


def get_angle_to_magnetic_field_vector(zenith, azimuth, site):
    """Angle between the shower propagation direction and the geomagnetic
    field (radiotools.helper.get_angle_to_magnetic_field_vector)."""
    v = -np.array([np.sin(zenith) * np.cos(azimuth),
                   np.sin(zenith) * np.sin(azimuth), np.cos(zenith)])
    B = MAGNETIC_FIELD_VECTORS[site]
    return np.arccos(np.clip(np.dot(v, B) / np.linalg.norm(B), -1, 1))


class cosmicRayEnergyReconstructor:
    """CR energy from the unfolded E-field fluence
    (cosmicRayEnergyReconstructor.py:26-168, algorithm of
    JCAP 10 (2019) 075): fluence in the (vxB, vxvxB) shower plane with the
    vxB component corrected by 1/sin(alpha), scaled by the geometric
    distance to an Xmax of 750 g/cm^2 and the site/zenith parametrization,
    with separate coefficients inside/outside the Cherenkov ring (chosen by
    the fitted spectrum quadratic term vs slope).

    Requires: 80-300 MHz 10th-order Butterworth filtering, a reconstructed
    direction (stationParameters.zenith/azimuth) and an analytic-efield fit
    (electricFieldParameters.cr_spectrum_slope / cr_spectrum_quadratic_term),
    as in the reference chain.
    """

    # coefficients from cosmicRayEnergyReconstructor.py:41-65 (exact)
    PARAMETRIZATIONS = {
        "mooresbay": {
            "scale": np.array([(442.46, -281.75, 324.96), (394.08, -308.36, 436.30)]),
            "falloff": np.array([(-.1584, -.07943), (.8070, -1.4098)]),
        },
        "southpole": {
            "scale": np.array([(976.30, -1213.43, 626.98), (643.39, -667.08, 478.06)]),
            "falloff": np.array([(-.2273, .05627), (1.3372, -2.1653)]),
        },
        "auger": {
            "scale": np.array([(229.96, -123.75, 110.51), (214.46, -111.01, 119.18)]),
            "falloff": np.array([(-.1445, -.09820), (.5936, -1.1763)]),
        },
        "summit": {
            "scale": np.array([[404.5, -131.56, 11.7], [428.97, -92.11, 5.94]]),
            "falloff": np.array([[-0.3391, 0.1738], [0.9543, -1.6967]]),
        },
    }
    ELEVATIONS = {"mooresbay": 30., "southpole": 2800., "auger": 1560.,
                  "summit": 3216.}

    def begin(self, site=None):
        if site is not None and site not in self.PARAMETRIZATIONS:
            raise ValueError(f"unsupported site {site}; choose one of "
                             f"{list(self.PARAMETRIZATIONS)}")
        self._site = site
        from nuradiomc_tpu.models.atmosphere import Atmosphere
        self._atmosphere = Atmosphere()

    @register_run()
    def run(self, evt, station, det=None, electric_field=None):
        from nuradiomc_tpu.reco.rit import shower_frame
        from nuradiomc_tpu.utils.geometry import onsky_basis

        efp = par.electricFieldParameters
        zenith = station[stnp.zenith]
        azimuth = station[stnp.azimuth]
        site = self._site
        if site is None:
            site = det.get_site(station.get_id())
        parametrization = self.PARAMETRIZATIONS[site]
        elevation = self.ELEVATIONS[site]

        if electric_field is None:
            efields = station.get_electric_fields()
            if not efields:
                return None
            electric_field = efields[-1]

        spectrum_slope = electric_field[efp.cr_spectrum_slope]
        alpha = get_angle_to_magnetic_field_vector(zenith, azimuth, site)

        # onsky (eR,eTheta,ePhi) -> ground -> (vxB, vxvxB) shower plane
        trace_onsky = np.asarray(electric_field.get_trace())
        basis = np.asarray(onsky_basis(zenith, azimuth))      # rows eR/eTheta/ePhi
        trace_ground = basis.T @ trace_onsky
        e1, e2, v = shower_frame(zenith, azimuth, MAGNETIC_FIELD_VECTORS[site])
        trace_vxB = np.vstack([e1 @ trace_ground, e2 @ trace_ground,
                               v @ trace_ground])
        trace_vxB[0] /= np.sin(alpha)

        # energy fluence per component: eps0 c sum(E^2) dt
        # (trace_utilities.get_electric_field_energy_fluence)
        dt = 1.0 / electric_field.get_sampling_rate()
        from nuradiomc_tpu.utils.constants import Z_0
        eps0_c = 1.0 / Z_0  # eps0 * c = 1/Z0
        fluence = eps0_c * np.sum(trace_vxB ** 2, axis=1) * dt
        energy_fluence = np.abs(fluence[0]) + np.abs(fluence[1])

        xmax_distance = self._atmosphere.get_distance_xmax_geometric(
            zenith, 750.0, elevation)
        xmax_distance = np.abs(xmax_distance)

        quadratic = electric_field[efp.cr_spectrum_quadratic_term]
        branch = 0 if quadratic <= spectrum_slope * 0.1 else 1
        s = parametrization["scale"][branch]
        f = parametrization["falloff"][branch]
        scale = s[0] * zenith ** 2 + s[1] * zenith + s[2]
        falloff = f[0] * zenith + f[1]
        rec_energy = 1e18 * np.sqrt(energy_fluence) * (xmax_distance / units.km) \
            / (scale * np.exp(falloff * np.abs(spectrum_slope) ** 0.8))
        station[stnp.cr_energy_em] = rec_energy
        return rec_energy

    def end(self):
        pass


def cane_galactic_temperature(freqs):
    """Isotropic galactic brightness temperature (Cane 1979 parametrization),
    valid ~10 MHz - 1 GHz."""
    f_MHz = np.maximum(np.asarray(freqs) / units.MHz, 1.0)
    # I_g = 2.48e-20, I_eg = 1.06e-20 W m^-2 Hz^-1 sr^-1; tau = 5 (f/MHz)^-2.1
    tau = 5.0 * (f_MHz / 1.0) ** -2.1
    i_nu = (2.48e-20 * f_MHz ** -0.52 * (1 - np.exp(-tau)) / tau
            + 1.06e-20 * f_MHz ** -0.80 * np.exp(-tau))
    # Rayleigh-Jeans: T = I c^2 / (2 k f^2)   (SI)
    c_si = 2.99792458e8
    kb_si = 1.380649e-23
    f_si = f_MHz * 1e6
    return i_nu * c_si ** 2 / (2 * kb_si * f_si ** 2)


def fibonacci_sky(n_pixels):
    """Equal-area full-sky pixelization: (lon, lat) arrays in radians.

    Replaces healpy's pixel grid (same equal-solid-angle property; solid
    angle per pixel = 4 pi / n_pixels)."""
    i = np.arange(n_pixels) + 0.5
    lat = np.arcsin(1.0 - 2.0 * i / n_pixels)
    lon = np.mod(i * np.pi * (3.0 - np.sqrt(5.0)), 2 * np.pi)
    return lon, lat


def galactic_to_equatorial(l, b):
    """Galactic (l, b) -> equatorial J2000 (ra, dec), radians (standard
    rotation; NGP at ra 192.85948 deg, dec 27.12825 deg, l_NCP 122.93192)."""
    ra_gp = np.deg2rad(192.85948)
    dec_gp = np.deg2rad(27.12825)
    l_cp = np.deg2rad(122.93192)
    sin_dec = (np.sin(dec_gp) * np.sin(b)
               + np.cos(dec_gp) * np.cos(b) * np.cos(l_cp - l))
    dec = np.arcsin(np.clip(sin_dec, -1, 1))
    y = np.cos(b) * np.sin(l_cp - l)
    x = np.cos(dec_gp) * np.sin(b) - np.sin(dec_gp) * np.cos(b) * np.cos(l_cp - l)
    ra = np.mod(np.arctan2(y, x) + ra_gp, 2 * np.pi)
    return ra, dec


def equatorial_to_horizontal(ra, dec, lst_hours, lat_deg):
    """(ra, dec) -> (zenith, NRR azimuth East=0 ccw), radians."""
    lat = np.deg2rad(lat_deg)
    H = np.deg2rad(lst_hours * 15.0) - ra
    sin_alt = np.sin(lat) * np.sin(dec) + np.cos(lat) * np.cos(dec) * np.cos(H)
    alt = np.arcsin(np.clip(sin_alt, -1, 1))
    # astronomical azimuth from North, eastward
    y = -np.cos(dec) * np.sin(H)
    x = (np.sin(dec) - sin_alt * np.sin(lat)) / np.maximum(np.cos(lat), 1e-12)
    A = np.arctan2(y, x)
    zenith = np.pi / 2 - alt
    azimuth = np.mod(np.pi / 2 - A, 2 * np.pi)   # NRR convention: East=0, ccw
    return zenith, azimuth


class channelGalacticNoiseAdder:
    """Galactic noise by folding a directional sky-temperature model with
    the antenna response per sky pixel (channelGalacticNoiseAdder.py:54-408).

    The reference evaluates a pygdsm healpix map per pixel in a Python loop
    with astropy coordinate transforms. Here the pixelization is an in-repo
    equal-area Fibonacci grid, the galactic->horizontal chain is closed-form
    (J2000 rotation + IAU sidereal time), and the per-pixel E-field synthesis
    is vectorized over frequencies. The sky model is pluggable:

    * ``None`` (default): isotropic Cane (1979) temperature — works offline.
    * a callable ``T(freq, l, b)`` in internal units/radians.
    * a pygdsm model name ('gsm2008', 'gsm2016', 'lfss', 'haslam', 'lfmap')
      when the optional pygdsm package is installed.
    """

    def begin(self, skymodel=None, n_pixels=192, freq_range=None, seed=None,
              antenna_replacements=None, scaling=1.0, n_side=None,
              n_ice=1.35, n_air=1.000293):
        if n_side is not None:            # healpy-style API parity
            n_pixels = 12 * int(n_side) ** 2
        self._rng = np.random.Generator(np.random.Philox(seed))
        self._n_pixels = int(n_pixels)
        self._scaling = scaling
        self._reps = antenna_replacements or {}
        self._n_ice, self._n_air = n_ice, n_air
        if freq_range is None:
            freq_range = np.array([10, 1000]) * units.MHz
        self._interp_freqs = np.logspace(*np.log10(np.asarray(freq_range)), 15)

        lon, lat = fibonacci_sky(self._n_pixels)
        self._gal_l, self._gal_b = lon, lat
        self._solid_angle = 4 * np.pi / self._n_pixels

        if skymodel is None:
            def model(freq, l, b):
                return cane_galactic_temperature(freq) * units.kelvin
        elif callable(skymodel):
            model = skymodel
        else:
            import pygdsm  # noqa: F401 — optional dependency

            name = str(skymodel).lower()
            gsm = {"gsm2008": pygdsm.GlobalSkyModel,
                   "gsm2016": pygdsm.GlobalSkyModel16,
                   "lfss": pygdsm.LowFrequencySkyModel,
                   "haslam": pygdsm.HaslamSkyModel,
                   "lfmap": pygdsm.LFmap}[name](freq_unit="MHz")
            import healpy

            def model(freq, l, b):
                sky = gsm.generate(freq / units.MHz)
                nside = healpy.npix2nside(len(sky))
                return sky[healpy.ang2pix(nside, np.pi / 2 - b, l)]

        # log10(T) at the interpolation frequencies per pixel
        self._log_temps = np.array([
            np.log10(np.broadcast_to(
                np.maximum(model(f, self._gal_l, self._gal_b), 1e-30),
                (self._n_pixels,)))
            for f in self._interp_freqs])                    # [n_interp, P]

    @register_run()
    def run(self, evt, station, det, passband=None, excluded_channels=None):
        from nuradiomc_tpu.reco.efield_converters import get_channel_vel
        from nuradiomc_tpu.reco.lofar import local_apparent_sidereal_time
        from nuradiomc_tpu.utils.geometry import (fresnel_angle, fresnel_t_p,
                                                  fresnel_t_s)

        cids = [c for c in station.get_channel_ids()
                if not excluded_channels or c not in excluded_channels]
        ch0 = station.get_channel(cids[0])
        ff = np.asarray(ch0.get_frequencies())
        fs = ch0.get_sampling_rate()
        if passband is None:
            passband = [10 * units.MHz, 1000 * units.MHz]
        band = (ff > passband[0]) & (ff < passband[1])

        lat, lon = det.get_site_coordinates(station.get_id())
        t_station = station.get_station_time()
        if hasattr(t_station, "timestamp"):
            t_station = t_station.timestamp()
        lst = local_apparent_sidereal_time(float(t_station or 0.0), lon)

        ra, dec = galactic_to_equatorial(self._gal_l, self._gal_b)
        zenith, azimuth = equatorial_to_horizontal(ra, dec, lst, lat)
        up = zenith < np.pi / 2

        # log-quadratic interpolation of T to the trace frequencies [P, F]
        logf = np.log10(np.maximum(ff[band], self._interp_freqs[0]))
        temps = np.empty((self._n_pixels, band.sum()))
        logfi = np.log10(self._interp_freqs)
        for p in range(self._n_pixels):
            temps[p] = 10 ** np.interp(logf, logfi, self._log_temps[:, p])

        spectra = {c: np.array(station.get_channel(c).get_frequency_spectrum())
                   for c in cids}
        positions = {c: det.get_relative_position(station.get_id(), c)
                     for c in cids}

        for p in np.where(up)[0]:
            zen, azi = zenith[p], azimuth[p]
            # refraction into the ice for submerged antennas
            fr_zen = fresnel_angle(zen, n_2=self._n_ice, n_1=self._n_air)
            if np.isnan(fr_zen):
                continue
            t_theta = fresnel_t_p(zen, n_2=self._n_ice, n_1=self._n_air)
            t_phi = fresnel_t_s(zen, n_2=self._n_ice, n_1=self._n_air)

            amp = get_electric_field_from_temperature(
                ff[band], temps[p], self._solid_angle)
            phases = np.exp(1j * self._rng.uniform(0, 2 * np.pi, band.sum()))

            for c in cids:
                in_ice = positions[c][2] < 0
                zen_c = float(fr_zen) if in_ice else zen
                tt, tp = (t_theta, t_phi) if in_ice else (1.0, 1.0)
                n_med = self._n_ice if in_ice else self._n_air
                # plane-wave arrival delay wrt the station center
                axis = np.array([np.sin(zen_c) * np.cos(azi),
                                 np.sin(zen_c) * np.sin(azi),
                                 np.cos(zen_c)])
                dt = -(n_med / speed_of_light) * np.dot(positions[c], axis)
                delay = np.exp(-2j * np.pi * ff[band] * dt)
                pol = self._rng.uniform(0, 2 * np.pi, band.sum())
                vt, vp = get_channel_vel(det, station.get_id(), c, ff,
                                         zen_c, azi, self._reps)
                spectra[c][band] += self._scaling * amp * phases * delay * (
                    vt[band] * np.cos(pol) * tt + vp[band] * np.sin(pol) * tp)

        for c in cids:
            station.get_channel(c).set_frequency_spectrum(spectra[c], fs)

    def end(self):
        pass


class efieldGalacticNoiseAdder(channelGalacticNoiseAdder):
    """Galactic noise added to the station's ``ElectricField`` objects
    instead of channel voltages (modules/efieldGalacticNoiseAdder.py:11-167).

    Shares the sky model / pixelization / temperature interpolation machinery
    with channelGalacticNoiseAdder; per pixel the on-sky (eTheta, ePhi) noise
    spectrum with a random polarization and plane-wave delay is summed onto
    every efield (no antenna folding — that is downstream)."""

    @register_run()
    def run(self, evt, station, det, passband=None):
        from nuradiomc_tpu.reco.lofar import local_apparent_sidereal_time
        from nuradiomc_tpu.utils.geometry import (fresnel_angle, fresnel_t_p,
                                                  fresnel_t_s)

        efields = station.get_electric_fields()
        if not efields:
            return
        ff = np.asarray(efields[0].get_frequencies())
        for ef in efields[1:]:
            if not np.allclose(ff, ef.get_frequencies(), rtol=0,
                               atol=0.1 * units.MHz):
                raise ValueError("all efields must share one frequency grid")
        fs = efields[0].get_sampling_rate()
        if passband is None:
            passband = [10 * units.MHz, 1000 * units.MHz]
        band = (ff > passband[0]) & (ff < passband[1])

        lat, lon = det.get_site_coordinates(station.get_id())
        t_station = station.get_station_time()
        if hasattr(t_station, "timestamp"):
            t_station = t_station.timestamp()
        lst = local_apparent_sidereal_time(float(t_station or 0.0), lon)

        ra, dec = galactic_to_equatorial(self._gal_l, self._gal_b)
        zenith, azimuth = equatorial_to_horizontal(ra, dec, lst, lat)
        up = zenith < np.pi / 2

        logf = np.log10(np.maximum(ff[band], self._interp_freqs[0]))
        logfi = np.log10(self._interp_freqs)

        spectra = {ef.get_unique_identifier():
                   np.array(ef.get_frequency_spectrum()) for ef in efields}
        for p in np.where(up)[0]:
            zen, azi = zenith[p], azimuth[p]
            fr_zen = fresnel_angle(zen, n_2=self._n_ice, n_1=self._n_air)
            if np.isnan(fr_zen):
                continue
            t_theta = fresnel_t_p(zen, n_2=self._n_ice, n_1=self._n_air)
            t_phi = fresnel_t_s(zen, n_2=self._n_ice, n_1=self._n_air)

            temps = 10 ** np.interp(logf, logfi, self._log_temps[:, p])
            amp = get_electric_field_from_temperature(ff[band], temps,
                                                      self._solid_angle)
            phases = np.exp(1j * self._rng.uniform(0, 2 * np.pi, band.sum()))

            for ef in efields:
                pos = np.asarray(ef.get_position() if ef.get_position()
                                 is not None else (0.0, 0.0, 0.0))
                in_ice = pos[2] < 0
                zen_e = float(fr_zen) if in_ice else zen
                tt, tp = (t_theta, t_phi) if in_ice else (1.0, 1.0)
                n_med = self._n_ice if in_ice else self._n_air
                axis = np.array([np.sin(zen_e) * np.cos(azi),
                                 np.sin(zen_e) * np.sin(azi),
                                 np.cos(zen_e)])
                dt = -(n_med / speed_of_light) * np.dot(pos, axis)
                delay = np.exp(-2j * np.pi * ff[band] * dt)
                pol = self._rng.uniform(0, 2 * np.pi, band.sum())
                s = spectra[ef.get_unique_identifier()]
                s[1][band] += self._scaling * amp * phases * delay * np.cos(pol) * tt
                s[2][band] += self._scaling * amp * phases * delay * np.sin(pol) * tp

        for ef in efields:
            ef.set_frequency_spectrum(spectra[ef.get_unique_identifier()], fs)


def get_electric_field_from_temperature(frequencies, noise_temperature,
                                        solid_angle):
    """Rayleigh-Jeans E-field amplitude per frequency bin
    (utilities/signal_processing.py:493-533)."""
    from nuradiomc_tpu.utils.constants import boltzmann, speed_of_light
    ff = np.asarray(frequencies, dtype=float)
    d_f = ff[2] - ff[1]
    radiance = 2.0 * boltzmann * ff ** 2 * noise_temperature / speed_of_light ** 2
    radiance = np.nan_to_num(radiance) * d_f * solid_angle
    Z0 = 376.730313667 * units.ohm
    return np.sqrt(radiance * Z0) / d_f


class channelIceThermalNoiseAdder:
    """Thermal noise from the ice, folded through the antenna response per
    sky pixel (modules/channelIceThermalNoiseAdder.py:17-263).

    The effective-temperature input is a dict {antenna_depth: (thetas,
    T_eff(theta))} — the content of the reference's JSON files produced by
    NuRadioMC/examples/simulate_effective_ice_temperature.  All (theta, phi)
    pixels of one channel are folded in one vectorized pass instead of the
    reference's double Python loop.
    """

    def begin(self, eff_temperatures, nr_phi_bins=64,
              channel_depth_matching_error=10.0, seed=None,
              antenna_replacements=None):
        self._temps = {float(k): (np.asarray(v[0], float),
                                  np.asarray(v[1], float))
                       for k, v in eff_temperatures.items()}
        self._phis = np.linspace(0, 2 * np.pi, nr_phi_bins)
        self._depth_tol = channel_depth_matching_error
        self._rng = np.random.Generator(np.random.Philox(seed))
        self._reps = antenna_replacements or {}

    @register_run()
    def run(self, event, station, detector, passband=None):
        from nuradiomc_tpu.reco.efield_converters import get_channel_vel

        if passband is None:
            passband = [10 * units.MHz, 1600 * units.MHz]
        for channel in station.iter_channels():
            ff = np.asarray(channel.get_frequencies())
            band = (ff > passband[0]) & (ff < passband[1])
            depth = detector.get_relative_position(
                station.get_id(), channel.get_id())[2]
            matches = [k for k in self._temps
                       if abs(k - depth) <= self._depth_tol]
            if len(matches) != 1:
                raise KeyError(
                    f"{len(matches)} effective-temperature entries match "
                    f"depth {depth} within {self._depth_tol}")
            thetas, t_eff = self._temps[matches[0]]
            d_thetas = np.diff(thetas)
            d_phis = np.diff(self._phis)

            spec = np.array(channel.get_frequency_spectrum())
            add = np.zeros_like(spec)
            for phi, d_phi in zip(self._phis[:-1], d_phis):
                for th, d_th, T in zip(thetas[:-1], d_thetas, t_eff[:-1]):
                    omega = abs(np.sin(th) * np.sin(d_th / 2) * 2 * d_phi)
                    amp = get_electric_field_from_temperature(
                        ff[band], T, omega)
                    phases = np.exp(
                        1j * self._rng.uniform(0, 2 * np.pi, band.sum()))
                    pol = self._rng.uniform(0, 2 * np.pi, band.sum())
                    vt, vp = get_channel_vel(
                        detector, station.get_id(), channel.get_id(), ff,
                        th, phi, self._reps)
                    add[band] += (vt[band] * np.cos(pol)
                                  + vp[band] * np.sin(pol)) * amp * phases
            channel.set_frequency_spectrum(spec + add,
                                           channel.get_sampling_rate())

    def end(self):
        pass


class channelAntennaDedispersion:
    """Remove the antenna phase response (group-delay dispersion) from the
    channel traces (modules/channelAntennaDedispersion.py:14-54): divide by
    exp(i*angle(VEL)) evaluated at the antenna's sensitive direction."""

    def begin(self, antenna_replacements=None):
        self._reps = antenna_replacements or {}

    def _response(self, det, station_id, channel_id, ff):
        from nuradiomc_tpu.reco.efield_converters import get_channel_vel
        name = det.get_antenna_model(station_id, channel_id)
        name = self._reps.get(name, name)
        zen_ori, az_ori, _, _ = det.get_antenna_orientation(station_id,
                                                            channel_id)
        if "LPDA" in name:
            zen, az = zen_ori, az_ori   # boresight
        else:   # dipole-like: sensitive perpendicular to the orientation
            zen, az = np.pi / 2 + zen_ori, 0.0
        vt, vp = get_channel_vel(det, station_id, channel_id, ff, zen, az,
                                 self._reps)
        vel = vt if np.sum(np.abs(vt)) > np.sum(np.abs(vp)) else vp
        return np.exp(1j * np.angle(vel))

    @register_run()
    def run(self, evt, station, det, debug=False):
        for channel in station.iter_channels():
            ff = np.asarray(channel.get_frequencies())
            resp = self._response(det, station.get_id(), channel.get_id(), ff)
            channel.set_frequency_spectrum(
                np.asarray(channel.get_frequency_spectrum()) / resp,
                channel.get_sampling_rate())

    def end(self):
        pass
