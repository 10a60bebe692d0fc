"""CoREAS / CORSIKA-7 air-shower input pipeline.

Re-implementation of the reference cosmic-ray input machinery
(NuRadioReco/modules/io/coreas/coreas.py): angle conventions (get_angles:48),
CGS -> SI field-strength conversion (:24), observer efield conversion into
the on-sky CS (convert_obs_to_nuradio_efield:138-184), observer position
conversion (convert_obs_positions_to_nuradio_on_ground:186-222), and a
star-shape-pattern interpolator for arbitrary antenna positions in the shower
plane (coreasInterpolator.py; the reference delegates to the external
cr-pulse-interpolator package — here a Delaunay/linear fluence interpolation
with nearest-neighbor pulse shape is provided).
"""

from __future__ import annotations

import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import ElectricField, Event, SimStation, Shower, Station
from nuradiomc_tpu.utils import units

# 1 statvolt/cm = c * 1e-4 uV/m in the CoREAS convention (coreas.py:24)
conversion_fieldstrength_cgs_to_SI = 2.99792458e10 * units.micro * units.volt / units.meter

efp = par.electricFieldParameters
shp = par.showerParameters
stnp = par.stationParameters


def _normalized_angle(angle):
    return np.mod(angle, 2 * np.pi)


def _spherical_to_cartesian(zenith, azimuth):
    return np.array([np.sin(zenith) * np.cos(azimuth),
                     np.sin(zenith) * np.sin(azimuth),
                     np.cos(zenith)])


def _onsky_basis(zenith, azimuth):
    st, ct = np.sin(zenith), np.cos(zenith)
    sp, cp = np.sin(azimuth), np.cos(azimuth)
    e_r = np.array([st * cp, st * sp, ct])
    e_theta = np.array([ct * cp, ct * sp, -st])
    e_phi = np.array([-sp, cp, 0.0])
    return np.array([e_r, e_theta, e_phi])


def get_angles(corsika, declination=0.0):
    """(zenith, azimuth, magnetic_field_vector) in NRR conventions
    (coreas.get_angles:48-115)."""
    zenith = corsika["inputs"].attrs["THETAP"][0] * units.deg
    azimuth = _normalized_angle(
        3 * np.pi / 2.0 + np.deg2rad(corsika["inputs"].attrs["PHIP"][0]) - declination)
    By, minBz = corsika["inputs"].attrs["MAGNET"]
    B_inclination = np.arctan2(minBz, By)
    B_strength = np.sqrt(By ** 2 + minBz ** 2) * units.micro * units.tesla
    magnetic_field_vector = B_strength * _spherical_to_cartesian(
        np.pi / 2 + B_inclination, np.pi / 2 - declination)
    return zenith, azimuth, magnetic_field_vector


def _magnetic_to_geographic(v, magnetic_field_vector):
    """Rotate about z so magnetic north maps to geographic north.

    The declination is the azimuth offset of the horizontal B component from
    geographic north (radiotools cstrafo.transform_from_magnetic_to_geographic
    semantics).
    """
    dec = np.arctan2(magnetic_field_vector[0], magnetic_field_vector[1])
    c, s = np.cos(dec), np.sin(dec)
    R = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
    return R @ v


def convert_obs_to_nuradio_efield(observer, zenith, azimuth, magnetic_field_vector):
    """CoREAS observer (n, 4: t, Ey, -Ex, Ez columns in CGS) -> on-sky efield
    (coreas.convert_obs_to_nuradio_efield:138-184)."""
    efield_times = observer[:, 0] * units.second
    efield = np.array([
        -observer[:, 2],   # CORSIKA y points West
        observer[:, 1],
        observer[:, 3],
    ]) * conversion_fieldstrength_cgs_to_SI
    efield_geo = _magnetic_to_geographic(efield, magnetic_field_vector)
    efield_onsky = _onsky_basis(zenith, azimuth) @ efield_geo
    return efield_onsky, efield_times


def convert_obs_positions_to_nuradio_on_ground(observer_pos, declination=0.0):
    """CORSIKA observer position (cm, magnetic CS) -> NRR ground CS (m)
    (coreas.convert_obs_positions_to_nuradio_on_ground:186-222)."""
    observer_pos = np.atleast_2d(observer_pos)
    pos = np.array([
        -observer_pos[:, 1],
        observer_pos[:, 0],
        observer_pos[:, 2],
    ]) * units.cm
    c, s = np.cos(-declination), np.sin(-declination)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return np.squeeze((R @ pos).T)


def read_CORSIKA7(input_file, declination=0.0):
    """Read a CORSIKA-7/CoREAS HDF5 file into an Event with a SimStation
    holding one on-sky ElectricField per observer (coreas.read_CORSIKA7:223)."""
    import h5py

    with h5py.File(input_file, "r") as corsika:
        zenith, azimuth, magnet = get_angles(corsika, declination)
        energy = corsika["inputs"].attrs["ERANGE"][0] * units.GeV

        evt = Event(corsika["inputs"].attrs.get("RUNNR", 0),
                    corsika["inputs"].attrs.get("EVTNR", 0))
        station = Station(0)
        sim_station = SimStation(0)
        sim_station.set_is_cosmic_ray()

        sampling_rate = None
        for idx, (name, observer) in enumerate(corsika["CoREAS"]["observers"].items()):
            data = np.asarray(observer)
            efield_onsky, times = convert_obs_to_nuradio_efield(
                data, zenith, azimuth, magnet)
            pos = convert_obs_positions_to_nuradio_on_ground(
                np.asarray(observer.attrs["position"]), declination)
            if len(times) > 1:
                sampling_rate = 1.0 / (times[1] - times[0])
            n = len(times) - (len(times) % 2)
            ef = ElectricField([idx], position=pos)
            ef.set_trace(efield_onsky[:, :n], sampling_rate)
            ef.set_trace_start_time(times[0])
            ef[efp.zenith] = zenith
            ef[efp.azimuth] = azimuth
            sim_station.add_electric_field(ef)

        shower = Shower(0)
        shower[shp.zenith] = zenith
        shower[shp.azimuth] = azimuth
        shower[shp.energy] = energy
        shower[shp.magnetic_field_vector] = magnet
        evt.add_sim_shower(shower)
        station.set_sim_station(sim_station)
        evt.set_station(station)
        return evt


class coreasInterpolator:
    """Star-shape efield/fluence interpolation to arbitrary positions in the
    shower plane (coreasInterpolator.py:19-394 capability; fluence via linear
    barycentric interpolation, pulse shape from the nearest simulated
    observer, scaled to the interpolated fluence)."""

    def __init__(self, event: Event):
        self._efields = list(event.get_station(0).get_sim_station().get_electric_fields())
        shower = event.get_first_sim_shower()
        self._zenith = shower[shp.zenith]
        self._azimuth = shower[shp.azimuth]
        axis = _spherical_to_cartesian(self._zenith, self._azimuth)
        # shower-plane basis (vxB-like frame not needed for interpolation
        # geometry; any orthonormal basis orthogonal to the axis works)
        ref = np.array([0.0, 0.0, 1.0])
        e1 = np.cross(axis, ref)
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(axis, e1)
        self._basis = np.array([e1, e2])
        self._axis = axis

        pos = np.array([ef.get_position() for ef in self._efields])
        self._plane_pos = pos @ self._basis.T
        self._fluence = np.array([
            np.sum(np.asarray(ef.get_trace()) ** 2) for ef in self._efields])

        from scipy.interpolate import LinearNDInterpolator, NearestNDInterpolator
        self._fluence_interp = LinearNDInterpolator(self._plane_pos, self._fluence,
                                                    fill_value=0.0)
        self._nearest = NearestNDInterpolator(self._plane_pos, np.arange(len(pos)))

    def get_interp_fluence_value(self, position):
        p = np.asarray(position) @ self._basis.T
        return float(np.asarray(self._fluence_interp(p[None, :])).ravel()[0])

    def get_interp_efield_value(self, position):
        """Efield trace at an arbitrary position: nearest observer pulse shape
        scaled to the locally interpolated fluence."""
        p = np.asarray(position) @ self._basis.T
        idx = int(np.asarray(self._nearest(p[None, :])).ravel()[0])
        ef = self._efields[idx]
        target = self.get_interp_fluence_value(position)
        src = self._fluence[idx]
        scale = np.sqrt(target / src) if src > 0 else 0.0
        return np.asarray(ef.get_trace()) * scale, ef.get_sampling_rate()
