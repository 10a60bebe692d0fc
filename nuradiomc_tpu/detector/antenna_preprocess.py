"""Antenna-pattern preprocessors: raw simulation output -> reference pickle.

Re-implementation of the reference preprocessors
(NuRadioReco/detector/antennapattern.py:110-482): parse the raw WIPL-D
(.ad1/.ra1/.orientation) or RNO-G XFDTD (gain/phase csv) exports, compute the
realized vector effective length, and write the standard 9-item pickle
[orientation_theta, orientation_phi, rotation_theta, rotation_phi, ff,
thetas, phis, H_phi, H_theta] that ops.antenna.load_antenna_table (and the
reference's AntennaPattern) read — so a real data-server download drops in
unchanged.
"""

from __future__ import annotations

import cmath
import csv
import os
import pickle

import numpy as np
from scipy import constants
from scipy.interpolate import interp1d

from nuradiomc_tpu.utils import units


def cartesian_to_spherical_np(x, y, z):
    """(zenith, azimuth) of a cartesian direction; host numpy."""
    r = np.sqrt(x * x + y * y + z * z)
    return np.arccos(z / r), np.arctan2(y, x)


Z_0 = 119.9169 * np.pi * units.ohm     # free-space impedance
_C = constants.c * units.m / units.s


def parse_wipld_file(ad1, ra1, orientation, gen_num=1, s_parameters=None):
    """Parse the three WIPL-D export files (parse_WIPLD_file,
    antennapattern.py:214-288): .ad1 holds the S/Z parameters per frequency,
    .ra1 the complex radiated currents on the (freq, phi, theta) grid, and
    .orientation the boresight/tine vectors."""
    if s_parameters is None:
        s_parameters = [1, 1]
    boresight, tines = np.loadtxt(orientation, delimiter=",")
    orientation_theta, orientation_phi = cartesian_to_spherical_np(*boresight)
    rotation_theta, rotation_phi = cartesian_to_spherical_np(*tines)

    ad1_data = np.loadtxt(ad1, comments=">")
    mask = (ad1_data[:, 1] == s_parameters[0]) & (ad1_data[:, 2] == s_parameters[1])
    ff = ad1_data[:, 0][mask] * units.GHz
    Z = (ad1_data[:, 5][mask] + 1j * ad1_data[:, 6][mask]) * units.ohm
    S = ad1_data[:, 7][mask] + 1j * ad1_data[:, 8][mask]

    ff2, phis, thetas, Ephis, Ethetas, gains = [], [], [], [], [], []
    f = None
    skip = False
    with open(ra1) as fin:
        for line in fin.readlines():
            if line.strip().startswith(">"):
                skip = int(line.split()[3]) != gen_num
                f = float(line.split()[4])
            else:
                if skip:
                    continue
                ff2.append(f * units.GHz)
                phi, theta, re_ep, im_ep, re_et, im_et, gain, _gaindb = line.split()
                phis.append(float(phi))
                thetas.append(float(theta))
                Ephis.append(float(re_ep) + 1j * float(im_ep))
                Ethetas.append(float(re_et) + 1j * float(im_et))
                gains.append(float(gain))

    if not np.array_equal(ff, np.unique(np.array(ff2))):
        raise ValueError("frequencies of ad1 and ra1 files do not match")
    return (orientation_theta, orientation_phi, rotation_theta, rotation_phi,
            ff, Z, S, np.array(ff2), np.deg2rad(np.array(phis)),
            np.deg2rad(np.array(thetas)), np.array(Ephis), np.array(Ethetas),
            np.array(gains))


def preprocess_wipld(path, gen_num=1, s_parameters=None):
    """Realized VEL from WIPL-D currents + S-parameter matching into a 50 Ohm
    system (preprocess_WIPLD, antennapattern.py:386-461). ``path`` points
    into the folder containing <name>.ad1/.ra1/.orientation; returns the
    9-item pickle payload."""
    split = os.path.split(os.path.dirname(path))
    name = split[1]
    base = split[0]
    (orientation_theta, orientation_phi, rotation_theta, rotation_phi,
     ff, Z, S, ff2, phi, theta, Iphi, Itheta, _gains) = parse_wipld_file(
        os.path.join(base, name, f"{name}.ad1"),
        os.path.join(base, name, f"{name}.ra1"),
        os.path.join(base, name, f"{name}.orientation"),
        gen_num=gen_num, s_parameters=s_parameters)

    # WIPL-D defines theta from the x-y plane (antennapattern.py:439)
    theta = 0.5 * np.pi - theta

    index = np.lexsort((theta, phi, ff2))
    ff2 = ff2[index]
    phi = phi[index]
    theta = theta[index]
    Iphi = Iphi[index]
    Itheta = Itheta[index]

    get_S = interp1d(ff, S, kind="nearest")
    wavelength = _C / ff2
    V = 1 * units.V
    Z_L = 50 * units.ohm
    H_phi = wavelength * (1 + get_S(ff2)) * Iphi * Z_L / Z_0 / 1j / V
    # eTheta points in the opposite direction in NuRadio vs WIPL-D
    H_theta = -wavelength * (1 + get_S(ff2)) * Itheta * Z_L / Z_0 / 1j / V
    return (orientation_theta, orientation_phi, rotation_theta, rotation_phi,
            ff2, theta, phi, H_phi, H_theta)


def save_preprocessed_wipld(path):
    """preprocess_wipld + write <name>.pkl next to the raw files
    (save_preprocessed_WIPLD, antennapattern.py:464-482)."""
    payload = preprocess_wipld(path)
    split = os.path.split(os.path.dirname(path))
    name = split[1]
    out = os.path.join(split[0], name, f"{name}.pkl")
    with open(out, "wb") as fout:
        pickle.dump(list(payload), fout, protocol=4)
    return out


def parse_rnog_xfdtd_file(path_gain, path_phases, encoding=None):
    """Parse the XFDTD gain/phase csv pair (parse_RNOG_XFDTD_file,
    antennapattern.py:110-160)."""
    ff, phis, thetas, gain_theta, gain_phi = [], [], [], [], []
    with open(path_gain, encoding=encoding) as fin:
        for i, row in enumerate(csv.reader(fin, delimiter=",")):
            if i == 0:
                continue
            ff.append(float(row[0]))
            thetas.append(float(row[1]))
            phis.append(float(row[2]))
            gain_phi.append(float(row[3]))
            gain_theta.append(float(row[4]))
    phase_phi, phase_theta = [], []
    with open(path_phases, encoding=encoding) as fin:
        for i, row in enumerate(csv.reader(fin, delimiter=",")):
            if i == 0:
                continue
            phase_phi.append(cmath.phase(float(row[3]) + 1j * float(row[4])))
            phase_theta.append(cmath.phase(float(row[5]) + 1j * float(row[6])))
    return (np.array(ff), np.array(phis), np.array(thetas),
            np.array(gain_phi), np.array(gain_theta),
            np.array(phase_phi), np.array(phase_theta))


def preprocess_rnog_xfdtd(path_gain, path_phases, outputfilename,
                          n_index=1.74, encoding=None):
    """Realized VEL from XFDTD gain+phase; frequencies rescaled f -> f/n for
    the in-ice index (preprocess_RNOG_XFDTD, antennapattern.py:163-211)."""
    (ff, phi, theta, gain_phi, gain_theta,
     phase_phi, phase_theta) = parse_rnog_xfdtd_file(path_gain, path_phases,
                                                     encoding=encoding)
    theta = np.deg2rad(theta)
    phi = np.deg2rad(phi)
    wavelength = _C / np.array(ff)
    amp = (50 / (4 * np.pi * Z_0 / units.ohm)) ** 0.5
    H_theta = wavelength * amp * gain_theta ** 0.5 * np.exp(1j * phase_theta)
    H_phi = wavelength * amp * gain_phi ** 0.5 * np.exp(1j * phase_phi)

    zen_boresight, azi_boresight = 0.0, 0.0
    zen_ori, azi_ori = 0.5 * np.pi, 0.0

    index = np.lexsort((theta, phi, ff))
    ff = np.array(ff)[index] / n_index
    phi = phi[index]
    theta = theta[index]
    H_phi = np.array(H_phi)[index]
    H_theta = np.array(H_theta)[index]

    with open(outputfilename, "wb") as fout:
        pickle.dump([zen_boresight, azi_boresight, zen_ori, azi_ori,
                     ff, theta, phi, H_phi, H_theta], fout, protocol=2)
    return outputfilename
