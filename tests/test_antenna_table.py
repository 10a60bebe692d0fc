"""Tabulated antenna patterns: loader + trilinear interpolation + on-sky
rotation against the REFERENCE AntennaPattern (antennapattern.py:1426-1580,
1246-1307), the WIPL-D preprocessor against the reference's, and an
end-to-end simulation variant running on a tabulated pattern.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nuradiomc_tpu.ops import antenna
from nuradiomc_tpu.utils import units

REFERENCE = "/root/reference"
HERE = os.path.dirname(__file__)


def _perp(v):
    """Any unit vector perpendicular to v."""
    a = np.array([1.0, 0.0, 0.0])
    if abs(np.dot(a, v)) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    p = np.cross(v, a)
    return p / np.linalg.norm(p)


def _angles(v):
    return float(np.arccos(v[2] / np.linalg.norm(v))), float(np.arctan2(v[1], v[0]))


def _make_synthetic_pickle(path, ori=(0.0, 0.0), rot=None):
    """Reference-format 9-item pickle on a uniform grid with smooth complex
    VELs; flat layout iFreq*n_theta*n_phi + iPhi*n_theta + iTheta
    (antennapattern.py:1423)."""
    freqs = np.linspace(0.05, 1.2, 24)
    thetas = np.linspace(0.0, np.pi, 25)
    phis = np.linspace(0.0, 2 * np.pi, 37)
    F, T, P = len(freqs), len(thetas), len(phis)

    ff = np.zeros(F * T * P)
    th = np.zeros(F * T * P)
    ph = np.zeros(F * T * P)
    for iF in range(F):
        for iP in range(P):
            for iT in range(T):
                idx = iF * T * P + iP * T + iT
                ff[idx] = freqs[iF]
                th[idx] = thetas[iT]
                ph[idx] = phis[iP]
    h_theta = ((0.2 + ff) * np.sin(th)
               * np.exp(1j * (0.3 * ph + 0.7 * th + 2.0 * ff)))
    h_phi = ((0.1 + 0.5 * ff) * np.cos(0.5 * th)
             * np.exp(1j * (0.2 * ph - 0.4 * th)))

    o_vec = np.array([np.sin(ori[0]) * np.cos(ori[1]),
                      np.sin(ori[0]) * np.sin(ori[1]), np.cos(ori[0])])
    r_vec = _perp(o_vec) if rot is None else rot
    rt, rp = _angles(r_vec)
    with open(path, "wb") as f:
        pickle.dump([ori[0], ori[1], rt, rp, ff, th, ph, h_phi, h_theta],
                    f, protocol=4)
    return path


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_table_vel_matches_reference(tmp_path):
    """load_antenna_table + table_vel == the reference's
    get_antenna_response_vectorized (raw trilinear interpolation + on-sky
    rotation through the stored antenna frame) on random orientations and
    incoming directions, including out-of-band frequencies."""
    if not os.path.isdir("/tmp/refstubs"):
        subprocess.run([sys.executable, "tests/golden/make_refstubs.py"],
                       check=True, cwd=os.path.dirname(HERE))
    model_dir = tmp_path / "synthdipole"
    model_dir.mkdir()
    pkl = str(model_dir / "synthdipole.pkl")
    # non-trivial simulated-antenna frame
    _make_synthetic_pickle(pkl, ori=(0.3, 1.1))

    rng = np.random.default_rng(3)
    n = 12
    zeniths = rng.uniform(0.05, np.pi - 0.05, n)
    azimuths = rng.uniform(-np.pi, np.pi, n)
    ori_thetas = rng.uniform(0, np.pi, n)
    ori_phis = rng.uniform(0, 2 * np.pi, n)
    rot_angles = []
    for ot, op in zip(ori_thetas, ori_phis):
        o = np.array([np.sin(ot) * np.cos(op), np.sin(ot) * np.sin(op),
                      np.cos(ot)])
        rot_angles.append(_angles(_perp(o)))
    rot_thetas = np.array([r[0] for r in rot_angles])
    rot_phis = np.array([r[1] for r in rot_angles])
    # includes out-of-band frequencies on both sides
    freqs = np.linspace(0.0, 1.4, 57)

    np.savez(tmp_path / "inputs.npz", zeniths=zeniths, azimuths=azimuths,
             ori_thetas=ori_thetas, ori_phis=ori_phis,
             rot_thetas=rot_thetas, rot_phis=rot_phis, freqs=freqs)

    script = f"""
import numpy as np
from NuRadioReco.detector.antennapattern import AntennaPattern
d = np.load({str(tmp_path / 'inputs.npz')!r})
ap = AntennaPattern("synthdipole", path={str(tmp_path)!r},
                    do_consistency_check=False)
vt, vp = [], []
for z, a, ot, op, rt, rp in zip(d['zeniths'], d['azimuths'], d['ori_thetas'],
                                d['ori_phis'], d['rot_thetas'], d['rot_phis']):
    VEL = ap.get_antenna_response_vectorized(d['freqs'], z, a, ot, op, rt, rp)
    vt.append(VEL['theta']); vp.append(VEL['phi'])
np.savez({str(tmp_path / 'ref.npz')!r}, vt=np.array(vt), vp=np.array(vp))
print('REF-ANT-OK')
"""
    env = dict(os.environ, PYTHONPATH="/tmp/refstubs:" + REFERENCE)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True)
    assert "REF-ANT-OK" in r.stdout, (r.stdout[-2000:], r.stderr[-3000:])
    ref = np.load(tmp_path / "ref.npz")

    table = antenna.load_antenna_table(pkl)
    got_t, got_p = [], []
    for z, a, ot, op, rt, rp in zip(zeniths, azimuths, ori_thetas, ori_phis,
                                    rot_thetas, rot_phis):
        rot = antenna.antenna_rotation_matrix(
            ot, op, rt, rp, model_orientation=table.orientation)
        vt, vp = jax.jit(lambda zz, aa, rr: antenna.table_vel(
            zz, aa, rr, table, jnp.asarray(freqs)))(z, a, jnp.asarray(rot))
        got_t.append(np.asarray(vt))
        got_p.append(np.asarray(vp))
    np.testing.assert_allclose(np.array(got_t), ref["vt"], rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.array(got_p), ref["vp"], rtol=1e-9,
                               atol=1e-12)


def _write_wipld_raw(base, name):
    """Synthetic WIPL-D .ad1/.ra1/.orientation export."""
    d = base / name
    d.mkdir()
    freqs_ghz = np.array([0.1, 0.3, 0.5, 0.8])
    thetas_deg = np.arange(-90, 91, 30)     # WIPL-D elevation convention
    phis_deg = np.arange(0, 361, 60)
    rng = np.random.default_rng(9)

    with open(d / f"{name}.ad1", "w") as f:
        f.write("> header line\n")
        for fr in freqs_ghz:
            re_z, im_z = 50 + 20 * fr, -5 * fr
            re_s, im_s = 0.3 * fr - 0.2, 0.1 * fr
            f.write(f"{fr} 1 1 0 0 {re_z} {im_z} {re_s} {im_s}\n")
    with open(d / f"{name}.ra1", "w") as f:
        for fr in freqs_ghz:
            f.write(f"> ra1 gen 1 {fr}\n")   # tokens: [3]=gen_num, [4]=freq
            for ph in phis_deg:
                for th in thetas_deg:
                    re_ep, im_ep, re_et, im_et = rng.standard_normal(4)
                    f.write(f"{ph} {th} {re_ep} {im_ep} {re_et} {im_et} 1.0 0.0\n")
    with open(d / f"{name}.orientation", "w") as f:
        f.write("0, 0, 1\n1, 0, 0\n")
    return d


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_wipld_preprocessor_matches_reference(tmp_path):
    """preprocess_wipld == the reference's preprocess_WIPLD on the same raw
    export files (VEL from currents + S-parameters, theta convention flip,
    lexsort layout)."""
    if not os.path.isdir("/tmp/refstubs"):
        subprocess.run([sys.executable, "tests/golden/make_refstubs.py"],
                       check=True, cwd=os.path.dirname(HERE))
    name = "wipldtest"
    d = _write_wipld_raw(tmp_path, name)

    script = f"""
import numpy as np
from NuRadioReco.detector import antennapattern as ap
out = ap.preprocess_WIPLD({str(d / (name + '.ad1'))!r})
np.savez({str(tmp_path / 'ref_wipld.npz')!r},
         scalars=np.array(out[:4]), ff=out[4], theta=out[5], phi=out[6],
         H_phi=out[7], H_theta=out[8])
print('REF-WIPLD-OK')
"""
    env = dict(os.environ, PYTHONPATH="/tmp/refstubs:" + REFERENCE)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True)
    assert "REF-WIPLD-OK" in r.stdout, (r.stdout[-2000:], r.stderr[-3000:])
    ref = np.load(tmp_path / "ref_wipld.npz")

    from nuradiomc_tpu.detector import antenna_preprocess
    got = antenna_preprocess.preprocess_wipld(str(d / (name + ".ad1")))
    np.testing.assert_allclose(np.array(got[:4]), ref["scalars"], rtol=1e-12)
    np.testing.assert_allclose(got[4], ref["ff"], rtol=1e-12)
    np.testing.assert_allclose(got[5], ref["theta"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got[6], ref["phi"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got[7], ref["H_phi"], rtol=1e-12)
    np.testing.assert_allclose(got[8], ref["H_theta"], rtol=1e-12)

    # and the pickle written by save_preprocessed_wipld loads as a table
    pkl = antenna_preprocess.save_preprocessed_wipld(str(d / (name + ".ad1")))
    table = antenna.load_antenna_table(pkl)
    assert table.h_theta.shape == (4, 7, 7)


def test_e2e_with_tabulated_antenna(tmp_path):
    """End-to-end run on a TABULATED antenna: a fine-grid tabulation of the
    analytic VPol must reproduce the analytic-model triggered set."""
    from nuradiomc_tpu.sim import evtgen
    from nuradiomc_tpu.sim.simulation import (FilterStage, Simulation,
                                              TriggerSpec)

    # tabulate the analytic VPol (sinusoidal-theta dipole) on the pipeline's
    # internal rFFT grid (the template's Hann cutoff edge is sharp, so an
    # off-grid tabulation would add %-level frequency-interpolation error;
    # on-grid the frequency interpolation is exact and only the theta grid
    # matters)
    freqs = np.fft.rfftfreq(512, 0.5)[1:]      # uniform, 0.0039..1.0 GHz
    thetas = np.linspace(0.0, np.pi, 181)
    phis = np.linspace(0.0, 2 * np.pi, 13)     # azimuthally symmetric
    # evaluate the template on the FULL internal grid (its Hann cutoff edge
    # is indexed off the sampled grid) and drop the f=0 bin for the table
    tpl = np.asarray(antenna.build_analytic_template(
        "analytic_VPol", np.fft.rfftfreq(512, 0.5)))[0][1:]
    F, T, P = len(freqs), len(thetas), len(phis)
    ff = np.zeros(F * T * P)
    th = np.zeros(F * T * P)
    ph = np.zeros(F * T * P)
    h_t = np.zeros(F * T * P, dtype=complex)
    for iF in range(F):
        base = iF * T * P
        for iP in range(P):
            for iT in range(T):
                idx = base + iP * T + iT
                ff[idx] = freqs[iF]
                th[idx] = thetas[iT]
                ph[idx] = phis[iP]
                h_t[idx] = tpl[iF] * np.sin(thetas[iT])
    model_dir = tmp_path / "tab_vpol"
    model_dir.mkdir()
    with open(model_dir / "tab_vpol.pkl", "wb") as f:
        pickle.dump([0.0, 0.0, np.pi / 2, np.pi / 2, ff, th, ph,
                     np.zeros_like(h_t), h_t], f, protocol=4)

    inp = str(tmp_path / "in.hdf5")
    evtgen.generate_eventlist_cylinder(
        inp, 300, 1e18, 1e18,
        {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
         "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}, seed=31)

    det = {
        "channels": {"1": {
            "adc_n_samples": 256, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": 0.0, "ant_position_y": 0.0,
            "ant_position_z": -100.0,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "tab_vpol", "amp_type": "300",
            "cab_time_delay": 19.8, "adc_nbits": None,
            "channel_id": 0, "station_id": 101,
        }},
        "stations": {"1": {
            "pos_altitude": 0, "pos_easting": 0, "pos_northing": 0,
            "pos_site": "southpole", "station_id": 101,
        }},
    }
    common = dict(
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                        {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        trigger=TriggerSpec(threshold_high_sigma=2.0,
                            threshold_low_sigma=-2.0),
        chunk_size=512, dtype=jnp.float64)

    sim_tab = Simulation(inp, det, antenna_models_path=str(tmp_path),
                         **common)
    assert sim_tab.channel_params.antenna_table is not None
    res_tab = sim_tab.run()

    det_ana = {"channels": {"1": dict(det["channels"]["1"],
                                      ant_type="analytic_VPol")},
               "stations": det["stations"]}
    res_ana = Simulation(inp, det_ana, **common).run()

    # on-grid tabulation: identical triggered set, amplitudes to the theta
    # grid's interpolation accuracy
    assert res_ana["triggered"].sum() > 0
    np.testing.assert_array_equal(res_tab["triggered"], res_ana["triggered"])
    both = res_tab["triggered"] & res_ana["triggered"]
    np.testing.assert_allclose(res_tab["max_amplitude"][both],
                               res_ana["max_amplitude"][both], rtol=1e-4)
