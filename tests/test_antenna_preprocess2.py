"""The remaining antenna-pattern preprocessors (antennapattern.py:483-1184):
AERA XML, ARAsim ASCII, generic XFDTD, HFSS csv, LOFAR txt, FEKO .mat, and
the WIPL-D -> ARASim gain export.

Where the reference's preprocessor runs under Python 3 (AERA, LOFAR, the
ARA parser) the test executes it in-process on the same synthetic raw
export and asserts equality. Where it does not (preprocess_ARA calls its
own parser with the wrong arity, parse_HFSS_file indexes lists with float
bounds) or needs the full native-size input (preprocess_FEKO_mat hardcodes
the 301x721x181 grid -> a 1.3 GB fixture), the test checks the documented
VEL math directly and that the written pickle loads as an AntennaTable.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from nuradiomc_tpu.detector import antenna_preprocess as app
from nuradiomc_tpu.ops import antenna
from nuradiomc_tpu.utils import units

HERE = os.path.dirname(__file__)
REFERENCE = "/root/reference"


def _ref_env():
    if not os.path.isdir("/tmp/refstubs"):
        subprocess.run([sys.executable, "tests/golden/make_refstubs.py"],
                       check=True, cwd=os.path.dirname(HERE))
    return dict(os.environ, PYTHONPATH="/tmp/refstubs:" + REFERENCE)


def _run_ref(script):
    r = subprocess.run([sys.executable, "-c", script], env=_ref_env(),
                       capture_output=True, text=True)
    assert "REF-OK" in r.stdout, (r.stdout[-2000:], r.stderr[-3000:])


# ---------------------------------------------------------------------------
# AERA XML
# ---------------------------------------------------------------------------

def _write_aera_xml(path):
    freqs = [30.0, 55.0, 80.0]
    thetas = [0, 30, 60, 90]
    phis = [0, 90, 180, 270]
    # angle list = all (theta, phi) pairs, matching per-frequency node order
    pairs = [(t, p) for p in phis for t in thetas]
    rng = np.random.default_rng(5)
    with open(path, "w") as f:
        f.write("<frequency> %s </frequency>\n"
                % " ".join(str(x) for x in freqs))
        f.write("<theta> %s </theta>\n"
                % " ".join(str(t) for t, _ in pairs))
        f.write("<phi> %s </phi>\n" % " ".join(str(p) for _, p in pairs))
        for fr in freqs:
            for tag in ("EAHTheta_amp", "EAHTheta_phase", "EAHPhi_amp",
                        "EAHPhi_phase"):
                vals = rng.uniform(0.02, 2.0, len(pairs))
                if "phase" in tag:
                    vals = rng.uniform(-180, 180, len(pairs))
                f.write("<%s idfreq='%.2f'> %s </%s>\n"
                        % (tag, fr, " ".join(repr(float(v)) for v in vals),
                           tag))


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_preprocess_aera_matches_reference(tmp_path):
    xml = tmp_path / "aeratest.xml"
    _write_aera_xml(xml)

    script = f"""
import numpy as np
from NuRadioReco.detector import antennapattern as ap
ap.path_to_antennamodels = {str(tmp_path / 'models')!r}
ap.preprocess_AERA({str(xml)!r})
print('REF-OK')
"""
    _run_ref(script)
    import pickle
    with open(tmp_path / "models" / "aeratest" / "aeratest.pkl", "rb") as f:
        ref = pickle.load(f)

    out = app.preprocess_aera(str(xml), output=str(tmp_path / "mine.pkl"))
    with open(out, "rb") as f:
        got = pickle.load(f)

    np.testing.assert_allclose(np.array(got[:4], float),
                               np.array(ref[:4], float), atol=1e-12)
    for i in range(4, 9):
        np.testing.assert_allclose(got[i], ref[i], rtol=1e-12, atol=0)

    table = antenna.load_antenna_table(out)
    assert table.h_theta.shape == (3, 4, 4)


# ---------------------------------------------------------------------------
# ARAsim ASCII (parser vs reference; preprocessor vs documented math)
# ---------------------------------------------------------------------------

def _write_ara_txt(path, freqs=(100.0, 300.0)):
    thetas = np.arange(0, 181, 45)
    phis = np.arange(0, 356, 5)
    rng = np.random.default_rng(11)
    with open(path, "w") as f:
        for fr in freqs:
            f.write(f"freq : {fr} MHz\n")
            f.write("SWR : 1.5\n")
            f.write("Theta   Phi     Gain(dB)  Gain   Phase(deg)\n")
            for phi in phis:
                for theta in thetas:
                    g = rng.uniform(0.1, 5.0)
                    ph = rng.uniform(-180, 180)
                    f.write(f"{theta} {phi} {10 * np.log10(g):.3f}"
                            f" {g:.6f} {ph:.3f}\n")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_parse_ara_file_matches_reference(tmp_path):
    txt = tmp_path / "ara.txt"
    _write_ara_txt(txt)
    script = f"""
import numpy as np
from NuRadioReco.detector import antennapattern as ap
ff, phis, thetas, gains, phases = ap.parse_ARA_file({str(txt)!r})
np.savez({str(tmp_path / 'ref.npz')!r}, ff=ff, phis=phis, thetas=thetas,
         gains=gains, phases=phases)
print('REF-OK')
"""
    _run_ref(script)
    ref = np.load(tmp_path / "ref.npz")
    ff, phis, thetas, gains, phases = app.parse_ara_file(str(txt))
    np.testing.assert_allclose(ff, ref["ff"], rtol=1e-12)
    np.testing.assert_allclose(phis, ref["phis"], rtol=1e-12)
    np.testing.assert_allclose(thetas, ref["thetas"], atol=1e-12)
    np.testing.assert_allclose(gains, ref["gains"], rtol=1e-12)
    np.testing.assert_allclose(phases, ref["phases"], atol=1e-12)
    # the phi=0 block is duplicated at phi=360 for wrap interpolation
    assert np.isclose(phis.max(), 2 * np.pi)


def test_preprocess_ara_math(tmp_path):
    d = tmp_path / "aravpol"
    d.mkdir()
    _write_ara_txt(d / "aravpol.txt")
    out = app.preprocess_ara(str(d / "aravpol.txt"))
    table = antenna.load_antenna_table(out)
    # H_theta = lambda sqrt(50/(pi Z0)) sqrt(G); phases dropped; H_phi 1e-3
    ff, phis, thetas, gains, _ = app.parse_ara_file(str(d / "aravpol.txt"))
    lam = app._C / ff[0]
    expected = lam * (50 / (np.pi * app.Z_0 / units.ohm)) ** 0.5 \
        * gains[0] ** 0.5
    got = np.asarray(table.h_theta)[0, 0, 0]
    np.testing.assert_allclose(got.real, expected, rtol=1e-9)
    assert got.imag == 0
    np.testing.assert_allclose(np.asarray(table.h_phi),
                               1e-3 * np.asarray(table.h_theta), rtol=1e-9)


def test_preprocess_xfdtd_generic(tmp_path):
    d = tmp_path / "xfvpol"
    d.mkdir()
    _write_ara_txt(d / "xfvpol.txt")
    with open(d / "xfvpol.yaml", "w") as f:
        f.write("boresight_direction: [0, 0, 1]\n"
                "orientation: [1, 0, 0]\nn: 1.78\ntype: Vpol\n")
    out = app.preprocess_xfdtd(str(d / "xfvpol.txt"))
    table = antenna.load_antenna_table(out)
    ff, phis, thetas, gains, phases = app.parse_ara_file(
        str(d / "xfvpol.txt"))
    lam = app._C / ff[0]
    expected = (lam / 1.78 ** 0.5
                * (50 / (4 * np.pi * app.Z_0 / units.ohm)) ** 0.5
                * gains[0] ** 0.5 * np.exp(1j * phases[0]))
    got = np.asarray(table.h_theta)[0, 0, 0]
    np.testing.assert_allclose(got, expected, rtol=1e-9)
    # Vpol: phi component suppressed
    np.testing.assert_allclose(np.asarray(table.h_phi),
                               1e-6 * np.asarray(table.h_theta), rtol=1e-9)
    # boresight up, tines along x
    np.testing.assert_allclose(table.orientation,
                               (0.0, 0.0, np.pi / 2, 0.0), atol=1e-12)


# ---------------------------------------------------------------------------
# WIPL-D -> ARASim gain export (round-trips through parse_ara_file)
# ---------------------------------------------------------------------------

def test_save_preprocessed_wipld_for_ara(tmp_path):
    from tests.test_antenna_table import _write_wipld_raw
    name = "wipldara"
    d = _write_wipld_raw(tmp_path, name)
    out = app.save_preprocessed_wipld_for_ara(str(d / f"{name}.ad1"))
    assert out.endswith(".ara")
    # the written file parses with the ARAsim reader: same grid, and the
    # gain column is the realized gain Gr = G (1 - |S|^2)
    ff, phis, thetas, gains, _ = app.parse_ara_file(out)
    (_, _, _, _, ff_w, _Z, S, ff2, _phi, _theta, _Ip, _It,
     g_w) = app.parse_wipld_file(str(d / f"{name}.ad1"),
                                 str(d / f"{name}.ra1"),
                                 str(d / f"{name}.orientation"))
    from scipy.interpolate import interp1d
    gr = g_w * (1 - np.abs(interp1d(ff_w, S, kind="nearest")(ff2)) ** 2)
    np.testing.assert_allclose(np.sort(gains), np.sort(gr), rtol=2e-3)


# ---------------------------------------------------------------------------
# HFSS csv
# ---------------------------------------------------------------------------

def test_preprocess_hfss(tmp_path):
    d = tmp_path / "hfssant"
    d.mkdir()
    freqs = [200.0, 400.0]
    angles = [(t, p) for p in (0, 120, 240) for t in (0, 90, 180)]
    rng = np.random.default_rng(3)
    mag = {(f, t, p): rng.uniform(-10, 3) for f in freqs for t, p in angles}
    phs = {(f, t, p, c): rng.uniform(-np.pi, np.pi)
           for f in freqs for t, p in angles for c in "tp"}
    cols = ["Freq [MHz]"]
    for t, p in angles:
        tag = f"Phi='{p}deg' Theta='{t}deg'"
        cols += [f"log10(mag(rEPhi)) - {tag}", f"log10(mag(rETheta)) - {tag}",
                 f"ang_rad(rEPhi) - {tag}", f"ang_rad(rETheta) - {tag}"]
    with open(d / "hfssant.csv", "w") as f:
        f.write(",".join(cols) + "\n")
        for fr in freqs:
            row = [str(fr)]
            for t, p in angles:
                row += [str(mag[(fr, t, p)]), str(mag[(fr, t, p)] - 1),
                        str(phs[(fr, t, p, "p")]), str(phs[(fr, t, p, "t")])]
            f.write(",".join(row) + "\n")

    out = app.preprocess_hfss(str(d / "hfssant.csv"))
    table = antenna.load_antenna_table(out)
    assert table.h_theta.shape == (2, 3, 3)
    # spot-check the documented VEL math at (freq0, theta=0, phi=0)
    m = 10 ** (mag[(200.0, 0, 0)] / 10)
    gain = 4 * np.pi * m ** 2 / (2 * 120 * np.pi)
    lam = app._C / (200.0 * units.MHz)
    expected = (lam / 1.78 ** 0.5
                * (50 / (4 * np.pi * app.Z_0 / units.ohm)) ** 0.5
                * gain ** 0.5 * np.exp(1j * phs[(200.0, 0, 0, "p")]))
    np.testing.assert_allclose(np.asarray(table.h_phi)[0, 0, 0], expected,
                               rtol=1e-9)


# ---------------------------------------------------------------------------
# LOFAR txt
# ---------------------------------------------------------------------------

def _write_lofar_txt(directory, ant="LBA"):
    freqs = [30.0, 50.0, 70.0]
    thetas = [0, 45, 90]
    phis = [0, 90, 180, 270]
    rng = np.random.default_rng(7)
    rows = [(f, t, p) for f in freqs for t in thetas for p in phis]
    for comp in ("theta", "phi"):
        with open(os.path.join(directory, f"{ant}_Vout_{comp}.txt"),
                  "w") as fh:
            fh.write("freq theta phi re im\n")
            for f, t, p in rows:
                re, im = rng.standard_normal(2)
                fh.write(f"{f} {t} {p} {float(re)!r} {float(im)!r}\n")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_preprocess_lofar_matches_reference(tmp_path):
    _write_lofar_txt(str(tmp_path))
    script = f"""
import numpy as np
from NuRadioReco.detector import antennapattern as ap
ap.path_to_antennamodels = {str(tmp_path / 'models')!r}
ap.preprocess_LOFAR_txt({str(tmp_path)!r}, ant='LBA', orientation='X')
print('REF-OK')
"""
    _run_ref(script)
    import pickle
    with open(tmp_path / "models" / "LOFAR_LBA_X" / "LOFAR_LBA_X.pkl",
              "rb") as f:
        ref = pickle.load(f)

    out = app.preprocess_lofar_txt(str(tmp_path), ant="LBA", orientation="X",
                                   output=str(tmp_path / "mine.pkl"))
    with open(out, "rb") as f:
        got = pickle.load(f)
    np.testing.assert_allclose(np.array(got[:4], float),
                               np.array(ref[:4], float), atol=1e-12)
    for i in range(4, 9):
        np.testing.assert_allclose(got[i], ref[i], rtol=1e-12, atol=0)
    table = antenna.load_antenna_table(out)
    assert table.h_theta.shape == (3, 3, 4)


# ---------------------------------------------------------------------------
# FEKO .mat (SKALA4)
# ---------------------------------------------------------------------------

def test_preprocess_feko_mat(tmp_path):
    """The reference's preprocess_FEKO_mat hardcodes the native
    301x721x181 grid (a ~1.3 GB synthetic fixture), so this checks the
    documented VEL conversion (vel = -2i lambda Z_L / eta_0 E,
    antennapattern.py:1155-1160) on a small grid with the same [50,350] MHz
    x [0,360] x [0,90] deg extents, plus the downscale masking."""
    from scipy import io as scipy_io

    nf, np_, nt = 7, 9, 5
    rng = np.random.default_rng(13)
    E = (rng.standard_normal((np_, nt, nf, 2, 2))
         .view(np.complex128).reshape(np_, nt, nf, 2))
    scipy_io.savemat(tmp_path / "feko.mat",
                     {"Ephi": E[..., 0], "Etheta": E[..., 1]})

    out = app.preprocess_feko_mat(str(tmp_path / "feko.mat"),
                                  polarization="Y", downscale_freq=1,
                                  downscale_zenith=1, downscale_azimuth=1)
    table = antenna.load_antenna_table(out)
    assert table.h_theta.shape == (nf, nt, np_)
    np.testing.assert_allclose(np.asarray(table.freqs)[0], 50 * units.MHz)
    np.testing.assert_allclose(np.asarray(table.freqs)[-1], 350 * units.MHz)

    lam = app._C / (50 * units.MHz)
    from scipy import constants
    eta_0 = np.sqrt(constants.mu_0 / constants.epsilon_0) * units.ohm
    expected = -2j * lam * (50 * units.ohm) / eta_0 * E[0, 0, 0, 1]
    np.testing.assert_allclose(np.asarray(table.h_theta)[0, 0, 0], expected,
                               rtol=1e-9)
    # Y polarization stores the north-south rotation
    np.testing.assert_allclose(table.orientation,
                               (0.0, 0.0, np.pi / 2, np.pi), atol=1e-12)

    # downscaling keeps every second node on each axis
    out2 = app.preprocess_feko_mat(str(tmp_path / "feko.mat"),
                                   polarization="X", downscale_freq=2,
                                   downscale_zenith=2, downscale_azimuth=2,
                                   output=str(tmp_path / "down.pkl"))
    t2 = antenna.load_antenna_table(out2)
    assert t2.h_theta.shape == (4, 3, 5)
    np.testing.assert_allclose(np.asarray(t2.h_theta)[0, 0, 0],
                               np.asarray(table.h_theta)[0, 0, 0], rtol=1e-12)
