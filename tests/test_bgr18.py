"""BGR18/HEDIS table machinery on a synthetic table of the published schema
(cross_sections.py:16-63, inelasticities.py:53-106): piecewise-power-law
integration, log10 energy interpolation of the integrated cross section,
inverse-CDF inelasticity sampling, and the end-to-end generator path with
cross_sections_model='hedis_bgr18'. The real BGR18_dsigma_dy_H2O.npz
data-server download drops into the same reader.
"""
import numpy as np
import pytest

from nuradiomc_tpu.sim import cross_sections, evtgen
from nuradiomc_tpu.utils import units

# analytic synthetic table: dsigma/dy = A(E) * y^B — the pwpl integration
# and the inverse CDF have closed forms to check against
B_SLOPE = -0.7
FLAVORS = np.array([12, -12, 14, -14, 16, -16])
NCCCS = np.array(["nc", "cc"])
E_GRID = np.logspace(15, 20, 21)      # eV in internal units
Y_GRID = np.logspace(-4, 0, 200)


def _amplitude(e_idx, i_flavor, i_nccc):
    # energy power law with distinct normalization per (flavor, ccnc)
    return (1e-33 * (E_GRID[e_idx] / 1e18) ** 0.36
            * (1.0 + 0.1 * i_flavor) * (1.0 if i_nccc else 0.4))


@pytest.fixture(autouse=True)
def synthetic_table(tmp_path):
    dsdy = np.zeros((len(FLAVORS), len(NCCCS), len(E_GRID), len(Y_GRID)))
    for iF in range(len(FLAVORS)):
        for iI in range(len(NCCCS)):
            for iE in range(len(E_GRID)):
                dsdy[iF, iI, iE] = _amplitude(iE, iF, iI) * Y_GRID ** B_SLOPE
    path = str(tmp_path / "bgr18_synth.npz")
    np.savez(path, dsigma_dy_ref=dsdy, nu_energies_ref=E_GRID,
             y_ref=Y_GRID, flavors_ref=FLAVORS,
             ncccs_ref=np.array(["NC", "CC"]))
    old = cross_sections._BGR18_PATH
    cross_sections.set_bgr18_table_path(path)
    yield
    cross_sections.set_bgr18_table_path(old)


def test_integrate_pwpl_closed_form():
    """Piecewise-power-law integration of an exact power law == analytic,
    including the [0, 1] extension (integrate_pwpl:424-533)."""
    y = 2.5 * Y_GRID ** B_SLOPE
    got = cross_sections.integrate_pwpl(y, Y_GRID, low=0, high=1)
    expected = 2.5 / (B_SLOPE + 1)  # int_0^1 y^B dy = 1/(B+1)
    np.testing.assert_allclose(got, expected, rtol=1e-12)

    # cumulative output is the exact CDF of the power law
    total, (cum, x) = cross_sections.integrate_pwpl(
        y, Y_GRID, low=0, high=1, full_output=True)
    np.testing.assert_allclose(cum / total, x ** (B_SLOPE + 1), rtol=1e-10)


def test_hedis_cross_section_interpolation():
    """sigma(E) = A(E)/(B+1): exact at table nodes, log10-interpolated
    between (get_nu_cross_section hedis branch :266-303)."""
    # at a node, per (flavor, cc/nc/total)
    e = E_GRID[7]
    for iF, flav in enumerate(FLAVORS):
        cc = cross_sections.get_nu_cross_section(e, flav, "cc", "hedis_bgr18")
        nc = cross_sections.get_nu_cross_section(e, flav, "nc", "hedis_bgr18")
        tot = cross_sections.get_nu_cross_section(e, flav, "total",
                                                  "hedis_bgr18")
        # table is per ice nucleus, the reader divides by 18
        scale = units.cm ** 2 / 18 / (B_SLOPE + 1)
        np.testing.assert_allclose(cc, _amplitude(7, iF, 1) * scale, rtol=1e-9)
        np.testing.assert_allclose(nc, _amplitude(7, iF, 0) * scale, rtol=1e-9)
        np.testing.assert_allclose(tot, cc + nc, rtol=1e-12)

    # between nodes: log10-linear in sigma (the reference's interp1d of
    # log10 sigma over linear energy)
    e_mid = 0.5 * (E_GRID[7] + E_GRID[8])
    s7 = cross_sections.get_nu_cross_section(E_GRID[7], 12, "cc", "hedis")
    s8 = cross_sections.get_nu_cross_section(E_GRID[8], 12, "cc", "hedis")
    got = cross_sections.get_nu_cross_section(e_mid, 12, "cc", "hedis")
    w = (e_mid - E_GRID[7]) / (E_GRID[8] - E_GRID[7])
    np.testing.assert_allclose(
        got, 10 ** ((1 - w) * np.log10(s7) + w * np.log10(s8)), rtol=1e-12)

    with pytest.raises(ValueError):
        cross_sections.get_nu_cross_section(E_GRID[0] / 10, 12, "cc", "hedis")


def test_bgr18_inelasticity_sampling():
    """Inverse-CDF draws follow the analytic CDF y^(B+1) of the power-law
    table (the quantile match is exact up to the stored-grid interpolation)."""
    rnd = np.random.default_rng(8)
    n = 200_000
    yy = cross_sections.get_neutrino_inelasticity_bgr18(
        n, rnd, nu_energies=np.full(n, 1e18), flavors=np.full(n, 14),
        ncccs=np.full(n, "cc"))
    assert np.all((yy > 0) & (yy <= 1))
    # CDF-transform the samples through the table CDF (the reference's own
    # mapping, inelasticities.py:88-90): the result must be uniform —
    # quantiles of u equal q to 4x the binomial standard error
    dsdy_row = _amplitude(10, 2, 1) * Y_GRID ** B_SLOPE
    total, (cum, y_ext) = cross_sections.integrate_pwpl(
        dsdy_row, Y_GRID, low=0, high=1, full_output=True)
    cdf = cum / total
    u = np.interp(yy, y_ext, cdf)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        se = np.sqrt(q * (1 - q) / n)
        assert abs(np.quantile(u, q) - q) < 4 * se, (q, np.quantile(u, q))
    # and the mid/high quantiles match the ANALYTIC inverse CDF q^(1/(B+1))
    # within 4x the quantile estimator's standard error
    # se(y_q) = sqrt(q(1-q)/n) / pdf(y_q), pdf = (B+1) y^B
    for q in (0.25, 0.5, 0.75, 0.9):
        y_q = q ** (1.0 / (B_SLOPE + 1))
        pdf = (B_SLOPE + 1) * y_q ** B_SLOPE
        se = np.sqrt(q * (1 - q) / n) / pdf
        assert abs(np.quantile(yy, q) - y_q) < 4 * se, (q, np.quantile(yy, q))


def test_generator_end_to_end_with_hedis(tmp_path):
    """generate_eventlist_cylinder(cross_sections_model='hedis_bgr18') runs
    end-to-end on the synthetic table: cc fraction follows the table's
    cc/(cc+nc) and inelasticities follow the table CDF."""
    path = str(tmp_path / "events.hdf5")
    data, attrs = evtgen.generate_eventlist_cylinder(
        path, 20000, 1e18, 1e18,
        {"fiducial_rmin": 0, "fiducial_rmax": 1 * units.km,
         "fiducial_zmin": -1 * units.km, "fiducial_zmax": 0},
        flavor=(14, -14), cross_sections_model="hedis_bgr18", seed=5)
    it = np.asarray(data["interaction_type"])
    cc_frac = np.mean(it == "cc")
    cc = cross_sections.get_nu_cross_section(1e18, 14, "cc", "hedis")
    nc = cross_sections.get_nu_cross_section(1e18, 14, "nc", "hedis")
    expected = float(cc / (cc + nc))
    assert abs(cc_frac - expected) < 0.02, (cc_frac, expected)

    y = np.asarray(data["inelasticity"])
    med = np.median(y)
    y_med = 0.5 ** (1.0 / (B_SLOPE + 1))
    # 4x the median estimator's standard error at this sample size
    se = np.sqrt(0.25 / len(y)) / ((B_SLOPE + 1) * y_med ** B_SLOPE)
    assert abs(med - y_med) < 4 * se, (med, y_med)
