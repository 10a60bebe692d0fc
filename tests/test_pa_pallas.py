"""Equivalence of the fused Pallas phased-array kernel vs the XLA chain.

The kernel (ops/pa_pallas.py) must reproduce the pipeline's phased-array
path — decimating irfft matmul, perfect floor comparator, FFT upsample,
static beam rolls, window/step power sums (phasedArrayBase.py semantics)
— in CPU interpret mode. The sliding power sum is a doubling tree vs the
XLA cumsum difference (~1e-7-relative apart at f32), so decision
equality is asserted away from razor-thin margins and power values at
tolerance.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.ops import adc as adc_ops
from nuradiomc_tpu.ops import phased_array
from nuradiomc_tpu.ops.pa_pallas import fused_pa_trigger
from nuradiomc_tpu.sim.pipeline import (_decimating_irfft_matrices,
                                        _fft_upsample_matrix,
                                        _irfft_matrices)


def test_fused_pa_matches_xla_chain():
    rng = np.random.RandomState(11)
    G, C = 12, 4
    n_base, fs = 1024, 2.0
    fs_hi = 5.0
    n_hi = int(round(n_base * fs_hi / fs))
    adc_fs, nbits, up = 0.5, 8, 2
    decim = int(round(fs_hi / adc_fs))
    window, step = 32, 16
    adc_range = 0.04

    F = n_base // 2 + 1
    spec = (rng.randn(G * C, F) + 1j * rng.randn(G * C, F)).astype(
        np.complex64) * 1e-3
    I_r, I_i = _irfft_matrices(n_base)
    Dd_r, Dd_i = _decimating_irfft_matrices(n_base, n_hi, decim)
    U = _fft_upsample_matrix(Dd_r.shape[1], up)
    rolls = phased_array.beam_rolls(
        [-197.0 - i for i in range(C)], [0.0] * C,
        phased_array.default_angles, 1.73, adc_fs * up)

    # ---- XLA reference chain (pipeline._eval_trigger, matmul path) -----
    scale_dec = fs_hi / np.sqrt(2.0)
    tr = ((spec.real @ Dd_r + spec.imag @ Dd_i) * scale_dec).astype(
        np.float32).reshape(G, C, -1)
    q = np.asarray(adc_ops.perfect_floor_comparator(
        jnp.asarray(tr), nbits, (-adc_range / 2, adc_range / 2)))
    tru = np.einsum("gcn,nm->gcm", q, U).astype(np.float32)
    beams = np.asarray(phased_array.phase_signals(jnp.asarray(tru),
                                                  np.asarray(rolls)))
    power, nf = phased_array.power_sum(jnp.asarray(beams), window, step)
    power = np.asarray(power)
    max_power = power.max(axis=(1, 2))
    # threshold per scenario: below / above each group's own peak
    for q, name in ((0.35, "mostly-fire"), (0.75, "mostly-quiet")):
        # nudge off the quantile so no group sits exactly at threshold
        thr = float(np.quantile(max_power, q)) * 1.001
        ref_trig, ref_frame, _, _ = phased_array.phased_power_trigger(
            jnp.asarray(tru), np.asarray(rolls), thr, window, step)
        ref_trig = np.asarray(ref_trig)
        ref_frame = np.asarray(ref_frame)

        fired, frame, amp = fused_pa_trigger(
            jnp.asarray(spec.real), jnp.asarray(spec.imag),
            I_r, I_i, Dd_r, Dd_i, U,
            scale_full=fs / np.sqrt(2.0), scale_dec=scale_dec,
            rolls=rolls, threshold=thr, window=window, step=step,
            v_min=-adc_range / 2,
            lsb=adc_range / (2 ** nbits - 1), n_counts=2 ** nbits,
            C=C, row_tile=4 * C)
        fired, frame = np.asarray(fired), np.asarray(frame)

        # decisions equal away from razor-thin margins
        margin = np.abs(max_power - thr) / thr
        solid = margin > 1e-4
        assert solid.sum() >= G - 2
        np.testing.assert_array_equal(fired[solid], ref_trig[solid],
                                      err_msg=name)
        match = fired[solid] & ref_trig[solid]
        np.testing.assert_array_equal(frame[solid][match],
                                      ref_frame[solid][match], err_msg=name)
        assert ref_trig[solid].any() and not ref_trig[solid].all(), name

        # max-amp from the full-rate trace
        full = ((spec.real @ I_r + spec.imag @ I_i)
                * (fs / np.sqrt(2.0))).reshape(G, C, -1)
        np.testing.assert_allclose(np.asarray(amp),
                                   np.abs(full).max(axis=-1), rtol=1e-5)


@pytest.mark.heavy
def test_fused_pa_e2e_golden_decisions():
    """The production pipeline with trigger_impl='pallas' on the validated
    PA e2e workload must reproduce the XLA path's triggered set (same
    noise draws, same physics — only the power-sum tree order differs)."""
    import dataclasses

    import test_e2e_phased_array as pae2e
    from nuradiomc_tpu.sim.simulation import Simulation

    sim = Simulation(
        pae2e.INPUT,
        {"channels": {str(i + 1): {
            "adc_n_samples": 256, "adc_sampling_frequency": 0.5,
            "adc_nbits": 8,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": 0.0, "ant_position_y": 0.0,
            "ant_position_z": -197.0 - i,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "RNOG_vpol_v1_n1.73", "amp_type": "",
            "cab_time_delay": 1051.0, "channel_id": i, "station_id": 1,
        } for i in range(4)},
         "stations": {"1": {"station_id": 1, "pos_altitude": 0,
                            "pos_easting": 0, "pos_northing": 0}}},
        config={"sampling_rate": 2.0, "noise": True,
                "propagation": {"ice_model": "southpole_2015",
                                "focusing": True},
                "signal": {"model": "Alvarez2009"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=pae2e_filters(),
        trigger=pae2e_trigger(),
        antenna_replacements={"RNOG_vpol_v1_n1.73": "analytic_VPol"},
        chunk_size=512, dtype=jnp.float32)
    res_x = sim.run()

    sim.settings = dataclasses.replace(sim.settings, trigger_impl="pallas")
    sim._jit_step_by_station = {}
    res_p = sim.run()

    mine_x = set(res_x["group_ids"][res_x["triggered"]])
    mine_p = set(res_p["group_ids"][res_p["triggered"]])
    # identical draws; only razor-thin power margins may flip
    assert len(mine_x ^ mine_p) <= 1, sorted(mine_x ^ mine_p)


def pae2e_filters():
    from nuradiomc_tpu.sim.simulation import FilterStage
    from nuradiomc_tpu.utils import units
    return [FilterStage((96 * units.MHz, 100 * units.GHz), "cheby1",
                        {"order": 4, "rp": 0.1}),
            FilterStage((0, 220 * units.MHz), "cheby1",
                        {"order": 7, "rp": 0.1})]


def pae2e_trigger():
    from nuradiomc_tpu.sim.simulation import TriggerSpec
    return TriggerSpec(trigger_type="phased_array")
