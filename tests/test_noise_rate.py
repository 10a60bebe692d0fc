"""Noise-trigger-rate tuner test: the tuned threshold reproduces the target
rate, and the published reference working point (30.85 Vrms^2 at ~100 Hz for
the 4-channel PA with digitization, D05phased_array_deep.py:20-22) falls in
the right regime."""
import numpy as np
import pytest

from nuradiomc_tpu.ops import filters, phased_array
from nuradiomc_tpu.sim import noise_rate
from nuradiomc_tpu.utils import units


@pytest.fixture(scope="module")
def samples():
    fs = 2.0
    N = 1024
    ff = np.fft.rfftfreq(N, 1 / fs)
    chain = [((96 * units.MHz, 100 * units.GHz), "cheby1", {"order": 4, "rp": 0.1}),
             ((0, 220 * units.MHz), "cheby1", {"order": 7, "rp": 0.1})]
    filt = filters.chain_response(ff, chain)
    bw = np.trapezoid(np.abs(filt) ** 2, ff)
    Vrms = 5.6749e-6
    amp = Vrms / np.sqrt(bw / (0.5 * fs))
    z = np.array([-197.0, -198.0, -199.0, -200.0])
    rolls = phased_array.beam_rolls(z, np.zeros(4), phased_array.default_angles,
                                    1.75, 1.0)  # ADC 0.5 GHz x2 upsampling
    import jax.numpy as jnp
    mp = noise_rate.run_phased_array_tuning(
        4096, N, fs, amp, filt, rolls, 4, window=16, step=8,
        adc_fs=0.5, adc_nbits=8, adc_range=Vrms * 255 / 15,
        upsampling=2, seed=1, batch=1024, dtype=jnp.float64)
    duration = N / fs
    return mp, Vrms, duration


def test_tuned_threshold_reproduces_rate(samples):
    mp, Vrms, duration = samples
    target = 1.0 / (64 * duration)  # a rate resolvable with 4096 traces
    thr = noise_rate.tune_threshold(target, mp, duration)
    rate = noise_rate.estimate_rate_curve(np.array([thr]), mp, duration)[0]
    assert abs(rate / target - 1) < 0.5


def test_reference_working_point_regime(samples):
    mp, Vrms, duration = samples
    # at the published threshold the rate should be far below 1/(duration),
    # i.e. a rare noise trigger (the reference tuned 30.85 Vrms^2 ~ 100 Hz)
    rate_at_ref = noise_rate.estimate_rate_curve(
        np.array([30.85 * Vrms ** 2]), mp, duration)[0]
    # 100 Hz * 512 ns = 5e-5 per trace -> with 4096 traces we expect ~0
    assert rate_at_ref < 10.0 / (duration * 64)
    # and the rate curve is monotone decreasing
    thrs = np.linspace(5, 40, 8) * Vrms ** 2
    rates = noise_rate.estimate_rate_curve(thrs, mp, duration)
    assert np.all(np.diff(rates) <= 1e-12)
