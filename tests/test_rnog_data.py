"""RNO-G data modules: block-offset fitting, glitch detection, hit filter
(RNO_G/channelBlockOffsetFitter.py, channelGlitchDetector.py,
stationHitFilter.py)."""
import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.reco.rnog_data import (
    channelBlockOffsets, channelGlitchDetector, fit_block_offsets,
    seam_diff_sq, stationHitFilter, unscramble)
from nuradiomc_tpu.utils import units

chp = par.channelParameters


def test_fit_block_offsets_recovers_injected():
    rng = np.random.default_rng(0)
    fs, n, bs = 3.2, 2048, 128
    n_blocks = n // bs
    # in-band signal + noise + rect block offsets
    t = np.arange(n) / fs
    signal = 0.02 * np.sin(2 * np.pi * 0.3 * t) + rng.normal(0, 0.01, n)
    true_off = rng.normal(0, 0.05, n_blocks)
    trace = signal + np.repeat(true_off, bs)

    off, cleaned = fit_block_offsets(trace, bs, fs, 0.05, mode="fit",
                                     return_trace=True)
    # offsets are only defined up to the (kept) signal mean; compare shapes
    d_true = true_off - true_off.mean()
    d_fit = off - off.mean()
    assert np.max(np.abs(d_fit - d_true)) < 5e-3
    # cleaned trace has much smaller block structure than the input
    resid = np.mean(cleaned.reshape(n_blocks, bs), axis=1)
    assert np.std(resid) < 0.1 * np.std(true_off)


def test_block_offsets_module_roundtrip():
    rng = np.random.default_rng(1)
    fs, n = 3.2, 2048
    st = Station(11)
    ch = Channel(0)
    ch.set_trace(rng.normal(0, 0.01, n), fs)
    st.add_channel(ch)
    evt = Event(0, 0)

    mod = channelBlockOffsets()
    before = np.asarray(ch.get_trace()).copy()
    mod.add_offsets(evt, st, offsets=0.08, channel_ids=[0],
                    rng=np.random.default_rng(2))
    assert np.std(np.asarray(ch.get_trace()) - before) > 0.01
    mod.run(evt, st, mode="fit")
    after = np.asarray(ch.get_trace())
    # offsets removed to well below their injected size
    blocks = after.reshape(-1, 128).mean(axis=1)
    assert np.std(blocks) < 0.01
    assert ch.has_parameter(chp.block_offsets)


def test_glitch_detector():
    rng = np.random.default_rng(3)
    n = 2048
    clean = rng.normal(0, 1.0, n)
    st = Station(11)
    ch_ok = Channel(0)
    ch_ok.set_trace(clean, 3.2)
    # a "glitched" trace: scramble block pairs the way the LAB4D failure
    # mode does (inverse of unscramble): big seam discontinuities appear
    glitched = clean + 0.0
    for i in range(0, n, 256):
        glitched[i + 64:i + 128] += 8.0   # step inside every other block
    ch_bad = Channel(1)
    ch_bad.set_trace(glitched, 3.2)
    st.add_channel(ch_ok)
    st.add_channel(ch_bad)

    det = channelGlitchDetector()
    det.begin()
    det.run(Event(0, 0), st)
    assert ch_bad[chp.glitch] or not ch_ok[chp.glitch]
    # seam statistic is invariant on pure noise between trace and unscramble
    ts_ok = (seam_diff_sq(clean) - seam_diff_sq(unscramble(clean))) / np.var(clean)
    assert abs(ts_ok) < 50


def _hit_station(pulsed, n=2048, fs=3.2, delay_ns=1.0):
    """15 in-ice channels; `pulsed` channel ids get a pulse at ~t0+delay*i."""
    rng = np.random.default_rng(4)
    st = Station(11)
    t = np.arange(n) / fs
    for cid in stationHitFilter.IN_ICE_CHANNELS:
        tr = rng.normal(0, 0.01, n)
        if cid in pulsed:
            k = pulsed.index(cid)
            tr += 0.5 * np.exp(-0.5 * ((t - 300 - delay_ns * k) / 3.0) ** 2)
        ch = Channel(cid)
        ch.set_trace(tr, fs)
        st.add_channel(ch)
    return st


def test_hit_filter_pa_coincidence_passes():
    hf = stationHitFilter()
    hf.begin()
    st = _hit_station([0, 1, 2, 3])
    assert hf.run(Event(0, 0), st)
    assert hf.passed_time_checker


def test_hit_filter_noise_fails_time_but_high_hit_passes():
    hf = stationHitFilter()
    hf.begin()
    # only one strong channel: time checker fails, hit checker passes
    st = _hit_station([0])
    assert hf.run(Event(0, 0), st)
    assert not hf.passed_time_checker
    assert hf.passed_hit_checker


def test_hit_filter_pure_noise_fails():
    rng = np.random.default_rng(5)
    st = Station(11)
    n, fs = 2048, 3.2
    for cid in stationHitFilter.IN_ICE_CHANNELS:
        ch = Channel(cid)
        ch.set_trace(rng.normal(0, 0.01, n), fs)
        st.add_channel(ch)
    hf = stationHitFilter()
    hf.begin()
    # pure noise: random envelope maxima rarely coincide, no high hits
    passed = hf.run(Event(0, 0), st)
    assert not hf.passed_hit_checker
    assert passed == hf.passed_time_checker
