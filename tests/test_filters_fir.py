"""FIR and hann_tapered filter types (channelBandPassFilter.py:182-290).

The module-level path must be scipy-identical to the reference's time-domain
application (firwin scale=False taps + lfilter + group-delay roll; half-Hann
trace taper); the declarative chain response must equal the linear-phase
freqz of the same taps.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy import signal as scisig

from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.ops import filters as filter_ops
from nuradiomc_tpu.reco.channel_processing import (channelBandPassFilter,
                                                   half_hann_window)

REFERENCE = "/root/reference"


def _run_module(trace, fs, **kwargs):
    evt = Event(0, 0)
    st = Station(1)
    ch = Channel(0)
    ch.set_trace(trace.copy(), fs)
    st.add_channel(ch)
    evt.set_station(st)
    mod = channelBandPassFilter()
    mod.begin()
    mod.run(evt, st, None, **kwargs)
    return np.asarray(st.get_channel(0).get_trace())


@pytest.mark.parametrize("filter_type,passband", [
    ("FIR", (0.08, 0.3)),                 # bandpass, hamming default
    ("FIR hann", (0, 0.25)),              # lowpass
    ("FIR kaiser 8", (0.1, None)),        # highpass, kaiser window
    ("FIR", (0.3, 0.1)),                  # bandstop (inverted passband)
])
def test_fir_module_matches_scipy(filter_type, passband):
    """Module FIR == firwin(scale=False) + lfilter + np.roll(-ndelay),
    exactly the reference's _apply_filter FIR branch (:247-290)."""
    rng = np.random.default_rng(5)
    fs = 1.0
    tr = rng.standard_normal(256)
    got = _run_module(tr, fs, passband=passband, filter_type=filter_type,
                      order=30)

    taps = filter_ops.fir_taps(passband, filter_type, 30, fs)
    expected = np.roll(scisig.lfilter(taps, [1.0], tr), -((len(taps) - 1) // 2))
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-12)


def test_hann_tapered_module_is_window_only():
    """hann_tapered multiplies the trace by the half-Hann window and applies
    NO band (reference _apply_filter:242-246)."""
    rng = np.random.default_rng(6)
    tr = rng.standard_normal(200)
    got = _run_module(tr, 1.0, passband=(0.05, 0.3),
                      filter_type="hann_tapered", half_hann_percent=0.13)
    expected = tr * half_hann_window(200, 0.13)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-14)


def test_fir_chain_response_is_linear_phase_freqz():
    """Declarative-chain FIR response == freqz of the taps with the
    (N-1)/2-sample group delay removed (the np.roll compensation)."""
    fs = 2.0
    order = 24
    passband = (0.1, 0.5)
    ff = np.fft.rfftfreq(512, 1 / fs)
    resp = filter_ops.get_filter_response(ff, passband, "FIR", order=order,
                                          fs=fs)
    taps = filter_ops.fir_taps(passband, "FIR", order, fs)
    _, h = scisig.freqz(taps, worN=2 * np.pi * ff / fs)
    ndelay = (len(taps) - 1) // 2
    expected = h * np.exp(2j * np.pi * ff / fs * ndelay)
    np.testing.assert_allclose(resp, expected, rtol=0, atol=1e-12)


def test_fir_circular_equals_time_domain_interior():
    """Applying the chain FIR response in the rFFT domain equals the
    reference's time-domain application except in the first/last ndelay
    samples (circular vs linear convolution edge)."""
    rng = np.random.default_rng(7)
    fs = 1.0
    n = 512
    tr = rng.standard_normal(n)
    order = 30
    passband = (0.08, 0.3)

    taps = filter_ops.fir_taps(passband, "FIR", order, fs)
    ndelay = (len(taps) - 1) // 2
    ref = np.roll(scisig.lfilter(taps, [1.0], tr), -ndelay)

    ff = np.fft.rfftfreq(n, 1 / fs)
    resp = filter_ops.get_filter_response(ff, passband, "FIR", order=order,
                                          fs=fs)
    mine = np.fft.irfft(np.fft.rfft(tr) * resp, n=n)
    np.testing.assert_allclose(mine[ndelay:-ndelay], ref[ndelay:-ndelay],
                               rtol=0, atol=1e-10)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_fir_and_hann_match_reference_module(tmp_path):
    """Run the REFERENCE channelBandPassFilter on the same trace in a
    subprocess and compare sample-by-sample."""
    if not os.path.isdir("/tmp/refstubs"):
        subprocess.run([sys.executable, "tests/golden/make_refstubs.py"],
                       check=True, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    rng = np.random.default_rng(11)
    tr = rng.standard_normal(256)
    np.save(tmp_path / "trace.npy", tr)

    script = f"""
import numpy as np
from NuRadioReco.framework.event import Event
from NuRadioReco.framework.station import Station
from NuRadioReco.framework.channel import Channel
import NuRadioReco.modules.channelBandPassFilter as cbf

tr = np.load({str(tmp_path / 'trace.npy')!r})
outs = []
for kwargs in [
    dict(passband=[0.08, 0.3], filter_type="FIR", order=30),
    dict(passband=[0.08, 0.3], filter_type="FIR kaiser 8", order=24),
    dict(passband=[0.05, 0.3], filter_type="hann_tapered",
         half_hann_percent=0.13),
]:
    evt = Event(0, 0)
    st = Station(1)
    ch = Channel(0)
    ch.set_trace(tr.copy(), 1.0)
    st.add_channel(ch)
    evt.set_station(st)
    mod = cbf.channelBandPassFilter()
    mod.begin()
    mod.run(evt, st, None, **kwargs)
    outs.append(np.asarray(st.get_channel(0).get_trace()))
np.save({str(tmp_path / 'ref_out.npy')!r}, np.stack(outs))
print("REF-FILTER-OK")
"""
    env = dict(os.environ, PYTHONPATH="/tmp/refstubs:" + REFERENCE)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True)
    assert "REF-FILTER-OK" in r.stdout, (r.stdout[-2000:], r.stderr[-3000:])
    ref = np.load(tmp_path / "ref_out.npy")

    mine = np.stack([
        _run_module(tr, 1.0, passband=(0.08, 0.3), filter_type="FIR",
                    order=30),
        _run_module(tr, 1.0, passband=(0.08, 0.3), filter_type="FIR kaiser 8",
                    order=24),
        _run_module(tr, 1.0, passband=(0.05, 0.3), filter_type="hann_tapered",
                    half_hann_percent=0.13),
    ])
    np.testing.assert_allclose(mine, ref, rtol=0, atol=1e-12)
