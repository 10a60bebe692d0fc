"""Waveform summary statistics (NuRadioReco/utilities/trace_utilities.py:420-720)."""

from __future__ import annotations

import numpy as np
from scipy import ndimage, signal as scisig, stats as scistats


def peak_to_peak_amplitudes(trace, coincidence_window_size):
    """Local peak-to-peak amplitudes via running max - running min (:420-437)."""
    return (ndimage.maximum_filter1d(trace, coincidence_window_size)
            - ndimage.minimum_filter1d(trace, coincidence_window_size))


def get_split_trace_noise_RMS(trace, segments=4, lowest=2):
    """Mean of the lowest per-segment RMS values (:440-469)."""
    rms = sorted(np.std(seg) for seg in np.array_split(np.asarray(trace), segments))
    return float(np.mean(rms[:lowest]))


def get_signal_to_noise_ratio(trace, noise_rms, window_size=3):
    """Max windowed peak-to-peak over twice the noise RMS (:472-500)."""
    if window_size < 2:
        raise ValueError(f"Window size must be greater-equal 2 (but is {window_size})")
    return float(np.max(peak_to_peak_amplitudes(trace, window_size)) / (2 * noise_rms))


def get_hilbert_envelope(trace):
    return np.abs(scisig.hilbert(trace, axis=-1))


def get_impulsivity(trace):
    """CDF-of-power concentration around the envelope maximum, scaled to
    [0, 1] (:569-605)."""
    env = get_hilbert_envelope(trace)
    closeness = np.abs(np.arange(len(env)) - np.argmax(env))
    sorted_env = env[np.argsort(closeness, kind="stable")]
    cdf = np.cumsum(sorted_env ** 2)
    cdf = cdf / cdf[-1]
    return float(max(np.mean(cdf) * 2.0 - 1.0, 0.0))


def get_entropy(trace, n_hist_bins=50):
    """Shannon entropy (bits) of the amplitude histogram (:656-685)."""
    hist, _ = np.histogram(trace, bins=n_hist_bins, density=True)
    p = hist / np.sum(hist)
    return float(scistats.entropy(p, base=2))


def get_kurtosis(trace):
    """scipy (Fisher) kurtosis of the samples (:688-703)."""
    return float(scistats.kurtosis(trace))


def get_teager_kaiser_energy(trace):
    """|TKEO|: x[i]^2 - x[i-1] x[i+1] (:706-...)."""
    trace = np.asarray(trace, dtype=float)
    tkeo = np.zeros_like(trace)
    tkeo[1:-1] = trace[1:-1] ** 2 - trace[:-2] * trace[2:]
    return np.abs(tkeo)


def get_coherent_sum(trace_set, ref_trace, use_envelope=False):
    """Coherently-summed waveform: align every trace to the reference by the
    maximum of the z-scored cross-correlation, then sum (:608-653)."""
    def process(tr):
        tr = get_hilbert_envelope(tr) if use_envelope else np.asarray(tr, float)
        return ((tr - np.mean(tr, axis=-1, keepdims=True))
                / np.std(tr, axis=-1, keepdims=True))

    ref_trace = np.asarray(ref_trace, dtype=float)
    n = len(ref_trace)
    ref_p = process(ref_trace)
    traces = np.stack([np.asarray(t, dtype=float) for t in trace_set])
    traces_p = process(traces)
    lags = scisig.correlation_lags(n, n, mode="full")
    out = ref_trace.copy()
    for tr, tr_p in zip(traces, traces_p):
        corr = scisig.correlate(ref_p, tr_p, mode="full") / n
        out += np.roll(tr, lags[np.argmax(corr)])
    return out


def get_stokes(trace_u, trace_v, window_samples=128, squeeze=True):
    """Stokes parameters I, Q, U, V of two perpendicular efield components
    from their analytic signals, optionally as a running average over
    ``window_samples`` (trace_utilities.get_stokes:342-417)."""
    import numpy as np
    from scipy import signal as scsig

    trace_u = np.asarray(trace_u)
    trace_v = np.asarray(trace_v)
    assert len(trace_u) == len(trace_v)
    h1 = scsig.hilbert(trace_u)
    h2 = scsig.hilbert(trace_v)
    uv = 2 * h1 * np.conjugate(h2)
    stokes = np.array([np.abs(h1) ** 2 + np.abs(h2) ** 2,
                       np.abs(h1) ** 2 - np.abs(h2) ** 2,
                       np.real(uv), np.imag(uv)])
    if window_samples == 1:
        return stokes
    if window_samples is None:
        window_samples = len(h1)
    stokes = np.asarray([
        scsig.convolve(s, np.ones(window_samples), mode="valid")
        for s in stokes]) / window_samples
    return np.squeeze(stokes) if squeeze else stokes
