"""RNO-G data-quality / calibration modules.

* channelBlockOffsets — fit and remove LAB4D 128-sample block pedestal
  offsets (modules/RNO_G/channelBlockOffsetFitter.py:24-440).  The
  reference approximates the out-of-band chi2 fit with 5 iterations of
  scipy.optimize.minimize; the chi2 is linear in the offsets, so here it
  is solved exactly with one complex least-squares solve.
* channelGlitchDetector — test statistic on squared sample differences
  across 128-sample block seams, compared against its value on the
  "unscrambled" trace (modules/RNO_G/channelGlitchDetector.py:21-178).
* stationHitFilter — Hilbert-envelope hit-time coincidences between the
  deep in-ice channel groups (modules/RNO_G/stationHitFilter.py:17-520).
"""

from __future__ import annotations

import numpy as np
from scipy import signal as scisig

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.reco.base import register_run
from nuradiomc_tpu.utils import units

chp = par.channelParameters


# ------------------------------------------------------------------ blocks

def _block_design_matrix(frequencies_oob, n_offsets, block_size, dt, fs):
    """Analytic rFFT of a unit 'rect' offset on block j, evaluated on the
    out-of-band frequencies (channelBlockOffsetFitter.py:362-383)."""
    j = np.arange(n_offsets)
    phase = np.exp(-2j * np.pi * frequencies_oob[None, :] * dt
                   * ((j[:, None] + 0.5) * block_size - 0.5))
    amp = (np.sin(np.pi * frequencies_oob * block_size * dt)
           / np.sin(np.pi * frequencies_oob * dt))
    return (1.0 / fs * np.sqrt(2.0)) * phase * amp[None, :]


def fit_block_offsets(trace, block_size=128, sampling_rate=3.2 * units.GHz,
                      max_frequency=50 * units.MHz, mode="auto",
                      return_trace=False):
    """Per-block pedestal offsets from the out-of-band spectrum
    (fit_block_offsets, channelBlockOffsetFitter.py:259-392).

    mode: 'approximate' (block means of the low-passed trace), 'fit'
    (exact linear least squares on the <max_frequency band), or 'auto'
    (fit only when the largest offset exceeds half the trace RMS).
    """
    trace_full = np.asarray(trace, dtype=float)
    # work on whole blocks only (the reference's np.split would raise here)
    n_whole = block_size * (len(trace_full) // block_size)
    trace = trace_full[:n_whole]
    dt = 1.0 / sampling_rate
    n = len(trace)
    spectrum = np.fft.rfft(trace) / sampling_rate * np.sqrt(2.0)
    ff = np.fft.rfftfreq(n, dt)
    n_blocks = n // block_size

    mask = (ff > 0) & (ff < max_frequency)
    filtered_fft = np.where(mask, spectrum, 0.0)
    filtered = np.fft.irfft(filtered_fft, n) * sampling_rate / np.sqrt(2.0)
    a_guess = np.mean(filtered.reshape(n_blocks, block_size), axis=1)

    if mode == "approximate":
        perform_fit = False
    elif mode == "fit":
        perform_fit = True
    elif mode == "auto":
        perform_fit = np.max(np.abs(a_guess)) > 0.5 * np.std(trace)
    else:
        raise ValueError(f"invalid mode {mode!r}")

    if not perform_fit:
        block_offsets = a_guess + np.mean(trace)
    else:
        # the fit is degenerate under a global shift: drop the last block
        M = _block_design_matrix(ff[mask], n_blocks - 1, block_size, dt,
                                 sampling_rate)
        # subtracting the last block's template from each column accounts
        # for a_j -> a_j - a_last reparameterization implicitly: the
        # out-of-band spectrum of a constant is zero, so the constraint is
        # already in the design
        # offsets are real: solve the real-stacked least squares
        A = np.vstack([M.T.real, M.T.imag])
        b = np.concatenate([spectrum[mask].real, spectrum[mask].imag])
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        block_offsets = np.zeros(n_blocks)
        block_offsets[:-1] = sol
        block_offsets += np.mean(trace) - np.mean(block_offsets)

    if return_trace:
        out = trace_full.copy()
        out[:n_whole] -= np.repeat(block_offsets, block_size)
        return block_offsets, out
    return block_offsets


class channelBlockOffsets:
    """Add / remove block offsets on station channels
    (channelBlockOffsetFitter.py:24-257)."""

    def __init__(self, block_size=128, max_frequency=51 * units.MHz):
        self.block_size = block_size
        self._max_frequency = max_frequency

    def begin(self):
        pass

    def add_offsets(self, event, station, offsets=1 * units.mV,
                    channel_ids=None, rng=None):
        """Inject random (gaussian, sigma=offsets) or explicit offsets."""
        rng = rng or np.random.default_rng()
        for ch in station.iter_channels(channel_ids):
            tr = np.asarray(ch.get_trace())
            n_blocks = len(tr) // self.block_size
            if np.isscalar(offsets):
                add = rng.normal(0, offsets, n_blocks)
            else:
                add = np.asarray(offsets)
            ch.set_parameter(
                chp.block_offsets,
                np.asarray(ch.get_parameter(chp.block_offsets))
                + add if ch.has_parameter(chp.block_offsets) else add)
            ch.set_trace(tr + np.repeat(add, self.block_size),
                         ch.get_sampling_rate())

    def remove_offsets(self, event, station, mode="auto", channel_ids=None):
        for ch in station.iter_channels(channel_ids):
            trace = np.asarray(ch.get_trace())
            if mode == "median":
                # per-block medians, no spectral fit
                # (channelBlockOffsetFitter.remove_offsets:175-177)
                n_whole = self.block_size * (len(trace) // self.block_size)
                offsets = np.median(
                    trace[:n_whole].reshape(-1, self.block_size), axis=1)
                out = trace.copy()
                out[:n_whole] -= np.repeat(offsets, self.block_size)
            else:
                offsets, out = fit_block_offsets(
                    trace, self.block_size,
                    ch.get_sampling_rate(), self._max_frequency, mode=mode,
                    return_trace=True)
            ch.set_parameter(chp.block_offsets, offsets)
            ch.set_trace(out, ch.get_sampling_rate())

    @register_run()
    def run(self, event, station, det=None, mode="auto", channel_ids=None):
        self.remove_offsets(event, station, mode=mode, channel_ids=channel_ids)

    def end(self):
        pass


# ------------------------------------------------------------------ glitches

LAB4D_BLOCK = 64
LAB4D_READOUT = 2048


def seam_diff_sq(trace, block_size=LAB4D_BLOCK):
    """Sum of squared differences across 2*block seams
    (channelGlitchDetector.diff_sq:84-97)."""
    trace = np.asarray(trace)
    two = 2 * block_size
    n_chunks = len(trace) // two - 1
    k = np.arange(n_chunks)
    left = trace[k * two + block_size - 1]
    right = trace[k * two + block_size]
    return float(np.sum((left - right) ** 2))


def unscramble(trace, block_size=LAB4D_BLOCK, readout_size=LAB4D_READOUT):
    """Candidate de-scrambling of the LAB4D readout: even blocks move
    forward, odd blocks move back by two blocks
    (channelGlitchDetector.unscramble:99-126)."""
    trace = np.asarray(trace)
    new = np.zeros_like(trace)
    two = 2 * block_size
    for i in range(len(trace) // block_size):
        s, e = i * block_size, (i + 1) * block_size
        if i % 2 == 0:
            new[(s + two) % readout_size:(e + two) % readout_size or None] = trace[s:e]
        elif i > 1:
            new[(s - two) % readout_size:(e - two) % readout_size] = trace[s:e]
    new[0:block_size] = 0
    return new


class channelGlitchDetector:
    """Flags channels whose seam statistic improves under unscrambling
    (channelGlitchDetector.py:21-178)."""

    def __init__(self, cut_value=0.0, block_size=LAB4D_BLOCK,
                 readout_size=LAB4D_READOUT):
        self.cut = cut_value
        self.block_size = block_size
        self.readout_size = readout_size

    def begin(self):
        pass

    @register_run()
    def run(self, event, station, det=None):
        for ch in station.iter_channels():
            tr = np.asarray(ch.get_trace())
            ts = (seam_diff_sq(tr, self.block_size)
                  - seam_diff_sq(unscramble(tr, self.block_size,
                                            self.readout_size),
                                 self.block_size)) / np.var(tr)
            ch.set_parameter(chp.glitch, bool(ts > self.cut))

    def end(self):
        pass


# ------------------------------------------------------------------ hits

class stationHitFilter:
    """Envelope hit-time coincidence filter for the deep RNO-G channels
    (stationHitFilter.py:17-520).  Group 0 is the phased array (0-3);
    passing requires >=2 connected coincident PA pairs, or 1 PA pair plus
    a pair in another group; otherwise a single high hit
    (envelope max > multiplier * noise RMS) passes the event."""

    IN_ICE_CHANNELS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 21, 22, 23]
    GROUPS = ([0, 1, 2, 3], [9, 10], [23, 22], [8, 4])
    PA_PAIRS = ([0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3])

    def __init__(self, time_window=10.0 * units.ns, threshold_multiplier=6.5,
                 select_trigger=None):
        self._dT = time_window
        self._mult = threshold_multiplier
        self._select_trigger = select_trigger
        self.passed_time_checker = None
        self.passed_hit_checker = None

    def begin(self, log_level=None):
        pass

    @staticmethod
    def _map(cid):
        """Channel id -> index in the in-ice ordering (:84-104)."""
        return cid - 9 if cid >= 21 else cid

    def apply(self, traces, times, noise_rms=None):
        """traces/times: (15, N) arrays in in-ice channel order."""
        traces = np.asarray(traces, dtype=float)
        envelopes = np.abs(scisig.hilbert(traces, axis=-1))
        idx = np.argmax(envelopes, axis=-1)
        t_hit = np.asarray(times)[np.arange(len(traces)), idx]
        if noise_rms is None:
            split = traces[:, :20 * (traces.shape[1] // 20)]
            noise_rms = np.median(
                np.std(split.reshape(len(traces), 20, -1), axis=-1), axis=-1)

        # time checker (:106-162)
        seq = np.zeros(3, dtype=bool)
        pa_pair_ok = []
        d_mult = np.diff(np.asarray(self.PA_PAIRS)).ravel()
        for k, (i, j) in enumerate(self.PA_PAIRS):
            ok = abs(t_hit[j] - t_hit[i]) <= d_mult[k] * self._dT
            pa_pair_ok.append(ok)
            if ok:
                seq[i] = True
        passed = bool(np.sum(seq) >= 2)
        if not passed and np.any(seq):
            for group in self.GROUPS[1:]:
                i, j = self._map(group[0]), self._map(group[1])
                if abs(t_hit[j] - t_hit[i]) <= self._dT:
                    passed = True
                    break
        self.passed_time_checker = passed

        # hit checker (:164-180)
        over = np.max(envelopes, axis=-1) > self._mult * np.asarray(noise_rms)
        self.passed_hit_checker = bool(np.any(over))

        return passed or (not passed and self.passed_hit_checker)

    @register_run()
    def run(self, evt, station, det=None, noise_RMS_all=None):
        if self._select_trigger is not None:
            trig = station.get_first_trigger()
            if trig is None or trig.get_name() != self._select_trigger:
                return True
        chans = [(c.get_id(), c) for c in station.iter_channels()
                 if c.get_id() in self.IN_ICE_CHANNELS]
        chans.sort(key=lambda t: t[0])
        traces = np.array([np.asarray(c.get_trace()) for _, c in chans])
        times = np.array([np.asarray(c.get_times()) for _, c in chans])
        rms = None
        if noise_RMS_all is not None:
            rms = np.asarray(noise_RMS_all)[self.IN_ICE_CHANNELS]
        return self.apply(traces, times, rms)

    def end(self):
        pass


# ---------------------------------------------------------- coherent sums

class stationCoherentlySummedWaveforms:
    """SNR / impulsivity / entropy / kurtosis of the coherently-summed
    waveform (RNO_G/stationCoherentlySummedWaveforms.py:15-143)."""

    def begin(self, coincidence_window_size=6 * units.ns, pad_length=500,
              channel_ids=(0, 1, 2, 3)):
        self._window = coincidence_window_size
        self._pad = pad_length
        self._channel_ids = list(channel_ids)

    @register_run()
    def run(self, evt, station, det=None, ref_ch_id=0, use_envelope=True):
        from nuradiomc_tpu.utils import trace_stats as ts
        rnog = par.stationParametersRNOG

        ref = station.get_channel(ref_ch_id)
        ref_trace = np.asarray(ref.get_trace())
        others = [np.asarray(ch.get_trace())
                  for ch in station.iter_channels(self._channel_ids)
                  if ch.get_id() != ref_ch_id]
        window_bins = int(round(self._window * ref.get_sampling_rate()))
        csw = ts.get_coherent_sum(others, ref_trace, use_envelope)
        rms = ts.get_split_trace_noise_RMS(csw, segments=4, lowest=2)
        station[rnog.coherent_snr] = ts.get_signal_to_noise_ratio(
            csw, rms, window_size=max(window_bins, 2))
        station[rnog.coherent_impulsivity] = ts.get_impulsivity(csw)
        station[rnog.coherent_entropy] = ts.get_entropy(csw)
        station[rnog.coherent_kurtosis] = ts.get_kurtosis(csw)
        return csw

    def end(self):
        pass
