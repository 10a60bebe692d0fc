"""Data-cleaning and readout modules.

* channelStopFilter: Tukey-window taper + zero padding (modules/
  channelStopFilter.py:26-55) — removes the wrap-around "stop" artifact of
  ARIANNA-style ring buffers.
* channelCWNotchFilter: notch out continuous-wave lines found as narrow peaks
  in the averaged spectrum (modules/channelCWNotchFilter.py semantics).
* channelSinewaveSubtraction: fit & subtract a single CW contamination line
  (modules/channelSinewaveSubtraction.py semantics).
* channelReadoutWindowCutter: cut traces to the detector readout window
  around the trigger time using per-channel pre-trigger times
  (modules/channelReadoutWindowCutter.py:28-120).
* channelTimeWindow: zero/keep configurable time windows
  (modules/channelTimeWindow.py).
"""

from __future__ import annotations

import numpy as np
from scipy import signal as scsig

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.reco.base import register_run
from nuradiomc_tpu.utils import units


class channelStopFilter:
    def begin(self):
        pass

    @register_run()
    def run(self, evt, station, det=None, filter_size=0.1,
            prepend=128 * units.ns, append=128 * units.ns):
        for channel in station.iter_channels():
            trace = np.array(channel.get_trace())
            fs = channel.get_sampling_rate()
            trace *= scsig.windows.tukey(len(trace), filter_size)
            n_pre = int(round(prepend * fs))
            n_app = int(round(append * fs))
            trace = np.concatenate([np.zeros(n_pre), trace, np.zeros(n_app)])
            if len(trace) % 2 == 1:
                trace = trace[:-1]
            channel.set_trace(
                trace, fs,
                trace_start_time=channel.get_trace_start_time() - n_pre / fs)

    def end(self):
        pass


class channelCWNotchFilter:
    """Detect narrow spectral lines above the local median and notch them."""

    def begin(self, threshold_db: float = 10.0, notch_halfwidth_bins: int = 2):
        self._threshold = 10 ** (threshold_db / 10.0)
        self._hw = notch_halfwidth_bins

    @register_run()
    def run(self, evt, station, det=None):
        for channel in station.iter_channels():
            spec = np.array(channel.get_frequency_spectrum())
            power = np.abs(spec) ** 2
            # local median over a sliding window as the continuum estimate
            med = scsig.medfilt(power, kernel_size=31)
            peaks = np.where(power > self._threshold * np.maximum(med, 1e-300))[0]
            for p in peaks:
                lo = max(p - self._hw, 0)
                hi = min(p + self._hw + 1, len(spec))
                spec[lo:hi] = 0.0
            channel.set_frequency_spectrum(spec, channel.get_sampling_rate())

    def end(self):
        pass


class channelSinewaveSubtraction:
    """Fit amplitude/phase of a known-frequency sinusoid and subtract it."""

    def begin(self, cw_frequency):
        self._freq = cw_frequency

    @register_run()
    def run(self, evt, station, det=None):
        for channel in station.iter_channels():
            trace = np.array(channel.get_trace())
            t = channel.get_times()
            c = np.cos(2 * np.pi * self._freq * t)
            s = np.sin(2 * np.pi * self._freq * t)
            A = np.stack([c, s], axis=1)
            coeffs, *_ = np.linalg.lstsq(A, trace, rcond=None)
            channel.set_trace(trace - A @ coeffs, channel.get_sampling_rate(),
                              trace_start_time=channel.get_trace_start_time())

    def end(self):
        pass


class channelTimeWindow:
    """Zero the trace outside (or inside) given time windows."""

    def begin(self):
        pass

    @register_run()
    def run(self, evt, station, det=None, window=None, around_pulse=False,
            window_function="rectangular"):
        for channel in station.iter_channels():
            trace = np.array(channel.get_trace())
            times = channel.get_times()
            mask = (times >= window[0]) & (times <= window[1])
            trace[~mask] = 0.0
            channel.set_trace(trace, channel.get_sampling_rate(),
                              trace_start_time=channel.get_trace_start_time())

    def end(self):
        pass


class channelReadoutWindowCutter:
    """Cut each channel to its detector readout window around the trigger
    time (channelReadoutWindowCutter.py:28-120)."""

    def begin(self):
        pass

    @register_run()
    def run(self, evt, station, det):
        # primary trigger = earliest triggered trigger
        triggers = [t for t in station.get_triggers().values() if t.has_triggered()]
        if not triggers:
            return
        primary = min(triggers, key=lambda t: t.get_trigger_time())
        trigger_time = primary.get_trigger_time()

        for channel in station.iter_channels():
            cid = channel.get_id()
            n_samples = det.get_number_of_samples(station.get_id(), cid)
            det_fs = det.get_sampling_frequency(station.get_id(), cid)
            fs = channel.get_sampling_rate()
            n_cut = int(round(n_samples * fs / det_fs))
            pre = primary.get_pre_trigger_time_channel(cid)

            window_start = trigger_time - pre
            i0 = int(round((window_start - channel.get_trace_start_time()) * fs))
            trace = channel.get_trace()
            out = np.zeros(n_cut)
            lo = max(i0, 0)
            hi = min(i0 + n_cut, len(trace))
            if hi > lo:
                out[lo - i0:hi - i0] = trace[lo:hi]
            channel.set_trace(out, fs, trace_start_time=window_start)

    def end(self):
        pass
