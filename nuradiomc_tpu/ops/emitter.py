"""Artificial emitter (pulser) signal models.

Re-implementation of NuRadioMC/SignalGen/emitter.py:80-250: the analytic
models (delta_pulse, cw, square, tone_burst, gaussian, efield_delta_pulse)
as jnp ops, and a loader for measured-waveform models (idl1, hvsp1,
ARA02_calPulser, rno_*) from the reference HDF5 format when the data files
are on disk. Measured waveforms are interpolated/centered once on the host
(emitter.py:121-152) and applied as device arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.utils import fft

ANALYTIC_MODELS = ("delta_pulse", "cw", "square", "tone_burst", "gaussian",
                   "efield_delta_pulse")

# measured lab waveforms shipped with the package (emitter.py:121-131)
_DATA_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(__file__)),
    "data", "pulser_waveforms")
MEASURED_MODELS = {
    "idl1": "idl1_data.hdf5",
    "hvsp1": "hvsp1_data.hdf5",
    "ARA02_calPulser": "ARA02_Cal_data.hdf5",
    "rno_cal5C_0dB": "rno_cal5C_0dB.hdf5",
    "rno_cal5C_5dB": "rno_cal5C_5dB.hdf5",
    "rno_cal5C_10dB": "rno_cal5C_10dB.hdf5",
    "rno_cal5C_15dB": "rno_cal5C_15dB.hdf5",
    "rno_cal5C_20dB": "rno_cal5C_20dB.hdf5",
}


def get_measured_time_trace(model: str, amplitude: float, N: int, dt: float) -> np.ndarray:
    """Measured pulser waveform resampled/centered (emitter.py:121-152)."""
    import os
    if model not in MEASURED_MODELS:
        raise NotImplementedError(f"no measured waveform for emitter model {model}")
    return load_measured_waveform(os.path.join(_DATA_DIR, MEASURED_MODELS[model]),
                                  amplitude, N, dt)


def _time_axis(N: int, dt: float):
    return jnp.linspace(-(N / 2) * dt, ((N - 1) - N / 2) * dt, N)


def get_time_trace(amplitude, N: int, dt: float, model: str, *,
                   emitter_frequency=None, half_width=None, polarization=0.5):
    """Voltage (or 3-component efield) trace of an emitter model
    (emitter.get_time_trace:15-250, analytic models)."""
    time = _time_axis(N, dt)
    if model == "delta_pulse":
        return jnp.zeros(N).at[N // 2].set(amplitude)
    if model == "cw":
        return amplitude * jnp.sin(2 * jnp.pi * emitter_frequency * time)
    if model in ("square", "tone_burst"):
        box = jnp.where((time >= -half_width) & (time <= half_width), amplitude, 0.0)
        if model == "square":
            return box
        return box * jnp.sin(2 * jnp.pi * emitter_frequency * time)
    if model == "gaussian":
        sigma = half_width / jnp.sqrt(2 * jnp.log(2.0))
        trace = jnp.exp(-0.5 * ((time - 500) / sigma) ** 2)
        return amplitude * trace / jnp.max(jnp.abs(trace))
    if model == "efield_delta_pulse":
        tr = jnp.zeros((3, N))
        tr = tr.at[1, N // 2].set((1.0 - polarization) ** 0.5 * amplitude)
        tr = tr.at[2, N // 2].set(polarization ** 0.5 * amplitude)
        return tr
    raise NotImplementedError(
        f"emitter model {model} unknown or requires measured-waveform data files")


def get_frequency_spectrum(amplitude, N: int, dt: float, model: str, **kwargs):
    """NuRadioMC-normalized spectrum of the emitter trace."""
    trace = get_time_trace(amplitude, N, dt, model, **kwargs)
    return fft.time2freq(trace, 1.0 / dt)


def load_measured_waveform(path: str, amplitude: float, N: int, dt: float) -> np.ndarray:
    """Host-side loader for measured pulser waveforms (idl1/hvsp1/ARA02/rno_*
    HDF5 files with 'time'/'voltage'): cubic interpolation to the target rate,
    center the peak, normalize to ``amplitude`` (emitter.py:121-152)."""
    import h5py
    from scipy.interpolate import interp1d

    with h5py.File(path, "r") as f:
        t0 = np.asarray(f["time"])
        v0 = np.asarray(f["voltage"])
    t_new = np.linspace(t0[0], t0[-1], int((t0[-1] - t0[0]) / dt) + 1)
    v_new = interp1d(t0, v0, kind="cubic")(t_new)
    if len(v_new) > N:
        peak = int(np.argmax(np.abs(v_new)))
        v_new = np.roll(v_new, len(v_new) // 2 - peak)
        lo = len(v_new) // 2 - N // 2
        trace = v_new[lo:lo + N]
    else:
        pad = (N - len(v_new)) // 2
        adj = 1 if (N + len(v_new)) % 2 != 0 else 0
        trace = np.pad(v_new, (pad + adj, pad))
    trace = amplitude * trace / np.max(np.abs(trace))
    peak = int(np.argmax(np.abs(trace)))
    return np.roll(trace, N // 2 - peak)
