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


def _center_component(v: np.ndarray, N: int) -> np.ndarray:
    """Center a measured component on the grid the reference's way
    (emitter.py:205-237): longer traces are peak-rolled to the middle then
    truncated around it; shorter ones zero-padded symmetrically (+1 left
    for odd parity); finally the peak is rolled exactly to N//2."""
    if len(v) > N:
        peak = int(np.flatnonzero(np.abs(v) == np.max(np.abs(v)))[0])
        v = np.roll(v, len(v) // 2 - peak)
        lo = int(len(v) / 2 - N / 2)
        out = v[lo:lo + N]
    else:
        pad = int((N - len(v)) / 2)
        adj = 1 if (N + len(v)) % 2 != 0 else 0
        out = np.pad(v, (pad + adj, pad))
    peak = int(np.flatnonzero(np.abs(out) == np.max(np.abs(out)))[0])
    return np.roll(out, N // 2 - peak)


def load_spice_archive(path: str) -> dict:
    """Load the SPICE pulse archive (SPice_pulses.xz: lzma-compressed pickle
    with 'efields' {launch_angle_deg: [pulse (2, n), ...]} and
    'sampling_rate'; emitter.py:159-170). The published archive ships with
    the reference under SignalProp/examples/birefringence_examples/
    extra_files/ — drop it into nuradiomc_tpu/data/ or pass an explicit
    path."""
    import lzma
    import os
    import pickle

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"SPICE pulse archive not found at {path}. Download "
            "SPice_pulses.xz (reference: SignalProp/examples/"
            "birefringence_examples/extra_files/SPice_pulses.xz) and drop "
            "it there, or pass spice_pulses_path=.")
    with lzma.open(path, "r") as f:
        return pickle.load(f)


def spice_unit_specs(archive: dict, N: int, dt: float, iN=0, rng=None):
    """Per-launch-angle unit-amplitude (eTheta, ePhi) spectra of the SPICE
    pulser (emitter.py:159-250, model 'efield_idl1_spice').

    The reference picks ONE measured pulse per efield call (kwargs iN, or a
    random draw), Fourier-resamples it to the target rate, centers each
    component's peak at N//2 and scales by the event amplitude. Amplitude
    is linear, so everything per-angle is precomputed here once:
    returns (angles_rad [A] ascending, unit_specs [A, 2, F] complex) with
    the NuRadioMC rfft normalization (time2freq). ``iN`` selects the pulse
    (int, or per-angle via ``rng.integers`` when a numpy Generator is
    given — one draw per angle per batch instead of the reference's one
    draw per efield; document in run provenance when it matters).
    """
    from scipy.signal import resample as _fft_resample

    from nuradiomc_tpu.utils import units as u

    sr = float(archive["sampling_rate"])
    keys = sorted(archive["efields"].keys(), key=float)
    angles, specs = [], []
    for key in keys:
        pulses = archive["efields"][key]
        i = int(rng.integers(0, len(pulses))) if rng is not None else int(iN)
        if i >= len(pulses):
            raise ValueError(f"the selected pulse iN {i} is out of range. "
                             f"Only {len(pulses)} pulses at angle {key}")
        th = np.asarray(pulses[i][0], float)
        ph = np.asarray(pulses[i][1], float)
        # ElectricField.resample: FFT resampling to 1/dt, even length
        n_out = int(round(len(th) * (1.0 / dt) / sr))
        if n_out % 2 != 0:
            n_out += 1
        th = _fft_resample(th, n_out)
        ph = _fft_resample(ph, n_out)
        comp = np.stack([_center_component(th, N), _center_component(ph, N)])
        angles.append(float(key) * u.deg)
        specs.append(np.fft.rfft(comp, axis=-1) * dt * np.sqrt(2.0))
    return np.asarray(angles), np.asarray(specs)


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
