"""Frequency-domain filter responses.

Mirrors NuRadioReco/utilities/signal_processing.get_filter_response:237-330.
Filter responses are static per detector configuration, so they are computed
once on the host (scipy analog prototypes, exactly as the reference) and
shipped to the device as complex arrays — the device-side "filter" is a single
fused multiply in the rFFT-domain signal chain.
"""

from __future__ import annotations

import numpy as np
from scipy import signal


def get_filter_response(frequencies: np.ndarray, passband, filter_type: str,
                        order: int = 2, rp=None, roll_width=None) -> np.ndarray:
    """Complex filter response on ``frequencies`` (internal units, GHz)."""
    frequencies = np.asarray(frequencies, dtype=float)

    if filter_type == "rectangular":
        mask = (passband[0] <= frequencies) & (frequencies <= passband[1])
        return np.where(mask, 1.0 + 0j, 0.0 + 0j)

    if passband[0] == 0:
        scipy_args = [passband[1], "lowpass"]
    else:
        scipy_args = [list(passband), "bandpass"]

    if filter_type in ("butter", "butterabs"):
        f = np.zeros_like(frequencies, dtype=complex)
        mask = frequencies > 0
        b, a = signal.butter(order, *scipy_args, analog=True)
        _, h = signal.freqs(b, a, frequencies[mask])
        f[mask] = h
        return np.abs(f).astype(complex) if filter_type == "butterabs" else f

    if filter_type == "cheby1":
        f = np.zeros_like(frequencies, dtype=complex)
        mask = frequencies > 0
        b, a = signal.cheby1(order, rp, *scipy_args, analog=True)
        _, h = signal.freqs(b, a, frequencies[mask])
        f[mask] = h
        return f

    if filter_type == "gaussian_tapered":
        f = np.ones_like(frequencies, dtype=complex)
        f[frequencies < passband[0]] = 0.0
        f[frequencies > passband[1]] = 0.0
        gaussian_weights = signal.windows.gaussian(
            len(frequencies), int(round(roll_width / (frequencies[1] - frequencies[0]))))
        f = np.convolve(np.abs(f), gaussian_weights / np.sum(gaussian_weights), mode="same")
        return f.astype(complex)

    raise NotImplementedError(f"filter type {filter_type} not implemented")


def chain_response(frequencies: np.ndarray, chain) -> np.ndarray:
    """Product of a list of (passband, filter_type, kwargs) filter stages.

    This is the declarative replacement for the reference's
    ``_detector_simulation_filter_amp`` hook + get_filter provenance replay
    (simulation.py:1302-1315): the signal chain is declared once, its combined
    response is precomputed here.
    """
    resp = np.ones_like(frequencies, dtype=complex)
    for passband, filter_type, kwargs in chain:
        resp *= get_filter_response(frequencies, passband, filter_type, **kwargs)
    return resp


def bandwidth_integral(frequencies: np.ndarray, response: np.ndarray) -> float:
    """int |H(f)|^2 df — the effective noise bandwidth used for the thermal
    Vrms calibration (simulation.py:1302-1315, trapezoidal as in np.trapz)."""
    return float(np.trapezoid(np.abs(response) ** 2, frequencies))
