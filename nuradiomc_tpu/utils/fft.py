"""Power-conserving rFFT conventions (JAX).

Implements the same normalization contract as the reference framework
(NuRadioReco/utilities/fft.py:55-92): real-valued time traces are transformed
with ``rfft / fs * sqrt(2)`` so that

    sum(trace**2) * dt == sum(|spectrum|**2) * df

holds (approximately; the DC and Nyquist bins also carry the sqrt(2) factor).
All functions operate on the last axis and are batch-polymorphic, so they can
be vmapped/jitted freely over [event x station x channel] leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SQRT2 = 1.4142135623730951


def freqs(num_samples: int, sampling_rate: float) -> jnp.ndarray:
    """Frequency bins of the rFFT for a trace of ``num_samples`` samples."""
    return jnp.fft.rfftfreq(num_samples, d=1.0 / sampling_rate)


def freqs_np(num_samples: int, sampling_rate: float) -> np.ndarray:
    """Host-side (numpy) frequency bins; useful at pipeline build time."""
    return np.fft.rfftfreq(num_samples, d=1.0 / sampling_rate)


def time2freq(trace: jnp.ndarray, sampling_rate: float) -> jnp.ndarray:
    """Forward rFFT with power-conserving normalization (V -> V/GHz).

    The extra sqrt(2) accounts for the omitted negative frequencies.
    """
    return jnp.fft.rfft(trace, axis=-1) / sampling_rate * _SQRT2


def freq2time(spectrum: jnp.ndarray, sampling_rate: float, n: int | None = None) -> jnp.ndarray:
    """Inverse rFFT with power-conserving normalization (V/GHz -> V)."""
    return jnp.fft.irfft(spectrum, axis=-1, n=n) * sampling_rate / _SQRT2
