"""Askaryan radio-emission models (JAX, batched).

Frequency-domain parametrized models re-implemented from the reference
(NuRadioMC/SignalGen/parametrizations.py): ZHS1992 (:92-108), Alvarez2009
(:110-218) and Alvarez2000 (:220-275). The reference builds an analytic
spectrum, applies 90-degree phases, irffts and rolls the trace to the window
center. Here the roll is folded into the spectrum as a linear phase so the
entire signal chain can stay in the rFFT domain until the final irfft:

    spec_nuradio(f) = sqrt(2) * S(f) * exp(i pi/2) * exp(-2 pi i f k dt)

where ``k`` is the reference's roll offset and sqrt(2) is the framework FFT
normalization (utilities/fft.py:71). ``get_time_trace`` reproduces the
reference time traces; ``get_frequency_spectrum`` matches
SignalGen/askaryan.get_frequency_spectrum (askaryan.py:143).

All model functions are scalar-in (energy, viewing angle, ...) with a
vectorized frequency axis; vmap over showers x solutions for batches. EM/HAD
is encoded as a traced boolean ``is_em`` so mixed batches stay fused.

The stochastic Alvarez2009 EM parameter ``k_L`` is an explicit input: draw it
on the host per shower (see :func:`draw_alvarez2009_k_L`) exactly as the
reference persists it per shower for reuse across ray-tracing solutions
(simulation.py:235-242).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.utils import units
from nuradiomc_tpu.utils.constants import speed_of_light

MODELS = ("ZHS1992", "Alvarez2000", "Alvarez2009")

_C = speed_of_light  # m/ns


def _freqs(N: int, dt: float):
    return jnp.fft.rfftfreq(N, dt)


def _roll_phase(ff, k: int, dt: float):
    """Linear phase equivalent to np.roll(trace, k)."""
    return jnp.exp(-2j * jnp.pi * ff * k * dt)


def spectrum_zhs1992(energy, theta, N: int, dt: float, is_em, n_index, R):
    """ZHS1992 raw spectrum S(f) (parametrizations.py:92-108); EM/HAD identical."""
    del is_em
    ff = _freqs(N, dt)
    vv0 = ff / (0.5 * units.GHz)
    cherenkov = jnp.arccos(1.0 / n_index)
    domega = theta - cherenkov
    mag = (1.1e-7 * energy / units.TeV * vv0 / (1 + 0.4 * vv0 ** 2)
           * jnp.exp(-0.5 * (domega * vv0 / (2.4 * units.deg)) ** 2)
           * units.V / units.m / (R / units.m) / units.MHz)
    return 0.5 * mag  # ZHS fourier normalization factor


def spectrum_alvarez2000(energy, theta, N: int, dt: float, is_em, n_index, R):
    """Alvarez2000 raw spectrum S(f) (parametrizations.py:220-275)."""
    ff = _freqs(N, dt)
    fpos = jnp.where(ff > 0, ff, 1.0)
    cherenkov = jnp.arccos(1.0 / n_index)

    Elpm = 2e15 * units.eV
    dThetaEM = (2.7 * units.deg * 500 * units.MHz / fpos
                * (Elpm / (0.14 * energy + Elpm)) ** 0.3)

    epsilon = jnp.log10(energy / units.TeV)
    # piecewise epsilon dependence of the hadronic cone width
    base = 500 * units.MHz / fpos * units.deg
    dHad_0_2 = base * (2.07 - 0.33 * epsilon + 7.5e-2 * epsilon ** 2)
    dHad_2_5 = base * (1.74 - 1.21e-2 * epsilon)
    dHad_5_7 = base * (4.23 - 0.785 * epsilon + 5.5e-2 * epsilon ** 2)
    dHad_7p = (base * (4.23 - 0.785 * 7 + 5.5e-2 * 49)
               * (1 + (epsilon - 7) * 0.075))
    dThetaHad = jnp.where(
        epsilon <= 2, dHad_0_2,
        jnp.where(epsilon <= 5, dHad_2_5,
                  jnp.where(epsilon <= 7, dHad_5_7, dHad_7p)))
    had_valid = epsilon >= 0  # below 1 TeV the hadronic pulse is zero

    f0 = 1.15 * units.GHz
    E = (2.53e-7 * energy / units.TeV * ff / f0 / (1 + (fpos / f0) ** 1.44)
         * units.V / units.m / units.MHz
         * jnp.sin(theta) / jnp.sin(cherenkov))

    # missing energy factor for hadronic cascades (DOI:10.1016/S0370-2693(98)00905-8)
    f_eps = (-1.27e-2 - 4.76e-2 * (epsilon + 3) - 2.07e-3 * (epsilon + 3) ** 2
             + 0.52 * jnp.sqrt(epsilon + 3))

    # select the cone width / scale factor BEFORE the exponential: the exp
    # over [batch, F] dominates this model's cost, so evaluate it once
    dTheta = jnp.where(is_em, dThetaEM, dThetaHad)
    scale = jnp.where(is_em, 1.0, jnp.where(had_valid, f_eps, 0.0))
    spec = (E * jnp.exp(-jnp.log(2.0) * ((theta - cherenkov) / dTheta) ** 2)
            / R * scale)
    spec = jnp.where(ff > 0, spec, 0.0)
    return 0.5 * spec


def had_k_L_alvarez2009(energy):
    """Deterministic hadronic k_L parameter (parametrizations.py:140-144)."""
    return 31.25 * (energy / (1.0e15 * units.eV)) ** 3.01e-2


def em_k_L_params_alvarez2009(energy):
    """(log10_k_L_bar, sigma_k_L) of the EM k_L distribution (:146-172)."""
    log10_E0 = np.log10(energy / units.eV)
    sigma_0, delta_1, log10_E_sigma = 3.39e-2, 2.25e-2, 14.99
    sigma = np.where(log10_E0 < log10_E_sigma, sigma_0,
                     sigma_0 + delta_1 * (log10_E0 - log10_E_sigma))
    log10_k0, log10_E_LPM, gamma_0, gamma_1 = 1.52, 16.61, 5.59e-2, 0.39
    log10_bar = np.where(log10_E0 < log10_E_LPM,
                         log10_k0 + gamma_0 * (log10_E0 - log10_E_LPM),
                         log10_k0 + gamma_1 * (log10_E0 - log10_E_LPM))
    return log10_bar, sigma


def draw_alvarez2009_k_L(energy, is_em, rng: np.random.Generator):
    """Host-side per-shower k_L draw (EM: log-normal; HAD: deterministic)."""
    log10_bar, sigma = em_k_L_params_alvarez2009(np.asarray(energy))
    em_draw = 10 ** rng.normal(log10_bar, sigma)
    return np.where(np.asarray(is_em), em_draw, had_k_L_alvarez2009(np.asarray(energy)))


def spectrum_alvarez2009(energy, theta, N: int, dt: float, is_em, n_index, R, k_L):
    """Alvarez2009 raw spectrum S(f) (parametrizations.py:110-218)."""
    ff = _freqs(N, dt)
    fpos = jnp.where(ff > 0, ff, 1.0)

    E_C = 73.1 * units.MeV
    # ice density / radiation length / Moliere radius enter ONLY through
    # ratios; units.g alone is ~5.8e39 in internal units, which overflows
    # a float32 traced constant (inf -> NaN spectra; caught by the bench
    # conformance probe) — so combine them in float64 Python BEFORE tracing
    rho = 0.924 * units.g / units.cm ** 3
    X_0 = 36.08 * units.g / units.cm ** 2
    R_M = 10.57 * units.g / units.cm ** 2
    X0_over_rho = float(X_0 / rho)      # ~0.39 m
    rho_over_X0 = float(rho / X_0)      # ~2.56 / m
    rho_over_RM = float(rho / R_M)      # ~8.74 / m

    # amplitude A
    k_E_bar_had = (4.13e-16 * units.V / units.cm / units.MHz ** 2
                   * jnp.tanh((jnp.log10(energy / units.eV) - 10.60) / 2.54))
    k_E_bar_em = 4.65e-16 * units.V / units.cm / units.MHz ** 2
    k_E_bar = jnp.where(is_em, k_E_bar_em, k_E_bar_had)
    A = k_E_bar * energy / E_C * X0_over_rho * jnp.sin(theta) * ff

    # longitudinal form factor d_L
    nu_L = rho_over_X0 / k_L
    cher_cut = 1e-8
    denom = jnp.maximum(jnp.abs(1 - n_index * jnp.cos(theta)), cher_cut)
    nu_L = nu_L * _C / denom
    beta = jnp.where(is_em, 2.74, 2.57)
    d_L = 1.0 / (1 + (fpos / nu_L) ** beta)

    # lateral form factor d_R
    k_R_bar_had = 2.73 + jnp.tanh((12.92 - jnp.log10(energy / units.eV)) / 1.72)
    k_R_bar = jnp.where(is_em, 1.54, k_R_bar_had)
    nu_R = rho_over_RM / k_R_bar * _C / jnp.sqrt(n_index ** 2 - 1)
    d_R = 1.0 / (1 + (fpos / nu_R) ** 1.27)

    spec = A * d_L * d_R * 0.5 / R
    return jnp.where(ff > 0, spec, 0.0)


def _roll_samples(model: str, N: int, dt: float) -> int:
    """Trace roll offsets applied by the reference after the irfft."""
    if model == "ZHS1992":
        return int(2 * units.ns / dt)
    return N // 2  # Alvarez2000 / Alvarez2009 center the pulse


def get_frequency_spectrum(energy, theta, N: int, dt: float, is_em, n_index, R,
                           model: str, k_L=None):
    """NuRadioMC-normalized frequency spectrum of the eTheta component.

    Equivalent to SignalGen/askaryan.get_frequency_spectrum (askaryan.py:143)
    = fft.time2freq(get_time_trace). Batched by vmapping over the scalar args.
    """
    if model == "ZHS1992":
        S = spectrum_zhs1992(energy, theta, N, dt, is_em, n_index, R)
    elif model == "Alvarez2000":
        S = spectrum_alvarez2000(energy, theta, N, dt, is_em, n_index, R)
    elif model == "Alvarez2009":
        if k_L is None:
            raise ValueError("Alvarez2009 requires a per-shower k_L (draw on host)")
        S = spectrum_alvarez2009(energy, theta, N, dt, is_em, n_index, R, k_L)
    else:
        raise NotImplementedError(f"Askaryan model {model} not implemented")
    ff = _freqs(N, dt)
    k = _roll_samples(model, N, dt)
    # 90 deg phases + roll + NuRadioMC sqrt(2) rFFT normalization
    return jnp.sqrt(2.0) * S * 1j * _roll_phase(ff, k, dt)


def get_time_trace(energy, theta, N: int, dt: float, is_em, n_index, R,
                   model: str, k_L=None):
    """Time-domain Askaryan pulse (SignalGen/askaryan.get_time_trace:10)."""
    spec = get_frequency_spectrum(energy, theta, N, dt, is_em, n_index, R, model, k_L)
    # undo the NuRadioMC normalization: trace = irfft(spec / sqrt(2) * fs)
    return jnp.fft.irfft(spec / jnp.sqrt(2.0), n=N) / dt
