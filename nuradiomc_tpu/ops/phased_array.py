"""Phased-array (beamformed) trigger kernels (JAX, batched).

Re-implementation of the reference beamforming core
(NuRadioReco/modules/phasedarray/phasedArrayBase.py): integer-sample beam
delays from antenna depths + cable/group delays (calculate_time_delays:58-124),
coherent sums (phase_signals:183-215), sliding power sums (power_sum:217-271),
and the power-integration trigger used for the RNO-G/Gen2 deep arrays.

The beam delays are static per detector configuration, so the coherent sum is
expressed as a dense one-hot matmul: traces [..., C, N] are combined with a
precomputed beam matrix into [..., B, N] via circular gathers with static
shifts — XLA turns these into cheap rotations; no dynamic control flow.

Default beam set: 11 beams spanning +-55 degrees uniform in sin-space
(phasedArrayBase.py:14-16).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.utils.constants import speed_of_light

main_low_angle = np.deg2rad(-55.0)
main_high_angle = -main_low_angle
default_angles = np.arcsin(np.linspace(np.sin(main_low_angle),
                                       np.sin(main_high_angle), 11))


def beam_rolls(ant_z, cable_delays, phasing_angles, ref_index,
               sampling_frequency, group_delays=None) -> np.ndarray:
    """Integer roll (sample delay) per (beam, channel); host-side numpy.

    Mirrors calculate_time_delays (phasedArrayBase.py:58-124):
    delays = (z - z_ref)/c * n_ref * sin(angle) - cable - group, shifted to
    min zero, rounded to samples.
    """
    ant_z = np.asarray(ant_z, dtype=float)
    cable_delays = np.asarray(cable_delays, dtype=float)
    group_delays = np.zeros_like(ant_z) if group_delays is None else np.asarray(group_delays)
    ref_z = np.max(ant_z)
    rolls = np.zeros((len(phasing_angles), len(ant_z)), dtype=int)
    for b, angle in enumerate(np.asarray(phasing_angles)):
        delays = ((ant_z - ref_z) / speed_of_light * ref_index * np.sin(angle)
                  - cable_delays - group_delays)
        delays -= np.min(delays)
        rolls[b] = np.round(delays * sampling_frequency).astype(int)
    return rolls


def phase_signals(traces, rolls: np.ndarray):
    """Coherent beam sums (phase_signals:183-215).

    traces: [..., C, N]; rolls: static (B, C) ints -> [..., B, N].
    """
    B, C = rolls.shape
    beams = []
    for b in range(B):
        acc = 0.0
        for c in range(C):
            acc = acc + jnp.roll(traces[..., c, :], int(rolls[b, c]), axis=-1)
        beams.append(acc)
    return jnp.stack(beams, axis=-2)


def power_sum(coh_sum, window: int, step: int, averaging_divisor=None):
    """Sliding power sums over ``window`` ticks at ``step`` intervals
    (power_sum:217-271). coh_sum: [..., N] -> [..., num_frames]."""
    if averaging_divisor is None:
        averaging_divisor = window
    n = coh_sum.shape[-1]
    num_frames = int(np.floor((n - window) / step))
    sq = coh_sum * coh_sum
    c = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([zero, c], axis=-1)  # c[i] = sum of first i samples
    starts = np.arange(num_frames) * step
    power = c[..., starts + window] - c[..., starts]
    return power / averaging_divisor, num_frames


def phased_power_trigger(traces, rolls: np.ndarray, threshold,
                         window: int = 32, step: int = 16,
                         averaging_divisor=None):
    """Full power-integration phased trigger (phased_trigger, mode='power_sum').

    traces: [..., C, N].

    Returns
    -------
    triggered : bool [...]
    trigger_frame : int [...] — first frame above threshold (0 if none)
    max_power : [...] — maximum windowed power over all beams
    triggered_beams : bool [..., B]
    """
    beams = phase_signals(traces, rolls)                     # [..., B, N]
    power, _ = power_sum(beams, window, step, averaging_divisor)
    above = power > threshold                                # [..., B, F]
    triggered_beams = jnp.any(above, axis=-1)
    any_beam = jnp.any(above, axis=-2)                       # [..., F]
    triggered = jnp.any(any_beam, axis=-1)
    trigger_frame = jnp.argmax(any_beam, axis=-1)
    max_power = jnp.max(power, axis=(-2, -1))
    return triggered, trigger_frame, max_power, triggered_beams


def phased_envelope_trigger(traces, rolls: np.ndarray, threshold,
                            return_n_triggers: bool = False):
    """Beamformed Hilbert-envelope threshold trigger
    (phasedarray/digitalBeamformedEnvelopeTrigger.py:21-188, ideal-transformer
    mode): coherent beam sums -> analytic-signal envelope -> compare to an
    absolute amplitude threshold.

    traces: [..., C, N]; rolls: static (B, C) ints.
    Returns (triggered[...], first_bin[...], n_triggers[...]).
    """
    from nuradiomc_tpu.ops import trace as trace_ops

    beams = phase_signals(traces, rolls)                  # [..., B, N]
    env = trace_ops.hilbert_envelope(beams)
    over = env > threshold
    triggered = jnp.any(over, axis=(-2, -1))
    first = jnp.argmax(jnp.any(over, axis=-2), axis=-1)
    if return_n_triggers:
        # count rising edges over all beams (reference return_n_triggers)
        rising = over[..., 1:] & ~over[..., :-1]
        return triggered, first, jnp.sum(rising, axis=(-2, -1))
    return triggered, first, jnp.zeros_like(first)
