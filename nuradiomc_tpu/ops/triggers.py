"""Trigger kernels (JAX, batched).

Masked batch re-implementations of the reference trigger modules:

* simple threshold (modules/trigger/simpleThreshold.py:14-31)
* high-low threshold with coincidence window + channel majority logic
  (modules/trigger/highLowThreshold.py:13-142)
* sliding-window power integration (modules/trigger/powerIntegration.py)

The reference uses numpy stride tricks to build [frame, window] views; here
windowed any/all reductions are expressed as difference-of-cumulative
("sliding or") operations that XLA fuses into a couple of scans — no gather
materialization. All functions operate on the last (time) axis and broadcast
over arbitrary leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sliding_window_any(x_bool, window: int):
    """out[i] = any(x[i-window+1 .. i]) — zero-padded at the start.

    Matches the reference's stride-trick framing with left zero padding
    (highLowThreshold.py:52-56), so a trigger bin aligns with the last sample
    of the coincidence window.
    """
    c = jnp.cumsum(x_bool.astype(jnp.int32), axis=-1)
    shifted = jnp.pad(c[..., :-window], [(0, 0)] * (c.ndim - 1) + [(window, 0)])
    return (c - shifted) > 0


def get_threshold_triggers(trace, threshold):
    """|V| >= threshold per sample (simpleThreshold.get_threshold_triggers:14-31)."""
    return jnp.abs(trace) >= threshold


def get_high_low_triggers(trace, high_threshold, low_threshold,
                          time_coincidence, dt):
    """Bins where a high and a low crossing occur within the coincidence window
    (highLowThreshold.get_high_low_triggers:13-79, step=1 path)."""
    n_bins = max(int(round(time_coincidence / dt)), 1)
    hi = _sliding_window_any(trace >= high_threshold, n_bins)
    lo = _sliding_window_any(trace <= low_threshold, n_bins)
    return hi & lo


def majority_logic(tts, number_of_coincidences: int, time_coincidence, dt):
    """Station-level majority trigger (highLowThreshold.get_majority_logic:82-142).

    Parameters
    ----------
    tts : bool array [..., n_channels, n_samples]
        Per-channel single-channel trigger bins.

    Returns
    -------
    triggered : bool [...]
    triggered_bins : bool [..., n_samples] — bins fulfilling the coincidence
    trigger_time_idx : int [...] — first triggered bin (0 if not triggered)
    """
    n_samples = tts.shape[-1]
    n_bins = min(max(int(round(time_coincidence / dt)), 1), n_samples)
    widened = _sliding_window_any(tts, n_bins)
    count = jnp.sum(widened, axis=-2)
    ttt = count >= number_of_coincidences
    triggered = jnp.any(ttt, axis=-1)
    first = jnp.argmax(ttt, axis=-1)
    return triggered, ttt, first


def power_integration_triggers(trace, window, threshold, dt):
    """Sliding-window power sum above threshold (powerIntegration.py semantics).

    int V^2 dt over ``window`` > threshold.
    """
    n_bins = max(int(round(window / dt)), 1)
    p = trace * trace
    c = jnp.cumsum(p, axis=-1)
    shifted = jnp.pad(c[..., :-n_bins], [(0, 0)] * (c.ndim - 1) + [(n_bins, 0)])
    power = (c - shifted) * dt
    return power > threshold
