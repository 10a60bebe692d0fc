"""ADC models (JAX, batched).

Re-implementation of the reference analogToDigitalConverter quantization
(NuRadioReco/modules/analogToDigitalConverter.py:14-130): a perfect
floor/ceiling flash comparator with saturation, LSB = V_range / (2^n - 1).
Batch-polymorphic over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def perfect_comparator(trace, adc_n_bits: int, adc_voltage_range,
                       output: str = "voltage", mode: str = "floor"):
    """Quantize a voltage trace (perfect_comparator:14-90).

    adc_voltage_range: (v_min, v_max) full-scale range.
    """
    v_min, v_max = adc_voltage_range
    lsb = (v_max - v_min) / (2 ** adc_n_bits - 1)
    fn = jnp.floor if mode == "floor" else jnp.ceil
    counts = fn((trace - v_min) / lsb).astype(jnp.int32)
    counts = jnp.clip(counts, 0, 2 ** adc_n_bits - 1)  # apply_saturation (:91-130)
    counts = counts + fn(jnp.asarray(v_min / lsb)).astype(jnp.int32)
    if output == "voltage":
        return lsb * counts.astype(trace.dtype)
    if output == "counts":
        return counts
    raise ValueError(f"unknown ADC output {output}")


def perfect_floor_comparator(trace, adc_n_bits, adc_voltage_range, output="voltage"):
    return perfect_comparator(trace, adc_n_bits, adc_voltage_range, output, "floor")


def perfect_ceiling_comparator(trace, adc_n_bits, adc_voltage_range, output="voltage"):
    return perfect_comparator(trace, adc_n_bits, adc_voltage_range, output, "ceil")


def symmetric_range(noise_vrms, noise_n_lsb: int, adc_n_bits: int):
    """ADC range chosen so the noise RMS spans ``noise_n_lsb`` counts — the
    common convention for trigger-threshold studies (ARA/RNO-G FLOWER)."""
    lsb = noise_vrms / noise_n_lsb
    half = lsb * 2 ** (adc_n_bits - 1)
    return (-half, half)
