"""Pin the expected triggered counts for bench.py's conformance probe.

Runs each deterministic bench configuration for ONE unperturbed step on the
CPU backend (the trusted path: the same code the golden e2e tests validate
against the reference) and prints the triggered counts to pin as
``bench.EXPECTED_COUNTS``.  The on-chip bench then asserts its own
single-step count equals the pinned value, turning every driver bench run
into a chip-side Mosaic/XLA conformance probe (VERDICT r3 weak #2).

The phased-array value is PRNG-implementation dependent (hardware rbg bits
differ between CPU and TPU), so bench.py only band-asserts that mode; the
CPU value printed here is the band center.

Usage:  python tools/pin_bench_conformance.py [veff xla bf16 raytrace pa]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def count_veff(placement_impl, matmul_dtype):
    import jax.numpy as jnp

    from bench import _veff_settings_and_inputs
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    # the EXACT bench configuration (incl. trigger_impl + band_limit_eps)
    settings, ch, batch = _veff_settings_and_inputs(placement_impl,
                                                    matmul_dtype)

    @jax.jit
    def step(b):
        out = simulate_batch(b, ch, settings)
        return jnp.sum(out.triggered.astype(jnp.int32))

    return int(step(batch))


def count_raytrace():
    import jax.numpy as jnp
    import numpy as np

    from nuradiomc_tpu.models import ice as ice_models
    from nuradiomc_tpu.ops import raytrace

    ice = ice_models.southpole_simple
    n_pairs = 262144
    rng = np.random.default_rng(3)
    rr = rng.triangular(50.0, 3000.0, 3000.0, n_pairs)
    x1y = np.zeros(n_pairs, np.float32)
    x1z = rng.uniform(-3000.0, 0.0, n_pairs).astype(np.float32)
    x2y = rr.astype(np.float32)
    x2z = np.full(n_pairs, -5.0, np.float32)

    @jax.jit
    def step(a, b, c, d):
        sols = jax.vmap(lambda w, x, y, z: raytrace.find_solutions(
            w, x, y, z, ice, n_bisect=28))(a, b, c, d)
        return jnp.sum(sols.mask.astype(jnp.int32))

    return int(step(x1y, x1z, x2y, x2z))


def count_pa(noiseless=False):
    import dataclasses

    import jax.numpy as jnp

    from bench import _pa_setup
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    settings, ch, batch, base_key = _pa_setup(16384)
    # the EXACT bench configuration (band_limit_eps=1e-3, bench_pa)
    settings = dataclasses.replace(settings, band_limit_eps=1e-3)
    if noiseless:
        settings = dataclasses.replace(settings, add_noise=False)

        @jax.jit
        def probe(b):
            out = simulate_batch(b, ch, settings)
            return jnp.sum(out.triggered.astype(jnp.int32))
    else:
        @jax.jit
        def probe(b):
            out = simulate_batch(b, ch, settings,
                                 noise_key=jax.random.fold_in(base_key, 0))
            return jnp.sum(out.triggered.astype(jnp.int32))

    return int(probe(batch))


def count_gen2():
    import jax.numpy as jnp

    from bench import _gen2_setup
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    settings, chps, batch = _gen2_setup(1024)

    @jax.jit
    def probe(b):
        acc = jnp.int32(0)
        for chp in chps:
            out = simulate_batch(b, chp, settings)
            acc = acc + jnp.sum(out.triggered.astype(jnp.int32))
        return acc

    return int(probe(batch))


def main():
    modes = sys.argv[1:] or ["veff", "xla", "bf16", "raytrace", "pa",
                             "gen2"]
    out = {}
    for m in modes:
        if m == "veff":
            out["veff"] = count_veff("pallas", "float32")
        elif m == "v3":
            out["v3"] = count_veff("pallas_v3", "float32")
        elif m == "xla":
            out["xla"] = count_veff("xla", "float32")
        elif m == "bf16":
            out["bf16"] = count_veff("pallas", "bfloat16")
        elif m == "raytrace":
            out["raytrace"] = count_raytrace()
        elif m == "pa":
            out["pa"] = count_pa()
        elif m == "pa_noiseless":
            out["pa_noiseless"] = count_pa(noiseless=True)
        elif m == "gen2":
            out["gen2"] = count_gen2()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
