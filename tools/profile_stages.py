"""Per-stage device-time + roofline accounting for the headline pipeline.

Runs on the real TPU (no env overrides). Measurement: every number is a
fori-loop k=K_HI vs k=K_LO difference (removes the 70-110 ms host
dispatch/readback floor of the shared-chip tunnel), best of N blocks.

Output: one row per stage with measured ms/step, analytic bytes moved and
FLOPs, and achieved fraction of peak HBM bandwidth / MXU throughput —
the evidence behind BASELINE.md's roofline table.

    python -u tools/profile_stages.py all          # full table
    python -u tools/profile_stages.py full         # one stage per process
    (stages: full noatt ray ask placement irfft trigger)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# THIS chip's measured peaks (tools/microbench_chip.py, 2026-08-20,
# k-differenced chained 4096^3 matmuls; the independent-iteration variant
# reproduces f32 at 38.8): f32-input default-precision matmul 39.7
# TFLOP/s (datasheet-consistent v5e: 197 bf16 / ~5 passes), bf16-input
# 156.7 TFLOP/s (80% of the 197 datasheet peak). Round-4's "156 TFLOP/s
# f32" was a mis-accounting — no f32-input matmul on this chip exceeds
# ~40. HBM from the v5e datasheet (819 GB/s HBM2E) until the stream
# microbench lands a clean window.
PEAK_HBM_GBPS = 819.0
PEAK_F32_TFLOPS = 39.7
PEAK_BF16_TFLOPS = 156.7

K_HI, K_LO, N_BLOCKS = 5, 1, 3


def _block_time(make_block, arg, n_blocks=N_BLOCKS):
    """Best-of-N k-differenced seconds per step."""
    import jax

    times = {}
    for k in (K_LO, K_HI):
        fn = jax.jit(make_block(k))
        int(fn(arg))  # compile+warm
        best = np.inf
        for _ in range(n_blocks):
            t0 = time.perf_counter()
            int(fn(arg))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[K_HI] - times[K_LO]) / (K_HI - K_LO)


def main(only="all"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import _enable_compilation_cache
    _enable_compilation_cache()

    from __graft_entry__ import _make_settings_and_inputs
    from nuradiomc_tpu.ops import askaryan, raytrace, triggers
    from nuradiomc_tpu.sim import pipeline
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    G, S, C = 65536, 2, 1
    N_INT, N_BASE = 512, 2048
    settings, ch, batch = _make_settings_and_inputs(
        n_groups=G, n_showers=S, n_channels=C,
        n_internal=N_INT, n_base=N_BASE)
    F_INT = N_INT // 2 + 1
    F_BASE = N_BASE // 2 + 1
    ROWS = G * S * C * 2
    c8 = 8      # complex64 bytes
    f4 = 4

    rows = []

    def add(name, sec, bytes_moved, flops, note=""):
        ms = sec * 1e3
        bw = bytes_moved / sec / 1e9 if sec > 0 else 0.0
        tf = flops / sec / 1e12 if sec > 0 else 0.0
        rows.append(dict(stage=name, ms_per_step=round(ms, 2),
                         gbytes=round(bytes_moved / 1e9, 3),
                         gflops=round(flops / 1e9, 1),
                         achieved_GBps=round(bw, 0),
                         pct_hbm=round(100 * bw / PEAK_HBM_GBPS, 1),
                         achieved_TFLOPs=round(tf, 2),
                         pct_mxu=round(100 * tf / PEAK_F32_TFLOPS, 1),
                         note=note))
        print(json.dumps(rows[-1]))

    want = lambda name: only in ("all", name)

    # ---- 1. full pipeline --------------------------------------------------
    def full_block(k):
        def block(b):
            def body(i, acc):
                bb = b._replace(energies=b.energies *
                                (1.0 + 1e-7 * i.astype(b.energies.dtype)))
                out = simulate_batch(bb, ch, settings)
                return acc + jnp.sum(out.triggered.astype(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return block

    t_full = None
    if want("full") or want("noatt"):
        t_full = _block_time(full_block, batch)
        add("full_step", t_full, 0, 0, f"G={G} S={S} C={C}")

    # ---- 2. ablation: no attenuation --------------------------------------
    s_noatt = dataclasses.replace(settings, attenuate_ice=False)

    def noatt_block(k):
        def block(b):
            def body(i, acc):
                bb = b._replace(energies=b.energies *
                                (1.0 + 1e-7 * i.astype(b.energies.dtype)))
                out = simulate_batch(bb, ch, s_noatt)
                return acc + jnp.sum(out.triggered.astype(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return block

    if not want("noatt"):
        t_noatt = t_full
    else:
        t_noatt = _block_time(noatt_block, batch)
        add("full_minus_attenuation", t_noatt, 0, 0)
    # attenuation stage traffic: spec read + att write/read + spec_att write
    att_bytes = ROWS * F_INT * c8 * 3 + ROWS * settings.n_freq_attenuation * f4
    if want("noatt"):
        add("-> attenuation_stage(diff)", t_full - t_noatt, att_bytes,
            ROWS * settings.attenuation_steps * settings.n_freq_attenuation * 8,
            "quad eval + interp matmul + full-size multiply")

    # ---- 3. isolated: ray solve -------------------------------------------
    # (jit wrapper: eager-op results are unfetchable through the axon tunnel)
    geom = jax.jit(lambda v, p: raytrace.to_2d(
        jnp.broadcast_to(v[:, :, None, :], (G, S, C, 3)),
        jnp.broadcast_to(p[None, None, :, :], (G, S, C, 3))))(
            batch.vertices, ch.positions)
    flatg = tuple(np.asarray(a).reshape(-1) for a in
                  (geom.x1y, geom.x1z, geom.x2y, geom.x2z))

    def ray_block(k):
        def block(args):
            a, b, c_, d = args

            def body(i, acc):
                sols = jax.vmap(lambda w, x, y, z: raytrace.find_solutions(
                    w, x, y, z, settings.ice, n_bisect=settings.n_bisect))(
                        a, b + 1e-6 * i.astype(b.dtype), c_, d)
                return acc + jnp.sum(sols.mask.astype(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return block

    t_ray = _block_time(ray_block, flatg) if want("ray") else 0.0
    if want("ray"):
        add("raytrace_solve", t_ray, G * S * C * 4 * f4,
            G * S * C * settings.n_bisect * 2 * 60,
            "bisect+secant, transcendental-bound")

    # ---- 4. isolated: Askaryan spectra ------------------------------------
    view = np.random.default_rng(0).uniform(0.7, 1.2, ROWS).astype(np.float32)
    Rs = np.random.default_rng(1).uniform(200, 2500, ROWS).astype(np.float32)

    def ask_block(k):
        def block(args):
            v, r = args

            def body(i, acc):
                spec = jax.vmap(lambda vv, rr: askaryan.get_frequency_spectrum(
                    1e18, vv, N_INT, 0.5, False, 1.78, rr, "Alvarez2000",
                    k_L=30.0))(v + 1e-6 * i.astype(v.dtype), r)
                return acc + jnp.sum(jnp.abs(spec))   # full sum: no DCE
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return block

    t_ask = _block_time(ask_block, (view, Rs)) if want("ask") else 0.0
    if want("ask"):
        add("askaryan_spectrum", t_ask, ROWS * F_INT * c8,
            ROWS * F_INT * 20, "writes [rows, F_int] complex")

    # ---- 5. isolated: placement matmuls + phase + reduce ------------------
    # inputs are synthesized ON DEVICE inside the jit: arg-passing large
    # arrays through the axon tunnel yields unfetchable outputs, and closing
    # over them exceeds the remote-compile request size limit (HTTP 413)
    def _synth(shape, seed):
        n = int(np.prod(shape))
        x = (jnp.arange(n, dtype=jnp.float32) * (seed * 0.731 + 0.113)) % 7.1
        return (x - 3.55).reshape(shape) * 0.3

    def _synth_c(shape, seed):
        return jax.lax.complex(_synth(shape, seed), _synth(shape, seed + 1))
    # numpy closure constants: EAGER jnp.asarray dtype conversions are
    # UNIMPLEMENTED through the axon tunnel (CLAUDE.md quirks)
    D_r, D_i = pipeline._placement_matrices(N_INT, N_BASE)
    D_r32 = np.asarray(D_r, np.complex64)
    D_i32 = np.asarray(D_i, np.complex64)
    ff_base = np.asarray(np.fft.rfftfreq(N_BASE, 0.5), np.float32)

    def plc_block(k):
        # close over the numpy inputs (arg-passing large arrays through the
        # axon tunnel yields unfetchable outputs, CLAUDE.md quirks)
        def block(_):
            V = _synth_c((G, S, C, 2, F_INT), 2)
            off = 250.0 + 70.0 * _synth((G, S, C, 2), 5)

            def body(i, acc):
                from nuradiomc_tpu.ops import trace as trace_ops
                Vr = V.real * (1.0 + 1e-7 * i.astype(jnp.float32))
                Xb = (jnp.einsum("gscrf,fk->gscrk", Vr, D_r32)
                      + jnp.einsum("gscrf,fk->gscrk", V.imag, D_i32))
                ph = trace_ops.time_shift_phase(ff_base, off[..., None])
                chan = jnp.sum(Xb * ph.astype(jnp.complex64), axis=(1, 3))
                return acc + jnp.sum(jnp.abs(chan))   # full sum: no DCE
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return block

    t_plc = _block_time(plc_block, np.float32(0)) if want("placement") else 0.0
    plc_flops = 2 * ROWS * F_INT * F_BASE * 2 * 2   # two real matmuls, complex out
    plc_bytes = (ROWS * F_INT * c8                  # V read
                 + ROWS * F_BASE * c8 * 3           # Xb write+read, ph product
                 + G * C * F_BASE * c8)             # output
    if want("placement"):
        add("placement_matmul_phase_reduce", t_plc, plc_bytes, plc_flops,
            "[rows,F_int]x[F_int,F_base] + phase ramp + (S,2) sum")

    # ---- 6. isolated: final irfft matmul ----------------------------------
    I_r, I_i = pipeline._irfft_matrices(N_BASE)
    I_r32 = np.asarray(I_r, np.float32)
    I_i32 = np.asarray(I_i, np.float32)

    def irfft_block(k):
        def block(_):
            cs = _synth_c((G, C, F_BASE), 11)
            def body(i, acc):
                tr = (jnp.einsum("gcf,fn->gcn",
                                 cs.real * (1.0 + 1e-7 * i.astype(jnp.float32)),
                                 I_r32)
                      + jnp.einsum("gcf,fn->gcn", cs.imag, I_i32))
                return acc + jnp.sum(jnp.abs(tr))     # full sum: no DCE
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return block

    t_ir = _block_time(irfft_block, np.float32(0)) if want("irfft") else 0.0
    ir_flops = 2 * G * C * F_BASE * N_BASE * 2
    ir_bytes = G * C * (F_BASE * c8 + N_BASE * f4)
    if want("irfft"):
        add("trigger_irfft_matmul", t_ir, ir_bytes, ir_flops,
            "[G*C,F_base]x[F_base,n_base] x2")

    # ---- 7. isolated: trigger kernels -------------------------------------

    def trig_block(k):
        def block(_):
            tr = 1e-5 * _synth((G, C, N_BASE), 17)
            def body(i, acc):
                tts = triggers.get_high_low_triggers(
                    tr * (1.0 + 1e-7 * i.astype(jnp.float32)),
                    2e-5, -2e-5, 5.0, 0.5)
                t, _, _ = triggers.majority_logic(tts, 1, 200.0, 0.5)
                return acc + jnp.sum(t.astype(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return block

    t_tr = _block_time(trig_block, np.float32(0)) if want("trigger") else 0.0
    if want("trigger"):
        add("trigger_highlow_majority", t_tr,
            G * C * N_BASE * (f4 + 4), G * C * N_BASE * 20,
            "boolean shift-OR windows")

    # ---- summary -----------------------------------------------------------
    if only == "all":
        known = t_ray + t_ask + (t_full - t_noatt) + t_plc + t_ir + t_tr
        print(json.dumps({
            "stage": "SUMMARY", "full_ms": round(t_full * 1e3, 2),
            "sum_of_isolated_ms": round(known * 1e3, 2),
            "unattributed_ms": round((t_full - known) * 1e3, 2),
            "events_per_s": round(G / t_full, 0),
        }))
    return rows


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
