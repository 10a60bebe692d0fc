"""Emitter-mode orchestrator conformance vs the reference
(simulation_mode='emitter', calculate_sim_efield_for_emitter,
simulation.py:299-460 — the CI cal-pulser chain's efield_delta_pulse
path): a committed 24-pulser event list on the SingleEvents surface
station, two named triggers. Golden regenerated in-container with analytic
antennas on both sides (tests/golden/generate_emitter.py).

Two variants: 'efield' (efield_delta_pulse, no emitting antenna) and
'voltage' (the measured hvsp1 lab waveform folded with the emitting-antenna
VEL and the -i f n/c factor, simulation.py:400-418)."""
import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

HERE = os.path.dirname(__file__)
INPUTS = {
    "efield": os.path.join(HERE, "golden", "emitter_events.hdf5"),
    "voltage": os.path.join(HERE, "golden", "emitter_voltage_events.hdf5"),
}
GOLDENS = {
    "efield": os.path.join(HERE, "golden", "emitter_reference.npz"),
    "voltage": os.path.join(HERE, "golden", "emitter_voltage_reference.npz"),
}
DETECTOR_JSON = "/root/reference/NuRadioMC/test/SingleEvents/surface_station_1GHz.json"

ANTENNAS = {"createLPDA_100MHz_InfFirn": "analytic_LPDA",
            "bicone_v8_InfFirn": "analytic_VPol"}

TRIGGERS = [
    TriggerSpec(name="simple_threshold", trigger_type="simple_threshold",
                threshold_high_sigma=3.0, number_of_coincidences=1),
    TriggerSpec(name="dipoles_2of4_2sigma", trigger_type="high_low",
                threshold_high_sigma=2.0, threshold_low_sigma=-2.0,
                channels=(4, 5, 6, 7), number_of_coincidences=2),
]


@pytest.mark.parametrize("variant", ["efield", "voltage"])
@pytest.mark.skipif(not os.path.exists(DETECTOR_JSON),
                    reason="reference detector missing")
def test_emitter_chain_matches_reference(tmp_path, variant):
    if not (os.path.exists(GOLDENS[variant])
            and os.path.exists(INPUTS[variant])):
        pytest.skip(f"emitter {variant} golden missing")
    golden = np.load(GOLDENS[variant])
    names = [n.decode() for n in golden["trigger_names"]]

    sim = Simulation(
        INPUTS[variant],
        Detector(DETECTOR_JSON, default_station=101),
        config={"sampling_rate": 5.0, "noise": False,
                "speedup": {"minimum_weight_cut": 1e-5,
                            "min_efield_amplitude": 2},
                "propagation": {"ice_model": "ARAsim_southpole",
                                "focusing": True},
                "signal": {"model": "Alvarez2000"},
                "trigger": {"noise_temperature": 300}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                        {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        triggers=TRIGGERS,
        antenna_replacements=ANTENNAS,
        chunk_size=24,
        dtype=jnp.float64,
        outputfilename=str(tmp_path / "emitter_out.hdf5"),
    )
    res = sim.run()
    assert res["trigger_names"] == names
    np.testing.assert_allclose(float(sim.Vrms), float(golden["Vrms"]),
                               rtol=1e-6)

    gid_ref = golden["group_ids"]
    mt_ref = golden["multiple_triggers"]
    tt_ref = golden["trigger_times"]
    gidx = {int(g): i for i, g in enumerate(res["group_ids"])}
    mt = np.asarray(res["multiple_triggers"])
    tt = np.asarray(res["trigger_times_per_trigger"])

    for g in np.unique(gid_ref):
        rows = np.where(gid_ref == g)[0]
        i = gidx[int(g)]
        for iT, name in enumerate(names):
            ref_fired = bool(np.any(mt_ref[rows, iT]))
            assert bool(mt[i, iT]) == ref_fired, (int(g), name)
            if ref_fired:
                t_ref = float(np.nanmin(tt_ref[rows, iT]))
                assert abs(float(tt[i, iT]) - t_ref) < 5.0, \
                    (int(g), name, float(tt[i, iT]), t_ref)

    ours = set(int(g) for g in res["group_ids"][np.asarray(res["triggered"])])
    refs = set(int(g) for g in gid_ref[golden["triggered"].astype(bool)])
    assert ours == refs

    # per-(shower, channel, solution) amplitude parity on the triggered rows
    with h5py.File(sim.outputfilename) as f:
        st = f["station_101"]
        got_amp = np.asarray(st["max_amp_shower_and_ray"])
        got_sid = np.asarray(st["shower_id"])
    ref_amp = golden["station_101_max_amp_shower_and_ray"]
    ref_sid = golden["station_101_shower_id"]
    scale = float(np.nanmax(ref_amp))
    n_cmp = 0
    for sid in sorted(set(int(x) for x in ref_sid) &
                      set(int(x) for x in got_sid)):
        mine = got_amp[got_sid == sid][0]
        ref = ref_amp[ref_sid == sid][0]
        both = np.isfinite(mine) & np.isfinite(ref)
        np.testing.assert_allclose(mine[both], ref[both], atol=0.02 * scale)
        n_cmp += int(both.sum())
    assert n_cmp > 20, n_cmp


def _make_spice_archive(path, scale=1.0, n=64, sr=2.5):
    """Synthetic SPice_pulses.xz: 2 launch angles x 2 pulses of (2, n)
    (eTheta, ePhi) samples at ``sr`` GHz — the published archive's exact
    pickle layout (reference emitter.py:159-190)."""
    import lzma
    import pickle

    rng = np.random.RandomState(5)

    def pulse(amp_t, amp_p):
        t = np.arange(n)
        env = np.exp(-0.5 * ((t - n / 3) / 4.0) ** 2)
        return np.stack([amp_t * env * np.sin(0.8 * t),
                         amp_p * env * np.cos(0.8 * t)])

    archive = {"sampling_rate": sr,
               "efields": {120.0: [pulse(scale, 0.4 * scale),
                                   pulse(0.7 * scale, 0.2 * scale)],
                           160.0: [pulse(2.0 * scale, scale),
                                   pulse(1.5 * scale, 0.5 * scale)]}}
    with lzma.open(path, "wb") as f:
        pickle.dump(archive, f)
    return archive


def test_spice_unit_specs_semantics(tmp_path):
    """ops.emitter.spice_unit_specs: angle keys in radians ascending, pulse
    selection by iN, FFT resampling to the target rate, and each
    component's peak centered at N//2 (emitter.py:159-250)."""
    from nuradiomc_tpu.ops import emitter as emitter_ops
    from nuradiomc_tpu.utils import fft

    path = str(tmp_path / "SPice_pulses.xz")
    archive = _make_spice_archive(path)
    loaded = emitter_ops.load_spice_archive(path)
    assert sorted(loaded["efields"].keys()) == [120.0, 160.0]

    N, dt = 256, 0.2
    ang, specs = emitter_ops.spice_unit_specs(loaded, N, dt, iN=1)
    np.testing.assert_allclose(ang, np.deg2rad([120.0, 160.0]))
    assert specs.shape == (2, 2, N // 2 + 1)

    # round-trip: the time-domain component peak sits at N//2
    for a in range(2):
        for c in range(2):
            tr = fft.freq2time(specs[a, c], 1.0 / dt, n=N)
            assert int(np.argmax(np.abs(np.asarray(tr)))) == N // 2

    # iN selects a different measured pulse
    _, specs0 = emitter_ops.spice_unit_specs(loaded, N, dt, iN=0)
    assert not np.allclose(specs0, specs)
    with pytest.raises(ValueError, match="out of range"):
        emitter_ops.spice_unit_specs(loaded, N, dt, iN=7)

    # missing archive: gated with instructions
    with pytest.raises(FileNotFoundError, match="SPice_pulses"):
        emitter_ops.load_spice_archive(str(tmp_path / "nope.xz"))


@pytest.mark.skipif(not os.path.exists(DETECTOR_JSON),
                    reason="reference detector missing")
def test_spice_emitter_e2e(tmp_path):
    """efield_idl1_spice through the emitter orchestrator on a synthetic
    archive: the per-ray nearest-launch-angle gather + amplitude scaling
    drive the full chain (triggers fire with a strong archive; the same
    run with the archive scaled by 1e-9 fires nothing)."""
    import shutil

    if not os.path.exists(INPUTS["efield"]):
        pytest.skip("emitter input missing")
    infile = str(tmp_path / "spice_events.hdf5")
    shutil.copy(INPUTS["efield"], infile)
    with h5py.File(infile, "r+") as f:
        n = len(f["emitter_model"])
        del f["emitter_model"]
        f["emitter_model"] = np.array([b"efield_idl1_spice"] * n)

    def run(scale):
        arch = str(tmp_path / f"SPice_{scale}.xz")
        _make_spice_archive(arch, scale=scale)
        sim = Simulation(
            infile,
            Detector(DETECTOR_JSON, default_station=101),
            config={"sampling_rate": 5.0, "noise": False,
                    "speedup": {"minimum_weight_cut": 1e-5,
                                "min_efield_amplitude": 2},
                    "propagation": {"ice_model": "ARAsim_southpole",
                                    "focusing": True},
                    "signal": {"model": "Alvarez2000"},
                    "trigger": {"noise_temperature": 300}},
            filter_chain=[
                FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                            {"order": 2}),
                FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
            ],
            triggers=TRIGGERS,
            antenna_replacements=ANTENNAS,
            spice_pulses_path=arch,
            spice_pulse_index=1,
            chunk_size=24,
            dtype=jnp.float64,
        )
        return sim.run()

    res = run(1e6)
    assert np.asarray(res["triggered"]).any()
    res_tiny = run(1e-3)
    assert not np.asarray(res_tiny["triggered"]).any()
