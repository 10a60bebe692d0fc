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
