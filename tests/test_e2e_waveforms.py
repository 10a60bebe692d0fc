"""Per-waveform e2e regression (mirrors the reference's own
SingleEvents/T04validate_allmost_equal.py): the voltage traces of the
triggered events must match the REFERENCE-simulation .nur output
(tests/golden/e2e_reference_waveforms.nur, written by the reference itself
on the committed 3000-event input with the analytic_VPol antenna — see
generate_e2e_waveforms.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.framework.base_trace import BaseTrace
from nuradiomc_tpu.sim import io_nur_reference as rio
from nuradiomc_tpu.sim.pipeline import simulate_batch
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units
from tests.test_e2e import DETECTOR, INPUT

GOLDEN_NUR = os.path.join(os.path.dirname(__file__), "golden",
                          "e2e_reference_waveforms.nur")


@pytest.fixture(scope="module")
def reference_events():
    io = rio.NuRadioRecoio(GOLDEN_NUR)
    return {int(rid): io.get_event_i(i)
            for i, (rid, _) in enumerate(io.get_event_ids())}


@pytest.fixture(scope="module")
def my_traces(reference_events):
    sim = Simulation(
        INPUT, DETECTOR,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512, dtype=jnp.float64)

    group_ids, start, count, order, batch = sim._build_batches()
    sel = np.array([int(np.where(group_ids == g)[0][0])
                    for g in sorted(reference_events)])
    sub = jax.tree.map(lambda a: a[sel] if a is not None else None, batch)
    out = jax.jit(lambda b: simulate_batch(
        b, sim.channel_params, sim.settings, keep_traces=True))(sub)
    return sim, {g: (np.asarray(out.traces)[j, 0],
                     float(np.asarray(out.base_t0)[j]),
                     float(np.asarray(out.trigger_time)[j]))
                 for j, g in enumerate(sorted(reference_events))}


def test_all_golden_events_trigger(my_traces, reference_events):
    sim, traces = my_traces
    assert set(traces) == set(reference_events)


def test_trigger_times_match(my_traces, reference_events):
    for g, evt in reference_events.items():
        ref_tt = evt.get_station(101).get_trigger("highlow_2sigma") \
            .get_trigger_time()
        _, _, my_tt = my_traces[1][g]
        assert my_tt == pytest.approx(ref_tt, abs=1.0), g


def test_waveforms_match(my_traces, reference_events):
    """Readout-window waveforms agree with the reference's .nur traces.

    Tolerance: the amplitudes carry the reference's own ~1-2% attenuation
    quadrature accuracy (scipy epsrel=1e-2; same bound as the per-ray
    amplitude check in test_e2e), applied per-trace against its peak."""
    sim, traces = my_traces[0], my_traces[1]
    for g, evt in reference_events.items():
        st = evt.get_station(101)
        ref_ch = st.get_channel(0)
        ref_tr = np.asarray(ref_ch.get_trace())
        ref_t0 = ref_ch.get_trace_start_time()
        ref_fs = ref_ch.get_sampling_rate()

        my_tr, my_t0, _ = traces[g]
        bt = BaseTrace()
        bt.set_trace(my_tr, sim.internal_rate)
        bt.resample(ref_fs)
        # place our trace onto the reference's readout grid: integer-bin cut
        # + sub-bin shift of the remainder
        offset = (ref_t0 - my_t0) * ref_fs
        start_bin = int(np.floor(offset))
        frac = offset - start_bin
        if abs(frac) > 1e-9:
            bt.apply_time_shift(-frac / ref_fs)
        mine = np.asarray(bt.get_trace())[start_bin:start_bin + len(ref_tr)]
        assert len(mine) == len(ref_tr), g

        scale = np.abs(ref_tr).max()
        np.testing.assert_allclose(mine / scale, ref_tr / scale, atol=0.02,
                                   err_msg=f"group {g}")


def test_nur_writer_roundtrip_carries_same_waveforms(tmp_path, my_traces,
                                                     reference_events):
    """Simulation's own .nur output (triggered events with traces) is
    readable and its waveforms match the pipeline traces it was built from."""
    from nuradiomc_tpu.sim import io_nur

    sim = Simulation(
        INPUT, DETECTOR,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512, dtype=jnp.float64,
        nur_outputfilename=str(tmp_path / "out.nur"))
    sim.run()
    reader = io_nur.EventReader(str(tmp_path / "out.nur"))
    events = {e.get_id(): e for e in reader.run()}
    assert set(events) >= set(reference_events)
