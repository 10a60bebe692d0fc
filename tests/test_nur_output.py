"""Waveform (.nur) output of triggered events from the simulation."""
import numpy as np
import jax.numpy as jnp

from nuradiomc_tpu.sim import io_nur
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units
from tests.test_e2e import DETECTOR, INPUT


def test_nur_waveform_output(tmp_path):
    nur = str(tmp_path / "out.nur")
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
        trigger=TriggerSpec(),
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512, dtype=jnp.float64, nur_outputfilename=nur)
    res = sim.run()

    reader = io_nur.EventReader(nur)
    events = list(reader.get_events())
    reader.end()
    assert len(events) == res["n_triggered"]
    st = events[0].get_station(101)
    ch = st.get_channel(0)
    # downsampled to detector rate (1 GHz)
    assert abs(ch.get_sampling_rate() - 1.0) < 1e-9
    assert np.max(np.abs(ch.get_trace())) > 0
    assert st.has_triggered()
    assert len(list(events[0].get_sim_showers())) >= 1
