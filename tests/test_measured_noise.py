"""Experiment-specific measured-noise importers (reco/measured_noise.py):
RNO-G (over the npz run-export backend) and ARIANNA (npz CalibTree export)
superimpose real-format recorded noise onto simulated channels."""
import numpy as np
import pytest

from nuradiomc_tpu.framework import event as fw
from nuradiomc_tpu.reco import measured_noise, rnog_io
from nuradiomc_tpu.utils import units

FS = 3.2
N_CH, N_SAMP = 24, 2048
ADC_TO_V = rnog_io.ADC_REF_VOLTAGE_RANGE / (2 ** rnog_io.ADC_N_BITS - 1)


@pytest.fixture(scope="module")
def noise_runs(tmp_path_factory):
    """Two RNO-G runs: station 11 (2 FORCE + 1 RADIANT0 events) and
    station 22 (2 FORCE events)."""
    tmp = tmp_path_factory.mktemp("rnog_noise")
    rng = np.random.default_rng(9)
    wfs11 = rng.integers(-40, 40, (3, N_CH, N_SAMP))
    rnog_io.write_numpy_dataset(
        tmp / "station11" / "run100", 11, 100, wfs11,
        event_numbers=[0, 1, 2],
        trigger_types=["FORCE", "RADIANT0", "FORCE"],
        trigger_times=[1.7e9, 1.7e9 + 1, 1.7e9 + 2],
        readout_times=[1.7e9, 1.7e9 + 1, 1.7e9 + 2],
        sample_rate=FS)
    wfs22 = rng.integers(-40, 40, (2, N_CH, N_SAMP))
    rnog_io.write_numpy_dataset(
        tmp / "station22" / "run200", 22, 200, wfs22,
        event_numbers=[0, 1],
        trigger_types=["FORCE", "FORCE"],
        trigger_times=[1.8e9, 1.8e9 + 1],
        readout_times=[1.8e9, 1.8e9 + 1],
        sample_rate=FS)
    return tmp, wfs11, wfs22


def _sim_event(station_id=11, n_channels=3, n_samples=N_SAMP, fs=FS):
    evt = fw.Event(0, 0)
    st = fw.Station(station_id)
    rng = np.random.default_rng(1)
    traces = rng.standard_normal((n_channels, n_samples)) * 1e-5
    for c in range(n_channels):
        ch = fw.Channel(c)
        ch.set_trace(traces[c].copy(), fs)
        st.add_channel(ch)
    evt.set_station(st)
    return evt, st, traces


def test_rnog_importer_superimposes_force_noise(noise_runs):
    tmp, wfs11, wfs22 = noise_runs
    imp = measured_noise.RNOGNoiseImporter()
    imp.begin([str(tmp)], random_seed=3,
              reader_kwargs={"apply_baseline_correction": "none"})
    evt, st, traces = _sim_event()
    imp.run(evt, st, None)

    # the added noise must be EXACTLY one of the FORCE events' calibrated
    # traces (RADIANT0 is excluded by the default selector), the same
    # event for every channel
    candidates = [wfs11[0], wfs11[2], wfs22[0], wfs22[1]]
    matches = []
    for k, cand in enumerate(candidates):
        diff0 = np.asarray(st.get_channel(0).get_trace()) - traces[0]
        if np.allclose(diff0, cand[0] * ADC_TO_V, atol=1e-12):
            matches.append(k)
    assert len(matches) == 1, "added noise is not exactly one FORCE event"
    k = matches[0]
    for c in range(3):
        got = np.asarray(st.get_channel(c).get_trace())
        np.testing.assert_allclose(got - traces[c],
                                   candidates[k][c] * ADC_TO_V, atol=1e-12)
    imp.end()


def test_rnog_importer_match_station_id(noise_runs):
    tmp, wfs11, wfs22 = noise_runs
    imp = measured_noise.RNOGNoiseImporter()
    imp.begin([str(tmp)], match_station_id=True, random_seed=7,
              reader_kwargs={"apply_baseline_correction": "none"})
    evt, st, traces = _sim_event(station_id=22)
    imp.run(evt, st, None)
    # only station-22 noise allowed
    diff0 = np.asarray(st.get_channel(0).get_trace()) - traces[0]
    assert any(np.allclose(diff0, w[0] * ADC_TO_V, atol=1e-12)
               for w in (wfs22[0], wfs22[1]))

    evt2, st2, _ = _sim_event(station_id=99)
    with pytest.raises(ValueError, match="No station with id 99"):
        imp.run(evt2, st2, None)


def test_rnog_importer_channel_mapping_and_length_check(noise_runs):
    tmp, wfs11, wfs22 = noise_runs
    imp = measured_noise.RNOGNoiseImporter()
    imp.begin([str(tmp)], channel_mapping={0: 5, 1: 6, 2: 7},
              random_seed=3,
              reader_kwargs={"apply_baseline_correction": "none"})
    evt, st, traces = _sim_event()
    imp.run(evt, st, None)
    diff0 = np.asarray(st.get_channel(0).get_trace()) - traces[0]
    # the mapped DATA channel 5 was added onto MC channel 0
    all_noise = np.concatenate([wfs11, wfs22], axis=0)
    assert any(np.allclose(diff0, w[5] * ADC_TO_V, atol=1e-12)
               for w in all_noise)

    evt2, st2, _ = _sim_event(n_samples=512)
    imp2 = measured_noise.RNOGNoiseImporter()
    imp2.begin([str(tmp)], random_seed=3,
               reader_kwargs={"apply_baseline_correction": "none"})
    with pytest.raises(ValueError, match="Mismatch in trace length"):
        imp2.run(evt2, st2, None)


def test_arianna_importer_npz_backend(tmp_path):
    rng = np.random.default_rng(2)
    amp = rng.standard_normal((5, 4, 256))          # mV
    np.savez(tmp_path / "caltree_export.npz", amp_out=amp)
    imp = measured_noise.ARIANNANoiseImporter()
    imp.begin([str(tmp_path / "caltree_export.npz")], random_seed=11)
    evt, st, traces = _sim_event(n_channels=4, n_samples=256, fs=1.0)
    imp.run(evt, st, None)
    for c in range(4):
        diff = np.asarray(st.get_channel(c).get_trace()) - traces[c]
        assert any(np.allclose(diff, amp[i, c] * units.mV, atol=1e-12)
                   for i in range(5)), f"channel {c} noise not from the tree"

    # sample-count mismatch: warn, leave the trace untouched
    evt2, st2, traces2 = _sim_event(n_channels=4, n_samples=128, fs=1.0)
    imp.run(evt2, st2, None)
    np.testing.assert_array_equal(np.asarray(st2.get_channel(0).get_trace()),
                                  traces2[0])
