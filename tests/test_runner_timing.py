"""Runner budget/checkpoint behavior and time-logger accounting."""
import numpy as np

from nuradiomc_tpu.sim.runner import Runner, RunnerState
from nuradiomc_tpu.utils.timing import TimeLogger, pretty_time_delta


def test_runner_stops_at_trigger_budget(tmp_path):
    ckpt = str(tmp_path / "state.json")

    def make_batch(i, rng):
        return np.arange(100), np.ones(100)

    def run_batch(batch):
        trig = np.zeros(100, dtype=bool)
        trig[:7] = True
        return trig, {}

    r = Runner(make_batch, run_batch, n_triggers_max=20, max_runtime=60,
               checkpoint_path=ckpt)
    state = r.run()
    assert state.n_triggered >= 20
    assert state.n_batches == 3  # 7 per batch -> 21 at batch 3

    # resumability: a new runner picks up the persisted state
    r2 = Runner(make_batch, run_batch, n_triggers_max=20, max_runtime=60,
                checkpoint_path=ckpt)
    assert r2.state.n_triggered == state.n_triggered
    s2 = r2.run()
    assert s2.n_batches == state.n_batches  # budget already met -> no new work


def test_runner_crash_tolerance():
    calls = {"n": 0}

    def make_batch(i, rng):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("flaky")
        if calls["n"] > 4:
            return None, None
        return np.arange(10), np.ones(10)

    def run_batch(batch):
        return np.ones(10, dtype=bool), {}

    r = Runner(make_batch, run_batch, max_crashes=5, max_runtime=60)
    state = r.run()
    assert state.n_batches == 2  # two good batches after two crashes


def test_time_logger():
    import time
    tl = TimeLogger(update_interval=0.0)
    with tl.timed("ray tracing"):
        time.sleep(0.01)
    tl.start_time("trigger")
    tl.stop_time("trigger")
    times = tl.get_times()
    assert times["ray tracing"] >= 0.01
    assert "trigger" in times
    assert pretty_time_delta(3725) == "1h2m5s"
