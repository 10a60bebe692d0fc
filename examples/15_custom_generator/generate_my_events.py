"""Custom event-generator template (the EvtGen/generator_skeleton.py:1-117
equivalent): build an input event list for Simulation by hand.

The orchestrator consumes an HDF5 file of SHOWERS. Only six per-shower
columns actually drive the radio signal — position (xx/yy/zz), direction
(zeniths/azimuths), shower_energies, shower_type and event_group_ids —
everything else is bookkeeping carried into the output for weighting and
post-analysis. Copy this file, replace the dummy kinematics with your
source model, and feed the result straight to
``Simulation(<file>, detector, ...)``.

Run:  python generate_my_events.py  (writes testfile.hdf5, 20 events)
"""
import numpy as np

from nuradiomc_tpu.sim.evtgen import write_events_to_hdf5
from nuradiomc_tpu.utils import units


def generate_my_events(filename, n_events, rng=None):
    rng = rng or np.random.default_rng(0)
    n_events = int(n_events)

    # ---- file-level attributes --------------------------------------
    attributes = {
        "n_events": n_events,          # thrown events (denominator of Veff)
        "start_event_id": 0,
        # fiducial volume: only interactions inside it are kept
        # (rmin/rmax/zmin/zmax cylinder, or xmin/xmax/ymin/ymax box)
        "fiducial_rmin": 0.0,
        "fiducial_rmax": 1 * units.km,
        "fiducial_zmin": -2 * units.km,
        "fiducial_zmax": 0.0,
        # full generation volume (== fiducial here)
        "rmin": 0.0, "rmax": 1 * units.km,
        "zmin": -2 * units.km, "zmax": 0.0,
        # energy and angular ranges of the thrown flux
        "Emin": 1 * units.EeV, "Emax": 1 * units.EeV,
        "thetamin": 0.0, "thetamax": np.pi,
        "phimin": 0.0, "phimax": 2 * np.pi,
    }
    attributes["volume"] = (np.pi * attributes["rmax"] ** 2
                            * abs(attributes["zmin"]))
    # surface sources (e.g. air-shower muons) set attributes["area"] instead

    # ---- per-shower columns -----------------------------------------
    # REQUIRED by the radio simulation:
    data_sets = {
        "xx": rng.uniform(-500.0, 500.0, n_events),
        "yy": rng.uniform(-500.0, 500.0, n_events),
        "zz": rng.uniform(-2000.0, -100.0, n_events),
        "zeniths": np.arccos(rng.uniform(-1, 1, n_events)),
        "azimuths": rng.uniform(0, 2 * np.pi, n_events),
        "shower_energies": np.full(n_events, 1 * units.EeV),
        "shower_type": ["had"] * n_events,          # 'had' or 'em'
        # one event group per shower; give several showers the SAME
        # group id to sum their signals in one trigger window
        "event_group_ids": np.arange(n_events),
        "shower_ids": np.arange(n_events),
    }
    # bookkeeping (weights + output schema; set to anything sensible):
    data_sets["n_interaction"] = np.ones(n_events, dtype=int)
    data_sets["flavors"] = np.full(n_events, 12, dtype=int)  # PDG code
    data_sets["energies"] = np.full(n_events, 1 * units.EeV)
    data_sets["interaction_type"] = np.full(n_events, "nc", dtype="U2")
    data_sets["inelasticity"] = np.ones(n_events)
    # optional: fix the per-event weight yourself (calibration sources):
    # data_sets["weights"] = np.ones(n_events)

    write_events_to_hdf5(filename, data_sets, attributes)
    return data_sets, attributes


if __name__ == "__main__":
    generate_my_events("testfile.hdf5", 20)
    print("wrote testfile.hdf5 (20 events)")
