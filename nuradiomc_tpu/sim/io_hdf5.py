"""HDF5 event-list input reading and output writing.

Input format: the reference generator's per-shower tables
(NuRadioMC/EvtGen/generator.py:88-199 write_events_to_hdf5) with columns
xx/yy/zz/zeniths/azimuths/energies/shower_energies/shower_type/flavors/
interaction_type/inelasticity/event_group_ids/shower_ids/vertex_times and
file-level attrs (n_events, volume, thetamin/max, ...).

Output: the documented HDF5 schema subset
(documentation/source/NuRadioMC/pages/HDF5_structure.rst:100-182, written by
simulation/output_writer_hdf5.py): per-shower top-level arrays, OR-aggregated
trigger flags, per-station groups, and Veff bookkeeping attrs.
"""

from __future__ import annotations

import dataclasses

import h5py
import numpy as np


@dataclasses.dataclass
class EventInput:
    """Per-shower flat arrays as read from the input file."""

    event_group_ids: np.ndarray
    shower_ids: np.ndarray
    xx: np.ndarray
    yy: np.ndarray
    zz: np.ndarray
    zeniths: np.ndarray
    azimuths: np.ndarray
    energies: np.ndarray          # neutrino energy
    shower_energies: np.ndarray
    shower_type: np.ndarray       # 'had' / 'em'
    flavors: np.ndarray
    interaction_type: np.ndarray  # 'cc' / 'nc'
    inelasticity: np.ndarray
    vertex_times: np.ndarray
    attrs: dict
    # persisted per-shower signal-model realizations of a previous run
    # (simulation.py:737-740); None when absent from the input file
    shower_realization_Alvarez2009: np.ndarray = None
    shower_realization_ARZ: np.ndarray = None
    # emitter-mode per-row columns (attrs simulation_mode == 'emitter',
    # generator write side: examples/05_pulser_calibration A01; read side:
    # simulation.py:750-758 reads every 'emitter_<param>' dataset)
    emitter: dict = None

    @property
    def n_showers(self) -> int:
        return len(self.shower_ids)


def read_input_hdf5(path: str) -> EventInput:
    """Load the full input file into memory (simulation.py:1019-1057)."""
    with h5py.File(path, "r") as f:
        def get(key, default=None):
            if key in f:
                return np.asarray(f[key])
            return default

        n = len(f["shower_ids"])
        mode = f.attrs.get("simulation_mode", "neutrino")
        mode = mode.decode() if isinstance(mode, bytes) else str(mode)
        emitter = None
        if mode == "emitter":
            # emitter event lists carry emitter_* columns and usually no
            # shower kinematics — synthesize neutral defaults for those
            emitter = {k: np.asarray(f[k]) for k in f.keys()
                       if k.startswith("emitter_")}
        amps = get("emitter_amplitudes", np.zeros(n))

        def strings(key, default):
            raw = get(key)
            if raw is None:
                return np.full(n, default, dtype="U8")
            return np.array([s.decode() if isinstance(s, bytes) else s
                             for s in raw])

        return EventInput(
            event_group_ids=get("event_group_ids"),
            shower_ids=get("shower_ids"),
            xx=get("xx"), yy=get("yy"), zz=get("zz"),
            zeniths=get("zeniths", np.zeros(n)),
            azimuths=get("azimuths", np.zeros(n)),
            energies=get("energies", amps),
            shower_energies=get("shower_energies",
                                get("energies", amps)),
            shower_type=strings("shower_type", "had"),
            flavors=get("flavors", np.zeros(n, dtype=int)),
            interaction_type=strings("interaction_type", "nc"),
            inelasticity=get("inelasticity", np.ones(n)),
            vertex_times=get("vertex_times", np.zeros(n)),
            attrs=dict(f.attrs),
            shower_realization_Alvarez2009=get("shower_realization_Alvarez2009"),
            shower_realization_ARZ=get("shower_realization_ARZ"),
            emitter=emitter,
        )


def group_showers(inp: EventInput):
    """Group per-shower rows by event_group_id.

    Returns (group_ids [G], group_start [G], group_count [G], order) where
    ``order`` sorts rows by group (stable).
    """
    order = np.argsort(inp.event_group_ids, kind="stable")
    sorted_ids = inp.event_group_ids[order]
    group_ids, start, count = np.unique(sorted_ids, return_index=True,
                                        return_counts=True)
    return group_ids, start, count, order


def write_output_hdf5(path: str, inp: EventInput, results: dict, attrs: dict):
    """Write the output file (subset of output_writer_hdf5.py:448-553).

    ``results`` holds per-shower and per-group arrays produced by the
    simulation: at minimum 'triggered' [n_showers], 'weights' [n_showers],
    plus optional per-station datasets under results['station_<id>'].
    """
    with h5py.File(path, "w") as f:
        for key in ("event_group_ids", "shower_ids", "xx", "yy", "zz",
                    "zeniths", "azimuths", "energies", "shower_energies",
                    "flavors", "inelasticity", "vertex_times"):
            f[key] = getattr(inp, key)
        f["shower_type"] = np.array(inp.shower_type, dtype="S")
        f["interaction_type"] = np.array(inp.interaction_type, dtype="S")
        for key, val in results.items():
            if key.startswith("station_"):
                grp = f.create_group(key)
                for k2, v2 in val.items():
                    grp[k2] = v2
            else:
                f[key] = val
        for k, v in inp.attrs.items():
            f.attrs[k] = v
        for k, v in attrs.items():
            f.attrs[k] = v
