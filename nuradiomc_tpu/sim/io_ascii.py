"""ASCII event-list I/O (EvtGen/generator_ASCII.py:1-83, hdf5_to_ASCII.py,
readEventList_ASCII.py): the ARASim-adapted columnar neutrino list format."""

from __future__ import annotations

import h5py
import numpy as np

ASCII_HEADER = """VERSION=0.2
# standard event list format of NuRadioMC (adapted from ARASim)
# columns: event id, flavor (PDG), energy [eV], cc/nc, x, y, z [m],
#          zenith, azimuth [rad], inelasticity
"""

_FMT = ("{:08d} {:>+5d}  {:.5e}  {:s}  {:>10.3f}  {:>10.3f}  {:>10.3f}"
        "  {:>10.3f}  {:>10.3f}  {:>10.3f}\n")


def write_ascii_eventlist(filename, events):
    """events: dict with event_ids/flavors/energies/interaction_type/xx/yy/
    zz/zeniths/azimuths/inelasticity arrays (hdf5_to_ASCII.py:16-34)."""
    n = len(events["event_ids"])
    with open(filename, "w") as f:
        f.write(ASCII_HEADER)
        for i in range(n):
            ct = events["interaction_type"][i]
            if isinstance(ct, bytes):
                ct = ct.decode()
            f.write(_FMT.format(
                int(events["event_ids"][i]), int(events["flavors"][i]),
                float(events["energies"][i]), ct,
                float(events["xx"][i]), float(events["yy"][i]),
                float(events["zz"][i]), float(events["zeniths"][i]),
                float(events["azimuths"][i]),
                float(events["inelasticity"][i])))


def hdf5_to_ascii(hdf5_in, ascii_out):
    with h5py.File(hdf5_in, "r") as fin:
        events = {k: np.asarray(fin[k]) for k in
                  ("flavors", "energies", "interaction_type",
                   "xx", "yy", "zz", "zeniths", "azimuths", "inelasticity")}
        key = "event_ids" if "event_ids" in fin else "event_group_ids"
        events["event_ids"] = np.asarray(fin[key])
    write_ascii_eventlist(ascii_out, events)


def read_ascii_eventlist(filename):
    """Parse the columnar list back into arrays (readEventList_ASCII.py)."""
    rows = []
    with open(filename) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or line.startswith("VERSION"):
                continue
            rows.append(line.split())
    rows = list(zip(*rows))
    return {
        "event_ids": np.array(rows[0], dtype=int),
        "flavors": np.array(rows[1], dtype=int),
        "energies": np.array(rows[2], dtype=float),
        "interaction_type": np.array(rows[3], dtype="S2"),
        "xx": np.array(rows[4], dtype=float),
        "yy": np.array(rows[5], dtype=float),
        "zz": np.array(rows[6], dtype=float),
        "zeniths": np.array(rows[7], dtype=float),
        "azimuths": np.array(rows[8], dtype=float),
        "inelasticity": np.array(rows[9], dtype=float),
    }


def ascii_to_hdf5(ascii_in, hdf5_out, volume_attrs=None):
    """Convert an ASCII list to the standard hdf5 input layout so it can be
    fed to Simulation (the reference's readEventList path)."""
    ev = read_ascii_eventlist(ascii_in)
    n = len(ev["event_ids"])
    with h5py.File(hdf5_out, "w") as f:
        f["event_group_ids"] = ev["event_ids"].astype(int)
        f["shower_ids"] = np.arange(n)
        f["vertex_times"] = np.zeros(n)
        f["shower_type"] = np.array(
            [b"em" if (abs(fl) == 12 and ct == b"cc") else b"had"
             for fl, ct in zip(ev["flavors"], ev["interaction_type"])])
        f["shower_energies"] = np.where(
            f["shower_type"][()] == b"had",
            ev["inelasticity"] * ev["energies"],
            (1 - ev["inelasticity"]) * ev["energies"])
        for k, v in ev.items():
            if k == "event_ids":
                continue
            f[k] = v
        f["event_ids"] = ev["event_ids"]
        f.attrs["n_events"] = n
        f.attrs["start_event_id"] = int(ev["event_ids"][0]) if n else 0
        for k, v in (volume_attrs or {}).items():
            f.attrs[k] = v
