"""Effective-volume / effective-area post-processing.

Re-implementation of NuRadioMC/utilities/Veff.py: per-file Veff/Aeff with
weights, Feldman-Cousins count limits (FC_limits:56), water-equivalent
conversion (get_Veff_water_equivalent:132), zenith binning, and multi-file
aggregation (get_Veff_Aeff:484). Operates on the per-shower output HDF5
written by sim.io_hdf5 (reference schema subset).
"""

from __future__ import annotations

import glob
import os

import h5py
import numpy as np

from nuradiomc_tpu.utils import units

# Feldman-Cousins 68.27% intervals for low counts (Veff.py:56-130 table)
_FC_LOW = [0.0, 0.37, 0.74, 1.10, 2.34, 2.75, 3.82, 4.25, 5.30, 6.33, 6.78,
           7.81, 8.83, 9.28, 10.30, 11.32, 12.33, 12.79, 13.81, 14.82, 15.83]
_FC_HIGH = [1.29, 2.75, 4.25, 5.30, 6.78, 7.81, 9.28, 10.30, 11.32, 12.79,
            13.81, 14.82, 16.29, 17.30, 18.32, 19.32, 20.80, 21.81, 22.82,
            23.82, 25.30]


def FC_limits(counts):
    """68.27% Feldman-Cousins confidence belt on a Poisson count."""
    n = int(round(counts))
    if n < len(_FC_LOW):
        return _FC_LOW[n], _FC_HIGH[n]
    return counts - np.sqrt(counts), counts + np.sqrt(counts)


def get_Veff_water_equivalent(veff, density_medium=0.917 * units.g / units.cm ** 3,
                              density_water=1 * units.g / units.cm ** 3):
    """Scale to water-equivalent volume (Veff.py:132-151)."""
    return veff * density_medium / density_water


def get_veff_output(volume, counts, all_events):
    v_eff = volume * counts / all_events
    fc_low, fc_high = FC_limits(counts)
    v_eff_error = v_eff / np.sqrt(counts) if counts else 0.0
    return [v_eff, v_eff_error, counts,
            volume * fc_low / all_events, volume * fc_high / all_events]


def get_Veff_Aeff_single(filename, bounds_theta=(0, np.pi), min_weight=1e-5):
    """Veff (weighted) of one output file, per unique event group.

    Returns dict with keys energy, veff [m^3], veff_error, n_triggered,
    solid_angle, weight_sum (Veff.py:168-480 simplified to the OR trigger the
    fused pipeline records).
    """
    with h5py.File(filename, "r") as f:
        gid = np.asarray(f["event_group_ids"])
        triggered = np.asarray(f["triggered"])
        weights = np.asarray(f["weights"])
        zeniths = np.asarray(f["zeniths"])
        energies = np.asarray(f["energies"])
        volume = float(f.attrs["volume"])
        n_events = int(f.attrs["n_events"])
        thetamin = float(f.attrs.get("thetamin", 0.0))
        thetamax = float(f.attrs.get("thetamax", np.pi))

    _, first = np.unique(gid, return_index=True)
    trig = triggered[first]
    w = weights[first]
    zen = zeniths[first]

    mask = trig & (w >= min_weight)
    if bounds_theta is not None:
        mask &= (zen >= bounds_theta[0]) & (zen <= bounds_theta[1])

    weight_sum = float(np.sum(w[mask]))
    counts = int(np.sum(mask))
    veff = volume * weight_sum / n_events
    solid_angle = 2 * np.pi * (np.cos(thetamin) - np.cos(thetamax))
    v, v_err, c, v_lo, v_hi = get_veff_output(volume, counts, n_events)
    return {
        "energy": float(np.mean(energies)),
        "veff": veff,
        "veff_error": veff / np.sqrt(counts) if counts else 0.0,
        "veff_low": v_lo * (weight_sum / counts if counts else 1.0),
        "veff_high": v_hi * (weight_sum / counts if counts else 1.0),
        "n_triggered": counts,
        "weight_sum": weight_sum,
        "solid_angle": abs(solid_angle),
        "n_events": n_events,
        "volume": volume,
    }


def get_Veff_Aeff(folder_or_files, **kwargs):
    """Aggregate over a folder / glob / list of output files (Veff.py:484-620)."""
    if isinstance(folder_or_files, str):
        if os.path.isdir(folder_or_files):
            files = sorted(glob.glob(os.path.join(folder_or_files, "*.hdf5")))
        else:
            files = sorted(glob.glob(folder_or_files))
    else:
        files = list(folder_or_files)
    return [get_Veff_Aeff_single(f, **kwargs) for f in files]


def merge_output_hdf5(filenames, outname):
    """Merge per-batch output files (utilities/merge_hdf5.py:16 semantics):
    concatenate per-shower arrays, sum n_events, keep common attrs."""
    datas = {}
    attrs = None
    n_events = 0
    for fn in filenames:
        with h5py.File(fn, "r") as f:
            n_events += int(f.attrs["n_events"])
            if attrs is None:
                attrs = dict(f.attrs)
            for k in f.keys():
                if isinstance(f[k], h5py.Dataset):
                    datas.setdefault(k, []).append(np.asarray(f[k]))
    with h5py.File(outname, "w") as f:
        for k, parts in datas.items():
            f[k] = np.concatenate(parts)
        for k, v in attrs.items():
            f.attrs[k] = v
        f.attrs["n_events"] = n_events
    return outname


def split_input_hdf5(filename, out_prefix, n_events_per_file):
    """Split an input event list into batches (utilities/split_hdf5.py:11)."""
    from nuradiomc_tpu.sim import io_hdf5

    inp = io_hdf5.read_input_hdf5(filename)
    gids = np.unique(inp.event_group_ids)
    outputs = []
    for i0 in range(0, len(gids), n_events_per_file):
        sel_g = set(gids[i0:i0 + n_events_per_file].tolist())
        rows = np.array([g in sel_g for g in inp.event_group_ids])
        out = f"{out_prefix}.part{i0 // n_events_per_file:04d}.hdf5"
        with h5py.File(out, "w") as f:
            for key in ("event_group_ids", "shower_ids", "xx", "yy", "zz",
                        "zeniths", "azimuths", "energies", "shower_energies",
                        "flavors", "inelasticity", "vertex_times"):
                f[key] = getattr(inp, key)[rows]
            f["shower_type"] = np.array(inp.shower_type[rows], dtype="S")
            f["interaction_type"] = np.array(inp.interaction_type[rows], dtype="S")
            for k, v in inp.attrs.items():
                f.attrs[k] = v
            f.attrs["n_events"] = len(sel_g)
        outputs.append(out)
    return outputs
