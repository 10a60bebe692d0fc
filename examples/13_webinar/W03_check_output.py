"""Webinar part 3: inspecting the simulation output
(counterpart of NuRadioMC/examples/06_webinar/W03CheckOutput.py).

The output HDF5 carries one row per event: the generator quantities
(vertices xx/yy/zz, directions, energies, weights) plus the trigger
results — ``triggered`` is the OR of all triggers, and
``multiple_triggers[:, i]`` the per-trigger decision matrix whose columns
are named by the ``trigger_names`` attribute.

Usage:  python W03_check_output.py [results/NuMC_output.hdf5]
"""
import sys

import h5py
import numpy as np

fname = sys.argv[1] if len(sys.argv) > 1 else "results/NuMC_output.hdf5"

with h5py.File(fname, "r") as fin:
    trigger_names = np.array([
        t.decode() if isinstance(t, bytes) else str(t)
        for t in fin.attrs["trigger_names"]])
    print("triggers in file:", list(trigger_names))

    # pick one trigger by name and mask the events that fired it
    chosen_trigger = trigger_names[0]
    trigger_index = int(np.squeeze(np.argwhere(
        trigger_names == chosen_trigger)))
    mask = np.array(fin["multiple_triggers"])[:, trigger_index]

    xx = np.array(fin["xx"])[mask]
    yy = np.array(fin["yy"])[mask]
    zz = np.array(fin["zz"])[mask]
    weights = np.array(fin["weights"])[mask]

    print(f"{mask.sum()} of {len(mask)} events fired '{chosen_trigger}'")
    print(f"weighted count: {weights.sum():.4g}")
    if mask.any():
        rr = np.sqrt(xx ** 2 + yy ** 2)
        print(f"triggered vertices: r in [{rr.min():.0f}, {rr.max():.0f}] m,"
              f" z in [{zz.min():.0f}, {zz.max():.0f}] m")

    # weighted vertex maps (saved, not shown: headless-friendly)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        ax1.hist2d(xx, yy, bins=25, weights=weights)
        ax1.set_xlabel("x [m]"), ax1.set_ylabel("y [m]")
        ax2.hist2d(np.sqrt(xx ** 2 + yy ** 2), zz, bins=25, weights=weights)
        ax2.set_xlabel("r [m]"), ax2.set_ylabel("z [m]")
        fig.suptitle(f"triggered vertices ({chosen_trigger})")
        fig.savefig("vertex_distributions.png", dpi=100)
        print("wrote vertex_distributions.png")
    except Exception as e:  # matplotlib optional for this tutorial step
        print("plotting skipped:", e)
