"""Event viewer: plot traces/spectra/station overviews from event files.

A lightweight CLI/matplotlib replacement for the reference's Dash event
browser (NuRadioReco/eventbrowser/app.py — overview/traces/simulation tabs,
trace + spectrum plots, launched via `NuRadioViewer`). Renders the same
per-channel time traces and spectra plus the station overview, to files or
interactive windows.

Usage::

    python -m nuradiomc_tpu.sim.eventbrowser events.nur [--event N] [--out dir]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from nuradiomc_tpu.sim.io_nur import EventReader
from nuradiomc_tpu.utils import units


def plot_event(event, out_path=None, show=False):
    """Trace + spectrum grid for every channel of every station."""
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for station in event.get_stations():
        cids = station.get_channel_ids()
        n = max(len(cids), 1)
        fig, axes = plt.subplots(n, 2, figsize=(11, 2.2 * n), squeeze=False)
        for i, cid in enumerate(cids):
            ch = station.get_channel(cid)
            tr = ch.get_trace()
            tt = ch.get_times()
            axes[i][0].plot(tt, tr / units.mV, lw=0.8)
            axes[i][0].set_ylabel(f"ch {cid}\n[mV]")
            spec = np.abs(ch.get_frequency_spectrum())
            ff = ch.get_frequencies()
            axes[i][1].plot(ff / units.MHz, spec, lw=0.8)
            axes[i][1].set_yscale("log")
        axes[-1][0].set_xlabel("time [ns]")
        axes[-1][1].set_xlabel("frequency [MHz]")
        fig.suptitle(f"run {event.get_run_number()} event {event.get_id()} "
                     f"station {station.get_id()}"
                     + (" TRIGGERED" if station.has_triggered() else ""))
        fig.tight_layout()
        if out_path:
            fn = os.path.join(
                out_path, f"event_{event.get_id()}_station_{station.get_id()}.png")
            fig.savefig(fn, dpi=120)
            print("wrote", fn)
        if show:
            plt.show()
        plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser(description="nuradiomc-tpu event viewer")
    ap.add_argument("filename")
    ap.add_argument("--event", type=int, default=None,
                    help="only plot this event id")
    ap.add_argument("--out", default=".", help="output directory for PNGs")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args(argv)

    reader = EventReader(args.filename)
    for event in reader.get_events():
        if args.event is not None and event.get_id() != args.event:
            continue
        plot_event(event, out_path=args.out, show=args.show)
    reader.end()


if __name__ == "__main__":
    main()
