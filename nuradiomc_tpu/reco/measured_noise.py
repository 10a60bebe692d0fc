"""Experiment-specific measured-noise importers.

Superimpose REAL recorded noise (forced/software triggers) onto simulated
channel traces:

* :class:`RNOGNoiseImporter` — the RNO-G variant
  (measured_noise/RNO_G/noiseImporter.py:14-219): draws random
  forced-trigger events from RNO-G runs via :class:`reco.rnog_io.readRNOGData`
  (npz export backend in-container; mattak/pyroot when installed),
  optional station-id matching and MC->data channel mapping, strict
  trace-length and sampling-rate checks, per-event usage bookkeeping.
* :class:`ARIANNANoiseImporter` — the ARIANNA variant
  (measured_noise/ARIANNA/noiseImporterROOT.py:10-57): per-CHANNEL random
  draws from a CalibTree of forced triggers; ROOT TChain when pyroot is
  installed, else a committed ``caltree_export.npz``
  (``amp_out [N, C, S]`` in mV) with identical semantics.

The generic .nur-based ``channelMeasuredNoiseAdder`` lives in
``reco/channel_processing.py``.
"""
from __future__ import annotations

import collections
import glob
import logging
import os

import numpy as np

from nuradiomc_tpu.reco.base import register_run
from nuradiomc_tpu.utils import units

logger = logging.getLogger("nuradiomc_tpu.reco.measured_noise")


class RNOGNoiseImporter:
    """Imports recorded traces from RNO-G stations (forced triggers).

    API-compatible with the reference's
    ``measured_noise.RNO_G.noiseImporter.noiseImporter``.
    """

    def begin(self, noise_folders, file_pattern="*",
              match_station_id=False, station_ids=None,
              channel_mapping=None, scramble_noise_file_order=True,
              log_level=logging.NOTSET, random_seed=None, reader_kwargs=None):
        """
        noise_folders: folder(s) containing noise runs; searched
            recursively for ``{pattern}root`` (mattak) and ``{pattern}npz``
            (the in-repo export backend).
        match_station_id: only add noise from the simulated station's id.
        station_ids: restrict the allowed data station ids.
        channel_mapping: MC channel id -> data channel id (None = 1:1).
        scramble_noise_file_order: shuffle run folders before reading.
        random_seed: seeds the Philox generator (reference:63).
        reader_kwargs: forwarded to readRNOGData.begin (overrides the
            FORCE-trigger / physics-run defaults).
        """
        from nuradiomc_tpu.reco.rnog_io import readRNOGData

        if log_level:
            logger.setLevel(log_level)
        self._rng = np.random.Generator(np.random.Philox(random_seed))
        self._match_station_id = match_station_id
        self._station_ids = station_ids
        self._channel_mapping = channel_mapping

        if not isinstance(noise_folders, (list, tuple)):
            noise_folders = [noise_folders]
        noise_files = []
        for folder in noise_folders:
            if not folder:
                continue
            for ext in ("root", "npz"):
                noise_files += glob.glob(f"{folder}/**/{file_pattern}{ext}",
                                         recursive=True)
        self._noise_folders = np.unique(
            [os.path.dirname(e) for e in noise_files])
        if not len(self._noise_folders):
            raise FileNotFoundError(
                f"No noise run folders found under {noise_folders}")
        if scramble_noise_file_order:
            self._rng.shuffle(self._noise_folders)

        self._noise_reader = readRNOGData()
        kwargs = {
            "selectors": [lambda einfo: einfo.triggerType == "FORCE"],
            "select_runs": True,
            "max_trigger_rate": 2 * units.Hz,
            "run_types": ("physics",),
        }
        kwargs.update(reader_kwargs or {})
        self._noise_reader.begin(list(self._noise_folders), **kwargs)

        info = self._noise_reader.get_events_information(keys=("station",))
        self._event_index_list = np.array(list(info.keys()))
        self._station_id_list = np.array(
            [e["station"] for e in info.values()])
        self._n_use_event = collections.defaultdict(int)

    def _get_noise_channel(self, channel_id):
        if self._channel_mapping is None:
            return channel_id
        return self._channel_mapping[channel_id]

    def _draw_noise_event(self, mask):
        """Redraw (<=100 tries) when the reader returns None — e.g. inf
        trigger time or zero sampling rate (reference:124-157)."""
        noise_event = None
        for _ in range(100):
            i_noise = int(self._rng.choice(self._event_index_list[mask]))
            noise_event = self._noise_reader.get_event_by_index(i_noise)
            if noise_event is not None:
                break
        if noise_event is None:
            raise ValueError("Could not draw a random station which is not "
                             "None after 100 tries. Stop.")
        self._n_use_event[i_noise] += 1
        return noise_event, i_noise

    @register_run()
    def run(self, evt, station, det):
        if self._match_station_id:
            station_mask = self._station_id_list == station.get_id()
            if not np.any(station_mask):
                raise ValueError(f"No station with id {station.get_id()} "
                                 "in noise data.")
        else:
            station_mask = np.ones(len(self._event_index_list), dtype=bool)

        noise_event, i_noise = self._draw_noise_event(station_mask)
        station_id = noise_event.get_station_ids()[0]
        noise_station = noise_event.get_station(station_id)
        if self._station_ids is not None \
                and station_id not in self._station_ids:
            raise ValueError(f"Station id {station_id} not in list of "
                             f"allowed ids: {self._station_ids}")
        logger.debug("Selected noise event %d (run %s, event %s)", i_noise,
                     noise_event.get_run_number(), noise_event.get_id())

        for channel in station.iter_channels():
            trace = channel.get_trace()
            noise_channel = noise_station.get_channel(
                self._get_noise_channel(channel.get_id()))
            noise_trace = noise_channel.get_trace()

            if len(trace) > 2048:
                logger.warning("Simulated trace is longer than 2048 bins..."
                               " trim with :2048")
                trace = trace[:2048]
            if len(trace) != len(noise_trace):
                raise ValueError(
                    f"Mismatch in trace length: Noise has "
                    f"{len(noise_trace)} and simulation has {len(trace)} "
                    "samples")
            if channel.get_sampling_rate() \
                    != noise_channel.get_sampling_rate():
                raise ValueError(
                    "Mismatch in sampling rate: Noise has {} and simulation"
                    " has {} GHz".format(
                        noise_channel.get_sampling_rate() / units.GHz,
                        channel.get_sampling_rate() / units.GHz))

            channel.set_trace(trace + noise_trace,
                              channel.get_sampling_rate())

    def end(self):
        self._noise_reader.end()
        n_use = np.array(list(self._n_use_event.values()))
        if len(n_use):
            top = np.sort(n_use)[::-1][:5]
            logger.info("The five most used noise events have been used: "
                        "%s", ", ".join(str(v) for v in top))


class ARIANNANoiseImporter:
    """ARIANNA measured-noise importer (noiseImporterROOT.py:10-57).

    The recorded noise must match the station geometry and sampling (use
    channelResampler / channelLengthAdjuster first). Per CHANNEL a random
    CalibTree entry is drawn (the reference redraws inside the channel
    loop) and its mV waveform added. Backends: ROOT TChain("CalibTree")
    when pyroot is importable, else ``caltree_export.npz`` with
    ``amp_out [N_events, N_channels, N_samples]`` in mV.
    """

    def begin(self, noise_files, random_seed=None):
        self._rng = np.random.Generator(np.random.Philox(random_seed))
        if len(noise_files) > 1:
            logger.warning("Only using the first noise file, more is not "
                           "implemented yet")
        path = noise_files[0]
        if str(path).endswith(".npz"):
            data = np.load(path)
            self._amp_out = np.asarray(data["amp_out"], dtype=float)
            self._nevts = self._amp_out.shape[0]
            self._root = None
        else:
            import ROOT  # import-gated: experiment raw data needs pyroot

            self._root = ROOT.TChain("CalibTree")
            self._root.Add(path)
            self._data = ROOT.TSnCalWvData()
            self._root.SetBranchAddress("AmpOutData.", self._data)
            self._nevts = self._root.GetEntries()

    def _draw(self, channel_id, n_samples):
        """One random CalibTree entry's waveform for ``channel_id`` in
        volts, or None on a sample-count mismatch."""
        i = int(self._rng.integers(0, self._nevts + 1))
        i = min(i, self._nevts - 1)
        if self._root is None:
            wf = self._amp_out[i, channel_id]
            if wf.shape[0] != n_samples:
                return None
            return wf * units.mV
        self._root.GetEntry(i)
        if self._data.GetNumSamplesOn(0) != n_samples:
            return None
        return np.array(self._data.GetDataOnCh(channel_id)) * units.mV

    @register_run()
    def run(self, evt, station, det):
        for channel in station.iter_channels():
            trace = channel.get_trace()
            noise = self._draw(channel.get_id(), trace.shape[0])
            if noise is None:
                logger.warning("Mismatch in sample count — not adding "
                               "noise!")
                continue
            channel.set_trace(noise + trace, channel.get_sampling_rate())

    def end(self):
        pass


# reference-compatible aliases (module-path class name is `noiseImporter`)
noiseImporter = RNOGNoiseImporter
noiseImporterARIANNA = ARIANNANoiseImporter
