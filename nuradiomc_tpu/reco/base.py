"""Module convention: begin()/run(evt, station, det, ...)/end() with
provenance registration (NuRadioReco/modules/base/module.py:34-118)."""

from __future__ import annotations

import functools


def register_run():
    """Decorator recording each module invocation into the Event, so the
    processing history (and e.g. applied filters) can be replayed
    (base/module.py:34-118, Event.iter_modules)."""

    def decorator(run_fn):
        @functools.wraps(run_fn)
        def wrapper(self, evt, station=None, det=None, *args, **kwargs):
            name = type(self).__name__
            if evt is not None and hasattr(evt, "register_module_station"):
                sid = station.get_id() if station is not None else None
                if sid is not None:
                    evt.register_module_station(sid, self, name, kwargs)
                else:
                    evt.register_module_event(self, name, kwargs)
            return run_fn(self, evt, station, det, *args, **kwargs)

        return wrapper

    return decorator
