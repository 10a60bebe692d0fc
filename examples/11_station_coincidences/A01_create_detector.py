#!/usr/bin/env python3
"""Step 1: build a multi-station grid detector.

Mirrors the reference examples/03_station_coincidences/A01create_detector.py:
one 4-channel dipole station at the origin plus a ring of identical stations
at increasing horizontal distances, to study how often one neutrino fires
more than one station (the "coincidence" rate that sets the science value of
a sparse array layout).

Usage: A01_create_detector.py [d1,d2,...]   (ring distances in m,
                                             default "750,1500")
"""
import json
import sys

DISTANCES = ([float(d) for d in sys.argv[1].split(",")]
             if len(sys.argv) > 1 else [750.0, 1500.0])


def _channel(cid, sid, x, y, z):
    return {"adc_n_samples": 256, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": x, "ant_position_y": y, "ant_position_z": z,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_VPol", "amp_type": "",
            "cab_time_delay": 0.0, "adc_nbits": None,
            "channel_id": cid, "station_id": sid}


det = {"channels": {}, "stations": {}}
positions = [(101, 0.0, 0.0)]
sid = 102
for d in DISTANCES:
    # two stations per ring (+x and +y) keep the example cheap; the full
    # reference study uses 8 per ring at 10 distances
    positions.append((sid, d, 0.0)); sid += 1
    positions.append((sid, 0.0, d)); sid += 1

k = 1
for sid, x, y in positions:
    det["stations"][str(sid)] = {"station_id": sid, "pos_easting": x,
                                 "pos_northing": y, "pos_altitude": 0}
    for c in range(4):
        # channel positions are relative to the station; the station offset
        # lives in pos_easting/pos_northing (generic_detector.py semantics)
        det["channels"][str(k)] = _channel(c, sid, 0.0, 0.0, -100.0 - 2.0 * c)
        k += 1

with open("coincidence_detector.json", "w") as f:
    json.dump(det, f, indent=2)
print(f"wrote coincidence_detector.json "
      f"({len(positions)} stations: {[p[0] for p in positions]})")
