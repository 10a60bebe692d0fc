"""Create /tmp/refstubs: minimal stubs for the reference's third-party deps
so the read-only checkout at /root/reference can RUN to (re)generate golden
fixtures. Usage:

    python tests/golden/make_refstubs.py
    PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_X.py

Each stub implements only what the reference actually calls on the import
path of the golden generators (see CLAUDE.md "Golden data vs the reference").
"""
import os
import sys
import textwrap

ROOT = "/tmp/refstubs"


def write(rel, content):
    path = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(textwrap.dedent(content))


# ---- radiotools: coordinate helpers the reference uses ----------------------
write("radiotools/__init__.py", "")
write("radiotools/helper.py", '''
    import numpy as np

    def get_normalized_angle(angle, interval=None):
        if interval is None:
            interval = np.array([0, 2 * np.pi])
        delta = interval[1] - interval[0]
        return (np.asarray(angle) - interval[0]) % delta + interval[0]

    def spherical_to_cartesian(zenith, azimuth):
        st = np.sin(zenith)
        return np.array([st * np.cos(azimuth), st * np.sin(azimuth),
                         np.cos(zenith) * np.ones_like(azimuth)])

    def cartesian_to_spherical(x, y, z):
        r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
        return np.arccos(np.clip(z / r, -1, 1)), np.arctan2(y, x)

    def get_angle(v1, v2):
        n = np.linalg.norm(v1) * np.linalg.norm(v2)
        return np.arccos(np.clip(np.dot(v1, v2) / n, -1, 1))

    def rotate_vector_in_2d(v, angle):
        c, s = np.cos(angle), np.sin(angle)
        return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1]])

    def get_rotation(v1, v2):
        """Rotation matrix mapping unit vector v1 onto v2 (Rodrigues)."""
        v1 = v1 / np.linalg.norm(v1)
        v2 = v2 / np.linalg.norm(v2)
        k = np.cross(v1, v2)
        s = np.linalg.norm(k)
        c = np.dot(v1, v2)
        if s < 1e-12:
            return np.eye(3) if c > 0 else -np.eye(3)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + K + K @ K * ((1 - c) / s ** 2)

    def get_magnetic_field_vector(site=None):
        # default: south pole field as used by radiotools (T, NRR coords)
        return np.array([0.0, 0.00146, -0.05166])

    def get_declination(magnetic_field_vector):
        return np.arctan2(magnetic_field_vector[1], magnetic_field_vector[0])

    def get_magneticfield_azimuth(magnetic_field_declination):
        return magnetic_field_declination + np.pi * 0.5

    def get_magneticfield_zenith(magnetic_field_inclination):
        return magnetic_field_inclination + np.pi * 0.5

    def get_inclination(magnetic_field_vector):
        h = np.linalg.norm(magnetic_field_vector[:2])
        return np.arctan2(-magnetic_field_vector[2], h)

    def get_chi2(*args, **kwargs):
        raise NotImplementedError

    def is_equal(a, b, rel_precision=1e-5):
        return np.abs(a - b) <= rel_precision * np.abs(a + b) * 0.5

    def dB_to_linear(db):
        return 10 ** (np.asarray(db) / 10.0)

    def linear_to_dB(linear):
        return 10 * np.log10(np.asarray(linear))
''')
write("radiotools/coordinatesystems.py", '''
    import numpy as np
    from radiotools import helper as hp

    class cstrafo:
        """Minimal vxB transformation frame used by CoREAS/LOFAR modules."""

        def __init__(self, zenith, azimuth, magnetic_field_vector=None,
                     site=None):
            self._zenith = zenith
            self._azimuth = azimuth
            showeraxis = -hp.spherical_to_cartesian(zenith, azimuth)
            if magnetic_field_vector is None:
                magnetic_field_vector = hp.get_magnetic_field_vector(site=site)
            magnetic_field_normalized = (magnetic_field_vector
                                         / np.linalg.norm(magnetic_field_vector))
            vxB = np.cross(showeraxis, magnetic_field_normalized)
            e1 = vxB / np.linalg.norm(vxB)
            e2 = np.cross(showeraxis, e1)
            e2 /= np.linalg.norm(e2)
            e3 = showeraxis
            self.__transformation_matrix = np.array([e1, e2, e3])
            self.__inverse_transformation_matrix = np.linalg.inv(
                self.__transformation_matrix)

        # radiotools applies the matrix to the FIRST axis:
        # np.squeeze(np.dot(M, positions)) with positions (3,) or (3, N)
        def _apply(self, M, positions, core=None):
            pos = np.asarray(positions)
            if core is not None:
                pos = (pos.T - np.asarray(core)).T if pos.shape[0] == 3 \
                    else pos - np.asarray(core)
            return np.squeeze(np.tensordot(M, pos, axes=([1], [0])))

        def transform_to_vxB_vxvxB(self, positions, core=None):
            return self._apply(self.__transformation_matrix, positions, core)

        def transform_from_vxB_vxvxB(self, positions, core=None):
            out = self._apply(self.__inverse_transformation_matrix, positions)
            if core is not None:
                out = (out.T + np.asarray(core)).T if out.ndim > 1 \
                    else out + np.asarray(core)
            return out

        def transform_from_vxB_vxvxB_2D(self, positions, core=None):
            pos3 = np.asarray(positions)
            if pos3.shape[0] == 2:
                pos3 = np.vstack([pos3, np.zeros_like(pos3[0])])
            return self.transform_from_vxB_vxvxB(pos3, core=core)

        # on-sky (e_r, e_theta, e_phi) <-> ground, matching radiotools
        def _onsky_matrix(self):
            zen, az = self._zenith, self._azimuth
            st, ct = np.sin(zen), np.cos(zen)
            sp, cp = np.sin(az), np.cos(az)
            e_r = np.array([st * cp, st * sp, ct])
            e_theta = np.array([ct * cp, ct * sp, -st])
            e_phi = np.array([-sp, cp, 0.0])
            return np.array([e_r, e_theta, e_phi])

        def transform_from_ground_to_onsky(self, positions):
            return self._apply(self._onsky_matrix(), positions)

        def transform_from_onsky_to_ground(self, positions):
            return self._apply(self._onsky_matrix().T, positions)
''')
write("radiotools/atmosphere/__init__.py", "")
write("radiotools/atmosphere/models.py", '''
    import numpy as np

    class Atmosphere:
        def __init__(self, *args, **kwargs):
            pass

        def get_distance_xmax_geometric(self, zenith, xmax, observation_level=0):
            # Linsley layer-1 approximation, good enough for stubs
            rho0 = 1.168e-3  # g/cm^3 -> internal (reference uses grammage)
            h = -np.log(np.maximum(xmax, 1e-3) / 1036.0) * 8.4e5  # cm
            return h / 100.0 / np.cos(zenith)

    default_curved = True
''')

# ---- aenum (only used for Enum subclasses with aliases) ---------------------
write("aenum.py", '''
    from enum import Enum, IntEnum, auto  # noqa: F401

    class NoAlias:  # sentinel settings flag used as "settings = NoAlias"
        pass

    MultiValueEnum = Enum
''')

# ---- toml: the reference only reads its own pyproject for the package name --
write("toml.py", '''
    def load(f):
        return {"project": {"name": "NuRadioMC", "version": "0.0.0-ref"},
                "tool": {"poetry": {"name": "NuRadioMC",
                                    "version": "0.0.0-ref"}}}
''')

# ---- tinydb / tinydb_serialization: detector JSON "database" ----------------
write("tinydb/__init__.py", '''
    import json

    class Query:
        def __getattr__(self, name):
            return _Field((name,))

    def where(name):
        return _Field((name,))

    class _Field:
        def __init__(self, path):
            self._path = path

        def __getattr__(self, name):
            return _Field(self._path + (name,))

        def _get(self, doc):
            v = doc
            for p in self._path:
                v = v[p]
            return v

        def __eq__(self, other):
            return _Cond(lambda d: self._path[0] in d and self._get(d) == other)

        def __le__(self, other):
            return _Cond(lambda d: self._path[0] in d and self._get(d) <= other)

        def __ge__(self, other):
            return _Cond(lambda d: self._path[0] in d and self._get(d) >= other)

        def __lt__(self, other):
            return _Cond(lambda d: self._path[0] in d and self._get(d) < other)

        def __gt__(self, other):
            return _Cond(lambda d: self._path[0] in d and self._get(d) > other)

        def __ne__(self, other):
            return _Cond(lambda d: self._path[0] in d and self._get(d) != other)

        def exists(self):
            return _Cond(lambda d: self._path[0] in d)

    class _Cond:
        def __init__(self, fn):
            self._fn = fn

        def __call__(self, doc):
            return self._fn(doc)

        def __and__(self, other):
            return _Cond(lambda d: self(d) and other(d))

        def __or__(self, other):
            return _Cond(lambda d: self(d) or other(d))

    class _Table:
        def __init__(self, docs):
            self._docs = docs

        def all(self):
            return list(self._docs)

        def search(self, cond):
            return [d for d in self._docs if cond(d)]

        def get(self, cond):
            for d in self._docs:
                if cond(d):
                    return d
            return None

        def insert(self, doc):
            # decode TinyDate markers exactly as the serialization storage
            # would (generic_detector's dictionary source inserts raw docs)
            self._docs.append(_decode(dict(doc)))

        def truncate(self):
            self._docs = []

        def update(self, fields, cond=None):
            for d in self._docs:
                if cond is None or cond(d):
                    d.update(_decode(dict(fields)))

        def __iter__(self):
            return iter(self._docs)

        def __len__(self):
            return len(self._docs)

    def _decode(value):
        # tinydb_serialization TinyDate strings -> datetime (as the real
        # serialization middleware would)
        import datetime as _dt
        if isinstance(value, str) and value.startswith("{TinyDate}:"):
            return _dt.datetime.fromisoformat(value[len("{TinyDate}:"):])
        if isinstance(value, dict):
            return {k: _decode(v) for k, v in value.items()}
        if isinstance(value, list):
            return [_decode(v) for v in value]
        return value

    class TinyDB:
        def __init__(self, path_or_none=None, storage=None, **kwargs):
            self._tables = {}
            if isinstance(path_or_none, str):
                try:
                    with open(path_or_none) as f:
                        raw = json.load(f)
                    for name, docs in raw.items():
                        self._tables[name] = _Table(
                            [_decode(d) for d in docs.values()])
                except Exception:
                    pass

        def table(self, name, **kwargs):
            return self._tables.setdefault(name, _Table([]))

        def truncate(self):
            self._tables = {}

        def close(self):
            pass

    class Storage:  # base class for custom storages
        pass

    class JSONStorage(Storage):
        pass
''')
write("tinydb/storages.py", '''
    from tinydb import JSONStorage, Storage  # noqa: F401

    class MemoryStorage(Storage):
        def __init__(self, *args, **kwargs):
            self.memory = None

        def read(self):
            return self.memory

        def write(self, data):
            self.memory = data
''')
write("tinydb_serialization.py", '''
    from tinydb.storages import MemoryStorage

    class Serializer:
        pass

    class SerializationMiddleware:
        def __init__(self, storage_cls=MemoryStorage):
            self._storage_cls = storage_cls
            self._serializers = {}

        def register_serializer(self, serializer, name):
            self._serializers[name] = serializer

        def __call__(self, *args, **kwargs):
            return self._storage_cls(*args, **kwargs)
''')

# ---- pymongo / bson: only imported, never connected in our generators -------
write("pymongo.py", '''
    class MongoClient:
        def __init__(self, *args, **kwargs):
            raise RuntimeError("no MongoDB in this environment")
''')
write("bson/__init__.py", "")
write("bson/objectid.py", '''
    class ObjectId:
        def __init__(self, *args, **kwargs):
            pass
''')
write("bson/son.py", '''
    class SON(dict):
        pass
''')

# ---- astropy: time objects the framework stores ------------------------------
write("astropy/__init__.py", "")
write("astropy/time.py", '''
    import datetime as _dt

    _EPOCH_JD = 2440587.5  # 1970-01-01T00:00:00 UTC

    class Time:
        """Tiny astropy.time.Time lookalike (utc scale, jd/unix/datetime/isot)."""

        def __init__(self, val, val2=None, format=None, scale=None):
            self.scale = scale or "utc"
            self.precision = 3
            if isinstance(val, Time):
                self._jd1, self._jd2 = val._jd1, val._jd2
            elif format == "jd" or (format is None and isinstance(val, (int, float)) and val > 1e6):
                self._jd1 = float(val)
                self._jd2 = float(val2 or 0.0)
            elif isinstance(val, _dt.datetime):
                unix = val.replace(tzinfo=_dt.timezone.utc).timestamp()
                self._jd1 = _EPOCH_JD + unix // 86400
                self._jd2 = (unix % 86400) / 86400.0
            elif isinstance(val, str):
                s = val.replace("T", " ")
                parts = s.split(" ")
                d = [int(x) for x in parts[0].split("-")]
                s = f"{d[0]:04d}-{d[1]:02d}-{d[2]:02d}" + \
                    (" " + parts[1] if len(parts) > 1 else "")
                dt = _dt.datetime.fromisoformat(s)
                unix = dt.replace(tzinfo=_dt.timezone.utc).timestamp()
                self._jd1 = _EPOCH_JD + unix // 86400
                self._jd2 = (unix % 86400) / 86400.0
            elif format == "unix":
                self._jd1 = _EPOCH_JD + float(val) // 86400
                self._jd2 = (float(val) % 86400) / 86400.0
            else:
                raise ValueError(f"unsupported Time init: {val!r} ({format})")
            self.format = format or "isot"

        @property
        def jd1(self):
            return self._jd1

        @property
        def jd2(self):
            return self._jd2

        @property
        def unix(self):
            return (self._jd1 - _EPOCH_JD + self._jd2) * 86400.0

        @property
        def datetime(self):
            return _dt.datetime.fromtimestamp(self.unix, _dt.timezone.utc) \
                .replace(tzinfo=None)

        @property
        def isot(self):
            return self.datetime.isoformat()

        @property
        def value(self):
            return self.isot

        @staticmethod
        def _unix_of(other):
            if isinstance(other, Time):
                return other.unix
            if isinstance(other, _dt.datetime):
                return other.replace(tzinfo=_dt.timezone.utc).timestamp()
            return float(other)

        def __eq__(self, other):
            try:
                return self.unix == self._unix_of(other)
            except (TypeError, ValueError):
                return NotImplemented

        def __lt__(self, other):
            return self.unix < self._unix_of(other)

        def __le__(self, other):
            return self.unix <= self._unix_of(other)

        def __gt__(self, other):
            return self.unix > self._unix_of(other)

        def __ge__(self, other):
            return self.unix >= self._unix_of(other)

        def __repr__(self):
            return f"<Time {self.isot}>"

        def __add__(self, other):
            out = Time(self._jd1, self._jd2, format="jd")
            out._jd2 += getattr(other, "sec", other) / 86400.0
            return out

        def __sub__(self, other):
            if isinstance(other, Time):
                return TimeDelta((self.unix - other.unix), format="sec")
            return self.__add__(-other)

        @classmethod
        def now(cls):
            return cls(_dt.datetime.utcnow())

    class TimeDelta:
        def __init__(self, val, format="sec", scale=None):
            self.sec = float(val) if format == "sec" else float(val) * 86400.0

        def __neg__(self):
            return TimeDelta(-self.sec)

        def __lt__(self, other):
            return self.sec < getattr(other, "sec", other)

        def __le__(self, other):
            return self.sec <= getattr(other, "sec", other)

        def __gt__(self, other):
            return self.sec > getattr(other, "sec", other)

        def __ge__(self, other):
            return self.sec >= getattr(other, "sec", other)

        def __mul__(self, other):
            return TimeDelta(self.sec * other)

        __rmul__ = __mul__

        def __truediv__(self, other):
            return TimeDelta(self.sec / other)

        @property
        def value(self):
            return self.sec
''')
write("astropy/units.py", '''
    # minimal unit symbols used in reference type hints / scalars
    class _Unit:
        def __init__(self, name):
            self.name = name

        def __rmul__(self, other):
            return other

    deg = _Unit("deg")
    m = _Unit("m")
    s = _Unit("s")
''')
write("astropy/utils/__init__.py", "")
write("astropy/utils/exceptions.py", '''
    class ErfaWarning(Warning):
        pass

    class AstropyWarning(Warning):
        pass
''')
write("astropy/coordinates.py", '''
    class SkyCoord:
        def __init__(self, *args, **kwargs):
            raise NotImplementedError("astropy stub: SkyCoord not available")

    class EarthLocation:
        def __init__(self, *args, **kwargs):
            raise NotImplementedError

        @classmethod
        def from_geodetic(cls, *args, **kwargs):
            raise NotImplementedError

    def get_sun(*args, **kwargs):
        raise NotImplementedError

    class AltAz:
        def __init__(self, *args, **kwargs):
            raise NotImplementedError
''')

print(f"refstubs written to {ROOT}")
