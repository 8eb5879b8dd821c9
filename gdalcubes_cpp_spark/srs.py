"""Spatial reference support, pure formulas (pyproj/GDAL unavailable).

The reference supports arbitrary SRS through GDAL with a cached transform
(src/warp.cpp:33-55; src/view.h:703-711 accepts EPSG/WKT/proj4); footprints
are always stored in EPSG:4326 (src/image_collection.cpp:309-326) and query
rectangles are transformed to 4326 for the find_range_st predicate
(src/image_collection.cpp:1326). We implement the same protocol for the SRS
families that cover real workloads:

- EPSG:4326            identity (separable)
- EPSG:3857            spherical web mercator (separable: x<->lon, y<->lat
                       independent) — 1-D axis vectors transform alone
- EPSG:326xx / 327xx   UTM zones on the WGS84 ellipsoid (NON-separable:
                       lon depends on both x and y) via the transverse-
                       Mercator series of Snyder 1987 (USGS PP 1395,
                       eq. 8-9..8-25), vectorized numpy, ~mm accuracy
                       in-zone — the reference's flagship products are
                       UTM-zone rasters (formats/Sentinel2_L2A.json)

Non-separable SRS force the warp kernels onto 2-D coordinate grids
(grid_to_wgs84) and conservative bbox transforms (densified edge sampling,
bbox_to_wgs84) — the per-cell inside test stays exact, the join predicate
only needs to be a superset.

tm_inverse_sql() emits the SAME inverse series as ANSI SQL with the SAME
operation order, so a SQL engine (DuckDB oracle / Spark SQL) reproduces the
numpy cell-center coordinates to within libm ulps; driver queries built on
it keep footprint edges on a coarse decimal grid so ulp-level disagreement
can never flip a coverage decision (margin asserted in tests).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, functions as F

R = 6378137.0  # WGS84 spherical radius used by EPSG:3857

# WGS84 ellipsoid (UTM)
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2 = F_WGS84 * (2.0 - F_WGS84)
EP2 = E2 / (1.0 - E2)
K0 = 0.9996
FE = 500000.0
FN_SOUTH = 10000000.0

# meridian-arc series coefficients (Snyder eq. 3-21)
_C0 = 1.0 - E2 / 4.0 - 3.0 * E2 ** 2 / 64.0 - 5.0 * E2 ** 3 / 256.0
_C2 = 3.0 * E2 / 8.0 + 3.0 * E2 ** 2 / 32.0 + 45.0 * E2 ** 3 / 1024.0
_C4 = 15.0 * E2 ** 2 / 256.0 + 45.0 * E2 ** 3 / 1024.0
_C6 = 35.0 * E2 ** 3 / 3072.0
_E1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))

_UTM_RE = re.compile(r"^EPSG:32([67])(\d\d)$")


@dataclass(frozen=True)
class PolarPS:
    """Polar stereographic variant B (EPSG method 9829; Snyder 1987 §21):
    standard-parallel form on the WGS84 ellipsoid."""

    lat_ts: float  # latitude of standard parallel (deg, signed)
    lon0: float    # longitude of origin (deg)
    fe: float
    fn: float
    south: bool


@dataclass(frozen=True)
class LaeaParams:
    """Lambert azimuthal equal-area, ellipsoidal (EPSG method 9820;
    Snyder 1987 §24) — EPSG:3035 is the ESA/EEA European grid."""

    lat0: float
    lon0: float
    fe: float
    fn: float
    a: float
    e2: float


# GRS80 ellipsoid (EPSG:3035 datum ETRS89); differs from WGS84 only in the
# 12th significant digit of the flattening
_F_GRS80 = 1.0 / 298.257222101
_E2_GRS80 = _F_GRS80 * (2.0 - _F_GRS80)

_POLAR = {
    # WGS84 Antarctic Polar Stereographic (the EPSG registry parameters)
    "EPSG:3031": PolarPS(lat_ts=-71.0, lon0=0.0, fe=0.0, fn=0.0, south=True),
    # NSIDC Sea Ice Polar Stereographic North
    "EPSG:3413": PolarPS(lat_ts=70.0, lon0=-45.0, fe=0.0, fn=0.0, south=False),
}

_LAEA = {
    # ETRS89-extended / LAEA Europe (the ESA CCI / EEA reference grid)
    "EPSG:3035": LaeaParams(
        lat0=52.0, lon0=10.0, fe=4321000.0, fn=3210000.0,
        a=6378137.0, e2=_E2_GRS80,
    ),
}


def _proj4_kv(s: str) -> dict:
    """'+proj=utm +zone=33 +south' -> {'proj': 'utm', 'zone': '33',
    'south': True} (flags map to True)."""
    out = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        k, _, v = tok.partition("=")
        out[k.lower()] = v.lower() if v else True
    return out


def _proj4_ellps(kv: dict, s: str):
    """(a, e2) from +ellps= / +a=+b= / +a=+rf= (defaults to WGS84)."""
    if "ellps" in kv and kv["ellps"] is not True:
        known = _ELLPS.get(kv["ellps"])
        if known is None:
            raise ValueError(f"unknown +ellps={kv['ellps']} in {s!r}")
        return known[0], _e2_of(*known)
    if "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            return a, _e2_of(a, float(kv["rf"]))
        b = float(kv.get("b", a))
        f = (a - b) / a
        return a, f * (2.0 - f)
    return A_WGS84, E2


def _proj4_towgs84(kv: dict, s: str):
    """7-tuple (tx,ty,tz,rx",ry",rz",ds_ppm) from +towgs84=, or None.
    3-param form pads zero rotations/scale (the EPSG geocentric
    translation special case)."""
    ng = kv.get("nadgrids")
    if ng not in (None, True) and str(ng) not in ("@null", "null"):
        # NTv2 grid-shift file(s): PROJ semantics give +nadgrids=
        # precedence over +towgs84=. The tag rides the helm slot; the
        # datum stage dispatches on it (sources/ntv2.py). Only the first
        # grid of a comma list is used ('@' optional-prefixes stripped).
        path = str(ng).split(",")[0].lstrip("@")
        return ("ntv2", path)
    tw = kv.get("towgs84")
    if tw in (None, True):
        return None
    vals = [float(v) for v in str(tw).split(",")]
    if len(vals) == 3:
        vals += [0.0, 0.0, 0.0, 0.0]
    if len(vals) != 7:
        raise ValueError(f"+towgs84 needs 3 or 7 values in {s!r}")
    if all(v == 0.0 for v in vals):
        return None
    return tuple(vals)


def _from_proj4(s: str) -> str:
    """Resolve a proj4 string to a supported SRS (the reference feeds any
    user SRS string to GDAL, src/view.h:703-711; we resolve the families
    our kernels implement). Known EPSG parameter sets canonicalize to the
    EPSG code; other polar-stereographic / LAEA parameter sets register a
    dynamic entry so they warp too."""
    kv = _proj4_kv(s)
    proj = kv.get("proj")
    if proj == "longlat":
        return "EPSG:4326"
    if proj == "merc" and kv.get("a") == "6378137" and kv.get("b") == "6378137":
        return "EPSG:3857"
    if proj == "utm" and "zone" in kv:
        zone = int(kv["zone"])
        if not 1 <= zone <= 60:
            raise ValueError(f"UTM zone {zone} out of range in {s!r}")
        return f"EPSG:32{7 if kv.get('south') else 6}{zone:02d}"
    if proj == "stere" and float(kv.get("lat_0", 0)) in (90.0, -90.0):
        south = float(kv["lat_0"]) < 0
        p = PolarPS(
            lat_ts=float(kv.get("lat_ts", kv["lat_0"])),
            lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            south=south,
        )
        for code, known in _POLAR.items():
            if known == p:
                return code
        key = f"PS:{p.lat_ts}:{p.lon0}:{p.fe}:{p.fn}:{'S' if south else 'N'}"
        _POLAR[key] = p
        return key
    if proj == "laea":
        p = LaeaParams(
            lat0=float(kv.get("lat_0", 0.0)), lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            a=6378137.0,
            e2=_E2_GRS80 if kv.get("ellps") == "grs80" else E2,
        )
        for code, known in _LAEA.items():
            if known == p:
                return code
        key = f"LAEA:{p.lat0}:{p.lon0}:{p.fe}:{p.fn}:{p.e2:.17e}"
        _LAEA[key] = p
        return key
    if proj == "aea":
        p = AeaParams(
            lat1=float(kv.get("lat_1", 0.0)),
            lat2=float(kv.get("lat_2", kv.get("lat_1", 0.0))),
            lat0=float(kv.get("lat_0", 0.0)), lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            a=6378137.0,
            e2=_E2_GRS80 if kv.get("ellps") == "grs80" else E2,
        )
        for code, known in _AEA.items():
            if known == p:
                return code
        key = (
            f"AEA:{p.lat1}:{p.lat2}:{p.lat0}:{p.lon0}:{p.fe}:{p.fn}:{p.e2:.17e}"
        )
        _AEA[key] = p
        return key
    if proj == "lcc":
        p = LccParams(
            lat1=float(kv.get("lat_1", 0.0)),
            lat2=float(kv.get("lat_2", kv.get("lat_1", 0.0))),
            lat0=float(kv.get("lat_0", 0.0)), lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            a=6378137.0,
            e2=_E2_GRS80 if kv.get("ellps") == "grs80" else E2,
        )
        for code, known in _LCC.items():
            if known == p:
                return code
        key = (
            f"LCC:{p.lat1}:{p.lat2}:{p.lat0}:{p.lon0}:{p.fe}:{p.fn}:{p.e2:.17e}"
        )
        _LCC[key] = p
        return key
    if proj in ("tmerc", "somerc"):
        a, e2 = _proj4_ellps(kv, s)
        helm = _proj4_towgs84(kv, s)
        if proj == "tmerc":
            p = EtmParams(
                a=a, e2=e2, k0=float(kv.get("k", kv.get("k_0", 1.0))),
                lat0=float(kv.get("lat_0", 0.0)), lon0=float(kv.get("lon_0", 0.0)),
                fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
                helm=helm,
            )
            for code, known in _ETM.items():
                if known == p:
                    return code
            key = "ETM:" + ":".join(
                repr(v) for v in (p.a, p.e2, p.k0, p.lat0, p.lon0, p.fe, p.fn)
            )
            if helm is not None:
                key += ":" + _helm_key(helm)
            _ETM[key] = p
            return key
        pw = SwissParams(
            a=a, e2=e2,
            lat0=float(kv.get("lat_0", 0.0)), lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            helm=helm,
        )
        if float(kv.get("k", kv.get("k_0", 1.0))) != 1.0:
            raise ValueError(f"+proj=somerc supports k_0=1 only (Swiss): {s!r}")
        for code, known in _SWISS.items():
            if known == pw:
                return code
        key = "SOMERC:" + ":".join(
            repr(v) for v in (pw.a, pw.e2, pw.lat0, pw.lon0, pw.fe, pw.fn)
        )
        if helm is not None:
            key += ":" + _helm_key(helm)
        _SWISS[key] = pw
        return key
    if proj == "omerc":
        if kv.get("no_uoff"):
            raise ValueError("omerc variant A (+no_uoff) is unsupported; "
                             "variant B (EPSG 9815) only")
        a, e2 = _proj4_ellps(kv, s)
        helm = _proj4_towgs84(kv, s)
        alpha = float(kv.get("alpha", 0.0))
        ph = HomParams(
            a=a, e2=e2,
            latc=float(kv.get("lat_0", 0.0)), lonc=float(kv.get("lonc", 0.0)),
            alphac=alpha, gammac=float(kv.get("gamma", alpha)),
            k0=float(kv.get("k", kv.get("k_0", 1.0))),
            ec=float(kv.get("x_0", 0.0)), nc=float(kv.get("y_0", 0.0)),
            helm=helm,
        )
        for code, known in _HOM.items():
            if known == ph:
                return code
        key = "HOM:" + ":".join(repr(v) for v in (
            ph.a, ph.e2, ph.latc, ph.lonc, ph.alphac, ph.gammac, ph.k0,
            ph.ec, ph.nc))
        if helm is not None:
            key += ":" + _helm_key(helm)
        _HOM[key] = ph
        return key
    if proj == "aeqd":
        a, e2 = _proj4_ellps(kv, s)
        helm = _proj4_towgs84(kv, s)
        pq = AeqdParams(
            lat0=float(kv.get("lat_0", 0.0)), lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            a=a, e2=e2, helm=helm,
        )
        for code, known in _AEQD.items():
            if known == pq:
                return code
        key = "AEQD:" + ":".join(repr(v) for v in (
            pq.lat0, pq.lon0, pq.fe, pq.fn, pq.a, pq.e2))
        if helm is not None:
            key += ":" + _helm_key(helm)
        _AEQD[key] = pq
        return key
    if proj == "eqc":
        a, e2 = _proj4_ellps(kv, s)
        pe = EqcParams(
            lat_ts=float(kv.get("lat_ts", 0.0)), lat0=float(kv.get("lat_0", 0.0)),
            lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            a=a, e2=e2,
        )
        for code, known in _EQC.items():
            if known == pe:
                return code
        key = "EQC:" + ":".join(repr(v) for v in (
            pe.lat_ts, pe.lat0, pe.lon0, pe.fe, pe.fn, pe.a, pe.e2))
        _EQC[key] = pe
        return key
    if proj == "cea":
        a, e2 = _proj4_ellps(kv, s)
        pc = CeaParams(
            lat_ts=float(kv.get("lat_ts", 0.0)), lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
            a=a, e2=e2,
        )
        for code, known in _CEA.items():
            if known == pc:
                return code
        key = "CEA:" + ":".join(repr(v) for v in (
            pc.lat_ts, pc.lon0, pc.fe, pc.fn, pc.a, pc.e2))
        _CEA[key] = pc
        return key
    if proj == "sinu":
        # spherical form (the MODIS grid): radius from +R= (or a sphere
        # given as +a=); the ellipsoidal series is not implemented
        r = kv.get("r") or kv.get("a")
        if r is None:
            raise ValueError(f"+proj=sinu needs an explicit +R= sphere in {s!r}")
        if kv.get("b") not in (None, True) and float(kv["b"]) != float(r):
            raise ValueError(f"ellipsoidal sinusoidal is unsupported: {s!r}")
        p = SinuParams(
            r=float(r), lon0=float(kv.get("lon_0", 0.0)),
            fe=float(kv.get("x_0", 0.0)), fn=float(kv.get("y_0", 0.0)),
        )
        key = f"SINU:{p.r}:{p.lon0}:{p.fe}:{p.fn}"
        _SINU[key] = p
        return key
    raise ValueError(f"unsupported proj4 SRS {s!r}")


_WKT_EPSG_RE = re.compile(
    r"""(?:AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]|ID\s*\[\s*"EPSG"\s*,\s*(\d+)\s*\])""",
    re.IGNORECASE,
)


def normalize(srs: str) -> str:
    raw = str(srs).strip()
    if raw.startswith("+"):
        return _from_proj4(raw)
    if "[" in raw:
        # WKT1/WKT2: the LAST EPSG authority entry is the CRS's own code
        hits = _WKT_EPSG_RE.findall(raw)
        if hits:
            code = hits[-1][0] or hits[-1][1]
            return normalize(f"EPSG:{code}")
        raise ValueError(f"WKT without an EPSG authority is unsupported: {raw[:60]}...")
    if raw.startswith(("PS:", "LAEA:", "SINU:", "LCC:", "AEA:", "ETM:", "SOMERC:", "HOM:", "CEA:", "AEQD:", "EQC:")):
        # dynamic keys are SELF-DESCRIBING (parse-on-demand): executor
        # python workers import srs.py fresh, so a driver-side registry
        # alone would not resolve them inside kernels
        if (
            _polar_of(raw) is None and _laea_of(raw) is None
            and _sinu_of(raw) is None and _lcc_of(raw) is None
            and _aea_of(raw) is None and _etm_of(raw) is None
            and _swiss_of(raw) is None and _hom_of(raw) is None
            and _cea_of(raw) is None and _aeqd_of(raw) is None
            and _eqc_of(raw) is None
        ):
            raise ValueError(f"malformed dynamic SRS key {raw!r}")
        return raw
    s = raw.upper().replace(" ", "")
    if s in ("EPSG:4326", "WGS84", "CRS84"):
        return "EPSG:4326"
    if s in ("EPSG:3857", "EPSG:900913", "WEBMERCATOR"):
        return "EPSG:3857"
    if (s in _POLAR or s in _LAEA or s in _LCC or s in _AEA or s in _ETM
            or s in _SWISS or s in _HOM or s in _CEA or s in _AEQD
            or s in _EQC):
        return s
    m = _UTM_RE.match(s)
    if m:
        zone = int(m.group(2))
        if 1 <= zone <= 60:
            return s
    raise ValueError(
        f"unsupported SRS {srs!r} (supported: EPSG:4326, EPSG:3857, "
        f"EPSG:326xx/327xx UTM zones, EPSG:3031/3413 polar stereographic, "
        f"EPSG:3035 LAEA Europe, spherical sinusoidal (the MODIS grid), "
        f"EPSG:2154 Lambert-93 conformal conic, EPSG:5070 Conus Albers, "
        f"EPSG:27700 British National Grid (OSGB36 datum), EPSG:2056/21781 "
        f"Swiss oblique Mercator (CH1903 datum), equivalent proj4/WKT "
        f"strings, and any polar-stereographic/LAEA/sinusoidal/LCC/Albers/"
        f"tmerc/somerc/cea/eqc proj4 parameter set incl. +towgs84 datum shifts)"
    )


def is_separable(srs: str) -> bool:
    """True iff x depends only on lon and y only on lat (1-D axis transforms
    suffice); UTM/polar/LAEA are non-separable. Cylindrical equal area
    (EPSG:6933 EASE-Grid 2.0) and equidistant cylindrical (EPSG:4087
    Plate Carrée) ARE separable."""
    s = normalize(srs)
    return (s in ("EPSG:4326", "EPSG:3857") or _cea_of(s) is not None
            or _eqc_of(s) is not None)


def utm_params(srs: str):
    """(lon0_degrees, false_northing) of a UTM code, or None."""
    m = _UTM_RE.match(normalize(srs))
    if not m:
        return None
    zone = int(m.group(2))
    lon0 = -183.0 + 6.0 * zone
    fn = FN_SOUTH if m.group(1) == "7" else 0.0
    return lon0, fn


# -- web mercator (numpy, kernel-side) ----------------------------------------

def lon_to_x(lon):
    return np.radians(np.asarray(lon, dtype=np.float64)) * R


def lat_to_y(lat):
    lat = np.asarray(lat, dtype=np.float64)
    return R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))


def x_to_lon(x):
    return np.degrees(np.asarray(x, dtype=np.float64) / R)


def y_to_lat(y):
    return np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R)) - np.pi / 2.0)


# -- transverse Mercator / UTM (numpy; Snyder 1987 eq. 8-9..8-25) -------------

def tm_forward(lon, lat, lon0: float, fn: float = 0.0):
    """(lon, lat) degrees -> UTM (x, y) meters. Vectorized; broadcastable."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    sinp = np.sin(phi)
    cosp = np.cos(phi)
    tanp = np.tan(phi)
    N = A_WGS84 / np.sqrt(1.0 - E2 * sinp * sinp)
    T = tanp * tanp
    C = EP2 * cosp * cosp
    Aa = cosp * lam
    M = A_WGS84 * (
        _C0 * phi - _C2 * np.sin(2.0 * phi) + _C4 * np.sin(4.0 * phi) - _C6 * np.sin(6.0 * phi)
    )
    x = FE + K0 * N * (
        Aa
        + (1.0 - T + C) * Aa ** 3 / 6.0
        + (5.0 - 18.0 * T + T * T + 72.0 * C - 58.0 * EP2) * Aa ** 5 / 120.0
    )
    y = fn + K0 * (
        M
        + N * tanp * (
            Aa * Aa / 2.0
            + (5.0 - T + 9.0 * C + 4.0 * C * C) * Aa ** 4 / 24.0
            + (61.0 - 58.0 * T + T * T + 600.0 * C - 330.0 * EP2) * Aa ** 6 / 720.0
        )
    )
    return x, y


def tm_inverse(x, y, lon0: float, fn: float = 0.0):
    """UTM (x, y) meters -> (lon, lat) degrees. Vectorized; broadcastable.

    Operation order mirrors tm_inverse_sql EXACTLY — keep the two in sync
    (cross-engine cell-center equality is how the driver oracle works)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    M = (y - fn) / K0
    mu = M / (A_WGS84 * _C0)
    phi1 = (
        mu
        + (3.0 * _E1 / 2.0 - 27.0 * _E1 ** 3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * _E1 ** 2 / 16.0 - 55.0 * _E1 ** 4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * _E1 ** 3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * _E1 ** 4 / 512.0) * np.sin(8.0 * mu)
    )
    sin1 = np.sin(phi1)
    cos1 = np.cos(phi1)
    tan1 = np.tan(phi1)
    C1 = EP2 * cos1 * cos1
    T1 = tan1 * tan1
    N1 = A_WGS84 / np.sqrt(1.0 - E2 * sin1 * sin1)
    R1 = A_WGS84 * (1.0 - E2) / (1.0 - E2 * sin1 * sin1) ** 1.5
    D = (x - FE) / (N1 * K0)
    lat = np.degrees(
        phi1
        - (N1 * tan1 / R1) * (
            D * D / 2.0
            - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 * C1 - 9.0 * EP2) * D ** 4 / 24.0
            + (61.0 + 90.0 * T1 + 298.0 * C1 + 45.0 * T1 * T1 - 252.0 * EP2 - 3.0 * C1 * C1)
            * D ** 6 / 720.0
        )
    )
    lon = lon0 + np.degrees(
        (
            D
            - (1.0 + 2.0 * T1 + C1) * D ** 3 / 6.0
            + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 * C1 + 8.0 * EP2 + 24.0 * T1 * T1)
            * D ** 5 / 120.0
        )
        / cos1
    )
    return lon, lat


def _flit(v: float) -> str:
    """Float literal in E-notation — parsed as DOUBLE (not DECIMAL) by both
    DuckDB and Spark SQL; 17 significant digits round-trip float64."""
    return f"{float(v):.17e}"


def tm_inverse_sql(x_expr: str, y_expr: str, lon0: float, fn: float = 0.0):
    """(lon_sql, lat_sql) ANSI-SQL strings computing tm_inverse(x, y) with
    the SAME operation order — runnable in DuckDB and Spark SQL. The
    expressions reference ``x_expr``/``y_expr`` verbatim (pass column names
    or sub-expressions)."""
    L = _flit
    a = L(A_WGS84)
    deg = L(180.0 / math.pi)
    mu = f"((({y_expr}) - {L(fn)}) / {L(K0)} / ({a} * {L(_C0)}))"
    phi1 = (
        f"({mu} + {L(3.0 * _E1 / 2.0 - 27.0 * _E1 ** 3 / 32.0)} * sin(2.0 * {mu})"
        f" + {L(21.0 * _E1 ** 2 / 16.0 - 55.0 * _E1 ** 4 / 32.0)} * sin(4.0 * {mu})"
        f" + {L(151.0 * _E1 ** 3 / 96.0)} * sin(6.0 * {mu})"
        f" + {L(1097.0 * _E1 ** 4 / 512.0)} * sin(8.0 * {mu}))"
    )
    c1 = f"({L(EP2)} * cos({phi1}) * cos({phi1}))"
    t1 = f"(tan({phi1}) * tan({phi1}))"
    n1 = f"({a} / sqrt(1.0 - {L(E2)} * sin({phi1}) * sin({phi1})))"
    r1 = f"({a} * {L(1.0 - E2)} / pow(1.0 - {L(E2)} * sin({phi1}) * sin({phi1}), 1.5))"
    d = f"((({x_expr}) - {L(FE)}) / ({n1} * {L(K0)}))"
    lat = (
        f"(({phi1} - ({n1} * tan({phi1}) / {r1}) * ({d} * {d} / 2.0"
        f" - (5.0 + 3.0 * {t1} + 10.0 * {c1} - 4.0 * {c1} * {c1} - 9.0 * {L(EP2)})"
        f" * pow({d}, 4) / 24.0"
        f" + (61.0 + 90.0 * {t1} + 298.0 * {c1} + 45.0 * {t1} * {t1}"
        f" - {L(252.0 * EP2)} - 3.0 * {c1} * {c1}) * pow({d}, 6) / 720.0)) * {deg})"
    )
    lon = (
        f"({L(lon0)} + (({d} - (1.0 + 2.0 * {t1} + {c1}) * pow({d}, 3) / 6.0"
        f" + (5.0 - 2.0 * {c1} + 28.0 * {t1} - 3.0 * {c1} * {c1} + {L(8.0 * EP2)}"
        f" + 24.0 * {t1} * {t1}) * pow({d}, 5) / 120.0) / cos({phi1})) * {deg})"
    )
    return lon, lat


# -- polar stereographic variant B (numpy; Snyder 1987 §21, EPSG 9829) --------

_E = math.sqrt(E2)
# sqrt((1+e)^(1+e) (1-e)^(1-e)) — the ellipsoidal stereographic constant
_CPOL = math.sqrt((1.0 + _E) ** (1.0 + _E) * (1.0 - _E) ** (1.0 - _E))
_HALF_PI = math.pi / 2.0

# inverse conformal-latitude series (Snyder eq. 3-5)
_X2 = E2 / 2.0 + 5.0 * E2 ** 2 / 24.0 + E2 ** 3 / 12.0 + 13.0 * E2 ** 4 / 360.0
_X4 = 7.0 * E2 ** 2 / 48.0 + 29.0 * E2 ** 3 / 240.0 + 811.0 * E2 ** 4 / 11520.0
_X6 = 7.0 * E2 ** 3 / 120.0 + 81.0 * E2 ** 4 / 1120.0
_X8 = 4279.0 * E2 ** 4 / 161280.0


def _ps_t(phi: np.ndarray, south: bool) -> np.ndarray:
    """Isometric-latitude factor t (Snyder eq. 15-9 / 21-27)."""
    es = _E * np.sin(phi)
    if south:
        return np.tan(np.pi / 4.0 + phi / 2.0) / ((1.0 + es) / (1.0 - es)) ** (_E / 2.0)
    return np.tan(np.pi / 4.0 - phi / 2.0) * ((1.0 + es) / (1.0 - es)) ** (_E / 2.0)


def _ps_k0(p: PolarPS) -> float:
    """Implied scale at the pole from the standard parallel (variant B)."""
    phi_f = math.radians(p.lat_ts)
    es = _E * math.sin(phi_f)
    m_f = math.cos(phi_f) / math.sqrt(1.0 - es * es)
    t_f = float(_ps_t(np.asarray(phi_f), p.south))
    return m_f * _CPOL / (2.0 * t_f)


def ps_forward(lon, lat, p: PolarPS):
    """(lon, lat) degrees -> polar-stereographic (x, y) meters (vectorized)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p.lon0)
    k0 = _ps_k0(p)
    rho = 2.0 * A_WGS84 * k0 * _ps_t(phi, p.south) / _CPOL
    x = p.fe + rho * np.sin(lam)
    y = p.fn + (rho * np.cos(lam) if p.south else -rho * np.cos(lam))
    return x, y


def ps_inverse(x, y, p: PolarPS):
    """Polar-stereographic (x, y) meters -> (lon, lat) degrees.

    Operation order mirrors ps_inverse_sql EXACTLY (same scalar literals,
    same expression tree) — cross-engine cell-center equality is how the
    driver oracle replays the kernel in SQL."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    s = _CPOL / (2.0 * A_WGS84 * _ps_k0(p))  # one scalar, shared with SQL
    dx = x - p.fe
    dy = y - p.fn
    rho = np.sqrt(dx * dx + dy * dy)
    tp = rho * s
    if p.south:
        chi = 2.0 * np.arctan(tp) - _HALF_PI
        lam = np.arctan2(dx, dy)
    else:
        chi = _HALF_PI - 2.0 * np.arctan(tp)
        lam = np.arctan2(dx, -dy)
    phi = (
        chi + _X2 * np.sin(2.0 * chi) + _X4 * np.sin(4.0 * chi)
        + _X6 * np.sin(6.0 * chi) + _X8 * np.sin(8.0 * chi)
    )
    return p.lon0 + np.degrees(lam), np.degrees(phi)


def ps_inverse_sql(x_expr: str, y_expr: str, p: PolarPS):
    """(lon_sql, lat_sql) ANSI-SQL mirror of ps_inverse — same operation
    order, E-notation DOUBLE literals (runnable in DuckDB and Spark SQL)."""
    L = _flit
    s = _CPOL / (2.0 * A_WGS84 * _ps_k0(p))
    dx = f"(({x_expr}) - {L(p.fe)})"
    dy = f"(({y_expr}) - {L(p.fn)})"
    rho = f"sqrt({dx} * {dx} + {dy} * {dy})"
    tp = f"({rho} * {L(s)})"
    if p.south:
        chi = f"(2.0 * atan({tp}) - {L(_HALF_PI)})"
        lam = f"atan2({dx}, {dy})"
    else:
        chi = f"({L(_HALF_PI)} - 2.0 * atan({tp}))"
        lam = f"atan2({dx}, -{dy})"
    deg = L(180.0 / math.pi)
    lat = (
        f"(({chi} + {L(_X2)} * sin(2.0 * {chi}) + {L(_X4)} * sin(4.0 * {chi})"
        f" + {L(_X6)} * sin(6.0 * {chi}) + {L(_X8)} * sin(8.0 * {chi})) * {deg})"
    )
    lon = f"({L(p.lon0)} + {lam} * {deg})"
    return lon, lat


# -- Lambert azimuthal equal-area (numpy; Snyder 1987 §24, EPSG 9820) ---------

def _laea_q(phi, e: float, e2: float):
    es = e * np.sin(phi)
    return (1.0 - e2) * (
        np.sin(phi) / (1.0 - e2 * np.sin(phi) ** 2)
        - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
    )


def _laea_consts(p: LaeaParams):
    e = math.sqrt(p.e2)
    qp = float(_laea_q(np.asarray(_HALF_PI), e, p.e2))
    phi0 = math.radians(p.lat0)
    q0 = float(_laea_q(np.asarray(phi0), e, p.e2))
    beta1 = math.asin(q0 / qp)
    rq = p.a * math.sqrt(qp / 2.0)
    m1 = math.cos(phi0) / math.sqrt(1.0 - p.e2 * math.sin(phi0) ** 2)
    d = p.a * m1 / (rq * math.cos(beta1))
    return e, qp, beta1, rq, d


def laea_forward(lon, lat, p: LaeaParams):
    """(lon, lat) degrees -> LAEA (x, y) meters (vectorized)."""
    e, qp, beta1, rq, d = _laea_consts(p)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p.lon0)
    beta = np.arcsin(np.clip(_laea_q(phi, e, p.e2) / qp, -1.0, 1.0))
    b = rq * np.sqrt(
        2.0 / (1.0 + math.sin(beta1) * np.sin(beta)
               + math.cos(beta1) * np.cos(beta) * np.cos(lam))
    )
    x = p.fe + b * d * np.cos(beta) * np.sin(lam)
    y = p.fn + (b / d) * (
        math.cos(beta1) * np.sin(beta) - math.sin(beta1) * np.cos(beta) * np.cos(lam)
    )
    return x, y


def laea_inverse(x, y, p: LaeaParams):
    """LAEA (x, y) meters -> (lon, lat) degrees (vectorized); authalic-
    latitude series inverse (Snyder eq. 3-18)."""
    e, qp, beta1, rq, d = _laea_consts(p)
    e2 = p.e2
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xp = (x - p.fe) / d
    yp = (y - p.fn) * d
    rho = np.sqrt(xp * xp + yp * yp)
    with np.errstate(invalid="ignore"):
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
        betap = np.arcsin(np.clip(
            np.cos(ce) * math.sin(beta1)
            + np.where(rho > 0, yp * np.sin(ce) * math.cos(beta1) / np.where(rho > 0, rho, 1.0), 0.0),
            -1.0, 1.0,
        ))
    lam = np.arctan2(
        xp * np.sin(ce),
        rho * math.cos(beta1) * np.cos(ce) - yp * math.sin(beta1) * np.sin(ce),
    )
    phi = (
        betap
        + (e2 / 3.0 + 31.0 * e2 ** 2 / 180.0 + 517.0 * e2 ** 3 / 5040.0) * np.sin(2.0 * betap)
        + (23.0 * e2 ** 2 / 360.0 + 251.0 * e2 ** 3 / 3780.0) * np.sin(4.0 * betap)
        + (761.0 * e2 ** 3 / 45360.0) * np.sin(6.0 * betap)
    )
    lat = np.degrees(phi)
    lon = p.lon0 + np.degrees(lam)
    # exactly at the projection origin the direction is undefined: (lat0, lon0)
    at0 = rho == 0.0
    if np.any(at0):
        lat = np.where(at0, p.lat0, lat)
        lon = np.where(at0, p.lon0, lon)
    return lon, lat


def laea_inverse_sql(x_expr: str, y_expr: str, p: LaeaParams):
    """(lon_sql, lat_sql) ANSI-SQL mirror of laea_inverse — same operation
    order, E-notation DOUBLE literals. Assumes rho > 0 and interior points
    (the np.clip guards are identity there; driver views are margin-
    audited to stay clear of the origin and the horizon)."""
    e2 = p.e2
    _e, qp, beta1, rq, d = _laea_consts(p)
    L = _flit
    deg = L(180.0 / math.pi)
    xp = f"((({x_expr}) - {L(p.fe)}) / {L(d)})"
    yp = f"((({y_expr}) - {L(p.fn)}) * {L(d)})"
    rho = f"sqrt({xp} * {xp} + {yp} * {yp})"
    ce = f"(2.0 * asin({rho} / {L(2.0 * rq)}))"
    betap = (
        f"asin(cos({ce}) * {L(math.sin(beta1))}"
        f" + {yp} * sin({ce}) * {L(math.cos(beta1))} / {rho})"
    )
    lam = (
        f"atan2({xp} * sin({ce}),"
        f" {rho} * {L(math.cos(beta1))} * cos({ce})"
        f" - {yp} * {L(math.sin(beta1))} * sin({ce}))"
    )
    c2 = e2 / 3.0 + 31.0 * e2 ** 2 / 180.0 + 517.0 * e2 ** 3 / 5040.0
    c4 = 23.0 * e2 ** 2 / 360.0 + 251.0 * e2 ** 3 / 3780.0
    c6 = 761.0 * e2 ** 3 / 45360.0
    lat = (
        f"(({betap} + {L(c2)} * sin(2.0 * {betap}) + {L(c4)} * sin(4.0 * {betap})"
        f" + {L(c6)} * sin(6.0 * {betap})) * {deg})"
    )
    lon = f"({L(p.lon0)} + {lam} * {deg})"
    return lon, lat


# -- sinusoidal (numpy; Snyder 1987 §30, spherical form) ----------------------

@dataclass(frozen=True)
class SinuParams:
    """Spherical sinusoidal (Snyder 1987 §30, eqs. 30-1/30-2): equal-area,
    equally-spaced parallels; x = R·λ·cos φ, y = R·φ. The MODIS land grid
    (all MxD* products this engine ships presets for) uses the WGS84
    authalic sphere R = 6 371 007.181 m with lon0 = 0 — proj4
    ``+proj=sinu +R=6371007.181 +nadgrids=@null +wktext``."""

    r: float
    lon0: float
    fe: float
    fn: float


MODIS_SINU_R = 6371007.181  # authalic sphere radius of the MODIS grid (m)

_SINU: dict = {}

_LCC: dict = {}  # filled below LccParams (EPSG:2154) + dynamic keys


def sinu_forward(lon, lat, p: SinuParams):
    """(lon, lat) degrees -> sinusoidal (x, y) meters (vectorized)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p.lon0)
    x = p.fe + p.r * lam * np.cos(phi)
    y = p.fn + p.r * phi
    return x, y


def sinu_inverse(x, y, p: SinuParams):
    """Sinusoidal (x, y) meters -> (lon, lat) degrees. Operation order
    mirrors sinu_inverse_sql EXACTLY (driver-oracle discipline). The
    poles themselves (cos φ = 0) are the projection's singular points;
    views never sample a cell center at exactly ±90°."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    phi = (y - p.fn) / p.r
    lam = (x - p.fe) / (p.r * np.cos(phi))
    return p.lon0 + np.degrees(lam), np.degrees(phi)


def sinu_inverse_sql(x_expr: str, y_expr: str, p: SinuParams):
    """(lon_sql, lat_sql) ANSI-SQL mirror of sinu_inverse — same operation
    order, E-notation DOUBLE literals (runnable in DuckDB and Spark SQL)."""
    L = _flit
    deg = L(180.0 / math.pi)
    phi = f"((({y_expr}) - {L(p.fn)}) / {L(p.r)})"
    lam = f"((({x_expr}) - {L(p.fe)}) / ({L(p.r)} * cos({phi})))"
    return f"({L(p.lon0)} + {lam} * {deg})", f"({phi} * {deg})"


# -- Lambert conformal conic, 2SP (numpy; Snyder 1987 §15, EPSG 9802) ---------

@dataclass(frozen=True)
class LccParams:
    """Lambert conformal conic with two standard parallels (EPSG method
    9802; Snyder 1987 §15, ellipsoidal). EPSG:2154 (RGF93 / Lambert-93,
    the French national grid) is the registered instance; NAD83 state
    planes and the Canada Atlas LCC are the same method."""

    lat1: float  # first standard parallel (deg)
    lat2: float  # second standard parallel (deg)
    lat0: float  # latitude of false origin (deg)
    lon0: float  # longitude of false origin (deg)
    fe: float
    fn: float
    a: float
    e2: float


def _lcc_m(phi: float, e2: float) -> float:
    return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)


def _lcc_t_scalar(phi: float, e: float) -> float:
    es = e * math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) * ((1.0 + es) / (1.0 - es)) ** (e / 2.0)


def _lcc_consts(p: LccParams):
    """(n, aF, rho0, e, chi-series) — the per-projection scalars. The
    conformal-latitude inverse series (Snyder eq. 3-5) is recomputed for
    THIS ellipsoid's e² (GRS80 vs WGS84 differ in the 12th digit)."""
    e = math.sqrt(p.e2)
    phi1, phi2, phi0 = (math.radians(v) for v in (p.lat1, p.lat2, p.lat0))
    m1, m2 = _lcc_m(phi1, p.e2), _lcc_m(phi2, p.e2)
    t0, t1, t2 = (_lcc_t_scalar(v, e) for v in (phi0, phi1, phi2))
    if abs(phi1 - phi2) < 1e-12:
        n = math.sin(phi1)
    else:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    aF = p.a * (m1 / (n * t1 ** n))
    rho0 = aF * t0 ** n
    e2 = p.e2
    x2 = e2 / 2.0 + 5.0 * e2 ** 2 / 24.0 + e2 ** 3 / 12.0 + 13.0 * e2 ** 4 / 360.0
    x4 = 7.0 * e2 ** 2 / 48.0 + 29.0 * e2 ** 3 / 240.0 + 811.0 * e2 ** 4 / 11520.0
    x6 = 7.0 * e2 ** 3 / 120.0 + 81.0 * e2 ** 4 / 1120.0
    x8 = 4279.0 * e2 ** 4 / 161280.0
    return n, aF, rho0, e, (x2, x4, x6, x8)


def lcc_forward(lon, lat, p: LccParams):
    """(lon, lat) degrees -> LCC (x, y) meters (vectorized)."""
    n, aF, rho0, e, _ = _lcc_consts(p)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    es = e * np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) * ((1.0 + es) / (1.0 - es)) ** (e / 2.0)
    rho = aF * t ** n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - p.lon0)
    x = p.fe + rho * np.sin(th)
    y = p.fn + rho0 - rho * np.cos(th)
    return x, y


def lcc_inverse(x, y, p: LccParams):
    """LCC (x, y) meters -> (lon, lat) degrees. Operation order mirrors
    lcc_inverse_sql EXACTLY (driver-oracle discipline)."""
    n, aF, rho0, _e, (x2, x4, x6, x8) = _lcc_consts(p)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = x - p.fe
    dy = rho0 - (y - p.fn)
    rho = np.sqrt(dx * dx + dy * dy)
    if n < 0:
        rho = -rho
    tp = (rho / aF) ** (1.0 / n)
    chi = _HALF_PI - 2.0 * np.arctan(tp)
    phi = (
        chi + x2 * np.sin(2.0 * chi) + x4 * np.sin(4.0 * chi)
        + x6 * np.sin(6.0 * chi) + x8 * np.sin(8.0 * chi)
    )
    lam = np.arctan2(dx, dy) / n
    return p.lon0 + np.degrees(lam), np.degrees(phi)


def lcc_inverse_sql(x_expr: str, y_expr: str, p: LccParams):
    """(lon_sql, lat_sql) ANSI-SQL mirror of lcc_inverse — same operation
    order, E-notation DOUBLE literals (runnable in DuckDB and Spark SQL).
    Northern-hemisphere parameter sets only (n > 0 folds the sign of rho
    into a constant)."""
    n, aF, rho0, _e, (x2, x4, x6, x8) = _lcc_consts(p)
    if n <= 0:
        raise ValueError("SQL mirror assumes n > 0 (northern standard parallels)")
    L = _flit
    deg = L(180.0 / math.pi)
    dx = f"(({x_expr}) - {L(p.fe)})"
    dy = f"({L(rho0)} - (({y_expr}) - {L(p.fn)}))"
    rho = f"sqrt({dx} * {dx} + {dy} * {dy})"
    tp = f"pow({rho} / {L(aF)}, {L(1.0 / n)})"
    chi = f"({L(_HALF_PI)} - 2.0 * atan({tp}))"
    lat = (
        f"(({chi} + {L(x2)} * sin(2.0 * {chi}) + {L(x4)} * sin(4.0 * {chi})"
        f" + {L(x6)} * sin(6.0 * {chi}) + {L(x8)} * sin(8.0 * {chi})) * {deg})"
    )
    lon = f"({L(p.lon0)} + (atan2({dx}, {dy}) / {L(n)}) * {deg})"
    return lon, lat


# RGF93 / Lambert-93 — the EPSG registry parameters (GRS80 ellipsoid)
_LCC["EPSG:2154"] = LccParams(
    lat1=49.0, lat2=44.0, lat0=46.5, lon0=3.0,
    fe=700000.0, fn=6600000.0, a=6378137.0, e2=_E2_GRS80,
)


# -- Albers equal-area conic, 2SP (numpy; Snyder 1987 §14, EPSG 9822) ---------

@dataclass(frozen=True)
class AeaParams:
    """Albers equal-area conic with two standard parallels (EPSG method
    9822; Snyder 1987 §14, ellipsoidal). EPSG:5070 (NAD83 / Conus Albers
    — the NLCD / NASS CDL national grid) is the registered instance."""

    lat1: float
    lat2: float
    lat0: float
    lon0: float
    fe: float
    fn: float
    a: float
    e2: float


# NAD83 / Conus Albers (GRS80) — the EPSG registry parameters
_AEA: dict = {
    "EPSG:5070": AeaParams(
        lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
        fe=0.0, fn=0.0, a=6378137.0, e2=_E2_GRS80,
    ),
}


def _aea_consts(p: AeaParams):
    """(n, C, rho0, e, qp, authalic series) — per-projection scalars."""
    e = math.sqrt(p.e2)
    phi0, phi1, phi2 = (math.radians(v) for v in (p.lat0, p.lat1, p.lat2))
    q0, q1, q2 = (float(_laea_q(np.asarray(v), e, p.e2)) for v in (phi0, phi1, phi2))
    m1 = math.cos(phi1) / math.sqrt(1.0 - p.e2 * math.sin(phi1) ** 2)
    m2 = math.cos(phi2) / math.sqrt(1.0 - p.e2 * math.sin(phi2) ** 2)
    if abs(phi1 - phi2) < 1e-12:
        n = math.sin(phi1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = p.a * math.sqrt(C - n * q0) / n
    qp = float(_laea_q(np.asarray(_HALF_PI), e, p.e2))
    e2 = p.e2
    a2 = e2 / 3.0 + 31.0 * e2 ** 2 / 180.0 + 517.0 * e2 ** 3 / 5040.0
    a4 = 23.0 * e2 ** 2 / 360.0 + 251.0 * e2 ** 3 / 3780.0
    a6 = 761.0 * e2 ** 3 / 45360.0
    return n, C, rho0, e, qp, (a2, a4, a6)


def aea_forward(lon, lat, p: AeaParams):
    """(lon, lat) degrees -> Albers (x, y) meters (vectorized)."""
    n, C, rho0, e, _qp, _ = _aea_consts(p)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    q = _laea_q(phi, e, p.e2)
    rho = p.a * np.sqrt(C - n * q) / n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - p.lon0)
    x = p.fe + rho * np.sin(th)
    y = p.fn + rho0 - rho * np.cos(th)
    return x, y


def aea_inverse(x, y, p: AeaParams):
    """Albers (x, y) meters -> (lon, lat) degrees: authalic-latitude
    series inverse (Snyder eq. 3-18 — the same series as laea_inverse)."""
    n, C, rho0, _e, qp, (a2, a4, a6) = _aea_consts(p)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = x - p.fe
    dy = rho0 - (y - p.fn)
    rho = np.sqrt(dx * dx + dy * dy)
    if n < 0:
        rho = -rho
    q = (C - (rho * n / p.a) ** 2) / n
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    phi = beta + a2 * np.sin(2.0 * beta) + a4 * np.sin(4.0 * beta) + a6 * np.sin(6.0 * beta)
    lam = np.arctan2(dx, dy) / n
    return p.lon0 + np.degrees(lam), np.degrees(phi)


def aea_inverse_sql(x_expr: str, y_expr: str, p: AeaParams):
    """(lon_sql, lat_sql) ANSI-SQL mirror of aea_inverse — same operation
    order, E-notation DOUBLE literals. Assumes n > 0, rho > 0 and interior
    points (np.clip is identity there; driver views are margin-audited)."""
    n, C, rho0, _e, qp, (a2, a4, a6) = _aea_consts(p)
    if n <= 0:
        raise ValueError("SQL mirror assumes n > 0 (northern standard parallels)")
    L = _flit
    deg = L(180.0 / math.pi)
    dx = f"(({x_expr}) - {L(p.fe)})"
    dy = f"({L(rho0)} - (({y_expr}) - {L(p.fn)}))"
    rho = f"sqrt({dx} * {dx} + {dy} * {dy})"
    # numpy's `** 2` is an exact self-multiply (fast integer-power path);
    # SQL pow(x, 2) may round through exp/log — multiply explicitly
    rhon = f"({rho} * {L(n)} / {L(p.a)})"
    q = f"(({L(C)} - {rhon} * {rhon}) / {L(n)})"
    beta = f"asin({q} / {L(qp)})"
    lat = (
        f"(({beta} + {L(a2)} * sin(2.0 * {beta}) + {L(a4)} * sin(4.0 * {beta})"
        f" + {L(a6)} * sin(6.0 * {beta})) * {deg})"
    )
    lon = f"({L(p.lon0)} + (atan2({dx}, {dy}) / {L(n)}) * {deg})"
    return lon, lat


# -- datums: 7-parameter Helmert (EPSG method 9606, position vector) ----------
#
# The reference accepts ANY PROJ SRS including non-WGS84 datums
# (src/view.h:703-711; PROJ resolves +towgs84= internally). Here the
# transform is explicit: geodetic (source ellipsoid, h=0) -> geocentric
# XYZ -> position-vector 7-param similarity -> WGS84 geodetic via
# Bowring's closed formula. All stages are closed-form so the DuckDB
# oracle replays them exactly (no iteration).

_RAD = math.pi / 180.0
_DEG = 180.0 / math.pi
_AS2RAD = math.pi / 648000.0  # arc-seconds -> radians

_B_WGS84 = A_WGS84 * math.sqrt(1.0 - E2)  # WGS84 semi-minor axis

# ellipsoids: name -> (a, 1/f)
_ELLPS = {
    "wgs84": (6378137.0, 298.257223563),
    "grs80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "bessel": (6377397.155, 299.1528128),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.978698214),  # 1/f from a/(a-b), Clarke 1866
}


def _e2_of(a: float, inv_f: float) -> float:
    f = 1.0 / inv_f
    return f * (2.0 - f)


def _helm_key(helm) -> str:
    """Dynamic-key suffix for a datum spec — parseable back by
    _helm_from_parts in ANY process (executors re-resolve key strings
    in fresh Python workers, so the suffix must round-trip)."""
    if _is_ntv2(helm):
        return "ntv2@" + helm[1]
    return ":".join(repr(v) for v in helm)


def _helm_from_parts(parts: list, k: int):
    """Inverse of _helm_key over ':'-split key segments from index k."""
    if len(parts) <= k:
        return None
    rest = ":".join(parts[k:])
    if rest.startswith("ntv2@"):
        return ("ntv2", rest[5:])
    return tuple(float(v) for v in parts[k:k + 7])


def _is_ntv2(helm) -> bool:
    return isinstance(helm, tuple) and len(helm) == 2 and helm[0] == "ntv2"


def _helm_consts(helm):
    """(tx, ty, tz, rx, ry, rz, m) with rotations in radians and the scale
    factor applied — precomputed python floats so numpy and SQL consume
    identical literals."""
    if _is_ntv2(helm):
        raise ValueError(
            "NTv2 grid-shift datums have no closed-form SQL mirror; "
            "grid-shifted SRS keys cannot join the oracled families")
    tx, ty, tz, rxs, rys, rzs, ds = helm
    return (tx, ty, tz, rxs * _AS2RAD, rys * _AS2RAD, rzs * _AS2RAD,
            1.0 + ds * 1e-6)


def geodetic_to_xyz(lon_deg, lat_deg, a: float, e2: float):
    """Geodetic (h=0) -> geocentric XYZ on the given ellipsoid."""
    phs = np.asarray(lat_deg, dtype=np.float64) * _RAD
    lms = np.asarray(lon_deg, dtype=np.float64) * _RAD
    sinp = np.sin(phs)
    nu = a / np.sqrt(1.0 - e2 * sinp * sinp)
    cosp = np.cos(phs)
    return (nu * cosp * np.cos(lms), nu * cosp * np.sin(lms),
            nu * (1.0 - e2) * sinp)


def helmert_forward(X, Y, Z, helm):
    """Source-datum XYZ -> WGS84 XYZ (the +towgs84 direction): position-
    vector small-angle similarity, X' = t + m (I + R) X."""
    tx, ty, tz, rx, ry, rz, m = _helm_consts(helm)
    X2 = tx + m * (X - rz * Y + ry * Z)
    Y2 = ty + m * (rz * X + Y - rx * Z)
    Z2 = tz + m * (-ry * X + rx * Y + Z)
    return X2, Y2, Z2


def helmert_inverse(X, Y, Z, helm):
    """WGS84 XYZ -> source-datum XYZ: the EXACT inverse of the linearized
    forward map (3x3 solve via the closed adjugate), so forward∘inverse
    round-trips to float precision — not the sign-flipped approximation."""
    tx, ty, tz, rx, ry, rz, m = _helm_consts(helm)
    u, v, w = (X - tx) / m, (Y - ty) / m, (Z - tz) / m
    # inverse of [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]] (det = 1 + rx²+ry²+rz²)
    det = 1.0 + rx * rx + ry * ry + rz * rz
    X2 = ((1.0 + rx * rx) * u + (rz + rx * ry) * v + (rx * rz - ry) * w) / det
    Y2 = ((rx * ry - rz) * u + (1.0 + ry * ry) * v + (rx + ry * rz) * w) / det
    Z2 = ((ry + rx * rz) * u + (ry * rz - rx) * v + (1.0 + rz * rz) * w) / det
    return X2, Y2, Z2


def xyz_to_wgs84_geodetic(X, Y, Z):
    """Geocentric WGS84 XYZ -> (lon, lat) degrees, Bowring's single-pass
    closed formula (sub-mm for earth-surface points)."""
    pr = np.sqrt(X * X + Y * Y)
    th = np.arctan2(Z * A_WGS84, pr * _B_WGS84)
    sth = np.sin(th)
    cth = np.cos(th)
    phi = np.arctan2(Z + EP2 * _B_WGS84 * sth * sth * sth,
                     pr - E2 * A_WGS84 * cth * cth * cth)
    return np.arctan2(Y, X) * _DEG, phi * _DEG


def datum_to_wgs84(lon_deg, lat_deg, a: float, e2: float, helm):
    """Source-datum geodetic -> WGS84 geodetic (degrees); the op order the
    SQL mirrors replay stage by stage. An NTv2 helm tag applies the grid
    shift geodetically instead (the grid IS the datum transformation —
    no XYZ stage, per the NTv2 Developer's Guide)."""
    if _is_ntv2(helm):
        from .sources.ntv2 import grid_shift

        return grid_shift(helm[1]).forward(lon_deg, lat_deg)
    X, Y, Z = geodetic_to_xyz(lon_deg, lat_deg, a, e2)
    return xyz_to_wgs84_geodetic(*helmert_forward(X, Y, Z, helm))


def wgs84_to_datum(lon_deg, lat_deg, a: float, e2: float, helm):
    """WGS84 geodetic -> source-datum geodetic (degrees). The target-side
    geodetic conversion uses Bowring with the SOURCE ellipsoid. An NTv2
    helm tag iterates the grid shift (the Guide's inverse)."""
    if _is_ntv2(helm):
        from .sources.ntv2 import grid_shift

        return grid_shift(helm[1]).inverse(lon_deg, lat_deg)
    X, Y, Z = geodetic_to_xyz(lon_deg, lat_deg, A_WGS84, E2)
    u, v, w = helmert_inverse(X, Y, Z, helm)
    b = a * math.sqrt(1.0 - e2)
    ep2 = e2 / (1.0 - e2)
    pr = np.sqrt(u * u + v * v)
    th = np.arctan2(w * a, pr * b)
    sth = np.sin(th)
    cth = np.cos(th)
    phi = np.arctan2(w + ep2 * b * sth * sth * sth,
                     pr - e2 * a * cth * cth * cth)
    return np.arctan2(v, u) * _DEG, phi * _DEG


def _datum_sql(lon_expr: str, lat_expr: str, a: float, e2: float, helm):
    """(lon_sql, lat_sql): SQL mirror of datum_to_wgs84 with the same op
    order. Stage values are textually substituted — the chain stays small
    because every stage is closed-form (callers put cells in a CTE so x/y
    appear once)."""
    L = _flit
    tx, ty, tz, rx, ry, rz, m = _helm_consts(helm)
    phs = f"(({lat_expr}) * {L(_RAD)})"
    lms = f"(({lon_expr}) * {L(_RAD)})"
    nu = f"({L(a)} / sqrt(1.0 - {L(e2)} * sin({phs}) * sin({phs})))"
    gx = f"({nu} * cos({phs}) * cos({lms}))"
    gy = f"({nu} * cos({phs}) * sin({lms}))"
    gz = f"({nu} * {L(1.0 - e2)} * sin({phs}))"
    wx = f"({L(tx)} + {L(m)} * ({gx} - {L(rz)} * {gy} + {L(ry)} * {gz}))"
    wy = f"({L(ty)} + {L(m)} * ({L(rz)} * {gx} + {gy} - {L(rx)} * {gz}))"
    wz = f"({L(tz)} + {L(m)} * ({L(-ry)} * {gx} + {L(rx)} * {gy} + {gz}))"
    pr = f"sqrt({wx} * {wx} + {wy} * {wy})"
    th = f"atan2({wz} * {L(A_WGS84)}, {pr} * {L(_B_WGS84)})"
    phi = (
        f"atan2({wz} + {L(EP2 * _B_WGS84)} * sin({th}) * sin({th}) * sin({th}), "
        f"{pr} - {L(E2 * A_WGS84)} * cos({th}) * cos({th}) * cos({th}))"
    )
    return (f"(atan2({wy}, {wx}) * {L(_DEG)})", f"({phi} * {L(_DEG)})")


# -- generalized transverse Mercator on any ellipsoid + datum -----------------
#
# EPSG:27700 (British National Grid: TM on Airy 1830, OSGB36 datum via the
# published towgs84 7-param Helmert) is the registered instance; any
# +proj=tmerc string resolves here. Snyder 1987 eq. 8-9..8-25 with
# per-ellipsoid series constants and the lat_0 meridional-arc offset M0.

@dataclass(frozen=True)
class EtmParams:
    a: float
    e2: float
    k0: float
    lat0: float
    lon0: float
    fe: float
    fn: float
    helm: tuple | None  # (tx,ty,tz,rx",ry",rz",ds_ppm) source -> WGS84


def _tm_consts(e2: float):
    """Meridional-arc + footpoint series constants for any e2."""
    c0 = 1.0 - e2 / 4.0 - 3.0 * e2 ** 2 / 64.0 - 5.0 * e2 ** 3 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e2 ** 2 / 32.0 + 45.0 * e2 ** 3 / 1024.0
    c4 = 15.0 * e2 ** 2 / 256.0 + 45.0 * e2 ** 3 / 1024.0
    c6 = 35.0 * e2 ** 3 / 3072.0
    e1 = (1.0 - math.sqrt(1.0 - e2)) / (1.0 + math.sqrt(1.0 - e2))
    return c0, c2, c4, c6, e1


def _etm_m0(p: EtmParams) -> float:
    c0, c2, c4, c6, _ = _tm_consts(p.e2)
    phi0 = p.lat0 * _RAD
    return p.a * (c0 * phi0 - c2 * math.sin(2.0 * phi0)
                  + c4 * math.sin(4.0 * phi0) - c6 * math.sin(6.0 * phi0))


# OSGB36 -> WGS84 (the published national 7-param set)
_OSGB_HELM = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

_ETM: dict = {
    "EPSG:27700": EtmParams(
        a=_ELLPS["airy"][0], e2=_e2_of(*_ELLPS["airy"]), k0=0.9996012717,
        lat0=49.0, lon0=-2.0, fe=400000.0, fn=-100000.0, helm=_OSGB_HELM,
    ),
}


def etm_forward(lon, lat, p: EtmParams):
    """(lon, lat) degrees IN THE PROJECTION'S DATUM -> grid (x, y)."""
    c0, c2, c4, c6, _ = _tm_consts(p.e2)
    ep2 = p.e2 / (1.0 - p.e2)
    m0 = _etm_m0(p)
    phi = np.asarray(lat, dtype=np.float64) * _RAD
    lam = (np.asarray(lon, dtype=np.float64) - p.lon0) * _RAD
    sinp = np.sin(phi)
    cosp = np.cos(phi)
    tanp = np.tan(phi)
    N = p.a / np.sqrt(1.0 - p.e2 * sinp * sinp)
    T = tanp * tanp
    C = ep2 * cosp * cosp
    Aa = cosp * lam
    M = p.a * (c0 * phi - c2 * np.sin(2.0 * phi)
               + c4 * np.sin(4.0 * phi) - c6 * np.sin(6.0 * phi))
    x = p.fe + p.k0 * N * (
        Aa
        + (1.0 - T + C) * Aa ** 3 / 6.0
        + (5.0 - 18.0 * T + T * T + 72.0 * C - 58.0 * ep2) * Aa ** 5 / 120.0
    )
    y = p.fn + p.k0 * (
        M - m0
        + N * tanp * (
            Aa * Aa / 2.0
            + (5.0 - T + 9.0 * C + 4.0 * C * C) * Aa ** 4 / 24.0
            + (61.0 - 58.0 * T + T * T + 600.0 * C - 330.0 * ep2) * Aa ** 6 / 720.0
        )
    )
    return x, y


def etm_inverse(x, y, p: EtmParams):
    """Grid (x, y) -> (lon, lat) degrees in the projection's datum.
    Operation order mirrors etm_inverse_sql EXACTLY."""
    c0, _c2, _c4, _c6, e1 = _tm_consts(p.e2)
    ep2 = p.e2 / (1.0 - p.e2)
    m0 = _etm_m0(p)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    M = m0 + (y - p.fn) / p.k0
    mu = M / (p.a * c0)
    phi1 = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu)
    )
    sin1 = np.sin(phi1)
    cos1 = np.cos(phi1)
    tan1 = np.tan(phi1)
    C1 = ep2 * cos1 * cos1
    T1 = tan1 * tan1
    N1 = p.a / np.sqrt(1.0 - p.e2 * sin1 * sin1)
    R1 = p.a * (1.0 - p.e2) / (1.0 - p.e2 * sin1 * sin1) ** 1.5
    D = (x - p.fe) / (N1 * p.k0)
    lat = (
        phi1
        - (N1 * tan1 / R1) * (
            D * D / 2.0
            - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 * C1 - 9.0 * ep2) * D ** 4 / 24.0
            + (61.0 + 90.0 * T1 + 298.0 * C1 + 45.0 * T1 * T1 - 252.0 * ep2 - 3.0 * C1 * C1)
            * D ** 6 / 720.0
        )
    ) * _DEG
    lon = p.lon0 + (
        (
            D
            - (1.0 + 2.0 * T1 + C1) * D ** 3 / 6.0
            + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 * C1 + 8.0 * ep2 + 24.0 * T1 * T1)
            * D ** 5 / 120.0
        )
        / cos1
    ) * _DEG
    return lon, lat


def etm_inverse_wgs84(x, y, p: EtmParams):
    """Grid (x, y) -> WGS84 (lon, lat): projection inverse then the datum
    Helmert (identity when helm is None)."""
    lon, lat = etm_inverse(x, y, p)
    if p.helm is None:
        return lon, lat
    return datum_to_wgs84(lon, lat, p.a, p.e2, p.helm)


def etm_forward_wgs84(lon, lat, p: EtmParams):
    if p.helm is not None:
        lon, lat = wgs84_to_datum(
            np.asarray(lon, dtype=np.float64),
            np.asarray(lat, dtype=np.float64), p.a, p.e2, p.helm,
        )
    return etm_forward(lon, lat, p)


def etm_inverse_sql(x_expr: str, y_expr: str, p: EtmParams):
    """(lon_sql, lat_sql) in the projection's DATUM — the parameterized
    form of tm_inverse_sql (same series, per-ellipsoid constants + M0)."""
    c0, _c2, _c4, _c6, e1 = _tm_consts(p.e2)
    ep2 = p.e2 / (1.0 - p.e2)
    m0 = _etm_m0(p)
    L = _flit
    a = L(p.a)
    deg = L(_DEG)
    mu = f"(({L(m0)} + (({y_expr}) - {L(p.fn)}) / {L(p.k0)}) / ({a} * {L(c0)}))"
    phi1 = (
        f"({mu} + {L(3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0)} * sin(2.0 * {mu})"
        f" + {L(21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)} * sin(4.0 * {mu})"
        f" + {L(151.0 * e1 ** 3 / 96.0)} * sin(6.0 * {mu})"
        f" + {L(1097.0 * e1 ** 4 / 512.0)} * sin(8.0 * {mu}))"
    )
    c1 = f"({L(ep2)} * cos({phi1}) * cos({phi1}))"
    t1 = f"(tan({phi1}) * tan({phi1}))"
    n1 = f"({a} / sqrt(1.0 - {L(p.e2)} * sin({phi1}) * sin({phi1})))"
    r1 = f"({a} * {L(1.0 - p.e2)} / pow(1.0 - {L(p.e2)} * sin({phi1}) * sin({phi1}), 1.5))"
    d = f"((({x_expr}) - {L(p.fe)}) / ({n1} * {L(p.k0)}))"
    lat = (
        f"(({phi1} - ({n1} * tan({phi1}) / {r1}) * ({d} * {d} / 2.0"
        f" - (5.0 + 3.0 * {t1} + 10.0 * {c1} - 4.0 * {c1} * {c1} - 9.0 * {L(ep2)})"
        f" * pow({d}, 4) / 24.0"
        f" + (61.0 + 90.0 * {t1} + 298.0 * {c1} + 45.0 * {t1} * {t1}"
        f" - {L(252.0 * ep2)} - 3.0 * {c1} * {c1}) * pow({d}, 6) / 720.0)) * {deg})"
    )
    lon = (
        f"({L(p.lon0)} + (({d} - (1.0 + 2.0 * {t1} + {c1}) * pow({d}, 3) / 6.0"
        f" + (5.0 - 2.0 * {c1} + 28.0 * {t1} - 3.0 * {c1} * {c1} + {L(8.0 * ep2)}"
        f" + 24.0 * {t1} * {t1}) * pow({d}, 5) / 120.0) / cos({phi1})) * {deg})"
    )
    return lon, lat


# -- Swiss oblique Mercator (EPSG method 9814, Rosenmund) ---------------------
#
# EPSG:2056 (CH1903+ / LV95) and EPSG:21781 (CH1903 / LV03): the double
# projection Bessel-1841 -> conformal sphere -> rotated (oblique)
# equatorial Mercator, the swisstopo published formulation. The inverse
# closes through the standard inverse-conformal-latitude series (the same
# series family ps_inverse uses), so the SQL mirror needs no iteration.

@dataclass(frozen=True)
class SwissParams:
    a: float
    e2: float
    lat0: float
    lon0: float
    fe: float
    fn: float
    helm: tuple | None


_SWISS_LAT0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0   # Bern: 46°57'08.66"N
_SWISS_LON0 = 7.0 + 26.0 / 60.0 + 22.5 / 3600.0    # Bern: 7°26'22.50"E
# CH1903(+) -> WGS84: the published 3-param geocentric translation
_SWISS_HELM = (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)

_SWISS: dict = {
    "EPSG:2056": SwissParams(
        a=_ELLPS["bessel"][0], e2=_e2_of(*_ELLPS["bessel"]),
        lat0=_SWISS_LAT0, lon0=_SWISS_LON0,
        fe=2600000.0, fn=1200000.0, helm=_SWISS_HELM,
    ),
    "EPSG:21781": SwissParams(
        a=_ELLPS["bessel"][0], e2=_e2_of(*_ELLPS["bessel"]),
        lat0=_SWISS_LAT0, lon0=_SWISS_LON0,
        fe=600000.0, fn=200000.0, helm=_SWISS_HELM,
    ),
}


def _chi_series(e2: float):
    """Inverse conformal-latitude series coefficients (Snyder eq. 3-5) for
    any e2 — the per-ellipsoid form of the module's _X2.._X8."""
    return (
        e2 / 2.0 + 5.0 * e2 ** 2 / 24.0 + e2 ** 3 / 12.0 + 13.0 * e2 ** 4 / 360.0,
        7.0 * e2 ** 2 / 48.0 + 29.0 * e2 ** 3 / 240.0 + 811.0 * e2 ** 4 / 11520.0,
        7.0 * e2 ** 3 / 120.0 + 81.0 * e2 ** 4 / 1120.0,
        4279.0 * e2 ** 4 / 161280.0,
    )


def _swiss_consts(p: SwissParams):
    """(alpha, rsph, b0, K, e) — the conformal-sphere constants."""
    e = math.sqrt(p.e2)
    phi0 = p.lat0 * _RAD
    alpha = math.sqrt(1.0 + p.e2 / (1.0 - p.e2) * math.cos(phi0) ** 4)
    rsph = p.a * math.sqrt(1.0 - p.e2) / (1.0 - p.e2 * math.sin(phi0) ** 2)
    b0 = math.asin(math.sin(phi0) / alpha)
    psi0 = math.atanh(math.sin(phi0)) - e * math.atanh(e * math.sin(phi0))
    K = math.atanh(math.sin(b0)) - alpha * psi0
    return alpha, rsph, b0, K, e


def swiss_forward(lon, lat, p: SwissParams):
    """WGS84 (lon, lat) degrees -> Swiss grid (E, N) meters."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if p.helm is not None:
        lon, lat = wgs84_to_datum(lon, lat, p.a, p.e2, p.helm)
    alpha, rsph, b0, K, e = _swiss_consts(p)
    phi = lat * _RAD
    sinp = np.sin(phi)
    # ellipsoid -> conformal sphere (atanh written as explicit logs so the
    # SQL mirror shares the exact op sequence)
    psi = 0.5 * np.log((1.0 + sinp) / (1.0 - sinp)) \
        - e * 0.5 * np.log((1.0 + e * sinp) / (1.0 - e * sinp))
    S = alpha * psi + K
    es = np.exp(2.0 * S)
    sinb = (es - 1.0) / (es + 1.0)  # tanh(S)
    cosb = np.sqrt(1.0 - sinb * sinb)
    l = alpha * ((lon - p.lon0) * _RAD)
    sinl = np.sin(l)
    cosl = np.cos(l)
    sb0, cb0 = math.sin(b0), math.cos(b0)
    # rotate the projection center to the pseudo-equator
    sinbb = cb0 * sinb - sb0 * cosb * cosl
    lbar = np.arctan2(cosb * sinl, cb0 * cosb * cosl + sb0 * sinb)
    E = p.fe + rsph * lbar
    N = p.fn + rsph * (0.5 * np.log((1.0 + sinbb) / (1.0 - sinbb)))
    return E, N


def swiss_inverse(x, y, p: SwissParams):
    """Swiss grid (E, N) -> WGS84 (lon, lat) degrees. Operation order
    mirrors swiss_inverse_sql EXACTLY."""
    alpha, rsph, b0, K, e = _swiss_consts(p)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lbar = (x - p.fe) / rsph
    ex = np.exp(2.0 * ((y - p.fn) / rsph))
    sinbb = (ex - 1.0) / (ex + 1.0)
    cosbb = np.sqrt(1.0 - sinbb * sinbb)
    sinlb = np.sin(lbar)
    coslb = np.cos(lbar)
    sb0, cb0 = math.sin(b0), math.cos(b0)
    sinb = cb0 * sinbb + sb0 * cosbb * coslb
    cosb = np.sqrt(1.0 - sinb * sinb)
    l = np.arctan2(cosbb * sinlb, cb0 * cosbb * coslb - sb0 * sinbb)
    lon_s = p.lon0 + (l / alpha) * _DEG
    psi = (0.5 * np.log((1.0 + sinb) / (1.0 - sinb)) - K) / alpha
    ep = np.exp(2.0 * psi)
    sinchi = (ep - 1.0) / (ep + 1.0)
    chi = np.arcsin(sinchi)
    x2, x4, x6, x8 = _chi_series(p.e2)
    phi = chi + x2 * np.sin(2.0 * chi) + x4 * np.sin(4.0 * chi) \
        + x6 * np.sin(6.0 * chi) + x8 * np.sin(8.0 * chi)
    lat_s = phi * _DEG
    if p.helm is None:
        return lon_s, lat_s
    return datum_to_wgs84(lon_s, lat_s, p.a, p.e2, p.helm)


def swiss_inverse_datum_sql(x_expr: str, y_expr: str, p: SwissParams):
    """(lon_sql, lat_sql) in the projection's DATUM (CH1903) — mirror of
    swiss_inverse before the Helmert stage. Chain _datum_sql on top for
    WGS84 (do it from a CTE so the big strings bind once per stage)."""
    alpha, rsph, b0, K, e = _swiss_consts(p)
    L = _flit
    sb0, cb0 = L(math.sin(b0)), L(math.cos(b0))
    lbar = f"((({x_expr}) - {L(p.fe)}) / {L(rsph)})"
    ex = f"exp(2.0 * ((({y_expr}) - {L(p.fn)}) / {L(rsph)}))"
    sinbb = f"(({ex} - 1.0) / ({ex} + 1.0))"
    cosbb = f"sqrt(1.0 - {sinbb} * {sinbb})"
    sinb = f"({cb0} * {sinbb} + {sb0} * {cosbb} * cos({lbar}))"
    cosb = f"sqrt(1.0 - {sinb} * {sinb})"
    l = f"atan2({cosbb} * sin({lbar}), {cb0} * {cosbb} * cos({lbar}) - {sb0} * {sinbb})"
    lon = f"({L(p.lon0)} + ({l} / {L(alpha)}) * {L(_DEG)})"
    psi = f"((0.5 * ln((1.0 + {sinb}) / (1.0 - {sinb})) - {L(K)}) / {L(alpha)})"
    ep = f"exp(2.0 * {psi})"
    chi = f"asin(({ep} - 1.0) / ({ep} + 1.0))"
    x2, x4, x6, x8 = _chi_series(p.e2)
    lat = (
        f"(({chi} + {L(x2)} * sin(2.0 * {chi}) + {L(x4)} * sin(4.0 * {chi})"
        f" + {L(x6)} * sin(6.0 * {chi}) + {L(x8)} * sin(8.0 * {chi})) * {L(_DEG)})"
    )
    return lon, lat


# -- Lambert cylindrical equal area (EPSG method 9835; Snyder §10) ------------
#
# EPSG:6933 — NSIDC EASE-Grid 2.0 Global, the SMAP / AMSR passive-microwave
# product grid (lat_ts = 30 on WGS84). SEPARABLE: x depends only on lon and
# y only on lat, so the warp uses 1-D axis transforms (and aggregating
# resamplers stay available, unlike the conic/oblique families).

@dataclass(frozen=True)
class CeaParams:
    lat_ts: float
    lon0: float
    fe: float
    fn: float
    a: float
    e2: float


_CEA: dict = {
    "EPSG:6933": CeaParams(lat_ts=30.0, lon0=0.0, fe=0.0, fn=0.0,
                           a=A_WGS84, e2=E2),
}


def _cea_consts(p: CeaParams):
    e = math.sqrt(p.e2)
    ts = p.lat_ts * _RAD
    k0 = math.cos(ts) / math.sqrt(1.0 - p.e2 * math.sin(ts) ** 2)
    qp = float(_laea_q(np.asarray(_HALF_PI), e, p.e2))
    # authalic-latitude inverse series (Snyder eq. 3-18 — same as AEA/LAEA)
    a2 = p.e2 / 3.0 + 31.0 * p.e2 ** 2 / 180.0 + 517.0 * p.e2 ** 3 / 5040.0
    a4 = 23.0 * p.e2 ** 2 / 360.0 + 251.0 * p.e2 ** 3 / 3780.0
    a6 = 761.0 * p.e2 ** 3 / 45360.0
    return e, k0, qp, (a2, a4, a6)


def cea_forward(lon, lat, p: CeaParams):
    e, k0, _qp, _ = _cea_consts(p)
    lam = (np.asarray(lon, dtype=np.float64) - p.lon0) * _RAD
    phi = np.asarray(lat, dtype=np.float64) * _RAD
    x = p.fe + p.a * k0 * lam
    y = p.fn + p.a * _laea_q(phi, e, p.e2) / (2.0 * k0)
    return x, y


def cea_inverse(x, y, p: CeaParams):
    """Operation order mirrors cea_inverse_sql EXACTLY."""
    _e, k0, qp, (a2, a4, a6) = _cea_consts(p)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = p.lon0 + (x - p.fe) / (p.a * k0) * _DEG
    q = (y - p.fn) * (2.0 * k0) / p.a
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    phi = beta + a2 * np.sin(2.0 * beta) + a4 * np.sin(4.0 * beta) \
        + a6 * np.sin(6.0 * beta)
    return lon, phi * _DEG


def cea_inverse_sql(x_expr: str, y_expr: str, p: CeaParams):
    _e, k0, qp, (a2, a4, a6) = _cea_consts(p)
    L = _flit
    lon = f"({L(p.lon0)} + (({x_expr}) - {L(p.fe)}) / {L(p.a * k0)} * {L(_DEG)})"
    q = f"((({y_expr}) - {L(p.fn)}) * {L(2.0 * k0)} / {L(p.a)})"
    beta = f"asin({q} / {L(qp)})"
    lat = (
        f"(({beta} + {L(a2)} * sin(2.0 * {beta}) + {L(a4)} * sin(4.0 * {beta})"
        f" + {L(a6)} * sin(6.0 * {beta})) * {L(_DEG)})"
    )
    return lon, lat


def _cea_of(s: str):
    p = _CEA.get(s)
    if p is not None:
        return p
    if s.startswith("CEA:"):
        try:
            _, lat_ts, lon0, fe, fn, a, e2 = s.split(":")
            p = CeaParams(float(lat_ts), float(lon0), float(fe), float(fn),
                          float(a), float(e2))
        except ValueError:
            return None
        _CEA[s] = p
        return p
    return None


# -- Equidistant cylindrical (EPSG method 1028; Plate Carrée) -----------------
#
# EPSG:4087 WGS 84 / World Equidistant Cylindrical — the "unprojected
# meters" grid of many tiling systems and global mosaics. SEPARABLE like
# CEA: x = fe + ν(φts)·cosφts·λ depends only on lon, y = fn + M(φ) − M(φ0)
# (meridional arc, same _tm_consts series as tmerc) only on lat; the
# footpoint-latitude series gives a closed-form, iteration-free inverse
# that the SQL mirror replays term for term.

@dataclass(frozen=True)
class EqcParams:
    lat_ts: float
    lat0: float
    lon0: float
    fe: float
    fn: float
    a: float
    e2: float


_EQC: dict = {
    "EPSG:4087": EqcParams(lat_ts=0.0, lat0=0.0, lon0=0.0, fe=0.0, fn=0.0,
                           a=A_WGS84, e2=E2),
}


def _eqc_consts(p: EqcParams):
    c0, c2, c4, c6, e1 = _tm_consts(p.e2)
    ts = p.lat_ts * _RAD
    nu_cos = p.a / math.sqrt(1.0 - p.e2 * math.sin(ts) ** 2) * math.cos(ts)
    phi0 = p.lat0 * _RAD
    m0 = p.a * (c0 * phi0 - c2 * math.sin(2.0 * phi0)
                + c4 * math.sin(4.0 * phi0) - c6 * math.sin(6.0 * phi0))
    return nu_cos, m0, (c0, c2, c4, c6, e1)


def eqc_forward(lon, lat, p: EqcParams):
    nu_cos, m0, (c0, c2, c4, c6, _e1) = _eqc_consts(p)
    lam = (np.asarray(lon, dtype=np.float64) - p.lon0) * _RAD
    phi = np.asarray(lat, dtype=np.float64) * _RAD
    x = p.fe + nu_cos * lam
    m = p.a * (c0 * phi - c2 * np.sin(2.0 * phi)
               + c4 * np.sin(4.0 * phi) - c6 * np.sin(6.0 * phi))
    return x, p.fn + m - m0


def eqc_inverse(x, y, p: EqcParams):
    """Operation order mirrors eqc_inverse_sql EXACTLY."""
    nu_cos, m0, (c0, _c2, _c4, _c6, e1) = _eqc_consts(p)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = p.lon0 + (x - p.fe) / nu_cos * _DEG
    mu = (m0 + (y - p.fn)) / (p.a * c0)
    phi = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu)
    )
    return lon, phi * _DEG


def eqc_inverse_sql(x_expr: str, y_expr: str, p: EqcParams):
    nu_cos, m0, (c0, _c2, _c4, _c6, e1) = _eqc_consts(p)
    L = _flit
    lon = f"({L(p.lon0)} + (({x_expr}) - {L(p.fe)}) / {L(nu_cos)} * {L(_DEG)})"
    mu = f"(({L(m0)} + (({y_expr}) - {L(p.fn)})) / {L(p.a * c0)})"
    lat = (
        f"(({mu} + {L(3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0)} * sin(2.0 * {mu})"
        f" + {L(21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)} * sin(4.0 * {mu})"
        f" + {L(151.0 * e1 ** 3 / 96.0)} * sin(6.0 * {mu})"
        f" + {L(1097.0 * e1 ** 4 / 512.0)} * sin(8.0 * {mu})) * {L(_DEG)})"
    )
    return lon, lat


def _eqc_of(s: str):
    p = _EQC.get(s)
    if p is not None:
        return p
    if s.startswith("EQC:"):
        try:
            _, lat_ts, lat0, lon0, fe, fn, a, e2 = s.split(":")
            p = EqcParams(float(lat_ts), float(lat0), float(lon0),
                          float(fe), float(fn), float(a), float(e2))
        except ValueError:
            return None
        _EQC[s] = p
        return p
    return None


# -- Modified azimuthal equidistant (EPSG method 9832) ------------------------
#
# The Micronesia island grids (Guam-successor zones; EPSG:3295 Yap).
# Closed-form series both directions (EPSG GN7-2 formulas), so the SQL
# mirror is iteration-free. True distance from the projection center
# along any azimuth — the defining property the tests pin.

@dataclass(frozen=True)
class AeqdParams:
    lat0: float
    lon0: float
    fe: float
    fn: float
    a: float
    e2: float
    helm: tuple | None


_AEQD: dict = {
    # Guam 1963 / Yap Islands (Clarke 1866; EPSG:3295's defining params)
    "EPSG:3295": AeqdParams(
        lat0=9.0 + 32.0 / 60.0 + 48.15 / 3600.0,
        lon0=138.0 + 10.0 / 60.0 + 7.48 / 3600.0,
        fe=40000.0, fn=60000.0,
        a=_ELLPS["clrk66"][0], e2=_e2_of(*_ELLPS["clrk66"]),
        helm=None,
    ),
}


def aeqd_forward(lon, lat, p: AeqdParams):
    """Datum geodetic degrees -> grid (E, N) (EPSG 9832 forward series)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if p.helm is not None:
        lon, lat = wgs84_to_datum(lon, lat, p.a, p.e2, p.helm)
    e2 = p.e2
    phi0 = p.lat0 * _RAD
    s0, c0 = math.sin(phi0), math.cos(phi0)
    nu0 = p.a / math.sqrt(1.0 - e2 * s0 * s0)
    phi = lat * _RAD
    dl = (lon - p.lon0) * _RAD
    sinp, cosp = np.sin(phi), np.cos(phi)
    nu = p.a / np.sqrt(1.0 - e2 * sinp * sinp)
    psi = np.arctan((1.0 - e2) * np.tan(phi) + e2 * nu0 * s0 / (nu * cosp))
    sps, cps = np.sin(psi), np.cos(psi)
    alpha = np.arctan2(np.sin(dl), c0 * np.tan(psi) - s0 * np.cos(dl))
    sa, ca = np.sin(alpha), np.cos(alpha)
    G = math.sqrt(e2) * s0 / math.sqrt(1.0 - e2)
    H = math.sqrt(e2) * c0 * ca / math.sqrt(1.0 - e2)
    s = np.where(
        np.abs(sa) < 1e-12,
        np.arcsin(np.clip(c0 * sps - s0 * cps, -1.0, 1.0)) * np.sign(ca + (ca == 0)),
        np.arcsin(np.sin(dl) * cps / np.where(np.abs(sa) < 1e-12, 1.0, sa)),
    )
    H2 = H * H
    c = nu0 * s * (
        1.0 - s * s * H2 * (1.0 - H2) / 6.0
        + (s ** 3 / 8.0) * G * H * (1.0 - 2.0 * H2)
        + (s ** 4 / 120.0) * (H2 * (4.0 - 7.0 * H2) - 3.0 * G * G * (1.0 - 7.0 * H2))
        - (s ** 5 / 48.0) * G * H
    )
    return p.fe + c * sa, p.fn + c * ca


def aeqd_inverse(x, y, p: AeqdParams):
    """Grid -> WGS84 degrees (datum chain when helm set). Operation order
    mirrors aeqd_inverse_datum_sql EXACTLY."""
    e2 = p.e2
    phi0 = p.lat0 * _RAD
    s0, c0 = math.sin(phi0), math.cos(phi0)
    nu0 = p.a / math.sqrt(1.0 - e2 * s0 * s0)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = x - p.fe
    dy = y - p.fn
    cp = np.sqrt(dx * dx + dy * dy)
    alpha = np.arctan2(dx, dy)
    ca = np.cos(alpha)
    # constants factored exactly as the SQL mirror factors them
    A = (-e2 * c0 * c0 / (1.0 - e2)) * ca * ca
    B = (3.0 * e2 * s0 * c0 / (1.0 - e2)) * (1.0 - A) * ca
    D = cp / nu0
    J = D - A * (1.0 + A) * D ** 3 / 6.0 - B * (1.0 + 3.0 * A) * D ** 4 / 24.0
    K = 1.0 - A * J * J / 2.0 - B * J ** 3 / 6.0
    sinJ, cosJ = np.sin(J), np.cos(J)
    PSI = np.arcsin(np.clip(s0 * cosJ + c0 * sinJ * ca, -1.0, 1.0))
    lam = p.lon0 + np.arcsin(np.sin(alpha) * sinJ / np.cos(PSI)) * _DEG
    phi = np.arctan(
        (1.0 - e2 * K * s0 / np.sin(PSI)) * np.tan(PSI) / (1.0 - e2)
    ) * _DEG
    if p.helm is None:
        return lam, phi
    return datum_to_wgs84(lam, phi, p.a, p.e2, p.helm)


def aeqd_inverse_datum_sql(x_expr: str, y_expr: str, p: AeqdParams):
    """(lon_sql, lat_sql) in the projection's datum — mirror of
    aeqd_inverse before any Helmert stage."""
    e2 = p.e2
    phi0 = p.lat0 * _RAD
    s0, c0 = math.sin(phi0), math.cos(phi0)
    nu0 = p.a / math.sqrt(1.0 - e2 * s0 * s0)
    L = _flit
    dx = f"(({x_expr}) - {L(p.fe)})"
    dy = f"(({y_expr}) - {L(p.fn)})"
    cp = f"sqrt({dx} * {dx} + {dy} * {dy})"
    alpha = f"atan2({dx}, {dy})"
    ca = f"cos({alpha})"
    A = f"({L(-e2 * c0 * c0 / (1.0 - e2))} * {ca} * {ca})"
    B = f"({L(3.0 * e2 * s0 * c0 / (1.0 - e2))} * (1.0 - {A}) * {ca})"
    D = f"({cp} / {L(nu0)})"
    J = (f"({D} - {A} * (1.0 + {A}) * pow({D}, 3) / 6.0"
         f" - {B} * (1.0 + 3.0 * {A}) * pow({D}, 4) / 24.0)")
    K = f"(1.0 - {A} * {J} * {J} / 2.0 - {B} * pow({J}, 3) / 6.0)"
    PSI = f"asin({L(s0)} * cos({J}) + {L(c0)} * sin({J}) * {ca})"
    lon = f"({L(p.lon0)} + asin(sin({alpha}) * sin({J}) / cos({PSI})) * {L(_DEG)})"
    lat = (f"(atan((1.0 - {L(e2)} * {K} * {L(s0)} / sin({PSI}))"
           f" * tan({PSI}) / {L(1.0 - e2)}) * {L(_DEG)})")
    return lon, lat


def _aeqd_of(s: str) -> AeqdParams | None:
    p = _AEQD.get(s)
    if p is not None:
        return p
    if s.startswith("AEQD:"):
        try:
            parts = s.split(":")
            lat0, lon0, fe, fn, a, e2 = (float(v) for v in parts[1:7])
            helm = _helm_from_parts(parts, 7)
        except ValueError:
            return None
        p = AeqdParams(lat0, lon0, fe, fn, a, e2, helm)
        _AEQD[s] = p
        return p
    return None


# -- Hotine oblique Mercator variant B (EPSG method 9815; Snyder §9) ----------
#
# The skew-axis national grids: Timbalai/RSO Borneo (EPSG:29873), Alaska
# zone 1, Malaysia RSO. Variant B anchors false coordinates at the
# PROJECTION CENTER (Ec, Nc) with the u_c offset; proj4's +proj=omerc
# default. The inverse closes through the inverse conformal-latitude
# series, so the SQL mirror needs no iteration.

@dataclass(frozen=True)
class HomParams:
    a: float
    e2: float
    latc: float   # latitude of projection center (deg)
    lonc: float   # longitude of projection center (deg)
    alphac: float  # azimuth of the initial line at the center (deg)
    gammac: float  # angle from the rectified grid to the skew grid (deg)
    k0: float
    ec: float     # false easting at the center
    nc: float     # false northing at the center
    helm: tuple | None


# Timbalai 1948 / RSO Borneo (m) — the EPSG worked-example instance.
# Everest 1830 (1967 definition) ellipsoid; Timbalai->WGS84 3-param shift.
_HOM: dict = {
    "EPSG:29873": HomParams(
        a=6377298.556, e2=_e2_of(6377298.556, 300.8017),
        latc=4.0, lonc=115.0,
        alphac=53.0 + 18.0 / 60.0 + 56.9537 / 3600.0,
        gammac=53.0 + 7.0 / 60.0 + 48.3685 / 3600.0,
        k0=0.99984, ec=590476.87, nc=442857.65,
        helm=(-679.0, 669.0, -48.0, 0.0, 0.0, 0.0, 0.0),
    ),
}


def _hom_consts(p: HomParams):
    """Snyder eq. 9-1..9-12 / EPSG 9815 setup scalars."""
    e = math.sqrt(p.e2)
    phic = p.latc * _RAD
    sinc = math.sin(phic)
    B = math.sqrt(1.0 + p.e2 * math.cos(phic) ** 4 / (1.0 - p.e2))
    A = p.a * B * p.k0 * math.sqrt(1.0 - p.e2) / (1.0 - p.e2 * sinc * sinc)
    t0 = math.tan(math.pi / 4.0 - phic / 2.0) / (
        (1.0 - e * sinc) / (1.0 + e * sinc)) ** (e / 2.0)
    D = B * math.sqrt(1.0 - p.e2) / (
        math.cos(phic) * math.sqrt(1.0 - p.e2 * sinc * sinc))
    D2 = max(D * D, 1.0)
    sign = 1.0 if p.latc >= 0 else -1.0
    F = D + math.sqrt(D2 - 1.0) * sign
    H = F * t0 ** B
    G = (F - 1.0 / F) / 2.0
    gamma0 = math.asin(math.sin(p.alphac * _RAD) / D)
    lam0 = p.lonc * _RAD - math.asin(G * math.tan(gamma0)) / B
    # variant B center offset along the skew u axis
    uc = (A / B) * math.atan2(math.sqrt(D2 - 1.0), math.cos(p.alphac * _RAD)) * sign
    return e, B, A, H, gamma0, lam0, uc


def hom_forward(lon, lat, p: HomParams):
    """Datum geodetic degrees -> grid (E, N); WGS84 in when helm set."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if p.helm is not None:
        lon, lat = wgs84_to_datum(lon, lat, p.a, p.e2, p.helm)
    e, B, A, H, gamma0, lam0, uc = _hom_consts(p)
    phi = lat * _RAD
    sinp = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * sinp) / (1.0 + e * sinp)) ** (e / 2.0)
    Q = H / t ** B
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    dl = lon * _RAD - lam0
    # wrap to (-pi, pi] so B*dl stays in the principal branch
    dl = np.where(dl > np.pi, dl - 2 * np.pi, dl)
    dl = np.where(dl < -np.pi, dl + 2 * np.pi, dl)
    V = np.sin(B * dl)
    sg0, cg0 = math.sin(gamma0), math.cos(gamma0)
    U = (-V * cg0 + S * sg0) / T
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = A * np.arctan2(S * cg0 + V * sg0, np.cos(B * dl)) / B - uc
    gc = p.gammac * _RAD
    E = p.ec + v * math.cos(gc) + u * math.sin(gc)
    N = p.nc + u * math.cos(gc) - v * math.sin(gc)
    return E, N


def hom_inverse(x, y, p: HomParams):
    """Grid (E, N) -> WGS84 degrees (datum chain when helm set).
    Operation order mirrors hom_inverse_datum_sql EXACTLY."""
    e, B, A, H, gamma0, lam0, uc = _hom_consts(p)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    gc = p.gammac * _RAD
    dx = x - p.ec
    dy = y - p.nc
    v = dx * math.cos(gc) - dy * math.sin(gc)
    u = dy * math.cos(gc) + dx * math.sin(gc) + uc
    Q = np.exp(-B * v / A)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * u / A)
    sg0, cg0 = math.sin(gamma0), math.cos(gamma0)
    U = (V * cg0 + S * sg0) / T
    t = (H / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    x2, x4, x6, x8 = _chi_series(p.e2)
    phi = chi + x2 * np.sin(2.0 * chi) + x4 * np.sin(4.0 * chi) \
        + x6 * np.sin(6.0 * chi) + x8 * np.sin(8.0 * chi)
    lam = lam0 - np.arctan2(S * cg0 - V * sg0, np.cos(B * u / A)) / B
    lon_s = lam * _DEG
    lat_s = phi * _DEG
    if p.helm is None:
        return lon_s, lat_s
    return datum_to_wgs84(lon_s, lat_s, p.a, p.e2, p.helm)


def hom_inverse_datum_sql(x_expr: str, y_expr: str, p: HomParams):
    """(lon_sql, lat_sql) in the projection's DATUM — mirror of
    hom_inverse before the Helmert stage (chain _datum_sql on top)."""
    e, B, A, H, gamma0, lam0, uc = _hom_consts(p)
    L = _flit
    gc = p.gammac * _RAD
    dx = f"(({x_expr}) - {L(p.ec)})"
    dy = f"(({y_expr}) - {L(p.nc)})"
    v = f"({dx} * {L(math.cos(gc))} - {dy} * {L(math.sin(gc))})"
    u = f"({dy} * {L(math.cos(gc))} + {dx} * {L(math.sin(gc))} + {L(uc)})"
    Q = f"exp({L(-1.0)} * {L(B)} * {v} / {L(A)})"
    S = f"(({Q} - 1.0 / {Q}) / 2.0)"
    T = f"(({Q} + 1.0 / {Q}) / 2.0)"
    V = f"sin({L(B)} * {u} / {L(A)})"
    sg0, cg0 = L(math.sin(gamma0)), L(math.cos(gamma0))
    U = f"(({V} * {cg0} + {S} * {sg0}) / {T})"
    t = f"pow({L(H)} / sqrt((1.0 + {U}) / (1.0 - {U})), {L(1.0 / B)})"
    chi = f"({L(math.pi / 2.0)} - 2.0 * atan({t}))"
    x2, x4, x6, x8 = _chi_series(p.e2)
    lat = (
        f"(({chi} + {L(x2)} * sin(2.0 * {chi}) + {L(x4)} * sin(4.0 * {chi})"
        f" + {L(x6)} * sin(6.0 * {chi}) + {L(x8)} * sin(8.0 * {chi})) * {L(_DEG)})"
    )
    lon = (
        f"(({L(lam0)} - atan2({S} * {cg0} - {V} * {sg0}, "
        f"cos({L(B)} * {u} / {L(A)})) / {L(B)}) * {L(_DEG)})"
    )
    return lon, lat


def _hom_of(s: str) -> HomParams | None:
    p = _HOM.get(s)
    if p is not None:
        return p
    if s.startswith("HOM:"):
        try:
            parts = s.split(":")
            a, e2, latc, lonc, alphac, gammac, k0, ec, nc = (
                float(v) for v in parts[1:10])
            helm = _helm_from_parts(parts, 10)
        except ValueError:
            return None
        p = HomParams(a, e2, latc, lonc, alphac, gammac, k0, ec, nc, helm)
        _HOM[s] = p
        return p
    return None


def _etm_of(s: str) -> EtmParams | None:
    p = _ETM.get(s)
    if p is not None:
        return p
    if s.startswith("ETM:"):
        try:
            parts = s.split(":")
            a, e2, k0, lat0, lon0, fe, fn = (float(v) for v in parts[1:8])
            helm = _helm_from_parts(parts, 8)
        except ValueError:
            return None
        p = EtmParams(a, e2, k0, lat0, lon0, fe, fn, helm)
        _ETM[s] = p
        return p
    return None


def _swiss_of(s: str) -> SwissParams | None:
    p = _SWISS.get(s)
    if p is not None:
        return p
    if s.startswith("SOMERC:"):
        try:
            parts = s.split(":")
            a, e2, lat0, lon0, fe, fn = (float(v) for v in parts[1:7])
            helm = _helm_from_parts(parts, 7)
        except ValueError:
            return None
        p = SwissParams(a, e2, lat0, lon0, fe, fn, helm)
        _SWISS[s] = p
        return p
    return None


def _aea_of(s: str) -> AeaParams | None:
    p = _AEA.get(s)
    if p is not None:
        return p
    if s.startswith("AEA:"):
        try:
            _, lat1, lat2, lat0, lon0, fe, fn, e2 = s.split(":")
            p = AeaParams(
                float(lat1), float(lat2), float(lat0), float(lon0),
                float(fe), float(fn), 6378137.0, float(e2),
            )
        except ValueError:
            return None
        _AEA[s] = p
        return p
    return None


def _polar_of(s: str) -> PolarPS | None:
    """PolarPS for an SRS key — EPSG entry or a self-describing 'PS:...'
    dynamic key (parsed on demand so executor workers resolve it too)."""
    p = _POLAR.get(s)
    if p is not None:
        return p
    if s.startswith("PS:"):
        try:
            _, lat_ts, lon0, fe, fn, hemi = s.split(":")
            p = PolarPS(float(lat_ts), float(lon0), float(fe), float(fn), hemi == "S")
        except ValueError:
            return None
        _POLAR[s] = p
        return p
    return None


def _laea_of(s: str) -> LaeaParams | None:
    p = _LAEA.get(s)
    if p is not None:
        return p
    if s.startswith("LAEA:"):
        try:
            _, lat0, lon0, fe, fn, e2 = s.split(":")
            p = LaeaParams(float(lat0), float(lon0), float(fe), float(fn),
                           6378137.0, float(e2))
        except ValueError:
            return None
        _LAEA[s] = p
        return p
    return None


def _sinu_of(s: str) -> SinuParams | None:
    p = _SINU.get(s)
    if p is not None:
        return p
    if s.startswith("SINU:"):
        try:
            _, r, lon0, fe, fn = s.split(":")
            p = SinuParams(float(r), float(lon0), float(fe), float(fn))
        except ValueError:
            return None
        _SINU[s] = p
        return p
    return None


def _lcc_of(s: str) -> LccParams | None:
    p = _LCC.get(s)
    if p is not None:
        return p
    if s.startswith("LCC:"):
        try:
            _, lat1, lat2, lat0, lon0, fe, fn, e2 = s.split(":")
            p = LccParams(
                float(lat1), float(lat2), float(lat0), float(lon0),
                float(fe), float(fn), 6378137.0, float(e2),
            )
        except ValueError:
            return None
        _LCC[s] = p
        return p
    return None


def _nonsep_inverse(x, y, s: str):
    """Dispatch (x, y in srs) -> (lon, lat) for non-separable SRS."""
    pe = _etm_of(s)
    if pe is not None:
        return etm_inverse_wgs84(x, y, pe)
    ph = _hom_of(s)
    if ph is not None:
        return hom_inverse(x, y, ph)
    pq = _aeqd_of(s)
    if pq is not None:
        return aeqd_inverse(x, y, pq)
    pw = _swiss_of(s)
    if pw is not None:
        return swiss_inverse(x, y, pw)
    p = _polar_of(s)
    if p is not None:
        return ps_inverse(x, y, p)
    pl = _laea_of(s)
    if pl is not None:
        return laea_inverse(x, y, pl)
    ps = _sinu_of(s)
    if ps is not None:
        return sinu_inverse(x, y, ps)
    pc = _lcc_of(s)
    if pc is not None:
        return lcc_inverse(x, y, pc)
    pa = _aea_of(s)
    if pa is not None:
        return aea_inverse(x, y, pa)
    lon0, fn = utm_params(s)
    return tm_inverse(x, y, lon0, fn)


def _nonsep_forward(lon, lat, s: str):
    pe = _etm_of(s)
    if pe is not None:
        return etm_forward_wgs84(lon, lat, pe)
    ph = _hom_of(s)
    if ph is not None:
        return hom_forward(lon, lat, ph)
    pq = _aeqd_of(s)
    if pq is not None:
        return aeqd_forward(lon, lat, pq)
    pw = _swiss_of(s)
    if pw is not None:
        return swiss_forward(lon, lat, pw)
    p = _polar_of(s)
    if p is not None:
        return ps_forward(lon, lat, p)
    pl = _laea_of(s)
    if pl is not None:
        return laea_forward(lon, lat, pl)
    ps = _sinu_of(s)
    if ps is not None:
        return sinu_forward(lon, lat, ps)
    pc = _lcc_of(s)
    if pc is not None:
        return lcc_forward(lon, lat, pc)
    pa = _aea_of(s)
    if pa is not None:
        return aea_forward(lon, lat, pa)
    lon0, fn = utm_params(s)
    return tm_forward(lon, lat, lon0, fn)


# -- generic transform surface -------------------------------------------------

def axis_to_wgs84(xs: np.ndarray, ys: np.ndarray, srs: str):
    """1-D axis vectors in a SEPARABLE ``srs`` -> (lon, lat) vectors."""
    s = normalize(srs)
    if s == "EPSG:4326":
        return xs, ys
    if s == "EPSG:3857":
        return x_to_lon(xs), y_to_lat(ys)
    pc = _cea_of(s)
    if pc is not None:  # x and y transform independently
        lon, _ = cea_inverse(xs, np.zeros_like(np.asarray(xs, dtype=np.float64)), pc)
        _, lat = cea_inverse(np.zeros_like(np.asarray(ys, dtype=np.float64)), ys, pc)
        return lon, lat
    pe = _eqc_of(s)
    if pe is not None:
        lon, _ = eqc_inverse(xs, np.zeros_like(np.asarray(xs, dtype=np.float64)), pe)
        _, lat = eqc_inverse(np.zeros_like(np.asarray(ys, dtype=np.float64)), ys, pe)
        return lon, lat
    raise ValueError(f"{srs} is not separable; use grid_to_wgs84")


def grid_to_wgs84(xs: np.ndarray, ys: np.ndarray, srs: str):
    """1-D axis vectors -> 2-D (LON, LAT) grids of shape (len(ys), len(xs)),
    valid for any supported SRS (the non-separable warp path)."""
    s = normalize(srs)
    if is_separable(s):
        lon, lat = axis_to_wgs84(xs, ys, s)
        return np.broadcast_to(lon[None, :], (len(ys), len(xs))), np.broadcast_to(
            lat[:, None], (len(ys), len(xs))
        )
    X = np.broadcast_to(np.asarray(xs, dtype=np.float64)[None, :], (len(ys), len(xs)))
    Y = np.broadcast_to(np.asarray(ys, dtype=np.float64)[:, None], (len(ys), len(xs)))
    return _nonsep_inverse(X, Y, s)


def from_wgs84(lon, lat, srs: str):
    """(lon, lat) -> coords in ``srs`` (vectorized)."""
    s = normalize(srs)
    if s == "EPSG:4326":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if s == "EPSG:3857":
        return lon_to_x(lon), lat_to_y(lat)
    pc = _cea_of(s)
    if pc is not None:
        return cea_forward(lon, lat, pc)
    pe = _eqc_of(s)
    if pe is not None:
        return eqc_forward(lon, lat, pe)
    return _nonsep_forward(lon, lat, s)


def points_to_wgs84(x, y, srs: str):
    """Point-wise (x, y in srs) -> (lon, lat) (vectorized; the inverse of
    from_wgs84 for arbitrary point sets, not axis grids)."""
    s = normalize(srs)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if s == "EPSG:4326":
        return x, y
    if s == "EPSG:3857":
        return x_to_lon(x), y_to_lat(y)
    pc = _cea_of(s)
    if pc is not None:
        return cea_inverse(x, y, pc)
    pe = _eqc_of(s)
    if pe is not None:
        return eqc_inverse(x, y, pe)
    return _nonsep_inverse(x, y, s)


def bbox_to_wgs84(left, right, bottom, top, srs: str, n_samples: int = 9):
    """Conservative 4326 bbox of a rectangle in ``srs``.

    Separable SRS: corners map to corners (exact). Non-separable: sample
    ``n_samples`` points per edge, take extremes, pad by the max adjacent
    sample gap — a superset bbox (the per-cell inside test downstream stays
    exact; the reference transforms the query rect the same way,
    src/image_collection.cpp:1326)."""
    s = normalize(srs)
    if s == "EPSG:4326":
        return left, right, bottom, top
    if s == "EPSG:3857":
        return float(x_to_lon(left)), float(x_to_lon(right)), float(y_to_lat(bottom)), float(y_to_lat(top))
    _pc = _cea_of(s)
    if _pc is not None:  # separable: corners map to corners, exact
        lon0, lat0 = cea_inverse(left, bottom, _pc)
        lon1, lat1 = cea_inverse(right, top, _pc)
        return float(lon0), float(lon1), float(lat0), float(lat1)
    _pe = _eqc_of(s)
    if _pe is not None:
        lon0, lat0 = eqc_inverse(left, bottom, _pe)
        lon1, lat1 = eqc_inverse(right, top, _pe)
        return float(lon0), float(lon1), float(lat0), float(lat1)
    _pp = _polar_of(s)
    if _pp is not None and (left <= _pp.fe <= right) and (bottom <= _pp.fn <= top):
        # rectangle contains the pole: every longitude occurs; latitudes
        # reach the pole itself (edge sampling would miss both)
        p = _pp
        t = np.linspace(0.0, 1.0, n_samples)
        xs = left + (right - left) * t
        ys = bottom + (top - bottom) * t
        ex = np.concatenate([xs, xs, np.full_like(ys, left), np.full_like(ys, right)])
        ey = np.concatenate([np.full_like(xs, bottom), np.full_like(xs, top), ys, ys])
        _, lat = ps_inverse(ex, ey, p)
        if p.south:
            return -180.0, 180.0, -90.0, float(lat.max())
        return -180.0, 180.0, float(lat.min()), 90.0
    t = np.linspace(0.0, 1.0, n_samples)
    xs = left + (right - left) * t
    ys = bottom + (top - bottom) * t
    ex = np.concatenate([xs, xs, np.full_like(ys, left), np.full_like(ys, right)])
    ey = np.concatenate([np.full_like(xs, bottom), np.full_like(xs, top), ys, ys])
    lon, lat = _nonsep_inverse(ex, ey, s)
    # pad by the curvature bound: between two edge samples the extremum can
    # exceed the sampled max by at most ~the sample spread; one full gap is
    # a safe over-estimate at these scales
    pad_lon = (lon.max() - lon.min()) / max(n_samples - 1, 1)
    pad_lat = (lat.max() - lat.min()) / max(n_samples - 1, 1)
    return (
        float(lon.min() - pad_lon),
        float(lon.max() + pad_lon),
        float(lat.min() - pad_lat),
        float(lat.max() + pad_lat),
    )


def bbox_from_wgs84(left, right, bottom, top, srs: str, n_samples: int = 9):
    """Conservative ``srs`` bbox of a 4326 rectangle (densified edges +
    one-gap pad; exact for separable SRS)."""
    s = normalize(srs)
    if is_separable(s):
        x0, y0 = from_wgs84(left, bottom, s)
        x1, y1 = from_wgs84(right, top, s)
        return float(x0), float(x1), float(y0), float(y1)
    t = np.linspace(0.0, 1.0, n_samples)
    lons = left + (right - left) * t
    lats = bottom + (top - bottom) * t
    el = np.concatenate([lons, lons, np.full_like(lats, left), np.full_like(lats, right)])
    eb = np.concatenate([np.full_like(lons, bottom), np.full_like(lons, top), lats, lats])
    x, y = from_wgs84(el, eb, s)
    pad_x = (x.max() - x.min()) / max(n_samples - 1, 1)
    pad_y = (y.max() - y.min()) / max(n_samples - 1, 1)
    return (
        float(x.min() - pad_x),
        float(x.max() + pad_x),
        float(y.min() - pad_y),
        float(y.max() + pad_y),
    )


# -- Spark column expressions (join-side, JVM) -------------------------------

def col_x_to_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R))


def col_y_to_lat(y: Column) -> Column:
    return F.degrees(F.atan(F.sinh(y / F.lit(R))))
