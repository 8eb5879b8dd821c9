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
    if raw.startswith(("PS:", "LAEA:", "SINU:", "LCC:", "AEA:")):
        # dynamic keys are SELF-DESCRIBING (parse-on-demand): executor
        # python workers import srs.py fresh, so a driver-side registry
        # alone would not resolve them inside kernels
        if (
            _polar_of(raw) is None and _laea_of(raw) is None
            and _sinu_of(raw) is None and _lcc_of(raw) is None
            and _aea_of(raw) is None
        ):
            raise ValueError(f"malformed dynamic SRS key {raw!r}")
        return raw
    s = raw.upper().replace(" ", "")
    if s in ("EPSG:4326", "WGS84", "CRS84"):
        return "EPSG:4326"
    if s in ("EPSG:3857", "EPSG:900913", "WEBMERCATOR"):
        return "EPSG:3857"
    if s in _POLAR or s in _LAEA or s in _LCC or s in _AEA:
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
        f"equivalent proj4/WKT strings, and any polar-stereographic/LAEA/"
        f"sinusoidal/LCC/Albers proj4 parameter set)"
    )


def is_separable(srs: str) -> bool:
    """True iff x depends only on lon and y only on lat (1-D axis transforms
    suffice); UTM/polar/LAEA are non-separable."""
    return normalize(srs) in ("EPSG:4326", "EPSG:3857")


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
