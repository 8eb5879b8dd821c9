"""NTv2 grid-shift (.gsb) support — PROJ-grade datum shifts for legacy
national datums (r4 VERDICT #8; the reference accepts any PROJ SRS incl.
``+nadgrids=``, src/view.h:703-711, and PROJ applies the grid internally).

Format from the public *NTv2 Developer's Guide* (Canadian Geodetic
Survey): an overview header of 11 16-byte records (8-char name + 8-byte
value; ints are int32 + 4 pad), then per sub-grid an 11-record header
(S_LAT/N_LAT/E_LONG/W_LONG/LAT_INC/LONG_INC in arc-seconds, GS_COUNT
nodes) and GS_COUNT node records of four float32s (lat shift, lon shift,
lat/lon accuracy, arc-seconds). Longitudes are POSITIVE WEST; nodes run
row-major from S_LAT northward, each row from E_LONG increasing westward.
Canadian grids are little-endian, Australian ones big-endian — the reader
detects byte order from NUM_OREC == 11.

Shift semantics (Guide §"Interpolating"): source-datum geodetic ->
target-datum geodetic via bilinear interpolation in the cell;
``lat' = lat + Δlat/3600``, ``lon_east' = lon_east - Δlon/3600`` (the
sign flip because Δlon is positive-west). The inverse direction iterates
the forward shift (3 rounds, the standard fixed-point; sub-mm
convergence since the field varies slowly). Points outside every
sub-grid pass through UNSHIFTED (callers warping mixed-extent data want
identity falloff, not NaNs); sub-grid choice picks the densest grid
containing the point (children refine parents).

Validation strategy (tests/test_ntv2.py): no real national grid ships in
this container, so the writer builds spec-valid fixtures whose shift
field is AFFINE in (lon, lat) — bilinear interpolation reproduces an
affine field exactly, making every interpolated value analytically
checkable (plus golden byte-structure tests and inverse round-trips).
"""

from __future__ import annotations

import struct

import numpy as np

_SEC = 3600.0


def _rec_str(name: str, val: str) -> bytes:
    return name.encode().ljust(8)[:8] + val.encode().ljust(8)[:8]


def _rec_int(name: str, val: int) -> bytes:
    return name.encode().ljust(8)[:8] + struct.pack("<i", val) + b"\x00" * 4


def _rec_dbl(name: str, val: float) -> bytes:
    return name.encode().ljust(8)[:8] + struct.pack("<d", val)


class SubGrid:
    def __init__(self, name, parent, s_lat, n_lat, e_long, w_long,
                 lat_inc, long_inc, lat_shift, lon_shift):
        self.name, self.parent = name, parent
        self.s_lat, self.n_lat = s_lat, n_lat
        self.e_long, self.w_long = e_long, w_long          # positive WEST
        self.lat_inc, self.long_inc = lat_inc, long_inc
        self.lat_shift = lat_shift                         # (nrow, ncol) sec
        self.lon_shift = lon_shift

    def contains(self, lon_w_sec, lat_sec):
        return ((lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
                & (lon_w_sec >= self.e_long) & (lon_w_sec <= self.w_long))

    def interp(self, lon_w_sec, lat_sec):
        """Bilinear (Δlat_sec, Δlon_sec) at positive-west/seconds coords."""
        nrow, ncol = self.lat_shift.shape
        fr = np.clip((lat_sec - self.s_lat) / self.lat_inc, 0, nrow - 1)
        fc = np.clip((lon_w_sec - self.e_long) / self.long_inc, 0, ncol - 1)
        r0 = np.clip(np.floor(fr).astype(np.int64), 0, nrow - 2) \
            if nrow > 1 else np.zeros_like(fr, dtype=np.int64)
        c0 = np.clip(np.floor(fc).astype(np.int64), 0, ncol - 2) \
            if ncol > 1 else np.zeros_like(fc, dtype=np.int64)
        dr = fr - r0
        dc = fc - c0
        r1 = np.minimum(r0 + 1, nrow - 1)
        c1 = np.minimum(c0 + 1, ncol - 1)

        def bi(g):
            return (g[r0, c0] * (1 - dr) * (1 - dc) + g[r1, c0] * dr * (1 - dc)
                    + g[r0, c1] * (1 - dr) * dc + g[r1, c1] * dr * dc)

        return bi(self.lat_shift), bi(self.lon_shift)


class NTv2Grid:
    def __init__(self, subgrids, system_f="", system_t=""):
        self.subgrids = list(subgrids)
        self.system_f, self.system_t = system_f, system_t

    def _pick(self, lon_w_sec, lat_sec):
        """Index of the densest sub-grid containing each point, -1 if none."""
        pick = np.full(lon_w_sec.shape, -1, dtype=np.int64)
        best = np.full(lon_w_sec.shape, np.inf)
        for i, g in enumerate(self.subgrids):
            m = g.contains(lon_w_sec, lat_sec) & (g.lat_inc < best)
            pick[m] = i
            best = np.where(m, g.lat_inc, best)
        return pick

    def shift(self, lon_deg, lat_deg):
        """(Δlon_deg_east, Δlat_deg) of the forward (F->T) shift; zero
        outside every sub-grid."""
        lon = np.atleast_1d(np.asarray(lon_deg, dtype=np.float64))
        lat = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
        lon_w = -lon * _SEC
        lat_s = lat * _SEC
        dlon = np.zeros_like(lon)
        dlat = np.zeros_like(lat)
        pick = self._pick(lon_w, lat_s)
        for i, g in enumerate(self.subgrids):
            m = pick == i
            if m.any():
                a, o = g.interp(lon_w[m], lat_s[m])
                dlat[m] = a / _SEC
                dlon[m] = -o / _SEC      # Δlon is positive WEST in the file
        return dlon, dlat

    def forward(self, lon_deg, lat_deg):
        """Source datum -> target datum geodetic degrees."""
        dlon, dlat = self.shift(lon_deg, lat_deg)
        return np.asarray(lon_deg) + dlon, np.asarray(lat_deg) + dlat

    def inverse(self, lon_deg, lat_deg, iters: int = 4):
        """Target datum -> source datum: fixed-point iteration of the
        forward shift (the Guide's recommended inverse)."""
        lon_t = np.asarray(lon_deg, dtype=np.float64)
        lat_t = np.asarray(lat_deg, dtype=np.float64)
        lon = lon_t.copy()
        lat = lat_t.copy()
        for _ in range(iters):
            dlon, dlat = self.shift(lon, lat)
            lon = lon_t - dlon
            lat = lat_t - dlat
        return lon, lat


def write_gsb(path: str, subgrids: list[dict], system_f="NAD27",
              system_t="NAD83") -> None:
    """Spec-valid .gsb fixture writer. Each dict: name, parent, s_lat,
    n_lat, e_long, w_long, lat_inc, long_inc (arc-seconds, positive-west
    longitudes) and lat_shift / lon_shift (nrow, ncol) second arrays."""
    out = bytearray()
    out += _rec_int("NUM_OREC", 11)
    out += _rec_int("NUM_SREC", 11)
    out += _rec_int("NUM_FILE", len(subgrids))
    out += _rec_str("GS_TYPE", "SECONDS")
    out += _rec_str("VERSION", "NTv2.0")
    out += _rec_str("SYSTEM_F", system_f)
    out += _rec_str("SYSTEM_T", system_t)
    out += _rec_dbl("MAJOR_F", 6378206.4)
    out += _rec_dbl("MINOR_F", 6356583.8)
    out += _rec_dbl("MAJOR_T", 6378137.0)
    out += _rec_dbl("MINOR_T", 6356752.314)
    for g in subgrids:
        la = np.asarray(g["lat_shift"], dtype="<f4")
        lo = np.asarray(g["lon_shift"], dtype="<f4")
        nrow, ncol = la.shape
        out += _rec_str("SUB_NAME", g["name"])
        out += _rec_str("PARENT", g.get("parent", "NONE"))
        out += _rec_str("CREATED", "20260818")
        out += _rec_str("UPDATED", "20260818")
        out += _rec_dbl("S_LAT", g["s_lat"])
        out += _rec_dbl("N_LAT", g["n_lat"])
        out += _rec_dbl("E_LONG", g["e_long"])
        out += _rec_dbl("W_LONG", g["w_long"])
        out += _rec_dbl("LAT_INC", g["lat_inc"])
        out += _rec_dbl("LONG_INC", g["long_inc"])
        out += _rec_int("GS_COUNT", nrow * ncol)
        # rows south->north; within a row east->west longitude (i.e.
        # increasing positive-west value); accuracies written as zeros
        for r in range(nrow):
            for c in range(ncol):
                out += struct.pack("<ffff", float(la[r, c]), float(lo[r, c]),
                                   0.0, 0.0)
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_gsb(src) -> NTv2Grid:
    """.gsb path or bytes -> NTv2Grid (sub-grids + shift arrays)."""
    if isinstance(src, (bytes, bytearray, memoryview)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()
    if len(buf) < 11 * 16:
        raise ValueError("truncated NTv2 file")
    (norec_le,) = struct.unpack_from("<i", buf, 8)
    (norec_be,) = struct.unpack_from(">i", buf, 8)
    if norec_le == 11:
        en = "<"
    elif norec_be == 11:
        en = ">"
    else:
        raise ValueError("not an NTv2 grid-shift file (NUM_OREC != 11)")

    def sval(pos):
        return buf[pos + 8:pos + 16].decode("ascii", "replace").strip()

    def ival(pos):
        return struct.unpack_from(en + "i", buf, pos + 8)[0]

    def dval(pos):
        return struct.unpack_from(en + "d", buf, pos + 8)[0]

    hdr = {}
    pos = 0
    for _ in range(11):
        name = buf[pos:pos + 8].decode("ascii", "replace").strip()
        hdr[name] = pos
        pos += 16
    nfile = ival(hdr["NUM_FILE"])
    nsrec = ival(hdr["NUM_SREC"])
    system_f = sval(hdr["SYSTEM_F"]) if "SYSTEM_F" in hdr else ""
    system_t = sval(hdr["SYSTEM_T"]) if "SYSTEM_T" in hdr else ""
    if nfile <= 0 or nfile > 10_000:
        raise ValueError(f"implausible NTv2 NUM_FILE {nfile}")
    subgrids = []
    for _ in range(nfile):
        sh = {}
        for _r in range(nsrec):
            name = buf[pos:pos + 8].decode("ascii", "replace").strip()
            sh[name] = pos
            pos += 16
        count = ival(sh["GS_COUNT"])
        s_lat, n_lat = dval(sh["S_LAT"]), dval(sh["N_LAT"])
        e_long, w_long = dval(sh["E_LONG"]), dval(sh["W_LONG"])
        lat_inc, long_inc = dval(sh["LAT_INC"]), dval(sh["LONG_INC"])
        ncol = int(round((w_long - e_long) / long_inc)) + 1
        nrow = int(round((n_lat - s_lat) / lat_inc)) + 1
        if nrow * ncol != count:
            raise ValueError(
                f"NTv2 sub-grid extent disagrees with GS_COUNT "
                f"({nrow}x{ncol} != {count})")
        need = count * 16
        if pos + need > len(buf):
            raise ValueError("truncated NTv2 node block")
        nodes = np.frombuffer(buf, en + "f4", count=count * 4,
                              offset=pos).reshape(count, 4)
        pos += need
        subgrids.append(SubGrid(
            sval(sh["SUB_NAME"]), sval(sh["PARENT"]), s_lat, n_lat,
            e_long, w_long, lat_inc, long_inc,
            nodes[:, 0].reshape(nrow, ncol).astype(np.float64),
            nodes[:, 1].reshape(nrow, ncol).astype(np.float64)))
    return NTv2Grid(subgrids, system_f, system_t)


_CACHE: dict = {}


def grid_shift(path: str) -> NTv2Grid:
    """Cached reader — each executor loads a grid once (national grids
    are a few MB; at cluster scale ship them via spark.files and resolve
    with SparkFiles.get, same as any side artifact)."""
    g = _CACHE.get(path)
    if g is None:
        g = _CACHE[path] = read_gsb(path)
    return g
