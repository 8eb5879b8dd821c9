"""NTv2 grid-shift (.gsb): byte-structure conformance, bilinear
interpolation exactness on an affine shift field, sub-grid refinement,
inverse round-trip, byte-order detection, and the +nadgrids= dynamic-key
path through srs.py.

No real national grid ships in this container, so fixtures are built by
the spec-valid writer with an AFFINE shift field — bilinear interpolation
reproduces an affine field exactly, so every interpolated value has a
closed-form expected value (the honest analog of published sample
points, which we cannot verify offline)."""

import struct

import numpy as np
import pytest

from gdalcubes_cpp_spark.sources.ntv2 import grid_shift, read_gsb, write_gsb

# affine shift field in arc-seconds of (lat_sec, lon_w_sec):
#   dlat = 1.0 + 2e-5 * lat + 1e-5 * lonw ; dlon = -0.5 + 3e-5 * lonw
A0, A1, A2 = 1.0, 2e-5, 1e-5
B0, B1 = -0.5, 3e-5


def _field(lat_sec, lon_w_sec):
    return (A0 + A1 * lat_sec + A2 * lon_w_sec, B0 + B1 * lon_w_sec)


def _subgrid(name, parent, s_lat, n_lat, e_long, w_long, lat_inc, long_inc):
    nrow = int(round((n_lat - s_lat) / lat_inc)) + 1
    ncol = int(round((w_long - e_long) / long_inc)) + 1
    la = np.zeros((nrow, ncol))
    lo = np.zeros((nrow, ncol))
    for r in range(nrow):
        for c in range(ncol):
            la[r, c], lo[r, c] = _field(s_lat + r * lat_inc,
                                        e_long + c * long_inc)
    return {"name": name, "parent": parent, "s_lat": s_lat, "n_lat": n_lat,
            "e_long": e_long, "w_long": w_long, "lat_inc": lat_inc,
            "long_inc": long_inc, "lat_shift": la, "lon_shift": lo}


@pytest.fixture()
def gsb(tmp_path):
    # around 45..47N, 74..78W (positive-west seconds), coarse parent +
    # a denser child over the middle degree
    p = str(tmp_path / "shift.gsb")
    parent = _subgrid("COARSE", "NONE", 45 * 3600.0, 47 * 3600.0,
                      74 * 3600.0, 78 * 3600.0, 1800.0, 1800.0)
    child = _subgrid("FINE", "COARSE", 45.5 * 3600.0, 46.5 * 3600.0,
                     75 * 3600.0, 76 * 3600.0, 300.0, 300.0)
    write_gsb(p, [parent, child])
    return p


def test_golden_structure(gsb):
    buf = open(gsb, "rb").read()
    assert buf[:8].decode().strip() == "NUM_OREC"
    assert struct.unpack_from("<i", buf, 8)[0] == 11
    names = [buf[i * 16:i * 16 + 8].decode().strip() for i in range(11)]
    assert names == ["NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE",
                     "VERSION", "SYSTEM_F", "SYSTEM_T", "MAJOR_F",
                     "MINOR_F", "MAJOR_T", "MINOR_T"]
    assert buf[3 * 16 + 8:3 * 16 + 16].decode().strip() == "SECONDS"
    g = read_gsb(gsb)
    assert [s.name for s in g.subgrids] == ["COARSE", "FINE"]
    assert g.subgrids[1].parent == "COARSE"
    assert g.subgrids[0].lat_shift.shape == (5, 9)
    assert g.system_f == "NAD27" and g.system_t == "NAD83"


def test_affine_field_interpolates_exactly(gsb):
    g = read_gsb(gsb)
    rng = np.random.RandomState(3)
    lat = 45.0 + rng.rand(200) * 2.0
    lon = -(74.0 + rng.rand(200) * 4.0)           # east-positive degrees
    lon2, lat2 = g.forward(lon, lat)
    want_dlat, want_dlonw = _field(lat * 3600.0, -lon * 3600.0)
    assert np.allclose(lat2 - lat, want_dlat / 3600.0, atol=2e-7)
    assert np.allclose(lon2 - lon, -want_dlonw / 3600.0, atol=2e-7)
    # magnitudes are NAD27->NAD83-like (an arc-second-ish)
    assert np.all(np.abs(lat2 - lat) < 3.0 / 3600.0 * 3)


def test_densest_subgrid_wins(gsb):
    g = read_gsb(gsb)
    inside_child = g._pick(np.array([75.5 * 3600.0]), np.array([46.0 * 3600.0]))
    outside_child = g._pick(np.array([77.0 * 3600.0]), np.array([46.0 * 3600.0]))
    assert inside_child[0] == 1 and outside_child[0] == 0


def test_outside_grid_is_identity(gsb):
    g = read_gsb(gsb)
    lon2, lat2 = g.forward(np.array([10.0]), np.array([50.0]))
    assert lon2[0] == 10.0 and lat2[0] == 50.0


def test_inverse_roundtrip(gsb):
    g = read_gsb(gsb)
    rng = np.random.RandomState(9)
    lat = 45.1 + rng.rand(100) * 1.8
    lon = -(74.1 + rng.rand(100) * 3.8)
    flon, flat = g.forward(lon, lat)
    blon, blat = g.inverse(flon, flat)
    assert np.allclose(blon, lon, atol=1e-9)
    assert np.allclose(blat, lat, atol=1e-9)


def test_big_endian_read(gsb, tmp_path):
    """Australian grids are big-endian; the reader detects byte order."""
    buf = bytearray(open(gsb, "rb").read())
    le = read_gsb(bytes(buf))
    # byte-swap every value field per record type
    out = bytearray()
    pos = 0

    def swap_hdr(n):
        nonlocal pos
        for _ in range(n):
            name = bytes(buf[pos:pos + 8])
            val = bytes(buf[pos + 8:pos + 16])
            tag = name.decode().strip()
            if tag in ("NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"):
                val = val[:4][::-1] + val[4:]
            elif tag not in ("GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T",
                             "SUB_NAME", "PARENT", "CREATED", "UPDATED"):
                val = val[::-1]
            out.extend(name + val)
            pos += 16

    swap_hdr(11)
    for g in le.subgrids:
        swap_hdr(11)
        count = g.lat_shift.size
        f = np.frombuffer(buf, "<f4", count=count * 4, offset=pos)
        out.extend(f.astype(">f4").tobytes())
        pos += count * 16
    be = read_gsb(bytes(out))
    assert np.allclose(be.subgrids[0].lat_shift, le.subgrids[0].lat_shift)


def test_refusals(gsb):
    with pytest.raises(ValueError, match="NUM_OREC"):
        read_gsb(b"\x00" * 200)
    buf = bytearray(open(gsb, "rb").read())
    struct.pack_into("<i", buf, 2 * 16 + 8, 9999)   # NUM_FILE implausible... valid
    # corrupt GS_COUNT so extent disagrees
    buf2 = bytearray(open(gsb, "rb").read())
    # first subgrid GS_COUNT record = overview (11) + 10 records in
    pos = 11 * 16 + 10 * 16
    assert buf2[pos:pos + 8].decode().strip() == "GS_COUNT"
    struct.pack_into("<i", buf2, pos + 8, 7)
    with pytest.raises(ValueError, match="GS_COUNT"):
        read_gsb(bytes(buf2))
    with pytest.raises(ValueError, match="truncated"):
        read_gsb(open(gsb, "rb").read()[:-32])


def test_nadgrids_dynamic_key(gsb):
    """+proj=tmerc ... +nadgrids=<gsb> registers a dynamic SRS whose
    datum stage applies the grid: roundtrip through from_wgs84 /
    points_to_wgs84 matches composing the grid shift with the same
    projection on the shifted datum."""
    from gdalcubes_cpp_spark import srs as _srs

    proj = (f"+proj=tmerc +lat_0=0 +lon_0=-75 +k=0.9996 +x_0=500000 "
            f"+y_0=0 +ellps=clrk66 +nadgrids={gsb} +units=m")
    key = _srs.normalize(proj)
    assert key.startswith("ETM:") and "ntv2" in key
    lon = np.array([-75.3, -74.6])
    lat = np.array([45.4, 46.2])
    x, y = _srs.from_wgs84(lon, lat, key)
    # reference composition: WGS84/target -> source datum via grid
    # inverse, then plain clrk66 TM (no datum)
    g = grid_shift(gsb)
    slon, slat = g.inverse(lon, lat)
    key_plain = _srs.normalize(
        "+proj=tmerc +lat_0=0 +lon_0=-75 +k=0.9996 +x_0=500000 +y_0=0 "
        "+ellps=clrk66 +units=m")
    xp, yp = _srs.from_wgs84(slon, slat, key_plain)
    assert np.allclose(x, xp, atol=1e-6) and np.allclose(y, yp, atol=1e-6)
    # and back
    lon2, lat2 = _srs.points_to_wgs84(x, y, key)
    assert np.allclose(lon2, lon, atol=1e-9)
    assert np.allclose(lat2, lat, atol=1e-9)


def test_nadgrids_key_resolves_in_fresh_process(gsb):
    """Spark executors re-resolve SRS KEY STRINGS in fresh Python workers
    (operators/build.py warps call grid_to_wgs84(view.srs)); the ntv2
    dynamic-key suffix must round-trip through a process that never saw
    the original proj4 string (round-5 review finding #1)."""
    import subprocess
    import sys

    from gdalcubes_cpp_spark import srs as _srs

    proj = (f"+proj=tmerc +lat_0=0 +lon_0=-75 +k=0.9996 +x_0=500000 "
            f"+y_0=0 +ellps=clrk66 +nadgrids={gsb} +units=m")
    key = _srs.normalize(proj)
    lon = np.array([-75.3])
    lat = np.array([45.4])
    x, y = _srs.from_wgs84(lon, lat, key)
    code = (
        "import sys, numpy as np\n"
        "from gdalcubes_cpp_spark import srs\n"
        "key = sys.argv[1]\n"
        "lon, lat = srs.points_to_wgs84(np.array([float(sys.argv[2])]),"
        " np.array([float(sys.argv[3])]), key)\n"
        "print(repr(float(lon[0])), repr(float(lat[0])))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, key, repr(float(x[0])), repr(float(y[0]))],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert out.returncode == 0, out.stderr[-800:]
    flon, flat = (float(v) for v in out.stdout.split())
    assert abs(flon - lon[0]) < 5e-9 and abs(flat - lat[0]) < 5e-9
