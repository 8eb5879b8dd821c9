"""HDF5 subset + netCDF-4 layer: spec conformance of the writer, reader
interop (both superblock generations), chunk/filter handling, netCDF-4
dimension-scale conventions, cube roundtrip, and the untrusted-bytes
refuse-don't-hang guards."""

import struct

import numpy as np
import pytest

from gdalcubes_cpp_spark.sources.hdf5 import (
    MAGIC,
    RefList,
    jenkins_lookup3,
    read_hdf5,
    read_netcdf4,
    write_hdf5,
    write_netcdf4,
)

LIBVERS = ["v0", "latest"]


def test_lookup3_vectors():
    """Jenkins' published hashlittle() self-test values (lookup3.c)."""
    assert jenkins_lookup3(b"") == 0xDEADBEEF
    assert jenkins_lookup3(b"Four score and seven years ago") == 0x17770551
    assert jenkins_lookup3(b"Four score and seven years ago", 1) == 0xCD628161


@pytest.mark.parametrize("libver", LIBVERS)
@pytest.mark.parametrize("dt", ["<f8", "<f4", "<i4", "<i2", "<u1", ">f4", ">i2"])
def test_contiguous_dtypes(libver, dt):
    rng = np.random.RandomState(3)
    a = (rng.rand(4, 7) * 100).astype(dt)
    h = read_hdf5(write_hdf5({"d": {"data": a}}, libver=libver))
    got = h["datasets"]["d"]["data"]
    assert got.shape == a.shape
    assert np.array_equal(got.astype("<f8"), a.astype("<f8"))


@pytest.mark.parametrize("libver", LIBVERS)
@pytest.mark.parametrize("deflate,shuffle", [(None, False), (1, False),
                                             (6, True), (None, True)])
def test_chunked_filters(libver, deflate, shuffle):
    rng = np.random.RandomState(5)
    a = (rng.rand(6, 10, 14) * 50).astype("<f8")
    a[0, 0, :3] = np.nan
    h = read_hdf5(write_hdf5({"b": {
        "data": a, "chunks": (2, 4, 5), "deflate": deflate,
        "shuffle": shuffle, "fillvalue": np.nan}}, libver=libver))
    assert np.allclose(h["datasets"]["b"]["data"], a, equal_nan=True)


def test_edge_chunks_trimmed():
    """Chunks are always full-size on disk; the reader must trim the
    edge-chunk padding back to the dataspace extent."""
    a = np.arange(5 * 7, dtype="<i4").reshape(5, 7)
    h = read_hdf5(write_hdf5({"d": {"data": a, "chunks": (4, 4),
                                    "deflate": 2}}))
    assert np.array_equal(h["datasets"]["d"]["data"], a)


def test_many_chunks_multi_leaf_btree():
    """> 64 chunks forces a two-level chunk B-tree (leaf capacity 2K with
    the libhdf5 default K=32); the walker must traverse internal nodes."""
    a = np.arange(40 * 36, dtype="<f4").reshape(40, 36)
    h = read_hdf5(write_hdf5({"d": {"data": a, "chunks": (4, 4),
                                    "deflate": 1}}))  # 90 chunks
    assert np.array_equal(h["datasets"]["d"]["data"], a)


@pytest.mark.parametrize("libver", LIBVERS)
def test_attributes_and_strings(libver):
    h = read_hdf5(write_hdf5(
        {"s": {"data": "EPSG:32632", "attrs": {"role": "crs", "n": 7,
                                               "f": 2.5}}},
        {"title": "global", "vec": np.array([1.0, 2.0, 3.0])},
        libver=libver))
    assert h["attrs"]["title"] == "global"
    assert np.allclose(h["attrs"]["vec"], [1.0, 2.0, 3.0])
    d = h["datasets"]["s"]
    assert d["data"] == b"EPSG:32632"
    assert d["attrs"]["role"] == "crs"
    assert int(np.asarray(d["attrs"]["n"]).ravel()[0]) == 7
    assert float(np.asarray(d["attrs"]["f"]).ravel()[0]) == 2.5


@pytest.mark.parametrize("libver", LIBVERS)
def test_dimension_list_references(libver):
    """DIMENSION_LIST is a vlen sequence of object references resolved
    through a global heap collection — addresses must map back to the
    dimension-scale datasets."""
    blob = write_hdf5({
        "time": {"data": np.arange(3, dtype="<i4"),
                 "attrs": {"CLASS": "DIMENSION_SCALE", "NAME": "time"}},
        "x": {"data": np.arange(4, dtype="<f8"),
              "attrs": {"CLASS": "DIMENSION_SCALE", "NAME": "x"}},
        "v": {"data": np.zeros((3, 4), dtype="<f8"),
              "attrs": {"DIMENSION_LIST": RefList(["time", "x"])}},
    }, libver=libver)
    h = read_hdf5(blob)
    addr2name = {d["addr"]: n for n, d in h["datasets"].items()}
    dl = h["datasets"]["v"]["attrs"]["DIMENSION_LIST"]
    assert [addr2name[refs[0]] for refs in dl] == ["time", "x"]


def test_superblock_v0_golden_structure():
    """On-disk conformance (HDF5 spec II.A.1): signature, version block,
    8-byte offsets/lengths, EOF address, root symbol-table entry wiring,
    local heap + SNOD layout."""
    blob = write_hdf5({"a": {"data": np.arange(4, dtype="<i4")}},
                      {"g": "x"}, libver="v0")
    assert blob[:8] == MAGIC
    assert blob[8] == 0                       # superblock version 0
    assert blob[13] == 8 and blob[14] == 8    # offset/length sizes
    leaf_k, int_k = struct.unpack_from("<HH", blob, 16)
    assert (leaf_k, int_k) == (32, 16)
    eof = struct.unpack_from("<Q", blob, 40)[0]
    assert eof == len(blob)
    root_oh = struct.unpack_from("<Q", blob, 64)[0]
    assert blob[root_oh] == 1                 # v1 object header
    btree, heap = struct.unpack_from("<QQ", blob, 80)
    assert blob[btree:btree + 4] == b"TREE" and blob[btree + 4] == 0
    assert blob[heap:heap + 4] == b"HEAP"
    # the SNOD the btree points at holds the sorted link
    snod = struct.unpack_from("<Q", blob, btree + 32)[0]  # key0 then child0
    assert blob[snod:snod + 4] == b"SNOD"
    assert struct.unpack_from("<H", blob, snod + 6)[0] == 1


def test_superblock_v2_checksummed():
    """v2 superblock and OHDR headers carry Jenkins lookup3 checksums the
    writer must compute correctly (spec II.A.2 / IV.A.1.b)."""
    blob = write_hdf5({"a": {"data": np.arange(4, dtype="<i4")}},
                      libver="latest")
    assert blob[8] == 2
    got = struct.unpack_from("<I", blob, 44)[0]
    assert got == jenkins_lookup3(blob[:44])
    root = struct.unpack_from("<Q", blob, 36)[0]
    assert blob[root:root + 4] == b"OHDR"
    csize = struct.unpack_from("<I", blob, root + 6)[0]
    hdr_end = root + 10 + csize
    got = struct.unpack_from("<I", blob, hdr_end)[0]
    assert got == jenkins_lookup3(blob[root:hdr_end])


def test_corrupt_files_refused():
    """Untrusted-bytes policy: crafted pointer cycles raise ValueError
    (never hang); dense link storage raises NotImplementedError."""
    blob = bytearray(write_hdf5(
        {"d": {"data": np.arange(64, dtype="<f8").reshape(8, 8),
               "chunks": (4, 4)}}, libver="v0"))
    # group B-tree cycle: point the btree's child at the btree itself
    btree, _heap = struct.unpack_from("<QQ", blob, 80)
    bad = bytearray(blob)
    struct.pack_into("<Q", bad, btree + 32, btree)
    with pytest.raises(ValueError, match="cycle|bad group"):
        read_hdf5(bytes(bad))
    # chunk B-tree cycle: make the chunk node claim to be an internal
    # node whose child is itself
    pos = bytes(blob).find(b"TREE", btree + 4)
    while pos != -1 and blob[pos + 4] != 1:
        pos = bytes(blob).find(b"TREE", pos + 4)
    assert pos != -1
    bad = bytearray(blob)
    bad[pos + 5] = 1                              # level 1 => children are nodes
    struct.pack_into("<Q", bad, pos + 24 + 8 + 8 * 3, pos)  # child 0 -> itself
    with pytest.raises(ValueError, match="cycle|B-tree"):
        read_hdf5(bytes(bad))
    # a link-info message pointing at garbage instead of a real fractal
    # heap refuses cleanly (bad signature), never mis-parses
    blob2 = bytearray(write_hdf5({"d": {"data": np.arange(3, dtype="<i4")}},
                                 libver="latest"))
    root = struct.unpack_from("<Q", blob2, 36)[0]
    # link info message body starts after OHDR prefix (sig+ver+flags+4) +
    # first message header (4): ver, flags, then fractal heap address
    li = root + 10 + 4
    struct.pack_into("<Q", blob2, li + 2, 4096)   # fheap -> garbage bytes
    with pytest.raises(ValueError, match="fractal heap"):
        read_hdf5(bytes(blob2))
    with pytest.raises(ValueError, match="not an HDF5 file"):
        read_hdf5(b"CDF\x01" + b"\x00" * 64)


def _mkcube(spark, chunk=(2, 3, 4)):
    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=8.0, bottom=0.0, top=6.0, nx=8, ny=6,
                        t0="2020-01-01", nt=4, dt="P1D", chunk_size=chunk)
    return formula_cube(spark, v, {
        "B1": "CASE WHEN (it + iy + ix) % 5 = 0 THEN NULL ELSE "
              "CAST(it*3 + iy + ix AS DOUBLE) END",
        "B2": "CAST(it + iy*2 + ix AS DOUBLE)",
    })


@pytest.mark.parametrize("libver", LIBVERS + ["dense"])
def test_netcdf4_cube_roundtrip(spark, tmp_path, libver):
    """write_netcdf4 -> read_netcdf (magic dispatch) -> read_netcdf_cube:
    the reference's NC4 export layout (chunked + shuffle + deflate,
    src/cube.cpp:871,1004,1011) comes back cell-exact — including the
    DENSE link/attribute storage variant (fractal heap + v2 B-tree)."""
    from gdalcubes_cpp_spark.sources.netcdf3 import read_netcdf, read_netcdf_cube

    cube = _mkcube(spark)
    path = str(tmp_path / f"cube_{libver}.nc")
    if libver == "dense":
        write_netcdf4(cube, path, deflate=2, shuffle=True, dense=True)
    else:
        write_netcdf4(cube, path, deflate=2, shuffle=True, libver=libver)
    raw = open(path, "rb").read()
    assert raw[:8] == MAGIC

    nc = read_netcdf(path)                    # dispatches on the magic
    assert nc["dims"] == {"time": 4, "y": 6, "x": 8}
    assert nc["gatts"]["srs"] == "EPSG:4326"
    assert np.allclose(nc["vars"]["x"], np.arange(8) + 0.5)
    assert np.allclose(nc["vars"]["y"], 6.0 - (np.arange(6) + 0.5))
    assert np.array_equal(nc["vars"]["time"], np.arange(4) * 86400)
    want = cube.collect_dense()
    assert np.array_equal(np.isnan(nc["vars"]["B1"]), np.isnan(want[0]))
    m = np.isfinite(want[0])
    assert (nc["vars"]["B1"][m] == want[0][m]).all()

    back = read_netcdf_cube(spark, path)
    assert back.bands == ("B1", "B2")
    got = back.collect_dense()
    assert np.array_equal(np.isnan(got), np.isnan(want))
    mm = np.isfinite(want)
    assert (got[mm] == want[mm]).all()


def test_netcdf4_packed_roundtrip(spark, tmp_path):
    """CF packing (scale_factor/add_offset on NC_SHORT) auto-unpacks on
    read, matching the classic reader's behavior bit-for-bit."""
    from gdalcubes_cpp_spark.sources.netcdf3 import (read_netcdf,
                                                     write_netcdf)

    cube = _mkcube(spark)
    pk = {"scale": 0.5, "offset": -2.0, "nodata": -32768}
    p3 = str(tmp_path / "c3.nc")
    p4 = str(tmp_path / "c4.nc")
    write_netcdf(cube, p3, packing=pk)
    write_netcdf4(cube, p4, packing=pk, deflate=4)
    a, b = read_netcdf(p3), read_netcdf(p4)
    for band in ("B1", "B2"):
        assert np.array_equal(np.isnan(a["vars"][band]), np.isnan(b["vars"][band]))
        m = np.isfinite(a["vars"][band])
        assert (a["vars"][band][m] == b["vars"][band][m]).all()


def test_netcdf4_phantom_dimension():
    """A dimension-scale whose NAME carries the 'not a netCDF variable'
    sentinel is a dim without a variable — in dims, not in vars."""
    blob = write_hdf5({
        "d0": {"data": np.zeros(5, dtype="<f4"), "attrs": {
            "CLASS": "DIMENSION_SCALE",
            "NAME": "This is a netCDF dimension but not a netCDF "
                    "variable.         5"}},
        "v": {"data": np.arange(5, dtype="<f8"),
              "attrs": {"DIMENSION_LIST": RefList(["d0"])}},
    })
    nc = read_netcdf4(blob)
    assert nc["dims"] == {"d0": 5}
    assert set(nc["vars"]) == {"v"}


def test_netcdf4_deflate_actually_compresses(tmp_path, spark):
    cube = _mkcube(spark, chunk=(4, 6, 8))
    p_raw = str(tmp_path / "raw.nc")
    p_z = str(tmp_path / "z.nc")
    write_netcdf4(cube, p_raw, deflate=0, shuffle=False)
    write_netcdf4(cube, p_z, deflate=6, shuffle=True)
    import os
    assert os.path.getsize(p_z) < os.path.getsize(p_raw)


def test_fletcher32_filter():
    """nc_def_var_fletcher32's checksum filter: verified + stripped on
    read, composing with shuffle (trailer passes through unshuffled) and
    deflate; a flipped payload byte is refused."""
    from gdalcubes_cpp_spark.sources.hdf5 import _fletcher32

    a = np.arange(9 * 13, dtype="<f8").reshape(9, 13)
    for shuffle, deflate in ((False, None), (True, 4), (False, 2),
                             (True, None)):
        blob = write_hdf5({"d": {"data": a, "chunks": (4, 5),
                                 "fletcher32": True, "shuffle": shuffle,
                                 "deflate": deflate}})
        h = read_hdf5(blob)
        assert np.array_equal(h["datasets"]["d"]["data"], a), (shuffle, deflate)
    # corrupt one raw chunk byte of the uncompressed flavor
    blob = bytearray(write_hdf5({"d": {"data": a, "chunks": (4, 5),
                                       "fletcher32": True}}))
    # chunks live at the end... flip a byte inside the first chunk by
    # scanning for a known float pattern
    pat = np.array([0.0], "<f8").tobytes()
    pos = bytes(blob).find(np.array([14.0], "<f8").tobytes())
    assert pos != -1
    blob[pos] ^= 0xFF
    with pytest.raises(ValueError, match="fletcher32"):
        read_hdf5(bytes(blob))
    _ = pat
    # known-structure sanity: checksum of empty payload is 0
    assert _fletcher32(b"") == 0


def test_attr_info_undef_heap_is_compact():
    """An attribute-info message whose heap address is UNDEF means attrs
    stayed compact — reads as zero dense attributes, no error."""
    from gdalcubes_cpp_spark.sources.hdf5 import _R, _dense_attrs

    r = _R(b"\x00" * 64)
    ok = bytes([0, 0]) + struct.pack("<QQ", 0xFFFFFFFFFFFFFFFF,
                                     0xFFFFFFFFFFFFFFFF)
    assert _dense_attrs(r, ok) == []
    with_corder = bytes([0, 1]) + struct.pack("<HQQ", 5,
                                              0xFFFFFFFFFFFFFFFF,
                                              0xFFFFFFFFFFFFFFFF)
    assert _dense_attrs(r, with_corder) == []


def test_foreign_export_cf_reconstruction(spark, tmp_path):
    """A FOREIGN gdalcubes export — the reference's real attribute layout
    (Conventions/source/srs gatts, CF time units, crs variable, NO
    engine-private view JSON, src/cube.cpp:903-1001) — opens through
    read_netcdf_cube by reconstructing the view from CF metadata."""
    from gdalcubes_cpp_spark.sources.netcdf3 import (read_netcdf,
                                                     read_netcdf_cube,
                                                     view_from_cf)

    nt, ny, nx = 3, 6, 8
    band = np.arange(nt * ny * nx, dtype="<f8").reshape(nt, ny, nx)
    band[0, 0, 0] = np.nan
    xs = (0.0 + (np.arange(nx) + 0.5) * 0.5).astype("<f8")      # left=0, dx=.5
    ys = (6.0 - (np.arange(ny) + 0.5) * 1.0).astype("<f8")      # top=6, dy=1
    tvals = np.array([0, 16, 32], dtype="<i4")                  # P16D steps

    def dimscale(name, data, extra):
        at = {"CLASS": "DIMENSION_SCALE", "NAME": name}
        at.update(extra)
        return {"data": data, "attrs": at}

    blob = write_hdf5({
        "time": dimscale("time", tvals, {
            "units": "days since 2020-03-01T00:00:00",
            "standard_name": "time", "calendar": "gregorian", "axis": "T"}),
        "y": dimscale("y", ys, {"axis": "Y"}),
        "x": dimscale("x", xs, {"axis": "X"}),
        "crs": {"data": "", "attrs": {"spatial_ref": "EPSG:4326"}},
        "NDVI": {"data": band, "chunks": (2, 3, 4), "deflate": 2,
                 "shuffle": True, "fillvalue": np.nan,
                 "attrs": {"_FillValue": np.array([np.nan]),
                           "DIMENSION_LIST": RefList(["time", "y", "x"])}},
    }, {"Conventions": "CF-1.6", "source": "gdalcubes 0.6.4",
        "srs": "EPSG:4326"})
    p = str(tmp_path / "foreign.nc")
    open(p, "wb").write(blob)

    nc = read_netcdf(p)
    assert "view" not in nc["gatts"]
    assert nc["var_atts"]["time"]["units"].startswith("days since")
    v = view_from_cf(nc)
    assert (v.nx, v.ny, v.nt) == (nx, ny, nt)
    assert (v.left, v.right, v.bottom, v.top) == (0.0, 4.0, 0.0, 6.0)
    assert str(v.dt.n) + v.dt.unit == "16D" and v.t0.isoformat().startswith("2020-03-01")

    cube = read_netcdf_cube(spark, p)
    assert cube.bands == ("NDVI",)
    got = cube.collect_dense()[0]
    assert got.shape == (nt, ny, nx)
    m = np.isfinite(band)
    assert np.array_equal(np.isnan(got), np.isnan(band))
    assert (got[m] == band[m]).all()


def test_fletcher32_matches_libhdf5_reference():
    """_fletcher32 against a direct word-at-a-time transliteration of
    libhdf5's H5_checksum_fletcher32 (big-endian word assembly, fold
    (x & 0xffff) + (x >> 16) per 360-word block + once at the end, odd
    trailing byte as the HIGH byte) — the vectorized block math must be
    bit-exact, including at sums that are multiples of 65535 where a
    mod-65535 Fletcher variant diverges."""
    from gdalcubes_cpp_spark.sources.hdf5 import _fletcher32

    def ref(data: bytes) -> int:
        ln = len(data)
        s1 = s2 = 0
        i = 0
        while ln > 1:
            tlen = min(ln // 2, 360)
            ln -= tlen * 2
            for _ in range(tlen):
                s1 += (data[i] << 8) | data[i + 1]
                s2 += s1
                i += 2
            s1 = (s1 & 0xFFFF) + (s1 >> 16)
            s2 = (s2 & 0xFFFF) + (s2 >> 16)
        if ln:
            s1 += data[i] << 8
            s2 += s1
            s1 = (s1 & 0xFFFF) + (s1 >> 16)
            s2 = (s2 & 0xFFFF) + (s2 >> 16)
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
        return (s2 << 16) | s1

    rng = np.random.RandomState(5)
    cases = [b"", b"\x00", b"ab", b"abc", b"\xff\xff" * 400,
             bytes([0xFF] * 3), b"\x00" * 1441]
    for n in (1, 2, 7, 359 * 2, 360 * 2, 361 * 2, 5000):
        cases.append(bytes(rng.randint(0, 256, n, dtype=np.uint8)))
    for c in cases:
        assert _fletcher32(c) == ref(c), (len(c), c[:8])


def test_foreign_ascending_y_axis(spark, tmp_path):
    """A foreign CF file with an ASCENDING y coordinate (xarray/CDO
    default) must come back correctly georeferenced: rows flip so iy=0 is
    the top row (round-5 review finding #5)."""
    from gdalcubes_cpp_spark.sources.netcdf3 import read_netcdf_cube

    ny, nx = 4, 5
    band = np.arange(1 * ny * nx, dtype="<f8").reshape(1, ny, nx)
    ys_asc = (0.0 + (np.arange(ny) + 0.5) * 1.0).astype("<f8")  # bottom-up
    xs = (0.0 + (np.arange(nx) + 0.5) * 1.0).astype("<f8")

    def dimscale(name, data, extra=None):
        at = {"CLASS": "DIMENSION_SCALE", "NAME": name}
        at.update(extra or {})
        return {"data": data, "attrs": at}

    blob = write_hdf5({
        "time": dimscale("time", np.array([0], "<i4"),
                         {"units": "days since 2020-01-01T00:00:00"}),
        "y": dimscale("y", ys_asc),
        "x": dimscale("x", xs),
        "B1": {"data": band, "attrs": {
            "_FillValue": np.array([np.nan]),
            "DIMENSION_LIST": RefList(["time", "y", "x"])}},
    }, {"Conventions": "CF-1.6", "srs": "EPSG:4326"})
    p = str(tmp_path / "asc.nc")
    open(p, "wb").write(blob)
    cube = read_netcdf_cube(spark, p)
    v = cube.view
    assert (v.top, v.bottom) == (4.0, 0.0) and v.top > v.bottom
    got = cube.collect_dense()[0][0]            # (ny, nx), iy=0 = TOP row
    # source row 0 is the BOTTOM (y=0.5): it must land at iy = ny-1
    assert np.array_equal(got[ny - 1], band[0, 0])
    assert np.array_equal(got[0], band[0, ny - 1])


def test_many_root_links_multi_snod(spark, tmp_path):
    """> 64 root links split across multiple SNODs under one group
    B-tree node — a 100-band cube must export and re-read (the single-
    SNOD writer refused beyond 64 links)."""
    rng = np.random.RandomState(2)
    ds = {f"v{i:03d}": {"data": (rng.rand(3, 4) * 10).astype("<f8")}
          for i in range(100)}
    h = read_hdf5(write_hdf5(ds, {"n": 100}))
    assert len(h["datasets"]) == 100
    for k, spec in ds.items():
        assert np.allclose(h["datasets"][k]["data"], spec["data"])
    # end-to-end: a wide cube through the NC4 container
    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.sources.hdf5 import write_netcdf4
    from gdalcubes_cpp_spark.sources.netcdf3 import read_netcdf_cube
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=4.0, bottom=0.0, top=3.0, nx=4,
                        ny=3, t0="2020-01-01", nt=2, dt="P1D",
                        chunk_size=(2, 3, 4))
    cube = formula_cube(spark, v, {
        f"B{i:02d}": f"CAST(it + iy*2 + ix + {i} AS DOUBLE)"
        for i in range(70)})
    p = str(tmp_path / "wide.nc")
    write_netcdf4(cube, p, deflate=1)
    back = read_netcdf_cube(spark, p)
    assert len(back.bands) == 70
    a, b = back.collect_dense(), cube.collect_dense()
    assert np.array_equal(np.isnan(a), np.isnan(b))
    m = np.isfinite(b)
    assert (a[m] == b[m]).all()


def test_hard_linked_dataset_two_names():
    """One object linked under two names is legal per the HDF5 spec (e.g. a
    shared dimension scale linked from two groups) and must NOT raise the
    group-cycle guard; the dataset is emitted under each link path."""
    blob = bytearray(write_hdf5(
        {"a": {"data": np.arange(6, dtype="<f8")},
         "b": {"data": np.arange(6, dtype="<f8") * 2}}, libver="v0"))
    pos = bytes(blob).find(b"SNOD")
    assert pos != -1
    nsym = struct.unpack_from("<H", blob, pos + 6)[0]
    assert nsym == 2
    # entry layout: 8B name-offset + 8B OH address + 24B cache scratch
    a_addr = struct.unpack_from("<Q", blob, pos + 8 + 8)[0]
    struct.pack_into("<Q", blob, pos + 8 + 40 + 8, a_addr)  # link b -> a's OH
    h = read_hdf5(bytes(blob))
    assert set(h["datasets"]) == {"a", "b"}
    assert np.array_equal(h["datasets"]["a"]["data"],
                          h["datasets"]["b"]["data"])


def test_missing_fill_value_defaults_to_zero():
    """libhdf5's default fill value is 0 for every dtype; a float chunked
    dataset with unallocated chunks and no fill-value message reads 0.0
    (h5py parity), never NaN."""
    data = np.arange(16, dtype="<f8").reshape(4, 4)
    blob = bytearray(write_hdf5(
        {"d": {"data": data, "chunks": (2, 2)}}, libver="v0"))
    # strip every fill-value message (type 0x0005) from d's object header by
    # retyping it NIL (0x0000) so the reader sees "no fill value defined";
    # find d's header via the SNOD
    pos = bytes(blob).find(b"SNOD")
    d_addr = struct.unpack_from("<Q", blob, pos + 8 + 8)[0]
    # OH v1: ver(1) res(1) nmsg(2) refcnt(4) size(4) pad(4) then messages
    mp = d_addr + 16
    nmsg = struct.unpack_from("<H", blob, d_addr + 2)[0]
    killed = 0
    for _ in range(nmsg):
        mtype, msize = struct.unpack_from("<HH", blob, mp)
        if mtype == 0x0005:
            struct.pack_into("<H", blob, mp, 0x0000)  # NIL
            killed += 1
        mp += 8 + msize
    assert killed >= 1
    # drop the allocated chunks: point the chunk B-tree root at UNDEF
    from gdalcubes_cpp_spark.sources.hdf5 import UNDEF
    layout_found = False
    mp = d_addr + 16
    for _ in range(nmsg):
        mtype, msize = struct.unpack_from("<HH", blob, mp)
        if mtype == 0x0008:  # layout v3 chunked: ver(1) cls(1) addr(8)
            assert blob[mp + 8] == 3 and blob[mp + 9] == 2
            struct.pack_into("<Q", blob, mp + 8 + 3, UNDEF)
            layout_found = True
        mp += 8 + msize
    assert layout_found
    h = read_hdf5(bytes(blob))
    out = h["datasets"]["d"]["data"]
    assert out.shape == (4, 4)
    assert (out == 0.0).all() and not np.isnan(out).any()


def test_dense_storage_roundtrip():
    """write_hdf5(dense=True): root links in a fractal heap + type-5 v2
    B-tree, per-dataset attributes in type-8 indexes — read back whole."""
    ds = {}
    for i in range(12):
        ds[f"v{i:02d}"] = {
            "data": np.arange(6, dtype="<f8") * i,
            "attrs": {f"a{j}": np.int32(j * 100 + i) for j in range(15)}}
    ds["zc"] = {"data": np.arange(64, dtype="<f4").reshape(8, 8),
                "chunks": (4, 4), "deflate": 2, "shuffle": True,
                "attrs": {"units": "m"}}
    blob = write_hdf5(ds, {"title": "dense"}, libver="latest", dense=True)
    h = read_hdf5(blob)
    assert set(h["datasets"]) == set(ds)
    assert h["attrs"]["title"] == "dense"
    for i in range(12):
        d = h["datasets"][f"v{i:02d}"]
        assert np.array_equal(d["data"], np.arange(6) * float(i))
        assert d["attrs"]["a7"] == 700 + i and len(d["attrs"]) == 15
    zc = h["datasets"]["zc"]
    assert zc["attrs"]["units"] == "m"
    assert np.array_equal(zc["data"],
                          np.arange(64, dtype="<f4").reshape(8, 8))
    with pytest.raises(ValueError, match="dense storage requires"):
        write_hdf5(ds, libver="v0", dense=True)


def _mk_btree2(buf, addr, node_size, rec_size, depth, root, root_nrec,
               total, btype=5):
    buf[addr:addr + 4] = b"BTHD"
    buf[addr + 4] = 0
    buf[addr + 5] = btype
    struct.pack_into("<IHH", buf, addr + 6, node_size, rec_size, depth)
    buf[addr + 14:addr + 16] = bytes([100, 40])
    struct.pack_into("<QH", buf, addr + 16, root, root_nrec)
    struct.pack_into("<Q", buf, addr + 26, total)


def test_btree2_depth1_reader():
    """A depth-1 v2 B-tree (BTIN over two BTLF leaves) — the shape OUR
    writer never emits but libhdf5 does past one leaf's capacity; pointer
    field widths follow the spec's bottom-up capacity derivation."""
    from gdalcubes_cpp_spark.sources.hdf5 import _R, _btree2_records

    buf = bytearray(1024)
    recs = [bytes([10 + i]) * 11 for i in range(5)]
    A, B, C, D = 0, 64, 192, 320
    _mk_btree2(buf, A, 64, 11, 1, B, 1, 5)
    # internal: leaf cap = (64-10)//11 = 4 -> nrec size 1 byte, no totals
    buf[B:B + 6] = b"BTIN" + bytes([0, 5])
    buf[B + 6:B + 17] = recs[2]
    struct.pack_into("<QB", buf, B + 17, C, 2)
    struct.pack_into("<QB", buf, B + 26, D, 2)
    buf[C:C + 6] = b"BTLF" + bytes([0, 5])
    buf[C + 6:C + 17] = recs[0]
    buf[C + 17:C + 28] = recs[1]
    buf[D:D + 6] = b"BTLF" + bytes([0, 5])
    buf[D + 6:D + 17] = recs[3]
    buf[D + 17:D + 28] = recs[4]
    out = _btree2_records(_R(bytes(buf)), A)
    assert out == recs                      # in-order traversal
    # cycle: internal child pointing back at the internal node
    bad = bytearray(buf)
    struct.pack_into("<QB", bad, B + 17, B, 1)
    with pytest.raises(ValueError, match="cycle|bad v2"):
        _btree2_records(_R(bytes(bad)), A)


def test_fractal_heap_root_indirect_reader():
    """A root INDIRECT block with two direct children — again the shape
    libhdf5 grows into; heap ids resolve across blocks, ids outside the
    managed space refuse."""
    from gdalcubes_cpp_spark.sources.hdf5 import _FHeap, _R

    buf = bytearray(1024)
    H, I, D0, D1 = 0, 160, 256, 384
    buf[H:H + 4] = b"FRHP"
    buf[H + 4] = 0
    struct.pack_into("<HHB", buf, H + 5, 7, 0, 0)       # id len 7, no filt
    struct.pack_into("<I", buf, H + 10, 4096)
    struct.pack_into("<H", buf, H + 110, 2)              # width
    struct.pack_into("<QQ", buf, H + 112, 64, 1 << 16)   # start, max direct
    struct.pack_into("<HH", buf, H + 128, 32, 1)         # heap bits, rows
    struct.pack_into("<QH", buf, H + 132, I, 1)          # root FHIB, 1 row
    buf[I:I + 4] = b"FHIB"
    buf[I + 4] = 0
    struct.pack_into("<Q", buf, I + 5, H)
    struct.pack_into("<I", buf, I + 13, 0)
    struct.pack_into("<QQ", buf, I + 17, D0, D1)
    for addr, boff, payload in ((D0, 0, b"alpha"), (D1, 64, b"bravo")):
        buf[addr:addr + 4] = b"FHDB"
        buf[addr + 4] = 0
        struct.pack_into("<Q", buf, addr + 5, H)
        struct.pack_into("<I", buf, addr + 13, boff)
        buf[addr + 17:addr + 17 + len(payload)] = payload
    fh = _FHeap(_R(bytes(buf)), H)
    mkid = lambda off, ln: bytes([0]) + off.to_bytes(4, "little") + \
        ln.to_bytes(2, "little")
    assert fh.obj(mkid(17, 5)) == b"alpha"
    assert fh.obj(mkid(64 + 17, 5)) == b"bravo"
    with pytest.raises(ValueError, match="outside managed blocks"):
        fh.obj(mkid(500, 5))
    # tiny id: payload inline in the id itself
    assert fh.obj(bytes([0x20 | 4]) + b"tiny!x") == b"tiny!"
    with pytest.raises(NotImplementedError, match="huge"):
        fh.obj(bytes([0x10]) + b"\x00" * 6)
    # truncated/garbled child refuses
    bad = bytearray(buf)
    bad[D1:D1 + 4] = b"JUNK"
    with pytest.raises(ValueError, match="direct block"):
        _FHeap(_R(bytes(bad)), H)
