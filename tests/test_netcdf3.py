"""netCDF-3 classic (CDF-1) container export — spec-conformance primitives
vs hand-computed bytes, byte-structure invariants, and a full cube
roundtrip (the reference's write_netcdf_file / ncdf_cube pair,
src/cube.cpp:736, src/ncdf_cube.h:48-50)."""

import struct

import numpy as np

from gdalcubes_cpp_spark.sources import netcdf3 as nc3


def test_primitives_hand_bytes():
    # name encoding: int32 length + bytes + zero pad to 4
    assert nc3._name("x") == b"\x00\x00\x00\x01x\x00\x00\x00"
    assert nc3._name("time") == b"\x00\x00\x00\x04time"
    # char attribute: nelems + chars + pad
    assert nc3._att_values(nc3.NC_CHAR, "abc") == b"\x00\x00\x00\x03abc\x00"
    # double attribute: big-endian IEEE754
    got = nc3._att_values(nc3.NC_DOUBLE, [1.5])
    assert got == b"\x00\x00\x00\x01" + struct.pack(">d", 1.5)
    # absent attribute list = two zero words
    assert nc3._att_list([]) == b"\x00" * 8
    # tagged attribute list
    al = nc3._att_list([("u", nc3.NC_CHAR, "m")])
    assert al.startswith(struct.pack(">ii", nc3.NC_ATTRIBUTE, 1))


def test_write_read_roundtrip(spark, tmp_path):
    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.sources.netcdf3 import read_netcdf, read_netcdf_cube, write_netcdf
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=8.0, bottom=0.0, top=6.0, nx=8, ny=6,
                        t0="2020-01-01", nt=4, dt="P1D", chunk_size=(2, 3, 4))
    cube = formula_cube(spark, v, {
        "B1": "CASE WHEN (it + iy + ix) % 5 = 0 THEN NULL ELSE CAST(it*3 + iy + ix AS DOUBLE) END",
        "B2": "CAST(it + iy*2 + ix AS DOUBLE)",
    })
    path = str(tmp_path / "cube.nc")
    write_netcdf(cube, path)

    # byte-structure invariants
    raw = open(path, "rb").read()
    assert raw[:4] == b"CDF\x01"
    nc = read_netcdf(path)
    assert nc["dims"] == {"time": 4, "y": 6, "x": 8}
    assert nc["gatts"]["srs"] == "EPSG:4326"
    assert nc["vars"]["B1"].shape == (4, 6, 8)
    # coordinate vars: cell centers / offset seconds
    assert np.allclose(nc["vars"]["x"], np.arange(8) + 0.5)
    assert np.allclose(nc["vars"]["y"], 6.0 - (np.arange(6) + 0.5))
    assert np.allclose(nc["vars"]["time"], np.arange(4) * 86400.0)
    # values == the cube, NaN for nodata
    want = cube.collect_dense()
    assert np.array_equal(np.isnan(nc["vars"]["B1"]), np.isnan(want[0]))
    m = np.isfinite(want[0])
    assert (nc["vars"]["B1"][m] == want[0][m]).all()

    # full Cube roundtrip through the container
    back = read_netcdf_cube(spark, path)
    assert back.view.shape == v.shape and back.bands == ("B1", "B2")
    got = back.collect_dense()
    assert np.array_equal(np.isnan(got), np.isnan(want))
    mm = np.isfinite(want)
    assert (got[mm] == want[mm]).all()



def test_packed_netcdf_roundtrip(spark, tmp_path):
    """Packed NC_SHORT export with CF scale_factor/add_offset: reader
    auto-unpacks (fill -> NaN BEFORE unpacking); values within scale/2;
    the variable's on-disk type word really is NC_SHORT."""
    import struct as st

    import numpy as np

    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.sources.netcdf3 import (
        NC_SHORT,
        read_netcdf,
        read_netcdf_cube,
        write_netcdf,
    )
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(
        left=0.0, right=4.0, bottom=0.0, top=3.0, nx=4, ny=3,
        t0="2020-01-01", t1="2020-02-28", dt="P1M",
        aggregation="mean", resampling="near", chunk_size=(1, 3, 4),
    )
    c = formula_cube(spark, v, {
        "B1": "CASE WHEN ix = 1 THEN NULL ELSE CAST(it*1.5 + iy*0.25 + ix*0.125 AS DOUBLE) END"
    })
    path = str(tmp_path / "packed.nc")
    write_netcdf(c, path, packing={"scale": 0.01, "offset": -2.0, "nodata": -32768})
    nc = read_netcdf(path)
    dense = c.collect_dense()[0]
    got = nc["vars"]["B1"]
    assert np.isnan(got[np.isnan(dense)]).all()  # fill -> NaN
    ok = ~np.isnan(dense)
    assert np.abs(got[ok] - dense[ok]).max() <= 0.005 + 1e-12  # scale/2
    # on-disk type word: find the B1 variable entry and check NC_SHORT
    buf = open(path, "rb").read()
    i = buf.index(b"scale_factor")
    # nc_type word follows the att list; just assert a big-endian NC_SHORT
    # appears in the variable section after the name "B1"
    j = buf.index(b"B1", i - 4096 if i > 4096 else 0)
    assert st.pack(">i", NC_SHORT) in buf[j:j + 200]
    # full cube roundtrip (values at quantization precision)
    c2 = read_netcdf_cube(spark, path)
    d2 = c2.collect_dense()[0]
    assert np.allclose(d2, dense, atol=0.005 + 1e-12, equal_nan=True)


def test_distributed_writer_byte_identical(spark, tmp_path):
    """write_netcdf_distributed (one exchange on the slice index,
    executor positioned-writes) produces the BYTE-IDENTICAL file to the
    driver-gather writer — plain and packed, including a slice with no
    data at all (seeded fill run)."""
    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.sources.netcdf3 import (
        write_netcdf,
        write_netcdf_distributed,
    )
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=8.0, bottom=0.0, top=6.0, nx=8, ny=6,
                        t0="2020-01-01", nt=5, dt="P1D", chunk_size=(2, 3, 4))
    cube = formula_cube(spark, v, {
        "B1": "CASE WHEN (it + iy + ix) % 5 = 0 THEN NULL ELSE CAST(it*3 + iy + ix AS DOUBLE) END",
        "B2": "CAST(it + iy*2 + ix AS DOUBLE)",
    })
    # drop EVERY cell of slice it=3: the distributed writer must still
    # write its fill run (seeded group)
    from pyspark.sql import functions as F

    from gdalcubes_cpp_spark.cube import Cube

    cube = Cube(cube.df.filter(F.col("it") != 3), v, cube.bands)

    for pk in (None, {"scale": 0.5, "offset": 1.0, "nodata": -9999}):
        a = str(tmp_path / f"gather_{pk is None}.nc")
        b = str(tmp_path / f"dist_{pk is None}.nc")
        write_netcdf(cube, a, packing=pk)
        write_netcdf_distributed(cube, b, packing=pk)
        ba, bb = open(a, "rb").read(), open(b, "rb").read()
        assert len(ba) == len(bb)
        assert ba == bb


def test_cdf2_64bit_offset_roundtrip(spark, tmp_path):
    """CDF-2 (64-bit offset, spec 'Large File Support'): magic CDF\\x02,
    8-byte variable begin words — values and layout otherwise identical
    to CDF-1; both writers agree byte-for-byte, the reader auto-detects,
    and the auto version picker stays at CDF-1 for small files."""
    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.sources.netcdf3 import (
        _nc_plan, read_netcdf, write_netcdf, write_netcdf_distributed,
    )
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=8.0, bottom=0.0, top=6.0, nx=8, ny=6,
                        t0="2020-01-01", nt=4, dt="P1D", chunk_size=(2, 3, 4))
    cube = formula_cube(spark, v, {
        "B1": "CAST(it*3 + iy + ix AS DOUBLE)",
    })
    p1 = str(tmp_path / "v1.nc")
    p2 = str(tmp_path / "v2.nc")
    p2d = str(tmp_path / "v2d.nc")
    write_netcdf(cube, p1)
    write_netcdf(cube, p2, version=2)
    write_netcdf_distributed(cube, p2d, version=2)
    b1, b2, b2d = (open(p, "rb").read() for p in (p1, p2, p2d))
    assert b1[:4] == b"CDF\x01" and b2[:4] == b"CDF\x02"
    assert b2 == b2d
    # CDF-2 header is exactly 4 extra bytes per variable (4 vars here)
    assert len(b2) == len(b1) + 4 * 4
    n1, n2 = read_netcdf(p1), read_netcdf(p2)
    for k in n1["vars"]:
        a, b = n1["vars"][k], n2["vars"][k]
        if isinstance(a, bytes):
            assert a == b
        else:
            assert np.array_equal(a, b, equal_nan=True)
    # auto picker: small file stays CDF-1
    assert _nc_plan(v, ("B1",), None)["version"] == 1
    # forcing CDF-1 on an over-2GiB layout raises; auto upgrades to 2
    import pytest as _pytest

    # per-band variable = 2*8192*8192*8 = 1 GiB (< the 2**31 size word),
    # two bands push the offsets past 2**31-1
    big = CubeView.create(left=0.0, right=1.0, bottom=0.0, top=1.0,
                          nx=8192, ny=8192, t0="2020-01-01", nt=2,
                          dt="P1D", chunk_size=(1, 256, 256))
    with _pytest.raises(ValueError, match="CDF-1"):
        _nc_plan(big, ("B1", "B2"), None, version=1)
    assert _nc_plan(big, ("B1", "B2"), None)["version"] == 2
    # a single over-2GiB variable overflows the classic size word:
    # forcing CDF-1/2 raises, auto upgrades to CDF-5
    huge = CubeView.create(left=0.0, right=1.0, bottom=0.0, top=1.0,
                           nx=16384, ny=16384, t0="2020-01-01", nt=2,
                           dt="P1D", chunk_size=(1, 256, 256))
    with _pytest.raises(ValueError, match="size word"):
        _nc_plan(huge, ("B1",), None, version=2)
    assert _nc_plan(huge, ("B1",), None)["version"] == 5


def _classic_with_records(single: bool):
    """Hand-assemble a classic CDF-1 file WITH a record dimension the
    way netcdf-c lays it out (spec 'The Format in Detail'): dim of size
    0, numrecs in the header word, record slabs interleaved with a
    4-padded stride — unpadded when there is exactly one record var."""
    import struct as st

    t_slab = [st.pack(">d", 10.0), st.pack(">d", 20.0)]
    a_slab = [np.array([1, 2, 3], ">i2").tobytes(),
              np.array([4, 5, 6], ">i2").tobytes()]
    y_data = np.array([7.0, 8.0, 9.0], ">f8").tobytes()

    def var(name, dimids, nc_type, vsize, begin):
        v = nc3._name(name) + st.pack(">i", len(dimids))
        for d in dimids:
            v += st.pack(">i", d)
        v += nc3._att_list([]) + st.pack(">iii", nc_type, vsize, begin)
        return v

    def build(hlen):
        h = b"CDF\x01" + st.pack(">i", 2)                # numrecs = 2
        h += st.pack(">ii", nc3.NC_DIMENSION, 2)
        h += nc3._name("rec") + st.pack(">i", 0)          # record dim
        h += nc3._name("y") + st.pack(">i", 3)
        h += nc3._att_list([])
        if single:
            h += st.pack(">ii", nc3.NC_VARIABLE, 1)
            h += var("A", [0, 1], nc3.NC_SHORT, 6, hlen)
            data = a_slab[0] + a_slab[1]                  # UNPADDED records
        else:
            h += st.pack(">ii", nc3.NC_VARIABLE, 3)
            rec_off = hlen + len(y_data)                  # fixed data first
            h += var("t", [0], nc3.NC_DOUBLE, 8, rec_off)
            h += var("A", [0, 1], nc3.NC_SHORT, 8, rec_off + 8)
            h += var("y", [1], nc3.NC_DOUBLE, 24, hlen)
            data = y_data
            for r in range(2):
                data += t_slab[r] + a_slab[r] + b"\x00\x00"  # pad 6 -> 8
        return h, data

    h0, _ = build(0)            # begins depend only on the header LENGTH
    h, data = build(len(h0))
    return h + data


def test_record_dimension_read(tmp_path):
    """Record (unlimited) dimension interop: interleaved record slabs
    de-stride into (numrecs, ...) arrays; fixed vars unaffected."""
    p = str(tmp_path / "rec.nc")
    open(p, "wb").write(_classic_with_records(single=False))
    nc = nc3.read_netcdf(p)
    assert nc["dims"] == {"rec": 2, "y": 3}
    assert np.array_equal(nc["vars"]["t"], [10.0, 20.0])
    assert np.array_equal(nc["vars"]["A"], [[1, 2, 3], [4, 5, 6]])
    assert np.array_equal(nc["vars"]["y"], [7.0, 8.0, 9.0])


def test_record_dimension_single_var_unpadded(tmp_path):
    """The spec's special case: exactly one record variable -> records
    are NOT 4-padded (stride 6 here, not 8)."""
    p = str(tmp_path / "rec1.nc")
    open(p, "wb").write(_classic_with_records(single=True))
    nc = nc3.read_netcdf(p)
    assert np.array_equal(nc["vars"]["A"], [[1, 2, 3], [4, 5, 6]])


def test_cdf5_roundtrip(spark, tmp_path):
    """CDF-5 (64-bit data): magic CDF\x05, INT64 size/count words
    everywhere (numrecs, dim lengths, name lengths, nelems, vsize,
    begin), INT dimids/nc_type — values identical to CDF-1, both
    writers byte-identical, reader auto-detects."""
    import struct as st

    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.sources.netcdf3 import (
        read_netcdf, write_netcdf, write_netcdf_distributed,
    )
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=8.0, bottom=0.0, top=6.0, nx=8, ny=6,
                        t0="2020-01-01", nt=4, dt="P1D", chunk_size=(2, 3, 4))
    cube = formula_cube(spark, v, {
        "B1": "CASE WHEN ix = 2 THEN NULL ELSE CAST(it*3 + iy + ix AS DOUBLE) END",
    })
    p1 = str(tmp_path / "v1.nc")
    p5 = str(tmp_path / "v5.nc")
    p5d = str(tmp_path / "v5d.nc")
    write_netcdf(cube, p1)
    write_netcdf(cube, p5, version=5)
    write_netcdf_distributed(cube, p5d, version=5)
    b1, b5, b5d = (open(p, "rb").read() for p in (p1, p5, p5d))
    assert b5[:4] == b"CDF\x05"
    assert b5 == b5d
    (numrecs,) = st.unpack_from(">q", b5, 4)
    assert numrecs == 0
    n1, n5 = read_netcdf(p1), read_netcdf(p5)
    assert n1["dims"] == n5["dims"]
    assert n1["gatts"]["view"] == n5["gatts"]["view"]
    for k in n1["vars"]:
        a, b = n1["vars"][k], n5["vars"][k]
        if isinstance(a, bytes):
            assert a == b
        else:
            assert np.array_equal(a, b, equal_nan=True)


def test_external_float_byte_types(tmp_path):
    """External interop: NC_FLOAT (5) and NC_BYTE (1) variables — types
    our writers never emit but netcdf-c files commonly carry — decode
    through the same reader (hand-assembled file)."""
    import struct as st

    vals_f = np.array([1.5, -2.25, 3.0], ">f4").tobytes() + b"\x00" * 0
    vals_b = np.array([5, -7, 100], "i1").tobytes() + b"\x00"

    def var(name, dimids, nc_type, vsize, begin):
        v = nc3._name(name) + st.pack(">i", len(dimids))
        for d in dimids:
            v += st.pack(">i", d)
        v += nc3._att_list([]) + st.pack(">iii", nc_type, vsize, begin)
        return v

    def build(hlen):
        h = b"CDF\x01" + st.pack(">i", 0)
        h += st.pack(">ii", nc3.NC_DIMENSION, 1)
        h += nc3._name("y") + st.pack(">i", 3)
        h += nc3._att_list([])
        h += st.pack(">ii", nc3.NC_VARIABLE, 2)
        h += var("f", [0], 5, 12, hlen)
        h += var("b", [0], 1, 4, hlen + 12)
        return h

    h = build(len(build(0)))
    p = str(tmp_path / "ext.nc")
    open(p, "wb").write(h + vals_f + vals_b)
    nc = nc3.read_netcdf(p)
    assert np.allclose(nc["vars"]["f"], [1.5, -2.25, 3.0])
    assert np.array_equal(nc["vars"]["b"], [5, -7, 100])
