"""HDF4 SDS container: spec-level byte checks, writer/reader roundtrips,
compression coders, and the reference's test_sampledata MODIS scenario
end-to-end (src/test/test_sampledata.cpp:28-70 — MOD13A2 HDF4 granule ->
MxD13A2 collection format -> sinusoidal min-cube)."""

import struct

import numpy as np
import pytest

from gdalcubes_cpp_spark import codecs
from gdalcubes_cpp_spark.sources.hdf4 import (
    DFTAG_NDG,
    DFTAG_NT,
    DFTAG_SD,
    DFTAG_SDD,
    MAGIC,
    _rle_decode,
    _rle_encode,
    _walk_dds,
    hdf4_sds_bytes,
    read_hdf4_bytes,
)

DTYPES = ["float32", "float64", "int8", "uint8", "int16", "uint16", "int32", "uint32"]


@pytest.mark.parametrize("dt", DTYPES)
@pytest.mark.parametrize("comp", [None, "deflate", "rle"])
def test_roundtrip(dt, comp):
    rng = np.random.RandomState(3)
    a = (rng.rand(13, 17) * 200 - 100).astype(dt)
    b = (rng.rand(13, 17) * 50).astype(dt)
    buf = hdf4_sds_bytes([a, b], names=["NDVI", "EVI"], compress=comp)
    out = read_hdf4_bytes(buf)
    assert [s["name"] for s in out] == ["NDVI", "EVI"]
    assert (out[0]["data"] == a).all() and (out[1]["data"] == b).all()
    assert out[0]["data"].dtype == np.dtype(dt)


def test_spec_bytes():
    """Byte-level spec conformance: magic, big-endian DD entries, NT/SDD
    element contents (HDF 4.2 spec, 'Basic Structure' + tag specs)."""
    a = np.arange(6, dtype=np.int16).reshape(2, 3)
    buf = hdf4_sds_bytes(a, names=["x"])
    assert buf[:4] == MAGIC
    ndds, nxt = struct.unpack_from(">HI", buf, 4)
    assert nxt == 0 and ndds >= 5
    dds = _walk_dds(buf)
    # NT: version=1, DFNT_INT16=22, 16 bits
    off, ln = dds[(DFTAG_NT, 1)]
    assert buf[off:off + ln][:3] == bytes([1, 22, 16])
    # SDD: rank 2, dims (2, 3) big-endian, then (DFTAG_NT, ref) pair
    off, _ = dds[(DFTAG_SDD, 1)]
    rank, d0, d1, t, r = struct.unpack_from(">HIIHH", buf, off)
    assert (rank, d0, d1, t, r) == (2, 2, 3, DFTAG_NT, 1)
    # SD data: big-endian int16 values in row-major order
    off, ln = dds[(DFTAG_SD, 1)]
    assert buf[off:off + ln] == a.astype(">i2").tobytes()


def test_dd_block_chain():
    """The DD walker follows chained blocks (multi-block files)."""
    base = hdf4_sds_bytes(np.ones((2, 2), dtype=np.uint8), names=["x"])
    dds = _walk_dds(base)
    # rebuild the same file with each DD in its OWN chained block
    elems = []
    for (tag, ref), (off, ln) in sorted(dds.items()):
        elems.append((tag, ref, base[off:off + ln]))
    # layout: magic, then n 1-entry DD blocks, then payloads
    n = len(elems)
    block_sz = 6 + 12
    data_off = 4 + n * block_sz
    payload = b"".join(e[2] for e in elems)
    out = bytearray(MAGIC)
    off = data_off
    for i, (tag, ref, data) in enumerate(elems):
        nxt = 4 + (i + 1) * block_sz if i + 1 < n else 0
        out += struct.pack(">HI", 1, nxt)
        out += struct.pack(">HHII", tag, ref, off, len(data))
        off += len(data)
    out += payload
    got = read_hdf4_bytes(bytes(out))
    assert len(got) == 1 and (got[0]["data"] == 1).all()


def test_rle_vectors():
    """The HDF byte-RLE coder: control < 128 -> n+1 literals; >= 128 ->
    next byte repeated (control-128)+3 times."""
    assert _rle_decode(bytes([0x80 | 2, 7])) == bytes([7] * 5)
    assert _rle_decode(bytes([2, 1, 2, 3])) == bytes([1, 2, 3])
    rng = np.random.RandomState(11)
    for _ in range(100):
        n = int(rng.randint(0, 400))
        d = bytes(rng.randint(0, 3, size=n).astype(np.uint8))
        enc = _rle_encode(d)
        assert _rle_decode(enc) == d
    # long-run boundary: max run is 130
    d = bytes([9] * 500)
    assert _rle_decode(_rle_encode(d)) == d


def test_codecs_dispatch_and_stack():
    a = np.full((4, 5), 3, dtype=np.int16)
    b = np.full((4, 5), -2, dtype=np.int16)
    st = codecs.decode(hdf4_sds_bytes([a, b]))
    assert st.shape == (4, 5, 2)
    assert (st[:, :, 0] == 3).all() and (st[:, :, 1] == -2).all()
    with pytest.raises(ValueError, match="shapes differ"):
        codecs.decode(hdf4_sds_bytes([a, np.zeros((2, 2), dtype=np.int16)]))


def test_unsupported_special_raises():
    buf = bytearray(hdf4_sds_bytes(np.ones((2, 2), np.uint8), compress="deflate"))
    dds = _walk_dds(bytes(buf))
    off, _ = dds[(DFTAG_SD | 0x4000, 1)]
    struct.pack_into(">H", buf, off, 4)  # SPECIAL_VLINKED
    with pytest.raises(ValueError, match="special element"):
        read_hdf4_bytes(bytes(buf))


@pytest.mark.parametrize("comp", [None, "deflate", "rle"])
@pytest.mark.parametrize("chunks", [(7, 5), (16, 16), (13, 40)])
def test_chunked_sds_roundtrip(comp, chunks):
    """SPECIAL_CHUNKED elements (the layout real MODIS granules use):
    chunk-table Vdata + per-chunk DFTAG_CHUNK elements, per-chunk
    compression through the same special-COMP mechanism, edge chunks
    padded with fill and clipped on read."""
    rng = np.random.RandomState(9)
    a = (rng.rand(37, 40) * 4000 - 2000).astype(np.int16)
    b = (rng.rand(37, 40) * 50).astype(np.int16)
    buf = hdf4_sds_bytes([a, b], names=["NDVI", "EVI"],
                         compress=comp, chunks=chunks)
    out = read_hdf4_bytes(buf)
    assert (out[0]["data"] == a).all() and (out[1]["data"] == b).all()


def test_chunked_structure():
    """Byte-level checks on the chunked layout: special header fields,
    the Vdata chunk table (grouped VH arrays, named fields), DFTAG_CHUNK
    elements present."""
    from gdalcubes_cpp_spark.sources.hdf4 import (
        DFTAG_CHUNK,
        DFTAG_VH,
        SPECIAL_CHUNKED,
        _parse_vdata,
    )

    a = np.arange(12 * 10, dtype=np.int16).reshape(12, 10)
    buf = hdf4_sds_bytes(a, chunks=(5, 4))
    dds = _walk_dds(buf)
    off, _ = dds[(DFTAG_SD | 0x4000, 1)]
    (code,) = struct.unpack_from(">H", buf, off)
    assert code == SPECIAL_CHUNKED == 6
    _v, flag, tot, csz, nts = struct.unpack_from(">BIIII", buf, off + 6)
    assert (tot, csz, nts) == (12 * 10 * 2, 5 * 4 * 2, 2)
    tbl_tag, tbl_ref = struct.unpack_from(">HH", buf, off + 23)
    assert tbl_tag == DFTAG_VH
    recs, nrec, ivsize, fields = _parse_vdata(buf, dds, tbl_ref)
    assert nrec == 3 * 3 and set(fields) == {"origin", "chk_tag", "chk_ref"}
    assert fields["origin"][2] == 2  # order = ndims int32s
    # 9 chunk elements exist
    assert sum(1 for (t, _r) in dds if t == DFTAG_CHUNK) == 9


# ---------------------------------------------------------------------------
# the test_sampledata scenario
# ---------------------------------------------------------------------------


def _expected_modis_cells():
    """Independent numpy oracle: sinu inverse -> near pixel -> formula."""
    from gdalcubes_cpp_spark import srs
    from gdalcubes_cpp_spark.benchqueries import (
        V_MODIS,
        _MODIS_IMG,
        _modis_granule_planes,
    )

    m = _MODIS_IMG
    v = V_MODIS
    xs = v.left + (np.arange(v.nx) + 0.5) * v.dx
    ys = v.top - (np.arange(v.ny) + 0.5) * v.dy
    LON, LAT = srs.grid_to_wgs84(xs, ys, v.srs)
    pd_ = (m["right"] - m["left"]) / m["n"]
    pr = np.floor((m["top"] - LAT) / pd_).astype(int)
    pc = np.floor((LON - m["left"]) / pd_).astype(int)
    ndvi, evi = _modis_granule_planes()
    nd = ndvi[pr, pc].astype(float)
    ev = evi[pr, pc].astype(float)
    nod = nd == -3000
    nd[nod] = np.nan
    ev[nod] = np.nan
    return nd, ev


def test_modis_margins():
    """Placement audit: cell centers clear of every decision line — the
    0.04-deg pixel grid AND the footprint edges — by margins far above the
    ~1e-14 cross-engine transcendental noise."""
    from gdalcubes_cpp_spark import srs
    from gdalcubes_cpp_spark.benchqueries import V_MODIS, _MODIS_IMG

    m, v = _MODIS_IMG, V_MODIS
    xs = v.left + (np.arange(v.nx) + 0.5) * v.dx
    ys = v.top - (np.arange(v.ny) + 0.5) * v.dy
    LON, LAT = srs.grid_to_wgs84(xs, ys, v.srs)
    pd_ = (m["right"] - m["left"]) / m["n"]
    fx = (LON - m["left"]) / pd_
    fy = (m["top"] - LAT) / pd_
    line_margin = min(
        np.abs(fx - np.round(fx)).min(), np.abs(fy - np.round(fy)).min()
    ) * pd_
    edge_margin = min(
        (LON - m["left"]).min(), (m["right"] - LON).min(),
        (LAT - m["bottom"]).min(), (m["top"] - LAT).min(),
    )
    assert line_margin >= 5e-5  # measured 7.3e-5 deg
    assert edge_margin >= 0.4   # measured 0.51 deg


def test_modis_sampledata_end_to_end(spark):
    """The reference's disabled end-to-end test, runnable: MxD13A2 ingest ->
    HDF4 decode -> declared nodata -> sinusoidal near-warp -> min cube,
    every cell checked against the independent numpy oracle."""
    from gdalcubes_cpp_spark.benchqueries import hdf4_modis_pixels

    rows = hdf4_modis_pixels(spark, "/root/testdata/sf0.001").collect()
    nd, ev = _expected_modis_cells()
    want = {
        (0, iy, ix): (nd[iy, ix], ev[iy, ix])
        for iy in range(nd.shape[0]) for ix in range(nd.shape[1])
        if not np.isnan(nd[iy, ix])
    }
    got = {(r["it"], r["iy"], r["ix"]): (r["NDVI"], r["EVI"]) for r in rows}
    assert set(got) == set(want)
    for k, (a, b) in want.items():
        assert got[k] == (a, b), k


def test_modis_nodata_isolation(spark):
    """srcdata_decode applies the PRESET's nodata (-3000) to int16 HDF4
    values exactly — no float drift on the sentinel match."""
    from gdalcubes_cpp_spark.operators.build import srcdata_decode
    from gdalcubes_cpp_spark.benchqueries import _modis_granule_planes

    ndvi, evi = _modis_granule_planes()
    buf = hdf4_sds_bytes([ndvi, evi], compress="rle")
    out = srcdata_decode(nodata=[-3000.0, -3000.0])(buf, "hdf")
    assert np.isnan(out[:, :, 0]).sum() == (ndvi == -3000).sum()
    ok = ~np.isnan(out[:, :, 0])
    assert (out[:, :, 0][ok] == ndvi[ok]).all()
