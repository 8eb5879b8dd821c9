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
    recs, nrec, ivsize, fields, tbl_name, tbl_cls = _parse_vdata(buf, dds, tbl_ref)
    assert nrec == 3 * 3 and set(fields) == {"origin", "chk_tag", "chk_ref"}
    assert tbl_cls == "_HDF_CHK_TBL_"
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


# ---------------------------------------------------------------------------
# SD attribute layer (mfhdf Vgroup/Vdata mapping: Attr0.0 / Var0.0 / CDF0.0)
# ---------------------------------------------------------------------------

def test_attr_roundtrip_types():
    """Every supported attribute value type survives the on-disk trip:
    str -> CHAR8, python int -> INT32, python float -> FLOAT64, numpy
    scalars/arrays keep their dtype; per-SDS and global layers both."""
    from gdalcubes_cpp_spark.sources.hdf4 import read_hdf4_attrs

    a = np.arange(12, dtype=np.int16).reshape(3, 4)
    b = np.arange(12, dtype=np.float32).reshape(3, 4)
    attrs = [
        {"_FillValue": np.int16(-3000), "scale_factor": 0.0001,
         "add_offset": 0.0, "units": "NDVI", "valid_range":
         np.array([-2000, 10000], dtype=np.int16)},
        {"long_name": "enhanced vegetation index", "n_obs": 7},
    ]
    buf = hdf4_sds_bytes([a, b], names=["NDVI", "EVI"], attrs=attrs,
                         global_attrs={"StructMetadata.0": "GROUP=Grid",
                                       "orbit": 12345})
    out = read_hdf4_bytes(buf)
    assert (out[0]["data"] == a).all() and (out[1]["data"] == b).all()
    at0 = out[0]["attrs"]
    assert at0["_FillValue"] == -3000 and at0["_FillValue"].dtype == np.int16
    assert at0["scale_factor"] == 0.0001
    assert at0["units"] == "NDVI"
    assert (at0["valid_range"] == [-2000, 10000]).all()
    assert at0["valid_range"].dtype == np.int16
    assert out[1]["attrs"]["long_name"] == "enhanced vegetation index"
    assert out[1]["attrs"]["n_obs"] == 7
    g, per = read_hdf4_attrs(buf)
    assert g["StructMetadata.0"] == "GROUP=Grid" and g["orbit"] == 12345
    assert set(per) == {"NDVI", "EVI"}


def test_attr_spec_structure():
    """On-disk conformance: attribute Vdata carries class Attr0.0 with a
    single VALUES field; the SDS's Var0.0 Vgroup links the NDG and the
    attr VH; the root CDF0.0 Vgroup links the Var0.0 group (the layout
    GDAL's HDF4 driver and pyhdf traverse)."""
    from gdalcubes_cpp_spark.sources.hdf4 import (
        DFTAG_VG, DFTAG_VH, _parse_vdata, _parse_vgroup, _walk_dds,
    )

    a = np.ones((2, 2), dtype=np.uint8)
    buf = hdf4_sds_bytes(a, names=["B1"], attrs={"scale_factor": 2.0},
                         global_attrs={"title": "t"})
    dds = _walk_dds(buf)
    vgs = {ref: _parse_vgroup(buf, dds, ref)
           for (t, ref) in dds if t == DFTAG_VG}
    classes = sorted(k for _, k, _ in vgs.values())
    assert classes == ["CDF0.0", "Var0.0"]
    (var_name, _, var_members), = [v for v in vgs.values() if v[1] == "Var0.0"]
    assert var_name == "B1"
    assert (DFTAG_NDG, 1) in var_members
    vh_refs = [r for t, r in var_members if t == DFTAG_VH]
    assert len(vh_refs) == 1
    _recs, nrec, _iv, fields, nm, kl = _parse_vdata(buf, dds, vh_refs[0])
    assert kl == "Attr0.0" and nm == "scale_factor" and nrec == 1
    assert list(fields) == ["VALUES"]
    (_, _, cdf_members), = [v for v in vgs.values() if v[1] == "CDF0.0"]
    member_tags = {t for t, _ in cdf_members}
    assert DFTAG_VG in member_tags and DFTAG_VH in member_tags


def test_attr_decode_applies_fill_scale_offset():
    """attr_decode: _FillValue -> NaN, then v = raw*scale + offset per
    plane from the file's OWN attributes; attribute-less planes pass
    through; numpy oracle straight off the arrays."""
    from gdalcubes_cpp_spark.sources.hdf4 import attr_decode

    ndvi = np.array([[-3000, 1000], [2500, -3000]], dtype=np.int16)
    raw2 = np.array([[1, 2], [3, 4]], dtype=np.int16)
    buf = hdf4_sds_bytes(
        [ndvi, raw2], names=["NDVI", "RAW"],
        attrs=[{"_FillValue": np.int16(-3000), "scale_factor": 0.0001,
                "add_offset": 0.5}, {}],
    )
    out = attr_decode()(buf, "hdf")
    want = ndvi.astype(np.float64)
    want[want == -3000] = np.nan
    want = want * 0.0001 + 0.5
    assert np.array_equal(out[:, :, 0], want, equal_nan=True)
    assert (out[:, :, 1] == raw2).all()


def test_attr_decode_non_hdf4_fallback():
    """Non-HDF4 payloads fall through to the base codec untouched."""
    from gdalcubes_cpp_spark.sources.hdf4 import attr_decode

    img = (np.arange(12, dtype=np.uint8)).reshape(2, 2, 3)
    png = codecs.encode_png(img)
    out = attr_decode()(png, "png")
    assert (out == img).all()


def test_attrs_with_chunked_compression():
    """Attrs coexist with SPECIAL_CHUNKED storage: the chunk-table Vdata
    (class _HDF_CHK_TBL_) is not confused with Attr0.0, and both data
    and attributes roundtrip."""
    a = (np.arange(35, dtype=np.float32)).reshape(5, 7)
    buf = hdf4_sds_bytes(a, names=["X"], compress="deflate", chunks=(2, 3),
                         attrs={"scale_factor": 10.0})
    out = read_hdf4_bytes(buf)
    assert (out[0]["data"] == a).all()
    assert out[0]["attrs"] == {"scale_factor": 10.0}


def test_no_attrs_bytes_unchanged():
    """Without attrs the writer emits no Vgroup layer at all — output is
    the exact pre-attribute byte stream (decode-suite goldens hold)."""
    from gdalcubes_cpp_spark.sources.hdf4 import DFTAG_VG, _walk_dds

    a = np.arange(6, dtype=np.int16).reshape(2, 3)
    buf = hdf4_sds_bytes(a, names=["x"])
    assert not [1 for (t, _) in _walk_dds(buf) if t == DFTAG_VG]
    assert read_hdf4_bytes(buf)[0]["attrs"] == {}


# ---------------------------------------------------------------------------
# Linked-block elements (SPECIAL_LINKED, the HDF library's appendable layout)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("blk,per_tab", [(64, 16), (50, 4), (1024, 128)])
def test_linked_block_roundtrip(blk, per_tab):
    """Data split across DFTAG_LINKED blocks + chained block tables
    reassembles exactly — including multi-table chains (per_tab smaller
    than the block count) and a non-multiple final block."""
    rng = np.random.RandomState(31)
    a = (rng.rand(23, 29) * 1000).astype(np.int16)   # 1334 bytes
    buf = hdf4_sds_bytes(a, names=["L"], linked=(blk, per_tab))
    out = read_hdf4_bytes(buf)
    assert (out[0]["data"] == a).all()


def test_linked_block_structure():
    """On-disk conformance: special header fields (length, first/succ
    block length, blocks-per-table, first-table ref), zero-terminated
    table, table chaining."""
    from gdalcubes_cpp_spark.sources.hdf4 import (
        DFTAG_LINKED, DFTAG_SD, SPECIAL_BIT, SPECIAL_LINKED, _walk_dds,
    )

    a = np.arange(100, dtype=np.uint8).reshape(10, 10)  # 100 bytes
    buf = hdf4_sds_bytes(a, names=["L"], linked=(30, 2))
    dds = _walk_dds(buf)
    off, _ln = dds[(DFTAG_SD | SPECIAL_BIT, 1)]
    code, total, first_len, blk_len, num_blk, tab_ref = struct.unpack_from(
        ">HIIIIH", buf, off)
    assert code == SPECIAL_LINKED == 1
    assert (total, first_len, blk_len, num_blk) == (100, 30, 30, 2)
    # 4 data blocks (30+30+30+10) over tables of 2 -> 2 chained tables
    toff, tlen = dds[(DFTAG_LINKED, tab_ref)]
    (nxt,) = struct.unpack_from(">H", buf, toff)
    assert nxt != 0
    toff2, _ = dds[(DFTAG_LINKED, nxt)]
    (nxt2,) = struct.unpack_from(">H", buf, toff2)
    assert nxt2 == 0
    assert (out := read_hdf4_bytes(buf))[0]["data"].tobytes() == a.tobytes()


def test_linked_with_attrs():
    """Linked storage composes with the SD attribute layer."""
    a = np.arange(60, dtype=np.int16).reshape(6, 10)
    buf = hdf4_sds_bytes(a, names=["X"], linked=(16, 3),
                         attrs={"scale_factor": 0.5})
    out = read_hdf4_bytes(buf)
    assert (out[0]["data"] == a).all()
    assert out[0]["attrs"] == {"scale_factor": 0.5}


def test_linked_excludes_chunks_and_compress():
    a = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="linked excludes"):
        hdf4_sds_bytes(a, linked=(16, 2), compress="rle")
    with pytest.raises(ValueError, match="linked excludes"):
        hdf4_sds_bytes(a, linked=(16, 2), chunks=(2, 2))


def test_linked_first_block_shorter():
    """External-file semantics: first_len may differ from blk_len — the
    reader takes first_len bytes from the first block and blk_len from
    successive ones, honoring the header rather than assuming uniform
    blocks (element-level check with a consistently rewritten header)."""
    from gdalcubes_cpp_spark.sources.hdf4 import (
        DFTAG_SD, SPECIAL_BIT, _element, _walk_dds,
    )

    a = np.arange(100, dtype=np.uint8).reshape(10, 10)
    buf = bytearray(hdf4_sds_bytes(a, names=["L"], linked=(40, 8)))
    dds = _walk_dds(bytes(buf))
    off, _ = dds[(DFTAG_SD | SPECIAL_BIT, 1)]
    # declare the first block as 25 bytes and the total as what the
    # chain then yields (25 + 40 + 20): the reader must skip the first
    # block's trailing 15 physical bytes
    struct.pack_into(">I", buf, off + 2, 85)   # length
    struct.pack_into(">I", buf, off + 6, 25)   # first_len
    out = _element(bytes(buf), _walk_dds(bytes(buf)), DFTAG_SD, 1)
    raw = a.tobytes()
    assert out == raw[:25] + raw[40:80] + raw[80:100]


def test_attr_decode_in_build_cube(spark):
    """attr_decode runs executor-side inside the scan: granules carry
    their OWN _FillValue/scale_factor/add_offset, no preset constants;
    cells checked against a straight numpy oracle (near-warp at 2x
    coarsening picks pixel (2i+1, 2j+1), the cube_jp2_decode geometry)."""
    import pyspark.sql.functions as F

    from gdalcubes_cpp_spark.operators.build import build_cube
    from gdalcubes_cpp_spark.sources.hdf4 import attr_decode
    from gdalcubes_cpp_spark.view import CubeView

    r = np.arange(40)[:, None]
    c = np.arange(40)[None, :]
    rows = []
    planes = {}
    for k, ts in ((0, "2020-02-10"), (1, "2020-05-20")):
        plane = (((r * 31 + c * 17 + k * 1000) % 4999) - 1500).astype(np.int16)
        plane[k::7, 3::5] = -3000        # fill holes
        planes[k] = plane
        buf = hdf4_sds_bytes(
            plane, names=["NDVI"],
            attrs={"_FillValue": np.int16(-3000),
                   "scale_factor": 0.0001, "add_offset": 0.5},
        )
        rows.append((f"h4_{k}", bytearray(buf), 40, 40, "hdf", ts,
                     -12.05, -8.05, 18.05, 22.05))
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "ts string, left double, right double, bottom double, top double",
    ).withColumn("ts", F.to_timestamp("ts"))
    v = CubeView.create(
        left=-12.0, right=-8.0, bottom=18.0, top=22.0, nx=20, ny=20,
        t0="2020-01-01", t1="2020-12-31", dt="P3M",
        aggregation="mean", resampling="near", chunk_size=(2, 10, 10),
    )
    got = {(row["it"], row["iy"], row["ix"]): row["B1"]
           for row in build_cube(images, v, bands=("B1",),
                                 decode_fn=attr_decode()).df.collect()}
    for k in (0, 1):
        w = planes[k].astype(np.float64)
        w[w == -3000] = np.nan
        w = w * 0.0001 + 0.5
        for iy in range(20):
            for ix in range(20):
                want = w[2 * iy + 1, 2 * ix + 1]
                gv = got.get((k, iy, ix))
                if np.isnan(want):
                    assert gv is None or np.isnan(gv), (k, iy, ix)
                else:
                    assert gv == want, (k, iy, ix)


# ---------------------------------------------------------------------------
# Rank-3 SDS (band-major MODIS layouts like MxD021KM EV_1KM_RefSB)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("comp", [None, "deflate", "rle"])
def test_rank3_sds_roundtrip(comp):
    rng = np.random.RandomState(71)
    a = (rng.rand(4, 9, 11) * 30000).astype(np.uint16)   # (band, y, x)
    buf = hdf4_sds_bytes(a, names=["EV_1KM_RefSB"], compress=comp)
    out = read_hdf4_bytes(buf)
    assert out[0]["data"].shape == (4, 9, 11)
    assert (out[0]["data"] == a).all()
    # codecs channel stacking: leading axis -> channels
    dec = codecs.decode(buf)
    assert dec.shape == (9, 11, 4)
    for b in range(4):
        assert (dec[:, :, b] == a[b]).all()


def test_rank3_mixed_with_2d():
    """A granule mixing a 3-D SDS and 2-D SDS decodes to the channel
    concatenation in SDS order."""
    a3 = (np.arange(2 * 4 * 5, dtype=np.int16)).reshape(2, 4, 5)
    a2 = (np.arange(4 * 5, dtype=np.int16) * 3).reshape(4, 5)
    buf = hdf4_sds_bytes([a3, a2], names=["RefSB", "QA"])
    dec = codecs.decode(buf)
    assert dec.shape == (4, 5, 3)
    assert (dec[:, :, 0] == a3[0]).all()
    assert (dec[:, :, 1] == a3[1]).all()
    assert (dec[:, :, 2] == a2).all()


def test_rank3_sdd_rank_word():
    """SDD advertises rank 3 with all three dim words."""
    from gdalcubes_cpp_spark.sources.hdf4 import DFTAG_SDD, _element, _walk_dds

    a = np.zeros((2, 3, 4), dtype=np.uint8)
    buf = hdf4_sds_bytes(a)
    dds = _walk_dds(buf)
    sdd = _element(buf, dds, DFTAG_SDD, 1)
    (rank,) = struct.unpack_from(">H", sdd, 0)
    assert rank == 3
    assert struct.unpack_from(">III", sdd, 2) == (2, 3, 4)


def test_rank3_excludes_chunks_linked():
    a = np.zeros((2, 3, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="3-D SDS"):
        hdf4_sds_bytes(a, chunks=(2, 2))
    with pytest.raises(ValueError, match="3-D SDS"):
        hdf4_sds_bytes(a, linked=(16, 2))


# ---------------------------------------------------------------------------
# HDF-EOS StructMetadata.0: self-describing MODIS grid ingest
# ---------------------------------------------------------------------------

_SM = """GROUP=SwathStructure
END_GROUP=SwathStructure
GROUP=GridStructure
\tGROUP=GRID_1
\t\tGridName="MODIS_Grid_16DAY_1km_VI"
\t\tXDim=1200
\t\tYDim=1200
\t\tUpperLeftPointMtrs=(-1111950.519667,5559752.598333)
\t\tLowerRightMtrs=(0.000000,4447802.078667)
\t\tProjection=GCTP_SNSOID
\t\tProjParams=(6371007.181000,0,0,0,0,0,0,0,0,0,0,0,0)
\t\tSphereCode=-1
\tEND_GROUP=GRID_1
END_GROUP=GridStructure
END
"""


def test_struct_metadata_parse_and_grid_info():
    """The MOD13A2 h18v04-style StructMetadata resolves to the engine's
    sinusoidal footprint: radius from ProjParams, corners verbatim, and
    the dynamic SINU key round-trips through srs.normalize."""
    from gdalcubes_cpp_spark import srs
    from gdalcubes_cpp_spark.sources.hdf4 import (
        hdfeos_grid_info, parse_struct_metadata,
    )

    grids = parse_struct_metadata(_SM)
    assert len(grids) == 1
    g = grids[0]
    assert g["grid_name"] == "MODIS_Grid_16DAY_1km_VI"
    assert (g["nx"], g["ny"]) == (1200, 1200)
    assert g["left"] == -1111950.519667 and g["top"] == 5559752.598333
    assert g["projection"] == "GCTP_SNSOID"

    a = np.zeros((4, 4), dtype=np.int16)
    buf = hdf4_sds_bytes(a, names=["NDVI"],
                         global_attrs={"StructMetadata.0": _SM})
    (info,) = hdfeos_grid_info(buf)
    assert info["srs"] == "SINU:6371007.181:0.0:0.0:0.0"
    assert srs.normalize(info["srs"]) == info["srs"]
    # the key actually transforms: this tile (UL x = -1111950 m) sits
    # one tile west of Greenwich in the 40-50N row; center ~(-7.07, 45)
    lon, lat = srs.points_to_wgs84(
        np.array([(info["left"] + info["right"]) / 2.0]),
        np.array([(info["top"] + info["bottom"]) / 2.0]), info["srs"])
    assert -15.0 < float(lon[0]) < -5.0 and 44.0 < float(lat[0]) < 46.0


def test_struct_metadata_geo_dms():
    """GCTP_GEO grids: packed-DMS corners (DDDMMMSSS.ss) convert to
    degrees; a 40°30'00" value is exactly 40.5."""
    from gdalcubes_cpp_spark.sources.hdf4 import hdfeos_grid_info

    sm = """GROUP=GridStructure
GROUP=GRID_1
GridName="GEOGRID"
XDim=360
YDim=180
UpperLeftPointMtrs=(-180000000.000000,40030000.000000)
LowerRightMtrs=(180000000.000000,-40030000.000000)
Projection=GCTP_GEO
END_GROUP=GRID_1
END_GROUP=GridStructure
END
"""
    a = np.zeros((2, 2), dtype=np.uint8)
    buf = hdf4_sds_bytes(a, global_attrs={"StructMetadata.0": sm})
    (info,) = hdfeos_grid_info(buf)
    assert info["srs"] == "EPSG:4326"
    assert info["left"] == -180.0 and info["right"] == 180.0
    assert info["top"] == 40.5 and info["bottom"] == -40.5


def test_struct_metadata_missing_raises():
    from gdalcubes_cpp_spark.sources.hdf4 import hdfeos_grid_info

    buf = hdf4_sds_bytes(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="StructMetadata"):
        hdfeos_grid_info(buf)


def test_read_vdatas_general_tables():
    """read_vdatas surfaces arbitrary tabular Vdatas (the metadata
    tables real granules carry) with typed columns, multi-order fields
    as (nrec, order) arrays and CHAR8 fields as strings; the engine's
    own bookkeeping Vdatas stay hidden by default."""
    from gdalcubes_cpp_spark.sources.hdf4 import (
        DFNT_CHAR8, _vdata_pair, read_vdatas,
    )

    a = np.arange(6, dtype=np.int16).reshape(2, 3)
    # granule with: chunked SDS (internal chunk-table Vdata), one attr,
    # and a custom 2-field metadata table appended by hand
    buf = bytearray(hdf4_sds_bytes(a, names=["X"], chunks=(2, 2),
                                   attrs={"scale_factor": 2.0}))
    # append a custom Vdata pair by rebuilding through the writer's
    # helpers: 3 records of (f4 value, 8-char tag)
    elems = []
    recs = b""
    for i, (v, t) in enumerate([(1.5, b"alpha"), (-2.0, b"beta"),
                                (9.25, b"gamma")]):
        recs += struct.pack(">f", v) + t.ljust(8, b"\x00")
    _vdata_pair(elems, 200, "calib", "UserMeta",
                [("value", 5, 4, 1), ("tag", DFNT_CHAR8, 8, 8)], recs, 3)
    # splice the new elements into the DD chain by rewriting the file
    from gdalcubes_cpp_spark.sources.hdf4 import MAGIC, _walk_dds
    dds = _walk_dds(bytes(buf))
    old = [(t, r, bytes(buf[o:o + ln])) for (t, r), (o, ln) in sorted(dds.items())]
    allel = old + elems
    dd_block = struct.pack(">HI", len(allel), 0)
    off = len(MAGIC) + len(dd_block) + 12 * len(allel)
    dd = b""
    payload = b""
    for t, r, d in allel:
        dd += struct.pack(">HHII", t, r, off, len(d))
        payload += d
        off += len(d)
    buf2 = MAGIC + dd_block + dd + payload

    tables = read_vdatas(buf2)
    assert [t["name"] for t in tables] == ["calib"]
    t = tables[0]
    assert t["class"] == "UserMeta" and t["nrec"] == 3
    assert np.allclose(t["columns"]["value"], [1.5, -2.0, 9.25])
    assert t["columns"]["tag"] == ["alpha", "beta", "gamma"]
    # internal view still exposes the chunk table + attribute Vdatas
    full = read_vdatas(buf2, include_internal=True)
    classes = {t["class"] for t in full}
    assert "_HDF_CHK_TBL_" in classes and "Attr0.0" in classes
    # and the SDS itself still decodes
    assert (read_hdf4_bytes(buf2)[0]["data"] == a).all()


def test_dd_chain_cycle_refused():
    """A crafted DD-block next pointer that loops must raise, not hang
    (untrusted-bytes refuse-don't-corrupt policy)."""
    buf = bytearray(hdf4_sds_bytes(np.ones((2, 2), np.uint8), names=["x"]))
    ndds, _nxt = struct.unpack_from(">HI", buf, 4)
    struct.pack_into(">HI", buf, 4, ndds, 4)  # first block points to itself
    with pytest.raises(ValueError, match="cycle"):
        _walk_dds(bytes(buf))


def test_linked_table_cycle_refused():
    """A linked-block table chain with a pointer cycle must raise, not
    hang or grow the output unboundedly."""
    from gdalcubes_cpp_spark.sources.hdf4 import (
        DFTAG_LINKED, SPECIAL_BIT,
    )

    a = np.arange(100, dtype=np.uint8).reshape(10, 10)
    buf = bytearray(hdf4_sds_bytes(a, names=["L"], linked=(30, 2)))
    dds = _walk_dds(bytes(buf))
    off, _ln = dds[(DFTAG_SD | SPECIAL_BIT, 1)]
    (tab_ref,) = struct.unpack_from(">H", buf, off + 18)
    toff, _tlen = dds[(DFTAG_LINKED, tab_ref)]
    struct.pack_into(">H", buf, toff, tab_ref)  # table chains to itself
    with pytest.raises(ValueError, match="linked-block"):
        read_hdf4_bytes(bytes(buf))
