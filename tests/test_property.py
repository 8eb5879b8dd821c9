"""Property-based tests (hypothesis) for the pure core — the reference has
none (SURVEY.md §5); these guard the arithmetic everything else sits on."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gdalcubes_cpp_spark import codecs, srs
from gdalcubes_cpp_spark.grid import ChunkGrid
from gdalcubes_cpp_spark.view import CubeView, Duration, add_duration, time_index


@settings(max_examples=200, deadline=None)
@given(
    nx=st.integers(1, 500), ny=st.integers(1, 500), nt=st.integers(1, 100),
    cx=st.integers(1, 64), cy=st.integers(1, 64), ct=st.integers(1, 32),
)
def test_chunk_id_bijection(nx, ny, nt, cx, cy, ct):
    v = CubeView.create(left=0, right=float(nx), bottom=0, top=float(ny),
                        nx=nx, ny=ny, t0="2020-01-01", nt=nt, dt="P1D",
                        chunk_size=(ct, cy, cx))
    g = ChunkGrid(v)
    for cid in (0, g.count - 1, g.count // 2):
        assert g.chunk_id(*g.chunk_coords(cid)) == cid
        (t0, t1), (y0, y1), (x0, x1) = g.chunk_limits(cid)
        assert 0 <= t0 < t1 <= nt and 0 <= y0 < y1 <= ny and 0 <= x0 < x1 <= nx
        assert g.chunk_of_cell(t0, y0, x0) == cid
        assert g.chunk_of_cell(t1 - 1, y1 - 1, x1 - 1) == cid


@settings(max_examples=100, deadline=None)
@given(
    x=st.floats(-179.9, 179.9), y=st.floats(-84.9, 84.9),
)
def test_mercator_roundtrip(x, y):
    assert srs.x_to_lon(srs.lon_to_x(x)) == np.float64(x) or abs(srs.x_to_lon(srs.lon_to_x(x)) - x) < 1e-9
    assert abs(srs.y_to_lat(srs.lat_to_y(y)) - y) < 1e-9


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40), c=st.integers(1, 4),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_random(h, w, c, seed):
    rng = np.random.RandomState(seed % (2**31))
    img = rng.randint(0, 256, (h, w, c), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(1, 30),
    unit=st.sampled_from(["Y", "M", "D", "H", "MIN", "S"]),
    k=st.integers(-50, 50),
)
def test_time_index_inverse(n, unit, k):
    from datetime import datetime

    d = Duration(n, unit)
    t0 = datetime(2020, 1, 1)
    t = add_duration(t0, d, k)
    # the start of slice k maps back to index k
    assert time_index(t, t0, d) == k


@settings(max_examples=100, deadline=None)
@given(s=st.integers(0, 2**62), w=st.sampled_from([32, 64, 96]), h=st.sampled_from([32, 64, 96]))
def test_lossy_psnr_always_above_gate(s, w, h):
    from gdalcubes_cpp_spark import synth

    img = synth.make_pixels(s, w, h)
    dec = codecs.decode(codecs.encode_lossy(img))
    assert codecs.psnr(img, dec) >= 40.0
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


@settings(max_examples=60, deadline=None)
@given(
    # bboxes with deliberate exact-boundary alignments (multiples of 0.25)
    l=st.integers(-40, 36).map(lambda k: k * 0.25),
    w=st.integers(1, 12).map(lambda k: k * 0.25),
    b=st.integers(-40, 36).map(lambda k: k * 0.25),
    h=st.integers(1, 12).map(lambda k: k * 0.25),
    day=st.integers(0, 400),
)
def test_join_predicate_edges(l, w, b, h, day):
    """find_range_st edge semantics: touching bboxes intersect (strict <),
    chunk time end is INCLUSIVE (src/image_collection.cpp:1330-1334)."""
    from datetime import datetime, timedelta

    from gdalcubes_cpp_spark.grid import ChunkGrid
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=-10, right=10, bottom=-10, top=10, nx=40, ny=40,
                        t0="2020-01-01", nt=12, dt="P1M", chunk_size=(4, 20, 20))
    g = ChunkGrid(v)
    ts = datetime(2020, 1, 1) + timedelta(days=day)
    hits = []
    for cid in g.chunk_ids():
        bd = g.chunk_bounds(cid)
        sp = not (l + w < bd["left"] or l > bd["right"] or b > bd["top"] or b + h < bd["bottom"])
        tm = bd["t_start"] <= ts <= bd["t_end"]
        if sp and tm:
            hits.append(cid)
    # invariants: a bbox overlapping the extent with ts inside [t0, t_end]
    # hits at least one chunk; disjoint bboxes hit none
    inside_space = not (l + w < v.left or l > v.right or b > v.top or b + h < v.bottom)
    inside_time = v.t0 <= ts <= v.t_end
    if inside_space and inside_time:
        assert hits, (l, w, b, h, ts)
    if not inside_space:
        assert not hits


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(8, 60), w=st.integers(8, 60), nb=st.integers(1, 3),
    big=st.booleans(), seed=st.integers(0, 10_000),
)
def test_gtiff_roundtrip_any_version(h, w, nb, big, seed):
    """Striped GeoTIFF roundtrips exactly for any shape/band count in
    BOTH classic and BigTIFF containers (NaNs included)."""
    from gdalcubes_cpp_spark.sources import geotiff as gt

    rng = np.random.RandomState(seed)
    planes = rng.rand(nb, h, w) * 100
    planes[rng.rand(nb, h, w) < 0.1] = np.nan
    buf = gt.gtiff_bytes(planes, 1.0, 1.0, 0.0, float(h), "EPSG:4326",
                         "p", bigtiff=big)
    assert buf[:4] == (b"II+\x00" if big else b"II*\x00")
    out = gt.read_gtiff_bytes(buf)["planes"]
    assert np.array_equal(out, planes, equal_nan=True)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(8, 80), w=st.integers(8, 80),
    th=st.sampled_from([8, 16, 32]), tw=st.sampled_from([8, 16, 32]),
    levels=st.integers(1, 3), seed=st.integers(0, 10_000),
)
def test_jp2_multitile_lossless_random(h, w, th, tw, levels, seed):
    """Reversible multi-tile JP2 roundtrips bit-exactly for arbitrary
    image/tile geometry (clipped edge tiles included)."""
    from gdalcubes_cpp_spark.sources.jpeg2000 import decode_jp2, encode_jp2

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 5000, (h, w)).astype(np.uint16)
    out = decode_jp2(encode_jp2(img, levels=levels, tile_size=(th, tw)))
    assert (out[:, :, 0] == img).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(8, 60), w=st.integers(8, 60),
    levels=st.integers(1, 3), qstep=st.floats(0.5, 32.0),
    seed=st.integers(0, 10_000),
)
def test_jp2_97_error_bounded(h, w, levels, qstep, seed):
    """The lossy 9/7 path's reconstruction error stays bounded by a
    small multiple of the quantization step for arbitrary content."""
    from gdalcubes_cpp_spark.sources.jpeg2000 import decode_jp2, encode_jp2

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 60000, (h, w)).astype(np.uint16)
    out = decode_jp2(encode_jp2(img, levels=levels, transform="9/7",
                                qstep=qstep))
    err = np.abs(out[:, :, 0].astype(float) - img.astype(float)).max()
    assert err <= 6.0 * qstep + 1.0


@settings(max_examples=25, deadline=None)
@given(
    blk=st.integers(8, 200), per_tab=st.integers(1, 16),
    n=st.integers(1, 800), seed=st.integers(0, 10_000),
)
def test_hdf4_linked_blocks_random(blk, per_tab, n, seed):
    """SPECIAL_LINKED reassembly is exact for arbitrary block/table
    geometry (multi-table chains, short final blocks)."""
    from gdalcubes_cpp_spark.sources.hdf4 import hdf4_sds_bytes, read_hdf4_bytes

    rng = np.random.RandomState(seed)
    rows = max(1, n // 20)
    a = rng.randint(-30000, 30000, (rows, 20)).astype(np.int16)
    out = read_hdf4_bytes(hdf4_sds_bytes(a, linked=(blk, per_tab)))
    assert (out[0]["data"] == a).all()
