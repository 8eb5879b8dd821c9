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
