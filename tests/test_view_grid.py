"""Axis snapping / chunk arithmetic — the test_view.cpp / test_aggregate_time.cpp
analogs (shape assertions on synthetic views, SURVEY.md §5)."""

import math
from datetime import datetime

import pytest

from gdalcubes_cpp_spark.grid import ChunkGrid
from gdalcubes_cpp_spark.view import CubeView, Duration, parse_datetime, period_end


def test_duration_parse():
    assert Duration.parse("P1D") == Duration(1, "D")
    assert Duration.parse("P3M") == Duration(3, "M")
    assert Duration.parse("PT6H") == Duration(6, "H")
    assert str(Duration(5, "MIN")) == "PT5M"
    with pytest.raises(ValueError):
        Duration.parse("P1Y2M")


def test_datetime_granularity_widening():
    # "2000" as range start/end widens to the whole year (src/view.h:365-399)
    assert parse_datetime("2000") == datetime(2000, 1, 1)
    assert period_end("2000") == datetime(2000, 12, 31, 23, 59, 59)
    assert period_end("2000-02") == datetime(2000, 2, 29, 23, 59, 59)  # leap


def test_axis_snap_enlarges():
    # dx that doesn't divide the extent -> extent enlarged symmetrically
    v = CubeView.create(left=0, right=10, bottom=0, top=10, dx=3, dy=3,
                        t0="2020-01-01", t1="2020-01-10", dt="P1D")
    assert v.nx == 4 and v.ny == 4
    assert v.right - v.left == pytest.approx(12)
    assert v.left == pytest.approx(-1) and v.right == pytest.approx(11)


def test_time_axis_p1m_over_year():
    v = CubeView.create(left=0, right=1, bottom=0, top=1, nx=1, ny=1,
                        t0="2000", t1="2000", dt="P1M")
    assert v.nt == 12
    assert v.datetime_at(11) == datetime(2000, 12, 1)


def test_time_axis_p1d_leap_year():
    v = CubeView.create(left=0, right=1, bottom=0, top=1, nx=1, ny=1,
                        t0="2000", t1="2000", dt="P1D")
    assert v.nt == 366


def test_aggregate_time_nt():
    # mirror of test_aggregate_time.cpp:32-46: 365 daily slices -> 12 monthly
    v = CubeView.create(left=0, right=100, bottom=0, top=100, nx=100, ny=100,
                        t0="2019-01-01", t1="2019-12-31", dt="P1D")
    assert v.nt == 365
    assert math.ceil(v.nt / 31) == 12


def test_coord_conventions():
    v = CubeView.create(left=0, right=10, bottom=0, top=10, nx=10, ny=10,
                        t0="2020-01-01", nt=1, dt="P1D")
    # iy increases DOWNWARD (src/view.h:632-638)
    assert v.iy_of(9.9) == 0
    assert v.iy_of(0.1) == 9
    assert v.ix_of(0.1) == 0
    assert v.y_of(0) == pytest.approx(9.5)


def test_chunk_arithmetic():
    v = CubeView.create(left=0, right=100, bottom=0, top=50, nx=100, ny=50,
                        t0="2020-01-01", nt=40, dt="P1D", chunk_size=(16, 32, 32))
    g = ChunkGrid(v)
    assert (g.nct, g.ncy, g.ncx) == (3, 2, 4)
    assert g.count == 24
    cid = g.chunk_id(2, 1, 3)
    assert cid == 2 * 2 * 4 + 1 * 4 + 3  # x-fastest (src/cube.h:652-654)
    assert g.chunk_coords(cid) == (2, 1, 3)
    # boundary clamping (src/cube.h:495-579)
    assert g.chunk_limits(cid) == ((32, 40), (32, 50), (96, 100))
    assert g.chunk_shape(cid) == (8, 18, 4)
    assert g.chunk_of_cell(33, 33, 97) == cid
    b = g.chunk_bounds(0)
    # y flip: chunk row 0 is at the TOP (src/cube.h:676-694)
    assert b["top"] == 50.0 and b["bottom"] == 50.0 - 32 * v.dy


def test_labeled_time_axis():
    v = CubeView.create(left=0, right=1, bottom=0, top=1, nx=1, ny=1,
                        time_labels=["2020-01-05", "2020-03-01", "2020-07-15"])
    assert v.nt == 3 and v.labeled
    assert v.datetime_at(1) == datetime(2020, 3, 1)
    assert v.time_index_of(datetime(2020, 3, 2)) == 1
    assert v.time_index_of(datetime(2020, 7, 15)) == 2


def test_view_json_roundtrip():
    v = CubeView.create(left=0, right=10, bottom=0, top=10, nx=10, ny=10,
                        t0="2020-01-01", t1="2020-02-01", dt="P1D",
                        aggregation="median", resampling="bilinear")
    v2 = CubeView.from_json(v.to_json())
    assert v2 == v


def test_add_duration_month_clamps():
    """Month/year arithmetic clamps day-of-month to the last valid day
    (reference src/datetime.h operator+; ADVICE r1: replace() crashed)."""
    from gdalcubes_cpp_spark.view import add_duration

    assert add_duration(datetime(2020, 1, 31), Duration(1, "M")) == datetime(2020, 2, 29)
    assert add_duration(datetime(2019, 1, 31), Duration(1, "M")) == datetime(2019, 2, 28)
    assert add_duration(datetime(2020, 1, 31), Duration(2, "M")) == datetime(2020, 3, 31)
    assert add_duration(datetime(2020, 2, 29), Duration(1, "Y")) == datetime(2021, 2, 28)
    assert add_duration(datetime(2020, 3, 31), Duration(1, "M"), k=-1) == datetime(2020, 2, 29)
    # a monthly view whose t0 is day 31 must construct and index cleanly
    v = CubeView.create(left=0, right=10, bottom=0, top=10, nx=10, ny=10,
                        t0="2020-01-31", nt=14, dt="P1M")
    assert v.datetime_at(1) == datetime(2020, 2, 29)
    assert v.t_end == datetime(2021, 3, 31)


def test_labeled_slot_index_exact_only():
    """Build-kernel slot assignment on a labeled axis accepts EXACT labels
    only (off-label timestamps drop, both build strategies agree); the
    slicing helper time_index_of still buckets down."""
    labels = ["2020-01-05", "2020-02-10", "2020-03-15"]
    v = CubeView.create(left=0, right=10, bottom=0, top=10, nx=10, ny=10,
                        time_labels=labels)
    assert v.slot_index_of(datetime(2020, 2, 10)) == 1
    assert v.slot_index_of(datetime(2020, 2, 11)) == -1  # off-label -> drop
    assert v.slot_index_of(datetime(2019, 12, 31)) == -1
    assert v.time_index_of(datetime(2020, 2, 11)) == 1   # bucketing for slices
