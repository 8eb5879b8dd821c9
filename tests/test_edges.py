"""Adversarial edge cases: boundaries, empties, labeled-axis reductions."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdalcubes_cpp_spark.sources.collection import empty_cube
from gdalcubes_cpp_spark.view import CubeView

from .test_ops import cube_from_dense, make_dense


def test_empty_cube_through_operators(spark):
    v = CubeView.create(left=0, right=8, bottom=0, top=8, nx=8, ny=8,
                        t0="2020-01-01", nt=4, dt="P1D")
    c = empty_cube(spark, v, bands=("B1",))
    assert c.reduce_time([("mean", "B1")]).df.count() == 0
    assert c.window_time((1, 1), reducers=[("mean", "B1")]).df.count() == 0
    assert c.fill_time("linear").df.count() == 0
    assert c.aggregate_time(fact=2, func="max").df.count() == 0
    assert c.crop(it_range=(1, 3)).df.count() == 0
    assert c.fill_space_knn(k=1).df.count() == 0


def test_crop_out_of_range_is_empty(spark):
    dense = make_dense(seed=9)
    c, v = cube_from_dense(spark, dense)
    assert c.crop(it_range=(v.nt + 5, v.nt + 7)).df.count() == 0
    assert c.crop(ix_range=(v.nx, v.nx + 2)).df.count() == 0


def test_labeled_axis_reduce_which(spark):
    """which_min on a labeled (irregular) time axis must use the label
    datetimes for the numeric output."""
    dense = make_dense(seed=13)
    c, v = cube_from_dense(spark, dense)
    sel = c.select_time([1, 4, 6])
    red = sel.reduce_time([("which_min", "B1")])
    got = red.collect_dense()
    sub = dense[0][[1, 4, 6]]
    labels = [v.datetime_at(i) for i in (1, 4, 6)]
    for iy in range(dense.shape[2]):
        for ix in range(dense.shape[3]):
            col = sub[:, iy, ix]
            if np.isfinite(col).any():
                k = int(np.nanargmin(col))
                want = float(labels[k].strftime("%Y%m%d%H%M%S"))
                assert got[0, 0, iy, ix] == want, (iy, ix)


def test_query_points_on_boundaries(spark):
    dense = make_dense(seed=15)
    c, v = cube_from_dense(spark, dense)
    from gdalcubes_cpp_spark.vector.queries import query_points

    pts = pd.DataFrame({
        "point_id": [1, 2, 3],
        # x == right edge -> ix == nx -> out; x == left edge -> ix = 0 in
        "x": [float(v.nx), 0.0, 2.0],
        "y": [2.0, float(v.ny), 2.0],   # y == top edge -> iy = 0 in
        "t": pd.to_datetime(["2020-01-02"] * 3),
    })
    out = query_points(c, spark.createDataFrame(pts)).toPandas()
    assert 1 not in set(out["point_id"])  # right edge is exclusive
    for pid, iy, ix in [(2, 0, 0), (3, int((v.top - 2.0) / v.dy), 2)]:
        sel = out[out["point_id"] == pid]
        if len(sel):
            assert (sel["iy"] == iy).all() and (sel["ix"] == ix).all()


def test_extract_geom_outside_view(spark):
    dense = make_dense(seed=17)
    c, _ = cube_from_dense(spark, dense)
    from gdalcubes_cpp_spark.vector.queries import extract_geom

    polys = pd.DataFrame({"fid": [1], "wkt": ["POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))"]})
    assert extract_geom(c, spark.createDataFrame(polys)).count() == 0


def test_image_touching_view_edge_joins_but_contributes_nothing(spark):
    """A footprint touching the view boundary from outside joins (strict-<
    disjoint test: touching intersects) but no cell center is covered."""
    from gdalcubes_cpp_spark import synth
    from gdalcubes_cpp_spark.grid import ChunkGrid
    from gdalcubes_cpp_spark.operators.build import build_cube
    from gdalcubes_cpp_spark.operators.stjoin import assignment

    v = CubeView.create(left=0, right=4, bottom=0, top=4, nx=8, ny=8,
                        t0="2020-01-01", nt=2, dt="P1M",
                        aggregation="mean", chunk_size=(2, 8, 8))
    row = synth.images_pdf(1).iloc[0:1].copy()
    row["left"], row["right"] = -1.0, 0.0   # touches view left edge
    row["bottom"], row["top"] = 1.0, 2.0
    row["ts"] = pd.Timestamp("2020-01-15")
    imgs = spark.createDataFrame(row)
    assert assignment(imgs, ChunkGrid(v)).count() == 1  # touching -> joins
    for strategy in ("chunk_kernel", "cell_long"):
        assert build_cube(imgs, v, strategy=strategy).df.count() == 0
