"""window_space — spatial focal window via halo-advertise + one groupBy.
Value-checked against a straight-line numpy oracle (truncated windows for
reducers, zero-padding for kernels), including NaN cells and view edges."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdalcubes_cpp_spark.sources.collection import formula_cube
from gdalcubes_cpp_spark.view import CubeView


def _view():
    return CubeView.create(
        left=0.0, right=8.0, bottom=0.0, top=6.0, nx=8, ny=6,
        t0="2020-01-01", t1="2020-03-31", dt="P1M",
        aggregation="mean", resampling="near", chunk_size=(2, 3, 4),
    )


def _cube(spark):
    # deterministic values with NULL holes
    expr = "CASE WHEN (it*48 + iy*8 + ix) % 7 = 3 THEN NULL " \
           "ELSE CAST(it*100 + iy*10 + ix AS DOUBLE) END"
    return formula_cube(spark, _view(), {"B1": expr})


def _grid(v):
    g = np.full((v.nt, v.ny, v.nx), np.nan)
    for it in range(v.nt):
        for iy in range(v.ny):
            for ix in range(v.nx):
                if (it * 48 + iy * 8 + ix) % 7 != 3:
                    g[it, iy, ix] = it * 100 + iy * 10 + ix
    return g


def _collect(cube, col):
    return {
        (r["it"], r["iy"], r["ix"]): r[col]
        for r in cube.df.collect()
    }


@pytest.mark.parametrize("red,np_fn", [
    ("mean", np.nanmean), ("min", np.nanmin), ("max", np.nanmax),
    ("sum", np.nansum), ("median", np.nanmedian),
])
def test_window_space_reducers(spark, red, np_fn):
    v = _view()
    got = _collect(_cube(spark).window_space((1, 1), reducers=[(red, "B1")]), f"B1_{red}")
    g = _grid(v)
    import warnings

    for it in range(v.nt):
        for iy in range(v.ny):
            for ix in range(v.nx):
                win = g[it, max(0, iy - 1):iy + 2, max(0, ix - 1):ix + 2]
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    want = np_fn(win)
                have = got.get((it, iy, ix))
                if np.isnan(want) or (red == "sum" and np.isnan(win).all()):
                    # all-NaN window: engine yields NULL (nansum would say 0)
                    assert have is None or (isinstance(have, float) and math.isnan(have)), (it, iy, ix)
                else:
                    assert have is not None and abs(have - want) < 1e-9, (it, iy, ix, have, want)


def test_window_space_count(spark):
    v = _view()
    got = _collect(_cube(spark).window_space((1, 1), reducers=[("count", "B1")]), "B1_count")
    g = _grid(v)
    for (it, iy, ix), have in got.items():
        win = g[it, max(0, iy - 1):iy + 2, max(0, ix - 1):ix + 2]
        assert have == np.count_nonzero(~np.isnan(win))


def test_window_space_kernel_zero_padding(spark):
    """3x3 Gaussian-ish kernel: NaN cells and out-of-view cells contribute
    0 (zero padding) — same accumulate rule as the time kernel."""
    v = _view()
    k = [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]]
    got = _collect(_cube(spark).window_space((1, 1), kernel=k), "B1")
    g = _grid(v)
    for it in range(v.nt):
        for iy in range(v.ny):
            for ix in range(v.nx):
                want = 0.0
                for oy in (-1, 0, 1):
                    for ox in (-1, 0, 1):
                        sy, sx = iy + oy, ix + ox
                        if 0 <= sy < v.ny and 0 <= sx < v.nx and not np.isnan(g[it, sy, sx]):
                            want += g[it, sy, sx] * k[oy + 1][ox + 1]
                have = got.get((it, iy, ix))
                assert have is not None and abs(have - want) < 1e-9, (it, iy, ix)


def test_window_space_asymmetric_and_errors(spark):
    c = _cube(spark)
    out = c.window_space((0, 2), reducers=[("mean", "B1")])  # 1x5 row window
    assert out.df.count() > 0
    with pytest.raises(ValueError):
        c.window_space((1, 1), kernel=[[1.0, 2.0]])  # wrong shape
    with pytest.raises(ValueError):
        c.window_space((1, 1), reducers=[("var", "B1")])  # not a window reducer


def test_predict_linear_model(spark):
    """Cube.predict: fit a pyspark.ml LinearRegression on extracted pixel
    samples where target = 3*B1 + 2 exactly, apply over the full cube —
    predictions recover the relation to 1e-6; NULL-feature cells pass
    through with NULL prediction; no join/shuffle beyond the model map."""
    from pyspark.ml.regression import LinearRegression

    c = _cube(spark)
    train = (
        c.df.filter(F.col("B1").isNotNull())
        .withColumn("y", 3 * F.col("B1") + 2)
        .limit(60)
    )
    from pyspark.ml.feature import VectorAssembler

    fit_in = VectorAssembler(inputCols=["B1"], outputCol="features").transform(train)
    model = LinearRegression(featuresCol="features", labelCol="y").fit(fit_in)
    out = c.predict(model, feature_bands=["B1"]).df.collect()
    assert len(out) == _view().nt * _view().ny * _view().nx
    for r in out:
        if r["B1"] is None:
            assert r["prediction"] is None
        else:
            assert abs(r["prediction"] - (3 * r["B1"] + 2)) < 1e-6
    plan = c.predict(model, feature_bands=["B1"]).df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_reduce_time_trend(spark):
    """slope/intercept reducers vs numpy least squares per pixel
    (NULL slices drop out pairwise)."""
    v = _view()
    got = {
        (r["iy"], r["ix"]): (r["B1_slope"], r["B1_intercept"])
        for r in _cube(spark).reduce_time(
            [("slope", "B1"), ("intercept", "B1")]
        ).df.collect()
    }
    g = _grid(v)
    for iy in range(v.ny):
        for ix in range(v.nx):
            series = g[:, iy, ix]
            its = np.where(~np.isnan(series))[0]
            s_have, i_have = got[(iy, ix)]
            if len(its) < 2 or len(set(its)) < 2:
                assert s_have is None
                continue
            slope, intercept = np.polyfit(its, series[its], 1)
            assert abs(s_have - slope) < 1e-9, (iy, ix)
            assert abs(i_have - intercept) < 1e-9, (iy, ix)
