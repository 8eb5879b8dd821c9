"""Exact S2-bucketed kNN join (functions/s2.s2_knn_join) vs brute force.

The operator claims EXACT top-k regardless of strategy: cell-join rounds
with radius doubling, a completeness proof per resolved point (k-th
distance <= r and the disc provably inside the covered box), and a
brute-force tail for the pathological residue (poles, antimeridian,
isolated points). The oracle here is a per-query numpy brute force with
identical (haversine, b_id) ordering; the point set deliberately hits
every path: dense region (round-1 resolve), an isolated point (radius
escalation into the brute tail), a pole-adjacent query (full=false ->
brute), an antimeridian straddle (box clip -> brute), and duplicate
coordinates (exact ties broken by b_id).
"""

import math
import random

import numpy as np
import pytest

from gdalcubes_cpp_spark.functions import s2


def _np_hav(alon, alat, blon, blat):
    dla = np.radians(blat - alat) / 2.0
    dlo = np.radians(blon - alon) / 2.0
    h = np.sin(dla) ** 2 + np.cos(np.radians(alat)) * np.cos(np.radians(blat)) * np.sin(dlo) ** 2
    return np.degrees(2.0 * np.arcsin(np.sqrt(h)))


def _points(seed=7):
    rng = random.Random(seed)
    b = [("b%03d" % i, rng.uniform(-30, 30), rng.uniform(-20, 40)) for i in range(220)]
    b += [
        ("bpole1", 10.0, 89.96), ("bpole2", -170.0, 89.97),
        ("bam1", 179.95, 10.0), ("bam2", -179.95, 10.05),
        ("bdup1", 5.0, 5.0), ("bdup2", 5.0, 5.0),
        ("biso", 120.0, -75.0),
    ]
    a = [("a%02d" % i, rng.uniform(-30, 30), rng.uniform(-20, 40)) for i in range(40)]
    a += [
        ("apole", 30.0, 89.95),
        ("aam", 179.99, 10.0),
        ("aiso", 119.0, -74.5),
        ("adup", 5.0, 5.0),
    ]
    return a, b


def _brute(a, b, k, exclude_self=False):
    want = {}
    for aid, alon, alat in a:
        cand = []
        for bid, blon, blat in b:
            if exclude_self and bid == aid:
                continue
            d = float(_np_hav(alon, alat, blon, blat))
            cand.append((d, bid))
        cand.sort()
        want[aid] = [(bid, r + 1, d) for r, (d, bid) in enumerate(cand[:k])]
    return want


def _run(spark, a, b, k, **kw):
    adf = spark.createDataFrame([(i, float(x), float(y)) for i, x, y in a],
                                "a_id string, lon double, lat double")
    bdf = spark.createDataFrame([(i, float(x), float(y)) for i, x, y in b],
                                "b_id string, lon double, lat double")
    out = s2.s2_knn_join(adf, bdf, k, **kw).collect()
    got = {}
    for r in out:
        got.setdefault(r.a_id, []).append((r.rank, r.b_id, r.dist_deg))
    return {aid: [(bid, rk, d) for rk, bid, d in sorted(rows)] for aid, rows in got.items()}


def _check(got, want):
    assert set(got) == set(want)
    for aid in want:
        gs = [(bid, rk) for bid, rk, _ in got[aid]]
        ws = [(bid, rk) for bid, rk, _ in want[aid]]
        assert gs == ws, (aid, gs, ws)
        for (gb, gr, gd), (wb, wr, wd) in zip(got[aid], want[aid]):
            assert gd == pytest.approx(wd, abs=1e-9)


def test_knn_exact_all_paths(spark):
    a, b = _points()
    got = _run(spark, a, b, 3, init_radius_deg=0.5, max_rounds=4)
    _check(got, _brute(a, b, 3))


def test_knn_min_gap_guard(spark):
    # the fixed-seed point set must keep cross-engine rank order stable:
    # the gap between consecutive candidate distances near the top-k
    # boundary has to dwarf the ~1e-14 libm divergence
    a, b = _points()
    for aid, alon, alat in a:
        d = np.sort(_np_hav(alon, alat,
                            np.array([x for _, x, _ in b]),
                            np.array([y for _, _, y in b])))
        gaps = np.diff(d[:6])
        gaps = gaps[gaps > 0]  # exact duplicate-coord ties are b_id-broken
        assert gaps.min() > 1e-9


def test_knn_exclude_self(spark):
    _, b = _points()
    a = [(bid, lon, lat) for bid, lon, lat in b[:25]]
    got = _run(spark, a, b, 2, init_radius_deg=0.5, max_rounds=4, exclude_self=True)
    want = _brute(a, b, 2, exclude_self=True)
    _check(got, want)
    for aid, rows in got.items():
        assert all(bid != aid for bid, _, _ in rows)


def test_knn_k_exceeds_b(spark):
    a = [("a0", 0.0, 0.0), ("a1", 10.0, 10.0)]
    b = [("b0", 1.0, 1.0), ("b1", -2.0, 3.0)]
    got = _run(spark, a, b, 5, init_radius_deg=1.0, max_rounds=3)
    _check(got, _brute(a, b, 5))
    assert all(len(rows) == 2 for rows in got.values())


def test_knn_single_round_dense(spark):
    rng = random.Random(3)
    b = [("b%03d" % i, rng.uniform(0, 2), rng.uniform(0, 2)) for i in range(300)]
    a = [("a%02d" % i, rng.uniform(0.5, 1.5), rng.uniform(0.5, 1.5)) for i in range(20)]
    got = _run(spark, a, b, 4, init_radius_deg=0.4, max_rounds=2)
    _check(got, _brute(a, b, 4))


# ---------------------------------------------------------------- driver set
# Margin guards for the REGISTERED s2_knn/s2_suite query: the oracle is a
# DuckDB cross-join window over the same md5-jittered points, so rank order
# and round(,6) values must be immune to ~1e-14 libm divergence. Both are
# properties of the deterministic point set — assert them here at both SFs.

import hashlib

import pyarrow.parquet as pq


def _driver_points(sf_dir):
    ok = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    ids = ["%010d" % k for k in ok.column(0).to_pylist()]

    def u(tag, i):
        return int(hashlib.md5((tag + i).encode()).hexdigest()[:15], 16) / float(1 << 60)

    lon = np.array([-20.0 + u("knnx", i) * 40.0 for i in ids])
    lat = np.array([30.0 + u("knny", i) * 20.0 for i in ids])
    amask = np.array(
        [int(hashlib.md5(("knna" + i).encode()).hexdigest()[:4], 16) % 100 == 0 for i in ids]
    )
    return np.array(ids), lon, lat, amask


def _margins(sf_dir, k=4):
    ids, lon, lat, amask = _driver_points(sf_dir)
    ai = np.where(amask)[0]
    min_gap, min_bound = np.inf, np.inf
    for s in range(0, len(ai), 200):
        chunk = ai[s:s + 200]
        d = _np_hav(lon[chunk][:, None], lat[chunk][:, None], lon[None, :], lat[None, :])
        d[np.arange(len(chunk)), chunk] = np.inf  # exclude self
        part = np.partition(d, k + 2, axis=1)[:, : k + 2]
        part.sort(axis=1)
        gaps = np.diff(part, axis=1)
        min_gap = min(min_gap, gaps[gaps > 0].min())
        frac = np.abs((part[:, :k] * 1e6) % 1.0 - 0.5)
        min_bound = min(min_bound, frac.min())
    return min_gap, min_bound


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_driver_point_set_margins(sf_dir):
    min_gap, min_bound = _margins(sf_dir)
    # libm cross-engine divergence is ~1e-14 deg absolute; require 5+ orders
    # of headroom on rank decisions and on the round(,6) half boundary
    assert min_gap > 1e-8, min_gap
    assert min_bound > 1e-6, min_bound


def test_np_point_leaf_matches_py_reference():
    """The numpy batch point-encode used for s2_knn_join's b-side key must
    agree with the pure-python test reference (py_cell_id) — random sphere
    points plus the bench/driver point distribution."""
    from gdalcubes_cpp_spark.functions.s2 import np_point_leaf, py_cell_id

    rng = np.random.RandomState(11)
    lon = -180.0 + rng.rand(5000) * 360.0
    lat = -90.0 + rng.rand(5000) * 180.0
    got = np_point_leaf(lon, lat)
    want = np.array([py_cell_id(float(a), float(b)) for a, b in zip(lon, lat)])
    np.testing.assert_array_equal(got, want)

    ids, dlon, dlat, _ = _driver_points("/root/testdata/sf0.01")
    got = np_point_leaf(dlon, dlat)
    want = np.array([py_cell_id(float(a), float(b)) for a, b in zip(dlon, dlat)])
    np.testing.assert_array_equal(got, want)
