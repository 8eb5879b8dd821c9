"""GeoPackage zonal sink (src/vector_queries.cpp:603-1160 GPKG output):
container + registry + geometry-blob conformance checked with an
independent reader (sqlite3 stdlib for the container, a from-spec WKB
parser for the blobs), values checked against zonal_statistics."""

import sqlite3
import struct

import numpy as np
import pytest

from gdalcubes_cpp_spark.vector.gpkg import (
    GPKG_APP_ID,
    gpkg_geom_blob,
    read_gpkg_geom_blob,
    write_gpkg_zonal,
)


def test_geom_blob_spec_bytes():
    """Blob layout straight from the OGC GeoPackage 1.2 spec: magic,
    version, flags, srs_id, envelope, then little-endian WKB."""
    blob = gpkg_geom_blob("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))", srs_id=4326)
    assert blob[:2] == b"GP" and blob[2] == 0
    assert blob[3] == 0b11  # xy envelope + little endian
    assert struct.unpack_from("<i", blob, 4)[0] == 4326
    assert struct.unpack_from("<4d", blob, 8) == (0.0, 4.0, 0.0, 3.0)
    order, gtype = struct.unpack_from("<BI", blob, 40)
    assert order == 1 and gtype == 3  # WKB little-endian POLYGON
    kind, rings, srs_id = read_gpkg_geom_blob(blob)
    assert kind == "polygon" and srs_id == 4326
    assert np.array_equal(rings[0][:, 0], [0, 4, 4, 0, 0])


@pytest.mark.parametrize("wkt,kind", [
    ("POINT (3.5 -2.25)", "point"),
    ("LINESTRING (0 0, 1 2, 4 4)", "linestring"),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))",
     "polygon"),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
     "multipolygon"),
])
def test_blob_roundtrip(wkt, kind):
    got_kind, g, _ = read_gpkg_geom_blob(gpkg_geom_blob(wkt))
    assert got_kind == kind


def test_write_gpkg_zonal(spark, tmp_path):
    from gdalcubes_cpp_spark.benchqueries import _formula_cube, _rects_df
    from gdalcubes_cpp_spark.vector.queries import zonal_statistics

    cube = _formula_cube(spark)
    zones = _rects_df(spark)
    z = zonal_statistics(cube, zones, stats=("mean", "count", "min"))
    path = str(tmp_path / "zonal.gpkg")
    write_gpkg_zonal(z, zones, cube.view, path)

    # independent container checks
    con = sqlite3.connect(path)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == GPKG_APP_ID
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"gpkg_spatial_ref_sys", "gpkg_contents",
            "gpkg_geometry_columns", "geom"} <= tables
    # the reference's per-slice attribute-table naming
    attr_tables = sorted(t for t in tables if t.startswith("attr_"))
    assert len(attr_tables) == cube.view.nt
    ctypes = dict(con.execute(
        "SELECT table_name, data_type FROM gpkg_contents").fetchall())
    assert ctypes["geom"] == "features"
    assert all(ctypes[t] == "attributes" for t in attr_tables)

    # geometry blobs decode back to the input rectangles
    want_wkt = {int(r["fid"]): r["wkt"] for r in zones.collect()}
    for fid, blob in con.execute("SELECT fid, geom FROM geom"):
        kind, rings, srs_id = read_gpkg_geom_blob(blob)
        assert kind == "polygon" and srs_id == 4326
        from gdalcubes_cpp_spark.vector.geom import parse_wkt_geom
        _, exp = parse_wkt_geom(want_wkt[fid])
        assert np.allclose(rings[0], np.asarray(exp[0], dtype=np.float64))

    # attribute values match the zonal DataFrame exactly
    zrows = {(int(r["fid"]), int(r["it"])): r for r in z.collect()}
    stat_cols = [c for c in z.columns if c not in ("fid", "it")]
    seen = 0
    for it, t in enumerate(attr_tables):
        cur = con.execute(f'SELECT fid, {", ".join(stat_cols)} FROM "{t}"')
        for row in cur:
            fid = int(row[0])
            want = zrows[(fid, it)]
            for c, got in zip(stat_cols, row[1:]):
                w = want[c]
                assert (got is None and w is None) or got == w, (t, fid, c)
            seen += 1
    assert seen == len(zrows)
    con.close()


def test_read_gpkg_zonal_roundtrip(spark, tmp_path):
    """Write -> read the zonal GeoPackage: geometries come back as the
    original WKT (same float repr discipline as the transform path) and
    every (fid, it, stat) value survives exactly."""
    from gdalcubes_cpp_spark.benchqueries import _formula_cube, _rects_df
    from gdalcubes_cpp_spark.vector.gpkg import read_gpkg_zonal
    from gdalcubes_cpp_spark.vector.queries import zonal_statistics

    cube = _formula_cube(spark)
    zones = _rects_df(spark)
    z = zonal_statistics(cube, zones, stats=("mean", "count", "min"))
    path = str(tmp_path / "zonal.gpkg")
    write_gpkg_zonal(z, zones, cube.view, path)

    geoms, back = read_gpkg_zonal(spark, path)
    want_wkt = {int(r["fid"]): r["wkt"] for r in zones.collect()}
    got_wkt = {int(r["fid"]): r["wkt"] for r in geoms.collect()}
    assert set(got_wkt) == set(want_wkt)
    from gdalcubes_cpp_spark.vector.geom import parse_wkt_geom
    import numpy as np

    for fid in want_wkt:
        ka, ga = parse_wkt_geom(want_wkt[fid])
        kb, gb = parse_wkt_geom(got_wkt[fid])
        assert ka == kb
        assert np.allclose(np.asarray(ga, dtype=object).astype(float).ravel()
                           if ka == "point" else np.concatenate(
                               [np.asarray(r, float).ravel() for r in
                                (ga if ka != "point" else [ga])]),
                           np.concatenate(
                               [np.asarray(r, float).ravel() for r in
                                (gb if kb != "point" else [gb])]),
                           rtol=0, atol=0)
    want = {(int(r["fid"]), int(r["it"])): tuple(
        r[c] for c in z.columns if c not in ("fid", "it"))
        for r in z.collect()}
    got = {(int(r["fid"]), int(r["it"])): tuple(
        r[c] for c in back.columns if c not in ("fid", "it"))
        for r in back.collect()}
    assert want == got
