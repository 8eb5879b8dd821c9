"""Vector file ingest (vector/features.py): GeoJSON + Shapefile/DBF/PRJ
parsing, spec structure, SRS auto-reproject, and equivalence of
extract_geom over file-ingested vs WKT-DataFrame features."""

import json
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdalcubes_cpp_spark.vector.features import (
    _dbf_records,
    _srs_from_prj,
    geojson_rows,
    read_features,
    shp_rows,
    write_geojson,
    write_shp,
)

RECT = "POLYGON ((1.0 1.0, 5.0 1.0, 5.0 4.0, 1.0 4.0, 1.0 1.0))"
HOLEY = ("POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), "
         "(2.0 2.0, 4.0 2.0, 4.0 4.0, 2.0 4.0, 2.0 2.0))")
MULTI = ("MULTIPOLYGON (((20.0 0.0, 24.0 0.0, 24.0 4.0, 20.0 4.0, 20.0 0.0)), "
         "((30.0 0.0, 32.0 0.0, 32.0 2.0, 30.0 2.0, 30.0 0.0)))")


def _containment(wkt, probes):
    from gdalcubes_cpp_spark.vector.geom import parse_wkt_geom, points_in_geom

    kind, g = parse_wkt_geom(wkt)
    px = np.array([p[0] for p in probes], float)
    py = np.array([p[1] for p in probes], float)
    return list(points_in_geom(px, py, kind, g))


def test_geojson_feature_collection(tmp_path):
    p = str(tmp_path / "f.geojson")
    write_geojson(p, [(7, RECT, {"name": "a", "v": 2}),
                      (9, "POINT (1.5 2.5)", {"name": "b"})])
    rows = geojson_rows(open(p).read())
    assert rows[0][0] == 7 and rows[0][1] == RECT
    assert json.loads(rows[0][2]) == {"name": "a", "v": 2}
    assert rows[1] == (9, "POINT (1.5 2.5)", '{"name": "b"}')


def test_geojson_variants():
    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {
            "type": "MultiPolygon",
            "coordinates": [[[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]],
                            [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]]]},
         "properties": {"k": 1}},
        {"type": "Feature", "geometry": {
            "type": "LineString", "coordinates": [[0, 0], [3, 4]]},
         "properties": None},
        {"type": "Feature", "geometry": None, "properties": {}},
        {"type": "Feature", "id": "not-an-int", "geometry": {
            "type": "Point", "coordinates": [1, 2]}, "properties": {}},
    ]}
    rows = geojson_rows(json.dumps(gj))
    assert rows[0][1].startswith("MULTIPOLYGON ((")
    assert _containment(rows[0][1], [(1, 1), (5.5, 5.5), (3, 3)]) == \
        [True, True, False]
    assert rows[1][1] == "LINESTRING (0.0 0.0, 3.0 4.0)"
    assert rows[2][0] == 3 and rows[2][1] == "POINT (1.0 2.0)"  # seq fid
    # bare geometry (no FeatureCollection wrapper)
    assert geojson_rows('{"type": "Point", "coordinates": [7, 8]}') == \
        [(0, "POINT (7.0 8.0)", "{}")]
    with pytest.raises(ValueError, match="unsupported GeoJSON"):
        geojson_rows('{"type": "Feature", "geometry": {"type": "Weird", '
                     '"coordinates": []}, "properties": {}}')


def test_shp_roundtrip_semantics(tmp_path):
    """Ring orientation per the spec (outer CW, holes CCW) must come back
    as the same REGIONS (containment-equivalent; vertex order may flip)."""
    base = str(tmp_path / "t")
    write_shp(base, [HOLEY, MULTI], attrs=[{"n": 1, "s": "x"},
                                           {"n": 2, "s": "yy"}])
    rows = shp_rows(open(base + ".shp", "rb").read(),
                    open(base + ".dbf", "rb").read())
    assert [r[0] for r in rows] == [1, 2]
    probes = [(5, 5), (3, 3), (0.5, 0.5), (21, 1), (31, 1), (26, 1)]
    assert _containment(rows[0][1], probes) == \
        _containment(HOLEY, probes)
    assert _containment(rows[1][1], probes) == \
        _containment(MULTI, probes)
    assert json.loads(rows[0][2]) == {"n": 1, "s": "x"}
    assert json.loads(rows[1][2]) == {"n": 2, "s": "yy"}


def test_shp_golden_structure(tmp_path):
    """On-disk conformance (ESRI spec): file code 9994 BE, length in
    16-bit words, version 1000 LE, record frames numbered from 1."""
    base = str(tmp_path / "g")
    write_shp(base, [RECT])
    raw = open(base + ".shp", "rb").read()
    assert struct.unpack(">i", raw[:4])[0] == 9994
    assert struct.unpack(">i", raw[24:28])[0] * 2 == len(raw)
    version, stype = struct.unpack("<ii", raw[28:36])
    assert (version, stype) == (1000, 5)
    recno, clen = struct.unpack(">ii", raw[100:108])
    assert recno == 1
    assert struct.unpack("<i", raw[108:112])[0] == 5
    # .shx index entry points at the first record's content
    shx = open(base + ".shx", "rb").read()
    off, ln = struct.unpack(">ii", shx[100:108])
    assert off * 2 == 100 and ln == clen


def test_shp_z_variant_reads_xy(tmp_path):
    """PointZ/PolygonZ read their XY prefix (Z/M arrays trail and are
    skipped)."""
    base = str(tmp_path / "z")
    write_shp(base, [RECT])
    raw = bytearray(open(base + ".shp", "rb").read())
    struct.pack_into("<i", raw, 32, 15)    # header type -> PolygonZ
    struct.pack_into("<i", raw, 108, 15)   # record type -> PolygonZ
    rows = shp_rows(bytes(raw))
    probes = [(3, 3), (0.5, 0.5)]
    assert _containment(rows[0][1], probes) == _containment(RECT, probes)


def test_shp_refusals():
    with pytest.raises(ValueError, match="file code"):
        shp_rows(b"\x00" * 120)
    good = bytearray(struct.pack(">i", 9994) + b"\x00" * 20
                     + struct.pack(">i", 58) + struct.pack("<ii", 1000, 99)
                     + b"\x00" * 64)
    good += struct.pack(">ii", 1, 2) + struct.pack("<i", 99)
    with pytest.raises(NotImplementedError, match="shape type"):
        shp_rows(bytes(good))


def test_dbf_types():
    from gdalcubes_cpp_spark.vector.features import _dbf_bytes

    recs = [{"i": 3, "f": 1.5, "s": "ab", "b": True},
            {"i": None, "f": -2.25, "s": "", "b": False}]
    out = _dbf_records(_dbf_bytes(recs))
    assert out[0]["i"] == 3 and out[0]["f"] == 1.5
    assert out[0]["s"] == "ab" and out[0]["b"] == "True"  # bools go C-field
    assert out[1]["i"] is None and out[1]["f"] == -2.25


def test_prj_srs_detection():
    assert _srs_from_prj(
        'PROJCS["x",GEOGCS["y",DATUM["d",SPHEROID["s",1,2]]],'
        'AUTHORITY["EPSG","32632"]]') == "EPSG:32632"
    assert _srs_from_prj('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                         'SPHEROID["WGS_1984",6378137,298.257223563]]]') \
        == "EPSG:4326"
    assert _srs_from_prj('PROJCS["mystery"]') is None


def _mini_cube(spark):
    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=8.0, bottom=0.0, top=6.0, nx=16,
                        ny=12, t0="2020-01-01", nt=2, dt="P1D",
                        chunk_size=(2, 6, 8))
    return formula_cube(spark, v, {"B1": "CAST(it*100 + iy*16 + ix AS DOUBLE)"})


def test_extract_geom_from_files_matches_wkt(spark, tmp_path):
    """read_features(GeoJSON) and read_features(SHP) drive extract_geom to
    the SAME rows as the in-memory WKT DataFrame (OGR-source parity)."""
    import pandas as pd

    from gdalcubes_cpp_spark.vector.queries import extract_geom

    cube = _mini_cube(spark)
    wkts = [(1, "POLYGON ((1.0 1.0, 4.0 1.0, 4.0 3.0, 1.0 3.0, 1.0 1.0))"),
            (2, "POLYGON ((5.0 2.0, 7.0 2.0, 7.0 5.0, 5.0 5.0, 5.0 2.0))")]
    ref_df = spark.createDataFrame(pd.DataFrame(wkts, columns=["fid", "wkt"]))
    want = sorted(map(tuple, extract_geom(cube, ref_df).collect()))
    assert want  # non-degenerate fixture

    gj = str(tmp_path / "f.geojson")
    write_geojson(gj, [(fid, w, {}) for fid, w in wkts])
    got_gj = read_features(spark, gj)
    assert got_gj.columns == ["fid", "wkt", "props"]
    got = sorted(map(tuple, extract_geom(cube, got_gj).collect()))
    assert got == want

    base = str(tmp_path / "f")
    write_shp(base, [w for _fid, w in wkts])
    with open(base + ".prj", "w") as f:
        f.write('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984"]]')
    got_shp = read_features(spark, base + ".shp")  # fids = record numbers
    got = sorted(map(tuple, extract_geom(cube, got_shp).collect()))
    assert got == want


def test_read_features_multi_path_distributed(spark, tmp_path):
    """A path LIST fans out one file per task; per-file fid offsets keep
    fids globally unique."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f"p{i}.geojson")
        write_geojson(p, [(0, f"POINT ({float(i)!r} 0.0)", {"file": i})])
        paths.append(p)
    df = read_features(spark, paths)
    rows = df.collect()
    assert len(rows) == 3
    assert len({r.fid for r in rows}) == 3
    assert sorted(json.loads(r.props)["file"] for r in rows) == [0, 1, 2]


def test_read_features_reprojects_to_view(spark, tmp_path):
    """A UTM .prj + a 4326 view triggers transform_features; a 4326
    source is passed through byte-identical."""
    from gdalcubes_cpp_spark import srs as _srs
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(left=0.0, right=12.0, bottom=40.0, top=55.0, nx=12,
                        ny=15, t0="2020-01-01", nt=1, dt="P1D")
    # a rectangle in EPSG:32632 around (9E, 48N)
    lon, lat = np.array([8.9, 9.1]), np.array([47.9, 48.1])
    ex, ey = _srs.from_wgs84(np.array([8.9, 9.1]), np.array([47.9, 48.1]),
                             "EPSG:32632")
    wkt = (f"POLYGON (({ex[0]!r} {ey[0]!r}, {ex[1]!r} {ey[0]!r}, "
           f"{ex[1]!r} {ey[1]!r}, {ex[0]!r} {ey[1]!r}, {ex[0]!r} {ey[0]!r}))")
    base = str(tmp_path / "utm")
    write_shp(base, [wkt])
    with open(base + ".prj", "w") as f:
        f.write('PROJCS["WGS 84 / UTM zone 32N",AUTHORITY["EPSG","32632"]]')
    out = read_features(spark, base + ".shp", view=v).collect()[0]
    from gdalcubes_cpp_spark.vector.geom import geom_bbox

    x0, x1, y0, y1 = geom_bbox(out.wkt)
    assert abs(x0 - 8.9) < 2e-3 and abs(x1 - 9.1) < 2e-3
    assert abs(y0 - 47.9) < 2e-3 and abs(y1 - 48.1) < 2e-3

    gj = str(tmp_path / "ll.geojson")
    write_geojson(gj, [(1, "POINT (9.0 48.0)", {})])
    got = read_features(spark, gj, view=v).collect()[0]
    assert got.wkt == "POINT (9.0 48.0)"


def test_read_features_gpkg(spark, tmp_path):
    """GeoPackage feature layers (the modern OGR default) read through
    the from-spec GeoPackageBinary/WKB parser: fid + geometry + attribute
    columns as props, SRS from gpkg_geometry_columns."""
    import sqlite3

    from gdalcubes_cpp_spark.vector.gpkg import GPKG_APP_ID, gpkg_geom_blob
    from gdalcubes_cpp_spark.vector.queries import extract_geom

    p = str(tmp_path / "zones.gpkg")
    con = sqlite3.connect(p)
    cur = con.cursor()
    cur.execute(f"PRAGMA application_id = {GPKG_APP_ID}")
    cur.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT, "
                "column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, "
                "z TINYINT, m TINYINT)")
    cur.execute("INSERT INTO gpkg_geometry_columns VALUES "
                "('zones','geom','GEOMETRY',4326,0,0)")
    cur.execute("CREATE TABLE zones (fid INTEGER PRIMARY KEY, geom BLOB, "
                "name TEXT, score DOUBLE)")
    wkts = {1: "POLYGON ((1.0 1.0, 4.0 1.0, 4.0 3.0, 1.0 3.0, 1.0 1.0))",
            2: "POLYGON ((5.0 2.0, 7.0 2.0, 7.0 5.0, 5.0 5.0, 5.0 2.0))"}
    for fid, w in wkts.items():
        cur.execute("INSERT INTO zones VALUES (?,?,?,?)",
                    (fid, gpkg_geom_blob(w), f"z{fid}", fid * 1.5))
    con.commit()
    con.close()

    feats = read_features(spark, p)
    rows = {r.fid: r for r in feats.collect()}
    assert set(rows) == {1, 2}
    probes = [(2.0, 2.0), (6.0, 3.0), (0.1, 0.1)]
    for fid in (1, 2):
        assert _containment(rows[fid].wkt, probes) == \
            _containment(wkts[fid], probes)
        assert json.loads(rows[fid].props) == {"name": f"z{fid}",
                                               "score": fid * 1.5}
    # drives extract_geom identically to the in-memory WKT table
    import pandas as pd

    cube = _mini_cube(spark)
    ref = spark.createDataFrame(pd.DataFrame(
        [(k, v) for k, v in wkts.items()], columns=["fid", "wkt"]))
    want = sorted(map(tuple, extract_geom(cube, ref).collect()))
    got = sorted(map(tuple, extract_geom(cube, feats).collect()))
    assert got == want and want
    with pytest.raises(ValueError, match="no GeoPackage layer"):
        read_features(spark, p, layer="nope")


def test_gpkg_quoted_identifiers_no_injection(tmp_path):
    """Table/column names come from an UNTRUSTED file's metadata table; a
    name embedding a double quote is a legal sqlite identifier and must be
    read via proper escaping, not break out of the quoted identifier."""
    import sqlite3

    from gdalcubes_cpp_spark.vector.features import gpkg_rows
    from gdalcubes_cpp_spark.vector.gpkg import GPKG_APP_ID, gpkg_geom_blob

    p = str(tmp_path / "evil.gpkg")
    con = sqlite3.connect(p)
    cur = con.cursor()
    cur.execute(f"PRAGMA application_id = {GPKG_APP_ID}")
    cur.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT, "
                "column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, "
                "z TINYINT, m TINYINT)")
    tname = 'zo"nes'
    cur.execute("INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
                (tname, "geom", "GEOMETRY", 4326, 0, 0))
    cur.execute('CREATE TABLE "zo""nes" (fid INTEGER PRIMARY KEY, '
                'geom BLOB, "na""me" TEXT)')
    cur.execute('INSERT INTO "zo""nes" VALUES (?,?,?)',
                (7, gpkg_geom_blob("POINT (1.0 2.0)"), "ok"))
    con.commit()
    con.close()

    rows, srs = gpkg_rows(p)
    assert srs == "EPSG:4326"
    assert len(rows) == 1
    fid, wkt, props = rows[0]
    assert fid == 7 and wkt.startswith("POINT")
    assert json.loads(props) == {'na"me': "ok"}
