"""GeoPackage sink for zonal statistics — the reference's vector output
(src/vector_queries.cpp:603-1160: zonal_statistics writes a GPKG whose
"geom" layer holds the features and one attribute table per time slice,
named ``attr_<datetime>``, carries fields ``<band>_<agg>`` joined on fid;
GPKG assembly at :1080+). The container is SQLite (stdlib ``sqlite3``);
the GeoPackage-specific parts implemented here from the OGC GeoPackage
1.2 spec are the application_id/user_version pragmas, the
gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns registry
rows, and the GeoPackageBinary geometry blob (magic 'GP', flags,
envelope, then little-endian WKB — WKB from the OGC Simple Features
spec).

Driver-side interop sink (like write_netcdf / PNG export): the zonal
DataFrame collects feature-level rows (one per zone x time — already
aggregated, thousands not billions), never pixels.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np

from .geom import parse_wkt_geom

GPKG_APP_ID = 0x47504B47  # "GPKG"
GPKG_USER_VERSION = 10200  # GeoPackage 1.2


def _wkb_ring(ring) -> bytes:
    arr = np.asarray(ring, dtype=np.float64)
    return struct.pack("<I", len(arr)) + arr.astype("<f8").tobytes()


def _wkb(kind: str, g) -> bytes:
    """Little-endian ISO WKB for the parsed geometry."""
    if kind == "point":
        return struct.pack("<BI", 1, 1) + struct.pack("<dd", float(g[0]), float(g[1]))
    if kind == "linestring":
        return struct.pack("<BI", 1, 2) + _wkb_ring(g)
    if kind == "polygon":
        return (struct.pack("<BI", 1, 3) + struct.pack("<I", len(g))
                + b"".join(_wkb_ring(r) for r in g))
    if kind == "multipolygon":
        out = struct.pack("<BI", 1, 6) + struct.pack("<I", len(g))
        for rings in g:
            out += (struct.pack("<BI", 1, 3) + struct.pack("<I", len(rings))
                    + b"".join(_wkb_ring(r) for r in rings))
        return out
    raise ValueError(f"unsupported geometry kind {kind!r}")


def _envelope(kind: str, g):
    if kind == "point":
        x, y = float(g[0]), float(g[1])
        return x, x, y, y
    if kind == "linestring":
        a = np.asarray(g, dtype=np.float64)
        return a[:, 0].min(), a[:, 0].max(), a[:, 1].min(), a[:, 1].max()
    rings = g if kind == "polygon" else [r for poly in g for r in poly]
    a = np.vstack([np.asarray(r, dtype=np.float64) for r in rings])
    return a[:, 0].min(), a[:, 0].max(), a[:, 1].min(), a[:, 1].max()


def gpkg_geom_blob(wkt: str, srs_id: int = 4326) -> bytes:
    """GeoPackageBinary: 'GP', version 0, flags (envelope type 1, little
    endian), srs_id, [minx maxx miny maxy], WKB."""
    kind, g = parse_wkt_geom(wkt)
    flags = 0b00000011  # envelope indicator 1 (xy), byte order little
    env = _envelope(kind, g)
    return (b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id)
            + struct.pack("<4d", *env) + _wkb(kind, g))


def read_gpkg_geom_blob(blob: bytes):
    """Independent decode of a GeoPackageBinary blob -> (kind, coords) —
    used by tests to verify the writer from the spec, not via sqlite."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    env_ind = (flags >> 1) & 0x7
    little = flags & 1
    if not little:
        raise ValueError("big-endian blobs not produced here")
    (srs_id,) = struct.unpack_from("<i", blob, 4)
    off = 8 + {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_ind]
    order, gtype = struct.unpack_from("<BI", blob, off)
    off += 5

    def ring(off):
        (n,) = struct.unpack_from("<I", blob, off)
        a = np.frombuffer(blob, dtype="<f8", count=2 * n, offset=off + 4)
        return a.reshape(n, 2).copy(), off + 4 + 16 * n

    if gtype == 1:
        return "point", struct.unpack_from("<dd", blob, off), srs_id
    if gtype == 2:
        r, _ = ring(off)
        return "linestring", r, srs_id
    if gtype == 3:
        (nr,) = struct.unpack_from("<I", blob, off)
        off += 4
        rings = []
        for _ in range(nr):
            r, off = ring(off)
            rings.append(r)
        return "polygon", rings, srs_id
    if gtype == 6:
        (np_,) = struct.unpack_from("<I", blob, off)
        off += 4
        polys = []
        for _ in range(np_):
            _o, _t = struct.unpack_from("<BI", blob, off)
            off += 5
            (nr,) = struct.unpack_from("<I", blob, off)
            off += 4
            rings = []
            for _ in range(nr):
                r, off = ring(off)
                rings.append(r)
            polys.append(rings)
        return "multipolygon", polys, srs_id
    raise ValueError(f"unsupported WKB type {gtype}")


def write_gpkg_zonal(zonal, geoms, view, path: str, srs_id: int = 4326) -> None:
    """zonal_statistics output + the zone geometries -> one GeoPackage.

    ``zonal``: the DataFrame from vector.queries.zonal_statistics
    (fid, it, <band>_<stat>...). ``geoms``: (fid, wkt). Layout mirrors the
    reference: spatial layer 'geom' (fid + geometry), attribute table
    ``attr_<datetime>`` per time slice with the stat fields, joined on
    fid (src/vector_queries.cpp:1027: layer_name = "attr_" + datetime)."""
    stat_cols = [c for c in zonal.columns if c not in ("fid", "it")]
    rows = zonal.collect()  # feature grain: |zones| x |slices| — tiny
    feats = {int(r["fid"]): r["wkt"] for r in geoms.select("fid", "wkt").collect()}

    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(f"PRAGMA application_id = {GPKG_APP_ID}")
        cur.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
        cur.execute("""CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)""")
        cur.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic", 0, "NONE", 0, "undefined", None),
                ("WGS 84", 4326, "EPSG", 4326,
                 'GEOGCS["WGS 84",DATUM["WGS_1984",'
                 'SPHEROID["WGS 84",6378137,298.257223563]],'
                 'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
                 'AUTHORITY["EPSG","4326"]]', None),
            ],
        )
        cur.execute("""CREATE TABLE gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER)""")
        cur.execute("""CREATE TABLE gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")

        # spatial layer
        cur.execute("CREATE TABLE geom (fid INTEGER PRIMARY KEY, geom BLOB)")
        envs = []
        for fid in sorted(feats):
            blob = gpkg_geom_blob(feats[fid], srs_id)
            envs.append(struct.unpack_from("<4d", blob, 8))
            cur.execute("INSERT INTO geom VALUES (?, ?)", (fid, blob))
        env = (min(e[0] for e in envs), max(e[1] for e in envs),
               min(e[2] for e in envs), max(e[3] for e in envs)) if envs else (0, 0, 0, 0)
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, max_x, min_y, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            ("geom", "features", "geom", env[0], env[1], env[2], env[3], srs_id),
        )
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
            ("geom", "geom", "GEOMETRY", srs_id, 0, 0),
        )

        # per-slice attribute tables, the reference's layer naming
        by_it: dict = {}
        for r in rows:
            by_it.setdefault(int(r["it"]), []).append(r)
        for it in sorted(by_it):
            stamp = view.datetime_at(it).isoformat().replace(":", "").replace("-", "")
            tname = f"attr_{stamp}"
            cols = ", ".join(f'"{c}" DOUBLE' for c in stat_cols)
            cur.execute(
                f'CREATE TABLE "{tname}" (fid INTEGER PRIMARY KEY, {cols})'
            )
            ph = ",".join("?" * (1 + len(stat_cols)))
            cur.executemany(
                f'INSERT INTO "{tname}" VALUES ({ph})',
                [
                    (int(r["fid"]), *[
                        None if r[c] is None else float(r[c]) for c in stat_cols
                    ])
                    for r in by_it[it]
                ],
            )
            cur.execute(
                "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id)"
                " VALUES (?,?,?,?)",
                (tname, "attributes", tname, 0),
            )
        con.commit()
    finally:
        con.close()


def _wkt_of(kind: str, g) -> str:
    """Inverse of parse_wkt_geom for the shapes the writer emits."""
    def ring(r):
        return "(" + ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in r) + ")"

    if kind == "point":
        return f"POINT ({float(g[0])!r} {float(g[1])!r})"
    if kind == "linestring":
        return "LINESTRING " + ring(g)
    if kind == "polygon":
        return "POLYGON (" + ", ".join(ring(r) for r in g) + ")"
    if kind == "multipolygon":
        return ("MULTIPOLYGON ("
                + ", ".join("(" + ", ".join(ring(r) for r in rings) + ")"
                            for rings in g) + ")")
    raise ValueError(f"unsupported kind {kind}")


def read_gpkg_zonal(spark, path: str):
    """Read a write_gpkg_zonal container back: -> (geoms DataFrame
    (fid, wkt, srs_id), zonal DataFrame (fid, it, <stat cols>...)).
    The interop loop-closer: geometry blobs decode through the from-spec
    GeoPackageBinary/WKB parser (not a GIS library), attribute layers
    are matched by the reference's attr_<datetime> naming with ``it``
    recovered from the lexicographic slice order."""
    import pandas as pd

    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        (app_id,) = cur.execute("PRAGMA application_id").fetchone()
        if app_id != GPKG_APP_ID:
            raise ValueError("not a GeoPackage (application_id mismatch)")
        geo_rows = []
        for fid, blob in cur.execute("SELECT fid, geom FROM geom ORDER BY fid"):
            kind, g, srs_id = read_gpkg_geom_blob(blob)
            geo_rows.append((int(fid), _wkt_of(kind, g), int(srs_id)))
        attr_tables = [
            r[0] for r in cur.execute(
                "SELECT table_name FROM gpkg_contents "
                "WHERE data_type = 'attributes' AND table_name LIKE 'attr_%' "
                "ORDER BY table_name")
        ]
        frames = []
        for it, tname in enumerate(attr_tables):
            df = pd.read_sql_query(f'SELECT * FROM "{tname}"', con)
            df.insert(1, "it", it)
            frames.append(df)
    finally:
        con.close()
    geoms = spark.createDataFrame(geo_rows, "fid int, wkt string, srs_id int")
    zonal = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    return geoms, zonal
