"""Integer lon/lat spatial cell grid — the H3/S2 stand-in, as native Spark
column expressions (JVM-side, whole-stage-codegen'd; no Python in the path).

The h3 library is unavailable in this container; a fixed-resolution integer
grid over EPSG:4326 provides the same join-key mechanics (cell cover of a
bbox, equi-join on cell id, bottom-left-corner dedup instead of distinct).
Cell id = cx * 100_000 + cy with cx = floor((lon+180)/cell_deg),
cy = floor((lat+90)/cell_deg); a single BIGINT key that range-partitions
well and is reproducible in any SQL engine (the DuckDB oracle uses the same
formula).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

CY_MOD = 100_000  # supports cell_deg >= ~0.002


def cell_x(lon: Column, cell_deg: float) -> Column:
    return F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long")


def cell_y(lat: Column, cell_deg: float) -> Column:
    return F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long")


def cell_id(lon: Column, lat: Column, cell_deg: float) -> Column:
    return cell_x(lon, cell_deg) * F.lit(CY_MOD) + cell_y(lat, cell_deg)


def cover_cells(
    left: Column, right: Column, bottom: Column, top: Column, cell_deg: float
) -> Column:
    """Array of cell ids covering an axis-aligned bbox (inclusive of edges).

    flatten(transform(seq_x, cx -> transform(seq_y, cy -> cx*M + cy))) —
    pure Catalyst expressions; explode the result to get one row per cell.
    """
    cx0, cx1 = cell_x(left, cell_deg), cell_x(right, cell_deg)
    cy0, cy1 = cell_y(bottom, cell_deg), cell_y(top, cell_deg)
    seq_x = F.sequence(cx0, cx1)
    seq_y = F.sequence(cy0, cy1)
    return F.flatten(
        F.transform(
            seq_x,
            lambda cx: F.transform(seq_y, lambda cy: cx * F.lit(CY_MOD) + cy),
        )
    )


def kring_cells(center_lon: Column, center_lat: Column, cell_deg: float, k: int) -> Column:
    """k-ring neighborhood of the cell containing a point (for kNN lookups)."""
    cx, cy = cell_x(center_lon, cell_deg), cell_y(center_lat, cell_deg)
    seq = F.sequence(F.lit(-k), F.lit(k))
    return F.flatten(
        F.transform(seq, lambda dx: F.transform(seq, lambda dy: (cx + dx) * F.lit(CY_MOD) + cy + dy))
    )
