"""Spatial reference support: EPSG:4326 <-> EPSG:3857 (spherical web
mercator), pure formulas (pyproj/GDAL unavailable in this container).

The reference supports arbitrary SRS through GDAL with a cached transform
(src/warp.cpp:33-55); footprints are always stored in EPSG:4326
(src/image_collection.cpp:309-326) and query rectangles are transformed to
4326 for the find_range_st predicate (src/image_collection.cpp:1326).
We implement the same protocol for the two SRS that cover the synthetic
workload; the transform interface is the extension point for real PROJ.

Web mercator is separable (x depends only on lon, y only on lat) and
monotonic, which the warp kernels exploit: 1-D axis vectors transform
independently.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

R = 6378137.0  # WGS84 spherical radius used by EPSG:3857


def normalize(srs: str) -> str:
    s = srs.strip().upper().replace(" ", "")
    if s in ("EPSG:4326", "WGS84", "CRS84"):
        return "EPSG:4326"
    if s in ("EPSG:3857", "EPSG:900913", "WEBMERCATOR"):
        return "EPSG:3857"
    raise ValueError(f"unsupported SRS {srs!r} (supported: EPSG:4326, EPSG:3857)")


# -- numpy (kernel-side) -----------------------------------------------------

def lon_to_x(lon):
    return np.radians(np.asarray(lon, dtype=np.float64)) * R


def lat_to_y(lat):
    lat = np.asarray(lat, dtype=np.float64)
    return R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))


def x_to_lon(x):
    return np.degrees(np.asarray(x, dtype=np.float64) / R)


def y_to_lat(y):
    return np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R)) - np.pi / 2.0)


def axis_to_wgs84(xs: np.ndarray, ys: np.ndarray, srs: str):
    """1-D axis vectors in ``srs`` -> (lon, lat) vectors."""
    if normalize(srs) == "EPSG:4326":
        return xs, ys
    return x_to_lon(xs), y_to_lat(ys)


def bbox_to_wgs84(left, right, bottom, top, srs: str):
    if normalize(srs) == "EPSG:4326":
        return left, right, bottom, top
    return float(x_to_lon(left)), float(x_to_lon(right)), float(y_to_lat(bottom)), float(y_to_lat(top))


# -- Spark column expressions (join-side, JVM) -------------------------------

def col_x_to_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R))


def col_y_to_lat(y: Column) -> Column:
    return F.degrees(F.atan(F.sinh(y / F.lit(R))))
