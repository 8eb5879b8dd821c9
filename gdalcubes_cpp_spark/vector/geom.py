"""Minimal geometry kernel: WKT polygons/points, bboxes, vectorized
point-in-polygon — numpy only (shapely/GDAL unavailable in this container).

The reference leans on OGR/GDALRasterize for its polygon burns
(src/extract_geom.cpp:362-413, src/vector_queries.cpp:887-1020). Semantics we
match: a cube cell belongs to a polygon iff its CENTER is inside (GDAL
rasterize default, no ALL_TOUCHED). Even-odd ray casting; points exactly on
edges follow the half-open convention (left/bottom edges in), which matches
GDAL's scanline burn for axis-aligned rectangles.
"""

from __future__ import annotations

import math
import re

import numpy as np

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def parse_wkt(wkt: str):
    """-> ('point', (x, y)) | ('polygon', [rings]) ; ring = (n,2) ndarray."""
    s = wkt.strip()
    m = re.match(r"^POINT\s*\(\s*(" + _NUM + r")\s+(" + _NUM + r")\s*\)$", s, re.I)
    if m:
        return ("point", (float(m.group(1)), float(m.group(2))))
    m = re.match(r"^POLYGON\s*\((.*)\)$", s, re.I | re.S)
    if m:
        body = m.group(1)
        rings = []
        for rm in re.finditer(r"\(([^()]*)\)", body):
            pts = []
            for pm in re.finditer(r"(" + _NUM + r")\s+(" + _NUM + r")", rm.group(1)):
                pts.append((float(pm.group(1)), float(pm.group(2))))
            rings.append(np.asarray(pts))
        if rings:
            return ("polygon", rings)
    raise ValueError(f"cannot parse WKT: {wkt[:80]}")


def wkt_bbox(wkt: str):
    kind, g = parse_wkt(wkt)
    if kind == "point":
        x, y = g
        return (x, x, y, y)
    all_pts = np.vstack(g)
    return (
        float(all_pts[:, 0].min()), float(all_pts[:, 0].max()),
        float(all_pts[:, 1].min()), float(all_pts[:, 1].max()),
    )


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting (rightward ray). px/py 1-D arrays."""
    x0 = ring[:-1, 0][:, None] if not np.allclose(ring[0], ring[-1]) else ring[:-1, 0][:, None]
    # ensure closed
    r = ring if np.allclose(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
    xa, ya = r[:-1, 0][:, None], r[:-1, 1][:, None]
    xb, yb = r[1:, 0][:, None], r[1:, 1][:, None]
    px = px[None, :]
    py = py[None, :]
    cond = (ya <= py) != (yb <= py)  # edge straddles the horizontal line
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = xa + (py - ya) * (xb - xa) / (yb - ya)
    crossing = cond & (px < xint)
    return crossing.sum(axis=0) % 2 == 1


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd over all rings (holes flip parity)."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(np.asarray(px, float), np.asarray(py, float), ring)
    return inside


def polygon_contains_bbox(rings, left, right, bottom, top) -> bool:
    """Conservative chunk-fully-inside test (src/filter_geom.cpp:196-230
    fast path): all 4 bbox corners inside AND no ring vertex inside bbox."""
    corners_x = np.array([left, right, right, left])
    corners_y = np.array([bottom, bottom, top, top])
    if not points_in_polygon(corners_x, corners_y, rings).all():
        return False
    for ring in rings:
        inb = (
            (ring[:, 0] > left) & (ring[:, 0] < right)
            & (ring[:, 1] > bottom) & (ring[:, 1] < top)
        )
        if inb.any():
            return False
    return True


def _split_depth0(s: str) -> list:
    """Split on commas at parenthesis depth 0."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def parse_wkt_geom(wkt: str):
    """parse_wkt extended with MULTIPOLYGON (the common shape of real
    zonal features — countries with islands, coastlines):
    -> ('point', (x, y)) | ('polygon', [rings])
     | ('multipolygon', [[rings], [rings], ...]).
    A valid MULTIPOLYGON's members are disjoint, so containment is the OR
    of the per-polygon even-odd tests (points_in_geom)."""
    s = wkt.strip()
    line = parse_wkt_line(s) if re.match(r"^LINESTRING", s, re.I) else None
    if line is not None:
        return ("linestring", line)
    m = re.match(r"^MULTIPOLYGON\s*\((.*)\)$", s, re.I | re.S)
    if m:
        polys = []
        for part in _split_depth0(m.group(1)):
            polys.append(parse_wkt(f"POLYGON {part.strip()}")[1])
        if not polys:
            raise ValueError(f"empty MULTIPOLYGON: {wkt[:80]}")
        return ("multipolygon", polys)
    return parse_wkt(s)


def points_in_geom(px: np.ndarray, py: np.ndarray, kind: str, g) -> np.ndarray:
    """Containment for any parsed areal geometry."""
    if kind == "polygon":
        return points_in_polygon(px, py, g)
    if kind == "multipolygon":
        inside = np.zeros(len(px), dtype=bool)
        for rings in g:
            inside |= points_in_polygon(px, py, rings)
        return inside
    raise ValueError(f"not an areal geometry: {kind}")


def geom_bbox(wkt: str):
    """wkt_bbox extended with MULTIPOLYGON."""
    kind, g = parse_wkt_geom(wkt)
    if kind == "point":
        x, y = g
        return (x, x, y, y)
    if kind == "linestring":
        rings = [g]
    else:
        rings = g if kind == "polygon" else [r for poly in g for r in poly]
    all_pts = np.vstack(rings)
    return (
        float(all_pts[:, 0].min()), float(all_pts[:, 0].max()),
        float(all_pts[:, 1].min()), float(all_pts[:, 1].max()),
    )


def parse_wkt_line(wkt: str):
    """LINESTRING -> (n,2) vertex array (None if not a linestring)."""
    m = re.match(r"^LINESTRING\s*\(([^()]*)\)$", wkt.strip(), re.I | re.S)
    if not m:
        return None
    pts = [
        (float(pm.group(1)), float(pm.group(2)))
        for pm in re.finditer(r"(" + _NUM + r")\s+(" + _NUM + r")", m.group(1))
    ]
    if len(pts) < 2:
        raise ValueError(f"LINESTRING needs >= 2 vertices: {wkt[:80]}")
    return np.asarray(pts, float)


def line_cells(verts: np.ndarray, view) -> np.ndarray:
    """Grid cells traversed by a polyline (transect extraction): each
    segment is sampled at half-cell spacing, so every cell in which the
    line spends at least ~half a cell of arc appears; corner-clipping
    slivers shorter than the step can be skipped (sampling, not an
    analytic supercover — same tolerance as rasterizing the transect).
    Returns unique (iy, ix) rows inside the view, ordered along the line
    (first traversal wins)."""
    step = min(view.dx, view.dy) / 2.0
    seen = set()
    out = []
    for (x0, y0), (x1, y1) in zip(verts[:-1], verts[1:]):
        seg = math.hypot(x1 - x0, y1 - y0)
        n = max(int(math.ceil(seg / step)), 1)
        t = np.linspace(0.0, 1.0, n + 1)
        xs = x0 + (x1 - x0) * t
        ys = y0 + (y1 - y0) * t
        ix = np.floor((xs - view.left) / view.dx).astype(int)
        iy = np.floor((view.top - ys) / view.dy).astype(int)
        ok = (ix >= 0) & (ix < view.nx) & (iy >= 0) & (iy < view.ny)
        for yy, xx in zip(iy[ok], ix[ok]):
            key = (int(yy), int(xx))
            if key not in seen:
                seen.add(key)
                out.append(key)
    return np.asarray(out, dtype=int).reshape(-1, 2)
