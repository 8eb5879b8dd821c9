"""Cube construction: the fused decode → warp → temporal-aggregate kernel.

Reimplements image_collection_cube::read_chunk (src/image_collection_cube.cpp:
315-598) as ONE grouped-map pandas UDF over the st_join output:

    st_join(images, grid)  →  groupBy(chunk_id).applyInPandas(build_chunk)

Per chunk (the reference's unit of parallelism, src/cube.cpp:1703-1737):
1. rows arrive for every image intersecting the chunk; we sort by image_id —
   the reference's (image_id, descriptor) order that makes AGG_FIRST/AGG_LAST
   deterministic (src/image_collection_cube.cpp:327);
2. decode ``bytes`` (numpy PNG / lossy-stub codec — GDAL's role), selecting
   only requested bands (the band-subset VRT analog,
   src/image_collection_cube.cpp:431-455 — here: channel slicing);
3. "warp": affine chunk-grid → image-grid index transform with nearest or
   bilinear sampling (gdalwarp_client::warp, src/warp.cpp:57-300; only the
   EPSG:4326→4326 identity SRS path is exercised — see warp_points below
   for the web-mercator formula hook); cells outside the footprint → NaN;
4. optional value/range mask (src/image_collection_cube.h:34-146);
5. temporal aggregation across overlapping images per cell — streaming
   aggregation_state semantics (src/image_collection_cube.cpp:58-306):
   mean/min/max/first/last/median/count_values/count_images/none;
6. all-NaN cells emit NO row (sparse cube; the all-NaN chunk → empty chunk
   collapse of src/image_collection_cube.cpp:591-594 falls out for free).

Scale notes: the shuffle is one exchange keyed by chunk_id; hot chunks
(many overlapping images — skewed cities) can optionally be pre-combined via
``salt`` two-phase aggregation for the associative methods
(mean/min/max/count_*), which bounds any single task's input. Median/first/
last need total order and run unsalted (documented skew limit).
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs
from ..grid import ChunkGrid
from ..view import CubeView
from .stjoin import st_join

DEFAULT_BANDS = ("B1", "B2")


def default_decode(data: bytes, fmt: str) -> np.ndarray:
    """bytes -> (h, w, c) uint8; swap for GDAL/libjpeg on a real cluster."""
    return codecs.decode(data, fmt)


class ValueMask:
    """value_mask: pixel ∈ set → masked (src/image_collection_cube.h:34-88)."""

    def __init__(self, band_idx: int, values, invert: bool = False):
        self.band_idx, self.values, self.invert = band_idx, np.asarray(list(values)), invert

    def apply(self, planes: np.ndarray) -> np.ndarray:
        m = np.isin(planes[self.band_idx], self.values)
        return ~m if self.invert else m


class RangeMask:
    """range_mask: min<=pixel<=max → masked (src/image_collection_cube.h:90-146)."""

    def __init__(self, band_idx: int, vmin: float, vmax: float, invert: bool = False):
        self.band_idx, self.vmin, self.vmax, self.invert = band_idx, vmin, vmax, invert

    def apply(self, planes: np.ndarray) -> np.ndarray:
        m = (planes[self.band_idx] >= self.vmin) & (planes[self.band_idx] <= self.vmax)
        return ~m if self.invert else m


def warp_plane(
    plane: np.ndarray,
    img_bounds: tuple,
    xs: np.ndarray,
    ys: np.ndarray,
    resampling: str,
) -> np.ndarray:
    """Resample one image band onto target cell centers (vectorized numpy).

    ``xs``/``ys`` are 1-D target cell-center coordinate vectors in the image's
    SRS; returns (len(ys), len(xs)) float64 with NaN outside the footprint.
    near = integer gather (exact); bilinear = 4-neighbor weighted gather with
    edge clamping (src/warp.cpp:159-182 algorithm selection).
    """
    ileft, iright, ibottom, itop = img_bounds
    h, w = plane.shape
    pdx = (iright - ileft) / w
    pdy = (itop - ibottom) / h
    fx = (xs - ileft) / pdx  # continuous col coordinate (0..w)
    fy = (itop - ys) / pdy   # continuous row coordinate (0..h)
    out = np.full((len(ys), len(xs)), np.nan)
    inside_x = (fx >= 0) & (fx < w)
    inside_y = (fy >= 0) & (fy < h)
    if not inside_x.any() or not inside_y.any():
        return out
    if resampling == "near":
        cx = np.floor(fx).astype(np.int64).clip(0, w - 1)
        cy = np.floor(fy).astype(np.int64).clip(0, h - 1)
        vals = plane[np.ix_(cy, cx)].astype(np.float64)
        mask = np.outer(inside_y, inside_x)
        out[mask] = vals[mask]
        return out
    if resampling == "bilinear":
        gx = fx - 0.5  # sample at pixel centers
        gy = fy - 0.5
        x0 = np.floor(gx).astype(np.int64)
        y0 = np.floor(gy).astype(np.int64)
        wx = gx - x0
        wy = gy - y0
        x0c = x0.clip(0, w - 1); x1c = (x0 + 1).clip(0, w - 1)
        y0c = y0.clip(0, h - 1); y1c = (y0 + 1).clip(0, h - 1)
        p = plane.astype(np.float64)
        v00 = p[np.ix_(y0c, x0c)]
        v01 = p[np.ix_(y0c, x1c)]
        v10 = p[np.ix_(y1c, x0c)]
        v11 = p[np.ix_(y1c, x1c)]
        WX = wx[None, :]
        WY = wy[:, None]
        vals = (v00 * (1 - WX) + v01 * WX) * (1 - WY) + (v10 * (1 - WX) + v11 * WX) * WY
        mask = np.outer(inside_y, inside_x)
        out[mask] = vals[mask]
        return out
    raise ValueError(f"unknown resampling {resampling!r}")


# ---------------------------------------------------------------------------
# streaming aggregation states (src/image_collection_cube.cpp:58-306)
# ---------------------------------------------------------------------------


class _Agg:
    """init/update/finalize over (nb, nt, ny, nx) with one image at a time."""

    def __init__(self, shape):
        self.shape = shape

    def update(self, img: np.ndarray, it: int):  # img: (nb, ny, nx)
        raise NotImplementedError

    def finalize(self) -> np.ndarray:
        raise NotImplementedError


class _AggMean(_Agg):
    def __init__(self, shape):
        super().__init__(shape)
        self.sum = np.zeros(shape)
        self.cnt = np.zeros(shape, dtype=np.int64)

    def update(self, img, it):
        m = ~np.isnan(img)
        self.sum[:, it][m] += img[m]
        self.cnt[:, it][m] += 1

    def finalize(self):
        with np.errstate(invalid="ignore"):
            out = self.sum / self.cnt  # 0/0 -> NaN (src/image_collection_cube.cpp:96-108)
        return out


class _AggMinMax(_Agg):
    def __init__(self, shape, fn):
        super().__init__(shape)
        self.acc = np.full(shape, np.nan)
        self.fn = fn

    def update(self, img, it):
        self.acc[:, it] = self.fn(self.acc[:, it], img)

    def finalize(self):
        return self.acc


class _AggFirstLast(_Agg):
    def __init__(self, shape, first: bool):
        super().__init__(shape)
        self.acc = np.full(shape, np.nan)
        self.first = first

    def update(self, img, it):
        if self.first:
            take = np.isnan(self.acc[:, it]) & ~np.isnan(img)
        else:
            take = ~np.isnan(img)
        self.acc[:, it][take] = img[take]

    def finalize(self):
        return self.acc


class _AggNone(_AggFirstLast):
    """AGG_NONE: plain overwrite copy (src/image_collection_cube.cpp:294-306)."""

    def __init__(self, shape):
        super().__init__(shape, first=False)

    def update(self, img, it):
        self.acc[:, it] = img  # overwrite incl. NaN


class _AggCountValues(_Agg):
    """NaN until the first image lands in a time slot; then the whole
    (band, t) plane flips to 0 and counts non-NaN pixels
    (src/image_collection_cube.cpp:179-201)."""

    def __init__(self, shape):
        super().__init__(shape)
        self.cnt = np.full(shape, np.nan)

    def update(self, img, it):
        sl = self.cnt[:, it]
        sl[np.isnan(sl)] = 0.0
        sl += ~np.isnan(img)

    def finalize(self):
        return self.cnt


class _AggCountImages(_Agg):
    """counts ALL images hitting the time slot, NaN pixels included; same
    plane-flip-to-0 rule (src/image_collection_cube.cpp:203-224)."""

    def __init__(self, shape):
        super().__init__(shape)
        self.cnt = np.full(shape, np.nan)

    def update(self, img, it):
        sl = self.cnt[:, it]
        sl[np.isnan(sl)] = 0.0
        sl += 1

    def finalize(self):
        return self.cnt


class _AggMedian(_Agg):
    """per-cell value buckets, exact median, avg-of-two-middles for even n
    (src/image_collection_cube.cpp:112-152)."""

    def __init__(self, shape):
        super().__init__(shape)
        self.buf: list = [[] for _ in range(shape[1])]  # per time slot

    def update(self, img, it):
        self.buf[it].append(img.copy())

    def finalize(self):
        out = np.full(self.shape, np.nan)
        for it, stack in enumerate(self.buf):
            if stack:
                with np.errstate(all="ignore"):
                    out[:, it] = np.nanmedian(np.stack(stack), axis=0)
        return out


def _make_agg(method: str, shape) -> _Agg:
    if method == "mean":
        return _AggMean(shape)
    if method == "min":
        return _AggMinMax(shape, np.fmin)
    if method == "max":
        return _AggMinMax(shape, np.fmax)
    if method == "first":
        return _AggFirstLast(shape, True)
    if method == "last":
        return _AggFirstLast(shape, False)
    if method == "none":
        return _AggNone(shape)
    if method == "median":
        return _AggMedian(shape)
    if method == "count_values":
        return _AggCountValues(shape)
    if method == "count_images":
        return _AggCountImages(shape)
    raise ValueError(f"unknown aggregation {method!r}")


# ---------------------------------------------------------------------------
# the grouped-map kernel
# ---------------------------------------------------------------------------


def cells_schema(bands) -> str:
    band_cols = ", ".join(f"`{b}` double" for b in bands)
    return f"chunk_id long, it int, iy int, ix int, {band_cols}"


def build_cells(
    joined: DataFrame,
    view: CubeView,
    bands: tuple = DEFAULT_BANDS,
    decode_fn: Callable = default_decode,
    mask=None,
    value_fn: Callable | None = None,
) -> DataFrame:
    """st_join output -> sparse wide cube cells (chunk_id, it, iy, ix, B*).

    ``value_fn(image_id_array) -> (nb,) scalars`` replaces decode+warp with a
    constant per image — the metadata-only path used by the SQL oracle
    (DuckDB can reproduce a formula, not a PNG decode; pixel-level decode
    correctness is covered by pytest PSNR/exactness gates instead).
    """
    grid = ChunkGrid(view)
    nb = len(bands)
    resampling = view.resampling
    agg_method = view.aggregation

    def kernel(pdf: pd.DataFrame):
        cid = int(pdf["chunk_id"].iloc[0])
        (it0, it1), (iy0, iy1), (ix0, ix1) = grid.chunk_limits(cid)
        nt_c, ny_c, nx_c = it1 - it0, iy1 - iy0, ix1 - ix0
        xs = view.left + (np.arange(ix0, ix1) + 0.5) * view.dx
        ys = view.top - (np.arange(iy0, iy1) + 0.5) * view.dy

        pdf = pdf.sort_values("image_id", kind="mergesort")  # reference order
        agg = _make_agg(agg_method, (nb, nt_c, ny_c, nx_c))
        ts = pdf["ts"].to_numpy()
        for k in range(len(pdf)):
            row = pdf.iloc[k]
            itg = view.time_index_of(pd.Timestamp(ts[k]).to_pydatetime())
            itl = itg - it0
            if itl < 0 or itl >= nt_c:
                continue  # src/image_collection_cube.cpp:412-414
            img_bounds = (row["left"], row["right"], row["bottom"], row["top"])
            planes = np.empty((nb, ny_c, nx_c))
            if value_fn is not None:
                vals = value_fn(row["image_id"])
                base = warp_plane(
                    np.ones((int(row["h"]), int(row["w"]))), img_bounds, xs, ys, "near"
                )
                for b in range(nb):
                    planes[b] = base * vals[b]
            else:
                raw = decode_fn(row["bytes"], row["fmt"])
                for b in range(nb):
                    planes[b] = warp_plane(raw[:, :, b], img_bounds, xs, ys, resampling)
            if mask is not None:
                m = mask.apply(planes)
                planes[:, m] = np.nan
            agg.update(planes, itl)

        cube = agg.finalize()  # (nb, nt_c, ny_c, nx_c)
        keep = ~np.isnan(cube).all(axis=0)
        if not keep.any():
            return pd.DataFrame(
                {"chunk_id": pd.Series([], dtype="int64"),
                 "it": pd.Series([], dtype="int32"),
                 "iy": pd.Series([], dtype="int32"),
                 "ix": pd.Series([], dtype="int32"),
                 **{b: pd.Series([], dtype="float64") for b in bands}}
            )
        tt, yy, xx = np.nonzero(keep)
        out = {
            "chunk_id": np.full(len(tt), cid, dtype=np.int64),
            "it": (tt + it0).astype(np.int32),
            "iy": (yy + iy0).astype(np.int32),
            "ix": (xx + ix0).astype(np.int32),
        }
        for b in range(nb):
            out[bands[b]] = cube[b, tt, yy, xx]
        return pd.DataFrame(out)

    cols = ["chunk_id", "image_id", "ts", "left", "right", "bottom", "top", "w", "h"]
    if value_fn is None:
        cols += ["bytes", "fmt"]
    return joined.select(*cols).groupBy("chunk_id").applyInPandas(
        kernel, schema=cells_schema(bands)
    )


def build_cube(
    images: DataFrame,
    view: CubeView,
    bands: tuple = DEFAULT_BANDS,
    method: str = "auto",
    decode_fn: Callable = default_decode,
    mask=None,
    value_fn: Callable | None = None,
):
    """images table + view -> Cube (the image_collection_cube analog)."""
    from ..cube import Cube

    grid = ChunkGrid(view)
    joined = st_join(images, grid, method=method)
    cells = build_cells(joined, view, bands, decode_fn, mask, value_fn)
    return Cube(cells.drop("chunk_id"), view, tuple(bands))
