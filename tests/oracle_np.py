"""Pure-numpy oracle: independent transliteration of the reference kernels
(SURVEY.md §2.2-2.3 citations) used to verify the Spark engine cell-exactly.
Kept free of any engine code except codecs/warp_plane primitives that are
themselves unit-tested against hand-computed values.
"""

from __future__ import annotations

import numpy as np

from gdalcubes_cpp_spark import codecs, synth
from gdalcubes_cpp_spark.operators.build import warp_plane


def dense_cube(pdf, view, resampling="near", aggregation="mean", nb=2, decode=None):
    """Build the dense (nb, nt, ny, nx) array the reference would produce.

    Transliterates read_chunk (src/image_collection_cube.cpp:315-598):
    iterates CHUNKS, selects intersecting images (find_range_st), warps
    them into the chunk-local grid, and streams the aggregation — the
    per-chunk granularity matters for count_* (the plane-flip-to-0 applies
    per chunk time slice, not per view slice)."""
    from gdalcubes_cpp_spark.grid import ChunkGrid

    v = view
    grid = ChunkGrid(v)
    out = np.full((nb, v.nt, v.ny, v.nx), np.nan)
    pdf = pdf.sort_values("image_id")  # (image_id, descriptor) order
    for cid in grid.chunk_ids():
        bd = grid.chunk_bounds(cid)
        m = ~(
            (pdf["right"] < bd["left"]) | (pdf["left"] > bd["right"])
            | (pdf["bottom"] > bd["top"]) | (pdf["top"] < bd["bottom"])
        )
        m &= (pdf["ts"] >= bd["t_start"]) & (pdf["ts"] <= bd["t_end"])
        sel = pdf.loc[m]
        if not len(sel):
            continue
        nt_c = bd["it1"] - bd["it0"]
        ny_c = bd["iy1"] - bd["iy0"]
        nx_c = bd["ix1"] - bd["ix0"]
        xs = v.left + (np.arange(bd["ix0"], bd["ix1"]) + 0.5) * v.dx
        ys = v.top - (np.arange(bd["iy0"], bd["iy1"]) + 0.5) * v.dy
        from gdalcubes_cpp_spark.operators.build import AGG_RESAMPLERS

        wkw = {}
        if resampling in AGG_RESAMPLERS:
            wkw = {
                "x_edges": v.left + np.arange(bd["ix0"], bd["ix1"] + 1) * v.dx,
                "y_edges": v.top - np.arange(bd["iy0"], bd["iy1"] + 1) * v.dy,
            }
        shape = (nb, nt_c, ny_c, nx_c)
        sums = np.zeros(shape)
        cnts = np.zeros(shape)
        acc = np.full(shape, np.nan)
        med: dict = {}
        for _, r in sel.iterrows():
            it = v.time_index_of(r["ts"].to_pydatetime()) - bd["it0"]
            if it < 0 or it >= nt_c:
                continue
            raw = (decode or codecs.decode)(r["bytes"], r["fmt"])
            planes = np.stack(
                [
                    warp_plane(
                        raw[:, :, b],
                        (r["left"], r["right"], r["bottom"], r["top"]),
                        xs, ys, resampling, **wkw,
                    )
                    for b in range(nb)
                ]
            )
            mm = ~np.isnan(planes)
            if aggregation == "mean":
                sums[:, it][mm] += planes[mm]
                cnts[:, it][mm] += 1
            elif aggregation == "min":
                acc[:, it] = np.fmin(acc[:, it], planes)
            elif aggregation == "max":
                acc[:, it] = np.fmax(acc[:, it], planes)
            elif aggregation == "first":
                take = np.isnan(acc[:, it]) & mm
                acc[:, it][take] = planes[take]
            elif aggregation == "last":
                acc[:, it][mm] = planes[mm]
            elif aggregation == "none":
                acc[:, it] = planes
            elif aggregation == "count_values":
                sl = acc[:, it]
                sl[np.isnan(sl)] = 0.0
                sl += mm
            elif aggregation == "count_images":
                sl = acc[:, it]
                sl[np.isnan(sl)] = 0.0
                sl += 1
            elif aggregation == "median":
                med.setdefault(it, []).append(planes)
            else:
                raise ValueError(aggregation)
        if aggregation == "mean":
            with np.errstate(invalid="ignore"):
                acc = sums / cnts
        elif aggregation == "median":
            for it, stack in med.items():
                with np.errstate(all="ignore"):
                    acc[:, it] = np.nanmedian(np.stack(stack), axis=0)
        out[:, bd["it0"]:bd["it1"], bd["iy0"]:bd["iy1"], bd["ix0"]:bd["ix1"]] = acc
    return out


def st_assignment(pdf, grid):
    """find_range_st join-rows oracle (inclusive time, strict-< disjoint)."""
    rows = []
    for cid in grid.chunk_ids():
        bd = grid.chunk_bounds(cid)
        m = ~(
            (pdf["right"] < bd["left"]) | (pdf["left"] > bd["right"])
            | (pdf["bottom"] > bd["top"]) | (pdf["top"] < bd["bottom"])
        )
        m &= (pdf["ts"] >= bd["t_start"]) & (pdf["ts"] <= bd["t_end"])
        for iid in pdf.loc[m, "image_id"]:
            rows.append((iid, cid))
    return sorted(rows)


def assert_dense_equal(got: np.ndarray, want: np.ndarray, atol=1e-9):
    assert got.shape == want.shape, (got.shape, want.shape)
    assert (np.isnan(got) == np.isnan(want)).all(), "NaN pattern mismatch"
    g, w = got[np.isfinite(got)], want[np.isfinite(want)]
    assert np.allclose(g, w, rtol=0, atol=atol), float(np.abs(g - w).max())
