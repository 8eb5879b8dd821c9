"""stream_exec (the literal stream_cube subprocess surface, src/stream.h:41)
— protocol round-trip, keep/collapse shape rule, band renaming, edge
chunks, sparse semantics, and refusal paths."""

import os
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD_HEADER = f"""\
import sys
sys.path.insert(0, {REPO!r})
import numpy as np
from gdalcubes_cpp_spark.operators.streamexec import (
    read_stream_input, write_stream_output)
arr, meta = read_stream_input()
"""


def child(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(CHILD_HEADER + textwrap.dedent(body))
    import sys

    return f"{sys.executable} {p}"


def small_cube(spark, nt=4, ny=6, nx=10, chunk=(2, 3, 4)):
    from gdalcubes_cpp_spark.sources.collection import formula_cube
    from gdalcubes_cpp_spark.view import CubeView

    v = CubeView.create(
        left=0.0, right=float(nx), bottom=0.0, top=float(ny),
        nx=nx, ny=ny, t0="2020-01-01", nt=nt, dt="P1D",
        chunk_size=chunk)
    return formula_cube(spark, v, {
        "B1": "(it*7 + iy*3 + ix) % 11",
        "B2": "it + iy*0.5 + ix*0.25",
    })


def collect(cube):
    rows = cube.df.collect()
    return {(r["it"], r["iy"], r["ix"]): tuple(
        r[b] for b in cube.bands) for r in rows}


def test_identity_shape_transform(spark, tmp_path):
    cmd = child(tmp_path, "double.py",
                "write_stream_output(arr * 2.0 + 1.0)\n")
    c = small_cube(spark)
    out = c.stream_exec(cmd)
    assert out.bands == ("band1", "band2")
    assert out.view.shape == c.view.shape
    got = collect(out)
    want = {k: (v[0] * 2 + 1, v[1] * 2 + 1) for k, v in collect(c).items()}
    assert got == want


def test_band_reduction_and_renaming(spark, tmp_path):
    cmd = child(tmp_path, "bandsum.py", """\
        write_stream_output(arr.sum(axis=0, keepdims=True))
    """)
    c = small_cube(spark)
    out = c.stream_exec(cmd)
    assert out.bands == ("band1",)
    got = collect(out)
    base = collect(c)
    assert got.keys() == base.keys()
    for k, v in got.items():
        assert v[0] == pytest.approx(base[k][0] + base[k][1])


def test_time_collapse_one_slot_per_chunk(spark, tmp_path):
    cmd = child(tmp_path, "tmean.py", """\
        write_stream_output(np.nanmean(arr, axis=1, keepdims=True))
    """)
    c = small_cube(spark, nt=4, chunk=(2, 3, 4))  # 2 time chunks
    out = c.stream_exec(cmd)
    assert out.view.nt == 2 and out.view.dt.n == 2
    base = collect(c)
    got = collect(out)
    for (it, iy, ix), vals in got.items():
        for k in range(2):
            stack = [base[(t, iy, ix)][k] for t in (it * 2, it * 2 + 1)]
            assert vals[k] == pytest.approx(np.mean(stack))


def test_space_collapse(spark, tmp_path):
    cmd = child(tmp_path, "smean.py", """\
        write_stream_output(np.nanmean(arr, axis=(2, 3), keepdims=True))
    """)
    c = small_cube(spark, nt=2, ny=6, nx=10, chunk=(2, 3, 5))
    out = c.stream_exec(cmd)
    assert (out.view.ny, out.view.nx) == (2, 2)
    base = collect(c)
    for (it, cy, cx), vals in collect(out).items():
        win = [base[(it, y, x)] for y in range(cy * 3, cy * 3 + 3)
               for x in range(cx * 5, cx * 5 + 5)]
        assert vals[0] == pytest.approx(np.mean([w[0] for w in win]))


def test_meta_coords_reach_child(spark, tmp_path):
    # child replaces band values with the dim coords it was handed — the
    # packed-decimal times (src/datetime.cpp:163) and y/x cell centers
    cmd = child(tmp_path, "coords.py", """\
        out = np.empty_like(arr[:1])
        out[0] = (meta["times"][:, None, None]
                  + meta["ys"][None, :, None]
                  + meta["xs"][None, None, :])
        assert meta["srs"] == "EPSG:4326"
        assert meta["chunk_id"] >= 0
        write_stream_output(out)
    """)
    c = small_cube(spark, nt=2, ny=2, nx=2, chunk=(2, 2, 2))
    v = c.view
    got = collect(c.stream_exec(cmd))
    for (it, iy, ix), vals in got.items():
        t_dbl = 20200101.0 + it  # P1D unit: YYYYMMDD
        assert vals[0] == pytest.approx(t_dbl + v.y_of(iy) + v.x_of(ix))


def test_edge_chunks_and_sparse_rows(spark, tmp_path):
    cmd = child(tmp_path, "ident.py", "write_stream_output(arr)\n")
    c = small_cube(spark, nt=3, ny=5, nx=10, chunk=(2, 3, 4))
    sparse = c._with(c.df.filter("(it + iy + ix) % 3 != 0"))
    out = sparse.stream_exec(cmd)
    assert collect(out) == {k: v for k, v in collect(sparse).items()}


def test_child_failure_raises(spark, tmp_path):
    cmd = child(tmp_path, "boom.py", "raise SystemExit(3)\n")
    c = small_cube(spark, nt=2, ny=2, nx=2, chunk=(2, 2, 2))
    with pytest.raises(Exception, match="exited|exit"):
        c.stream_exec(cmd)


def test_bad_output_shape_refused(spark, tmp_path):
    cmd = child(tmp_path, "badshape.py", """\
        write_stream_output(arr[:, :, : max(1, arr.shape[2] // 2), :])
    """)
    c = small_cube(spark, nt=2, ny=6, nx=4, chunk=(2, 6, 4))
    with pytest.raises(Exception, match="could not derive|neither"):
        c.stream_exec(cmd)


def test_truncated_output_refused(spark, tmp_path):
    cmd = child(tmp_path, "trunc.py", """\
        import os, struct
        with open(os.environ["GDALCUBES_STREAMING_FILE_OUT"], "wb") as fh:
            fh.write(struct.pack("<4i", 1, 2, 2, 2))
            fh.write(b"\\x00" * 8)  # claims 8 doubles, ships 1
    """)
    c = small_cube(spark, nt=2, ny=2, nx=2, chunk=(2, 2, 2))
    with pytest.raises(Exception, match="truncated"):
        c.stream_exec(cmd)


def test_protocol_pack_unpack_roundtrip():
    from gdalcubes_cpp_spark.operators.streamexec import (
        pack_chunk, unpack_result)

    arr = np.arange(2 * 3 * 4 * 5, dtype=float).reshape(2, 3, 4, 5)
    arr[0, 0, 0, 0] = np.nan
    buf = pack_chunk(arr, ["B1", "B2"], [20200101.0, 20200102.0, 20200103.0],
                     [3.5, 2.5, 1.5, 0.5], [0.5, 1.5, 2.5, 3.5, 4.5],
                     "EPSG:4326")
    # header: sizes + band names + dims + srs, then the buffer — the
    # out-file format is the trailing (sizes, buffer) pair
    out = unpack_result(
        buf[:16] + buf[len(buf) - arr.nbytes:])
    assert np.array_equal(out, arr, equal_nan=True)
