"""Pure-python netCDF-3 (classic, CDF-1) container export/import — the
single-file netCDF interop the reference writes via netcdf-c
(src/cube.cpp:736 write_netcdf_file; read side src/ncdf_cube.h:48-50).

The classic format is simple and fully public (NetCDF Classic Format
Specification, Unidata): a big-endian header (dim/att/var lists) followed
by fixed-size variable data. No netCDF library exists in this container,
so both the writer and the verifying reader are implemented here from the
spec; tests include a byte-level golden header for a tiny file.

Layout written (matching the reference's cube exports):
  dims:  time, y, x
  vars:  time (double, offset seconds since t0), y / x (double cell
         centers), one double (time, y, x) variable per band with a NaN
         _FillValue attribute
  global atts: Conventions, source, srs, view (the CubeView JSON)

A single netCDF file is inherently a gather — the cube is materialized
driver-side (collect_dense), exactly like the reference which assembles
the full cube in one process before writing. For distributed exports use
Cube.write_chunks (parquet) — this module is the interop shim.
"""

from __future__ import annotations

import struct

import numpy as np

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
NC_ATTRIBUTE = 0x0C
NC_CHAR = 2
NC_SHORT = 3
NC_INT = 4
NC_DOUBLE = 6

_TYPE_SIZE = {NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_DOUBLE: 8}
_TYPE_FMT = {NC_SHORT: ">i2", NC_INT: ">i4", NC_DOUBLE: ">f8"}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))


def _att_values(nc_type: int, values) -> bytes:
    if nc_type == NC_CHAR:
        b = values.encode() if isinstance(values, str) else bytes(values)
        return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))
    arr = np.asarray(values)
    raw = arr.astype(_TYPE_FMT[nc_type]).tobytes()
    return struct.pack(">i", arr.size) + raw + b"\x00" * _pad4(len(raw))


def _att_list(atts: list) -> bytes:
    """atts: [(name, nc_type, values)]; empty -> ABSENT (two zero words)."""
    if not atts:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", NC_ATTRIBUTE, len(atts))
    for name, nc_type, values in atts:
        out += _name(name) + struct.pack(">i", nc_type) + _att_values(nc_type, values)
    return out


def write_netcdf(cube, path: str, packing: dict | None = None) -> None:
    """Materialize the cube and write ONE classic netCDF-3 file.

    ``packing`` = {"scale": s, "offset": o, "nodata": fill} writes band
    variables as NC_SHORT with CF ``scale_factor``/``add_offset``
    attributes — the reference's packed netCDF export (src/cube.cpp:149
    packed_export; same packed = round((v - offset)/scale) rule as
    operators/export.py). read_netcdf auto-unpacks (ncdf_cube.h:45)."""
    v = cube.view
    dense = cube.collect_dense()  # (nb, nt, ny, nx)

    dims = [("time", v.nt), ("y", v.ny), ("x", v.nx)]
    time_vals = np.array(
        [(v.datetime_at(i) - v.t0).total_seconds() for i in range(v.nt)], dtype=np.float64
    )
    y_vals = np.array([v.y_of(i) for i in range(v.ny)], dtype=np.float64)
    x_vals = np.array([v.x_of(i) for i in range(v.nx)], dtype=np.float64)

    # (name, dimids, atts, data ndarray, nc_type)
    variables = [
        ("time", [0], [("units", NC_CHAR, f"seconds since {v.t0.isoformat()}")],
         time_vals, NC_DOUBLE),
        ("y", [1], [], y_vals, NC_DOUBLE),
        ("x", [2], [], x_vals, NC_DOUBLE),
    ]
    for bi, b in enumerate(cube.bands):
        if packing is None:
            variables.append(
                (b, [0, 1, 2], [("_FillValue", NC_DOUBLE, [np.nan])], dense[bi],
                 NC_DOUBLE)
            )
        else:
            s, o = float(packing["scale"]), float(packing["offset"])
            fill = int(packing.get("nodata", -32768))
            with np.errstate(invalid="ignore"):
                packed = np.round((dense[bi] - o) / s)
                packed = np.clip(packed, -32768, 32767)
            packed = np.where(np.isnan(dense[bi]), fill, packed).astype(np.int16)
            variables.append(
                (b, [0, 1, 2], [
                    ("_FillValue", NC_SHORT, [fill]),
                    ("scale_factor", NC_DOUBLE, [s]),
                    ("add_offset", NC_DOUBLE, [o]),
                ], packed, NC_SHORT)
            )

    gatts = [
        ("Conventions", NC_CHAR, "CF-1.6"),
        ("source", NC_CHAR, "gdalcubes_cpp_spark"),
        ("srs", NC_CHAR, v.srs),
        ("view", NC_CHAR, cube.view.to_json()),
    ]

    # ---- assemble header with a two-pass offset computation ----
    def header(begins: list) -> bytes:
        h = b"CDF\x01" + struct.pack(">i", 0)  # numrecs = 0 (no record dim)
        h += struct.pack(">ii", NC_DIMENSION, len(dims))
        for dname, dsize in dims:
            h += _name(dname) + struct.pack(">i", dsize)
        h += _att_list(gatts)
        h += struct.pack(">ii", NC_VARIABLE, len(variables))
        for (vname, dimids, atts, data, nc_type), begin in zip(variables, begins):
            vsize = data.size * _TYPE_SIZE[nc_type]
            vsize += _pad4(vsize)
            h += _name(vname)
            h += struct.pack(">i", len(dimids))
            for d in dimids:
                h += struct.pack(">i", d)
            h += _att_list(atts)
            h += struct.pack(">i", nc_type)
            h += struct.pack(">i", vsize)
            h += struct.pack(">i", begin)  # CDF-1: 32-bit offsets
        return h

    begins = [0] * len(variables)
    hlen = len(header(begins))
    off = hlen
    for i, (_, _, _, data, nc_type) in enumerate(variables):
        begins[i] = off
        sz = data.size * _TYPE_SIZE[nc_type]
        off += sz + _pad4(sz)
    if off > 2**31 - 1:
        raise ValueError("cube too large for CDF-1 (32-bit offsets); use write_chunks")

    with open(path, "wb") as f:
        f.write(header(begins))
        for _, _, _, data, nc_type in variables:
            raw = np.ascontiguousarray(data, dtype=_TYPE_FMT[nc_type]).tobytes()
            f.write(raw + b"\x00" * _pad4(len(raw)))


def _read_name(buf: memoryview, pos: int):
    (n,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    name = bytes(buf[pos:pos + n]).decode()
    pos += n + _pad4(n)
    return name, pos


def _read_atts(buf: memoryview, pos: int):
    tag, nelems = struct.unpack_from(">ii", buf, pos)
    pos += 8
    atts = {}
    if tag == 0:
        return atts, pos
    assert tag == NC_ATTRIBUTE
    for _ in range(nelems):
        name, pos = _read_name(buf, pos)
        nc_type, n = struct.unpack_from(">ii", buf, pos)
        pos += 8
        size = _TYPE_SIZE[nc_type] * n
        raw = bytes(buf[pos:pos + size])
        pos += size + _pad4(size)
        if nc_type == NC_CHAR:
            atts[name] = raw.decode()
        else:
            atts[name] = np.frombuffer(raw, _TYPE_FMT[nc_type])
    return atts, pos


def read_netcdf(path: str) -> dict:
    """Minimal classic-format reader (verification + interop ingest):
    returns {"dims": {...}, "gatts": {...}, "vars": {name: ndarray}}."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    assert bytes(buf[:4]) == b"CDF\x01", "not a CDF-1 classic file"
    pos = 8  # magic + numrecs
    tag, ndims = struct.unpack_from(">ii", buf, pos)
    pos += 8
    assert tag == NC_DIMENSION
    dims = []
    for _ in range(ndims):
        name, pos = _read_name(buf, pos)
        (size,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        dims.append((name, size))
    gatts, pos = _read_atts(buf, pos)
    tag, nvars = struct.unpack_from(">ii", buf, pos)
    pos += 8
    assert tag == NC_VARIABLE
    out = {}
    for _ in range(nvars):
        name, pos = _read_name(buf, pos)
        (nd,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        dimids = list(struct.unpack_from(f">{nd}i", buf, pos)) if nd else []
        pos += 4 * nd
        _atts, pos = _read_atts(buf, pos)
        nc_type, vsize, begin = struct.unpack_from(">iii", buf, pos)
        pos += 12
        shape = tuple(dims[d][1] for d in dimids)
        n = int(np.prod(shape)) if shape else 1
        raw = bytes(buf[begin:begin + _TYPE_SIZE[nc_type] * n])
        if nc_type == NC_CHAR:
            out[name] = raw
            continue
        arr = np.frombuffer(raw, _TYPE_FMT[nc_type]).astype(np.float64)
        # auto_unpack (src/ncdf_cube.h:45): CF scale_factor/add_offset with
        # _FillValue -> NaN BEFORE unpacking
        if "scale_factor" in _atts or "add_offset" in _atts:
            if "_FillValue" in _atts:
                arr = np.where(arr == float(_atts["_FillValue"][0]), np.nan, arr)
            arr = arr * float(_atts.get("scale_factor", [1.0])[0]) + float(
                _atts.get("add_offset", [0.0])[0]
            )
        out[name] = arr.reshape(shape)
    return {"dims": dict(dims), "gatts": gatts, "vars": out}


def read_netcdf_cube(spark, path: str):
    """netCDF file -> Cube (the ncdf_cube analog for our own exports):
    rebuilds the view from the embedded JSON and parallelizes the cells."""
    import pandas as pd

    from ..cube import Cube
    from ..view import CubeView

    nc = read_netcdf(path)
    view = CubeView.from_json(nc["gatts"]["view"])
    bands = [k for k in nc["vars"] if k not in ("time", "y", "x")]
    frames = {}
    arr0 = nc["vars"][bands[0]]
    tt, yy, xx = np.meshgrid(
        np.arange(arr0.shape[0]), np.arange(arr0.shape[1]), np.arange(arr0.shape[2]),
        indexing="ij",
    )
    keep = np.zeros(arr0.shape, dtype=bool)
    for b in bands:
        keep |= ~np.isnan(nc["vars"][b])
    frames = {
        "it": tt[keep].astype("int32"),
        "iy": yy[keep].astype("int32"),
        "ix": xx[keep].astype("int32"),
    }
    for b in bands:
        frames[b] = nc["vars"][b][keep]
    df = spark.createDataFrame(pd.DataFrame(frames))
    from pyspark.sql import functions as F

    df = df.select(
        "it", "iy", "ix",
        *[F.when(F.isnan(F.col(b)), None).otherwise(F.col(b)).alias(b) for b in bands],
    )
    return Cube(df, view, tuple(bands))
