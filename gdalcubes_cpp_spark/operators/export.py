"""Packed export: scale/offset packing of float64 cubes to narrow integer
types on write (src/cube.h:51-151, applied in src/cube.cpp:284-325):

    packed = round((v - offset) / scale);   NaN -> nodata fill
    unpack = packed * scale + offset

Per-band scale/offset/nodata with the reference's broadcast rule (1 value =
all bands). Writing is a plain column transform + parquet partitionBy —
Catalyst keeps it in whole-stage codegen; reading back reverses it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F

from ..cube import KEY, Cube
from ..view import CubeView

_TYPES = {
    "uint8": ("smallint", 0, 255),
    "uint16": ("int", 0, 65535),
    "uint32": ("bigint", 0, 4294967295),
    "int16": ("smallint", -32768, 32767),
    "int32": ("int", -2147483648, 2147483647),
    "float32": ("float", None, None),
}


@dataclass(frozen=True)
class Packing:
    """packed_export analog (src/cube.h:51-151)."""

    type: str  # uint8|uint16|uint32|int16|int32|float32
    scale: tuple = (1.0,)
    offset: tuple = (0.0,)
    nodata: tuple = (None,)

    def per_band(self, nb: int) -> list:
        def bc(v):
            if len(v) == nb:
                return list(v)
            if len(v) == 1:
                return list(v) * nb
            raise ValueError("scale/offset/nodata must have 1 or nbands values")

        return list(zip(bc(self.scale), bc(self.offset), bc(self.nodata)))


def write_packed(cube: Cube, path: str, packing: Packing, mode: str = "overwrite") -> None:
    if packing.type not in _TYPES:
        raise ValueError(f"unknown packing type {packing.type!r}")
    sql_type, lo, hi = _TYPES[packing.type]
    cols = []
    meta = {"view": cube.view.to_json(), "bands": list(cube.bands),
            "packing": {"type": packing.type, "bands": []}}
    for b, (scale, offset, nodata) in zip(cube.bands, packing.per_band(len(cube.bands))):
        c = F.col(f"`{b}`")
        if packing.type == "float32":
            packed = c.cast("float")  # scale/offset ignored (src/cube.h:92-100)
            scale, offset = 1.0, 0.0
        else:
            if nodata is None:
                nodata = float(hi)
            p = F.round((c - F.lit(float(offset))) / F.lit(float(scale)))
            p = F.least(F.greatest(p, F.lit(float(lo))), F.lit(float(hi)))
            # NULL must stay NULL through the clip: Spark's least/greatest
            # SKIP nulls (greatest(NULL, 0) = 0), which would silently pack
            # nodata cells as the clip floor
            packed = F.when(c.isNull(), F.lit(float(nodata))).otherwise(p).cast(sql_type)
        cols.append(packed.alias(b))
        meta["packing"]["bands"].append(
            {"band": b, "scale": scale, "offset": offset, "nodata": nodata}
        )
    df = cube.with_chunk_id().select("chunk_id", *KEY, *cols)
    df.write.mode(mode).partitionBy("chunk_id").parquet(path + "/cells")
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(path + "/cube.json", "w") as f:
        json.dump(meta, f)


def read_packed(spark: SparkSession, path: str) -> Cube:
    """Unpack on read (auto_unpack of src/ncdf_cube.h:48-50)."""
    import json

    with open(path + "/cube.json") as f:
        meta = json.load(f)
    view = CubeView.from_json(meta["view"])
    bands = tuple(meta["bands"])
    df = spark.read.parquet(path + "/cells")
    cols = []
    for spec in meta["packing"]["bands"]:
        b = spec["band"]
        c = F.col(f"`{b}`").cast("double")
        if meta["packing"]["type"] == "float32":
            unpacked = c
        else:
            unpacked = F.when(c == float(spec["nodata"]), None).otherwise(
                c * F.lit(float(spec["scale"])) + F.lit(float(spec["offset"]))
            )
        cols.append(unpacked.alias(b))
    return Cube(df.select(*KEY, *cols), view, bands)
