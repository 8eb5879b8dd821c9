"""JSON cube-plan (de)serialization — the cube_factory analog.

The reference serializes every cube DAG to nested JSON via
``make_constructible_json`` (src/cube.h:893) and rebuilds it with a
generator registry (src/cube_factory.cpp:62-109). Our logical plan is the
DataFrame lineage itself (Catalyst), so the JSON plan exists for the same
reasons the reference's does: ship a pipeline spec to another process /
checkpoint metadata — not for execution scheduling.

A plan is: {"source": {...}, "ops": [{"op": name, ...args}...]}.
Sources: synth (n images), formula (bands exprs), read (materialized cube).
Ops: every derived operator of cube.Cube by method name.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from ..cube import Cube
from ..view import CubeView

_OPS = {
    "select_bands": lambda c, a: c.select_bands(a["bands"]),
    "rename_bands": lambda c, a: c.rename_bands(a["mapping"]),
    "apply_pixel": lambda c, a: c.apply_pixel(a["exprs"], a.get("keep_bands", False)),
    "filter_pixel": lambda c, a: c.filter_pixel(a["predicate"]),
    "crop": lambda c, a: c.crop(
        tuple(a["ix_range"]) if a.get("ix_range") else None,
        tuple(a["iy_range"]) if a.get("iy_range") else None,
        tuple(a["it_range"]) if a.get("it_range") else None,
    ),
    "slice_time": lambda c, a: c.slice_time(a["it"]),
    "slice_space": lambda c, a: c.slice_space(a["ix"], a["iy"]),
    "select_time": lambda c, a: c.select_time(a["its"]),
    "reduce_time": lambda c, a: c.reduce_time([tuple(x) for x in a["reducers"]]),
    "reduce_space": lambda c, a: c.reduce_space([tuple(x) for x in a["reducers"]]),
    "aggregate_time": lambda c, a: c.aggregate_time(
        fact=a.get("fact"), dt=a.get("dt"), func=a.get("func", "mean")
    ),
    "aggregate_space": lambda c, a: c.aggregate_space(a["fact"], a.get("func", "mean")),
    "window_time": lambda c, a: c.window_time(
        tuple(a["window"]), reducers=[tuple(x) for x in a.get("reducers", [])] or None,
        kernel=a.get("kernel"),
    ),
    "fill_time": lambda c, a: c.fill_time(a.get("method", "linear")),
}


def build_plan(spark: SparkSession, plan: dict) -> Cube:
    src = plan["source"]
    kind = src["kind"]
    view = CubeView.from_json(json.dumps(src["view"])) if "view" in src else None
    if kind == "synth":
        from ..operators.build import build_cube
        from ..synth import images_df

        imgs = images_df(spark, src["n"], with_bytes=src.get("with_bytes", True))
        cube = build_cube(imgs, view, bands=tuple(src.get("bands", ("B1", "B2"))))
    elif kind == "formula":
        from ..sources.collection import formula_cube

        cube = formula_cube(spark, view, src["bands_exprs"])
    elif kind == "read":
        from ..sources.collection import read_chunks

        cube = read_chunks(spark, src["path"])
    else:
        raise ValueError(f"unknown source kind {kind!r}")
    for op in plan.get("ops", []):
        name = op["op"]
        if name not in _OPS:
            raise ValueError(f"unknown op {name!r} (registry: {sorted(_OPS)})")
        cube = _OPS[name](cube, op)
    return cube


def plan_from_json(spark: SparkSession, s: str) -> Cube:
    return build_plan(spark, json.loads(s))
