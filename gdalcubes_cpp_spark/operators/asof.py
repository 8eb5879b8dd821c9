"""As-of (nearest-time) join — a first-class temporal operator the
reference lacks outright (SURVEY §2.4: "no as-of join; nearest-time
behavior appears only as fill_time interpolation"), and a staple of
training-data assembly over event streams (label joins, sensor
alignment, "latest state as of this sample's timestamp").

Spark has no ASOF JOIN; the scalable composition here is the
UNION + ORDER + LAST(ignorenulls) pattern rather than a range join:

    tag left rows 1 / right rows 0, union on the shared (by, ts) axis,
    sort within each `by` partition by (ts, tag), and carry the latest
    right-side payload forward with last(..., ignorenulls=True) over
    UNBOUNDED PRECEDING .. CURRENT ROW; keep the left rows.

Why this scales where the naive approaches die at 100 TB:
- a theta/range join (l.ts >= r.ts) explodes to O(|L| x |R|) per key
  before a greatest-ts filter — quadratic in the hot keys;
- a per-key collect + python search is a UDF buffer bound by the
  largest key;
- this pattern is ONE exchange (hash by `by`) + ONE sort, both
  whole-stage-codegen JVM operators, with no intermediate blow-up —
  the same shape Spark uses for sessionization. Skewed keys salt the
  exchange exactly like any other sort-based op.

Directions: 'backward' (right.ts <= left.ts, the classic as-of),
'forward' (right.ts >= left.ts), 'nearest' (smaller absolute gap;
backward wins ties, pandas.merge_asof's rule). ``tolerance`` (seconds)
nulls matches whose gap exceeds it. Equal timestamps match in ALL
directions (>= / <= are inclusive, like DuckDB ASOF and merge_asof
defaults).

DuckDB replays 'backward' natively (``ASOF JOIN ... ON l.ts >= r.ts``),
so the driver oracle for the suite member is the real SQL operator, not
a mirrored reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _one_side(left: DataFrame, right: DataFrame, on: str, by: list,
              payload: list, direction: str, suffix: str) -> DataFrame:
    lt = left.withColumn("_is_left", F.lit(1))
    for c in payload:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    lt = lt.withColumn(f"{on}{suffix}", F.lit(None).cast(
        dict(right.dtypes)[on]))
    rt = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        F.col(on).alias(f"{on}{suffix}"),
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rt = rt.select(*lt.columns)
    u = lt.unionByName(rt)

    if direction == "backward":
        # right rows at the same ts must be visible: order right (tag 0)
        # before left (tag 1) at equal ts
        w = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col("_is_left").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(*by).orderBy(F.col(on).desc(), F.col("_is_left").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = u
    for c in [f"{p}{suffix}" for p in payload] + [f"{on}{suffix}"]:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_is_left") == 1).drop("_is_left")


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by=None, direction: str = "backward",
              tolerance_s: float | None = None,
              suffix: str = "_r") -> DataFrame:
    """For every left row, attach the right row with the nearest ``on``
    timestamp per ``direction`` within the same ``by`` group (see module
    docstring). Right columns arrive suffixed; ``<on><suffix>`` carries
    the matched timestamp (NULL = no match)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by or [])
    payload = [c for c in right.columns if c != on and c not in by]

    def gap(a, b):
        # cast(timestamp as double) keeps FRACTIONAL seconds —
        # unix_timestamp truncates, which would mis-rank 'nearest'
        # ties and mis-apply tolerance on sub-second data
        return F.abs(a.cast("double") - b.cast("double"))

    if direction in ("backward", "forward"):
        out = _one_side(left, right, on, by, payload, direction, suffix)
    else:
        # duplicate left rows must stay distinct through the two-sided
        # recombination: key on a synthetic row id, not the row values.
        # monotonically_increasing_id is NON-DETERMINISTIC across plan
        # re-executions, and the backward and forward subtrees each
        # re-execute `left` — pin the ids with an eager localCheckpoint
        # so both subtrees read the SAME materialized assignment.
        left = left.withColumn(
            "_rid", F.monotonically_increasing_id()).localCheckpoint(eager=True)
        b = _one_side(left, right, on, by, payload, "backward", "_bwd")
        f = _one_side(left, right, on, by, payload, "forward", "_fwd").select(
            "_rid", f"{on}_fwd", *[f"{c}_fwd" for c in payload])
        out = b.join(f, "_rid", "inner")
        use_b = (
            F.col(f"{on}_fwd").isNull()
            | (F.col(f"{on}_bwd").isNotNull()
               & (gap(F.col(on), F.col(f"{on}_bwd"))
                  <= gap(F.col(f"{on}_fwd"), F.col(on))))
        )
        for c in payload + [on]:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(use_b, F.col(f"{c}_bwd")).otherwise(F.col(f"{c}_fwd")))
        out = out.drop("_rid",
                       *[f"{c}_bwd" for c in payload + [on]],
                       *[f"{c}_fwd" for c in payload + [on]])
    if tolerance_s is not None:
        ok = gap(F.col(on), F.col(f"{on}{suffix}")) <= F.lit(float(tolerance_s))
        for c in payload + [on]:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(ok, F.col(f"{c}{suffix}")))
    return out
