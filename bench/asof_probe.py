#!/usr/bin/env python
"""As-of join adversarial skew probe (r5 VERDICT #7).

operators/asof.py claims the union+sort+last design is one exchange and
tolerates skew like any sort-based operator. Evidence: the SAME 1M-left /
250k-right backward as-of join with (a) uniform keys and (b) one hot key
holding ~50% of both sides, walls compared (claim: hot within ~2x of
uniform), plans audited for the number of exchanges feeding the window.

Writes BENCH/asof_skew.json.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_LEFT = int(os.environ.get("SPARK_GRAFT_ASOF_LEFT", "1000000"))
N_RIGHT = N_LEFT // 4
N_KEYS = 64


def build_inputs(spark, skewed: bool):
    from pyspark.sql import functions as F

    # deterministic: key = id%64 (uniform) or 0 for every even id (hot key
    # holds 50% + its uniform share); ts jitters around a shared axis
    key = (F.when(F.col("id") % 2 == 0, F.lit(0))
           .otherwise(F.pmod(F.col("id"), F.lit(N_KEYS)))
           if skewed else F.pmod(F.col("id"), F.lit(N_KEYS)))
    left = (spark.range(N_LEFT)
            .withColumn("k", key)
            .withColumn("ts", F.timestamp_seconds(
                F.lit(1_600_000_000) + (F.col("id") * 7) % 1_000_000))
            .select("id", "k", "ts"))
    right = (spark.range(N_RIGHT)
             .withColumn("k", key)
             .withColumn("ts", F.timestamp_seconds(
                 F.lit(1_600_000_000) + (F.col("id") * 13) % 1_000_000))
             .withColumn("price", (F.col("id") % 1000).cast("double"))
             .select("k", "ts", "price"))
    return left, right


def run(spark, skewed: bool):
    from gdalcubes_cpp_spark.operators.asof import asof_join

    left, right = build_inputs(spark, skewed)
    left = left.localCheckpoint()           # input build outside the timing
    right = right.localCheckpoint()
    out = asof_join(left, right, on="ts", by=["k"], direction="backward")
    out.count()                              # JIT/codegen warm; timed below
    t0 = time.time()
    n = out.count()
    matched = out.filter("ts_r IS NOT NULL").count()
    wall = time.time() - t0
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # numbered operator entries, not raw substring hits (the formatted
    # details section repeats each tree node once)
    n_exchange = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
    return {"rows": n, "matched": matched, "wall_s": round(wall, 2),
            "exchanges_in_plan": n_exchange}


def main():
    sys.path.insert(0, REPO)
    from gdalcubes_cpp_spark.session import get_spark

    spark = get_spark(app="asof-skew", cores=16, shuffle_partitions=16)
    import bench

    bench.warmup(spark)
    uniform = run(spark, skewed=False)
    hot = run(spark, skewed=True)
    ratio = round(hot["wall_s"] / max(uniform["wall_s"], 1e-9), 2)
    result = {
        "n_left": N_LEFT, "n_right": N_RIGHT, "n_keys": N_KEYS,
        "hot_key_share": 0.5,
        "uniform": uniform, "hot": hot,
        "hot_over_uniform_wall": ratio,
        "loadavg": round(os.getloadavg()[0], 1),
        "note": ("union+sort+last pattern: the by-key window is ONE "
                 "exchange; a 50%-hot key concentrates ~half the sort in "
                 "one task, bounded by that task's O(n log n) — no "
                 "quadratic blow-up (a range join would explode to "
                 "O(|L|x|R|) on the hot key)."),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "asof_skew.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
