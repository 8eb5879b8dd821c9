"""Partition-shape guards shared by CPU-heavy operators.

Compressed columnar inputs can be small on disk while carrying orders of
magnitude more kernel work than bytes (a 6 MB single-row-group parquet of
text expands to tens of millions of md5 calls in a MinHash pass). Parquet
scans cannot split inside a row group, so such a file plans as ONE task no
matter how many cores the session has — the classic small-file /
row-group-granularity trap. ``spread`` widens those scans to the session's
task parallelism before the kernel runs; for any real-scale input (many
files / row groups) it is a structural no-op that adds nothing to the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, per_core: int = 1) -> DataFrame:
    """Return ``df`` repartitioned to ``per_core`` x the session's default
    parallelism, but ONLY when its current plan has fewer partitions than
    that — i.e. only when a narrow scan would otherwise serialize a
    CPU-heavy downstream kernel onto a handful of cores.

    The partition probe converts the plan to an RDD (no job is run). The
    repartition is a round-robin shuffle of the input rows; callers use it
    in front of kernels whose per-row cost dwarfs a row's transfer cost
    (shingling/hashing, signature computation, embedding arithmetic), where
    the shuffle amortizes to noise. Result semantics are unaffected: every
    caller aggregates or joins afterwards, none depends on input order.
    """
    if df.isStreaming:
        # no .rdd on a streaming frame; micro-batch sources size their own
        # partitions (maxFilesPerTrigger etc.) — the guard is batch-only
        return df
    spark = df.sparkSession
    target = max(1, spark.sparkContext.defaultParallelism * per_core)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
