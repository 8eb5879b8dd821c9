"""Streaming near-dup detection (streaming/dedup.py): cross-batch state,
restart persistence, and estimate agreement with the batch minhash."""

import pandas as pd

from gdalcubes_cpp_spark.streaming.dedup import dedup_stream

BASE = "the quick brown fox jumps over the lazy dog again and again " * 4
DISTINCT = "completely different content about distributed query planning " * 4


def _write(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, in_dir, sink, cp):
    q = dedup_stream(spark, in_dir, sink, cp, threshold=0.5)
    q.awaitTermination(120)


def test_dedup_stream_cross_batch(spark, tmp_path):
    in_dir, sink, cp = (str(tmp_path / d) for d in ("in", "sink", "cp"))
    # batch 1: two near-dups + one distinct doc
    _write(spark, in_dir, [(1, BASE), (2, BASE + "tail one"), (3, DISTINCT)])
    _run(spark, in_dir, sink, cp)
    out1 = spark.read.parquet(sink).toPandas()
    pairs1 = set(map(tuple, out1[["doc_a", "doc_b"]].drop_duplicates().values))
    assert (1, 2) in pairs1
    assert all(3 not in p for p in pairs1)

    # batch 2 (same checkpoint — state must survive the restart): a new
    # near-dup of doc 1 arrives
    _write(spark, in_dir, [(4, BASE + "tail two")])
    _run(spark, in_dir, sink, cp)
    out2 = spark.read.parquet(sink).toPandas()
    pairs2 = set(map(tuple, out2[["doc_a", "doc_b"]].drop_duplicates().values))
    assert (1, 4) in pairs2  # matched against state from the PREVIOUS batch
    assert all(3 not in p for p in pairs2)

    # estimate agreement: est_jaccard equals the offline minhash agreement
    from gdalcubes_cpp_spark.functions.dedup import minhash_signature

    sig = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(8)]
        for r in minhash_signature(
            spark.createDataFrame(
                [(1, BASE), (4, BASE + "tail two")], "doc_id long, text string"
            )
        ).collect()
    }
    want = sum(a == b for a, b in zip(sig[1], sig[4])) / 8.0
    got = out2[(out2["doc_a"] == 1) & (out2["doc_b"] == 4)]["est_jaccard"].iloc[0]
    assert got == want
    assert want >= 0.5


def test_dedup_stream_bucket_cap(spark, tmp_path):
    """Identical docs all hash to the same buckets; the representative cap
    bounds state AND emitted pairs (no quadratic blowup)."""
    in_dir, sink, cp = (str(tmp_path / d) for d in ("in", "sink", "cp"))
    _write(spark, in_dir, [(i, BASE) for i in range(30)])
    q = dedup_stream(spark, in_dir, sink, cp, threshold=0.5, max_bucket=5)
    q.awaitTermination(120)
    out = spark.read.parquet(sink).toPandas()
    pairs = out[["doc_a", "doc_b"]].drop_duplicates()
    # each arrival compares against <= 5 representatives per bucket:
    # far fewer than the 30*29/2 uncapped pairs
    assert 0 < len(pairs) <= 30 * 5
