"""partition.spread: widen narrow scans feeding CPU-heavy kernels."""

import pandas as pd
import pytest

from gdalcubes_cpp_spark.partition import spread


@pytest.fixture(scope="module")
def spark():
    from gdalcubes_cpp_spark.session import get_spark

    return get_spark(app="test-partition", cores=4)


def test_spread_widens_narrow_scan(spark, tmp_path):
    # single-row-group parquet -> one scan partition no matter the cores
    p = str(tmp_path / "narrow.parquet")
    pd.DataFrame({"doc_id": range(1000), "text": ["x y z"] * 1000}).to_parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    wide = spread(df)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # semantics unchanged
    assert wide.count() == 1000
    assert wide.agg({"doc_id": "sum"}).collect()[0][0] == 499500


def test_spread_noop_when_already_wide(spark):
    df = spark.range(0, 10_000, 1, 64)
    out = spread(df)
    # no repartition node added: partition count unchanged (not collapsed
    # to defaultParallelism), plan identity preserved
    assert out is df


def test_spread_per_core_factor(spark):
    df = spark.range(0, 100, 1, 1)
    out = spread(df, per_core=2)
    assert out.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism


def test_dedup_kernels_escape_single_partition(spark, tmp_path):
    """The operator entry points widen a single-row-group documents scan."""
    from gdalcubes_cpp_spark.functions.dedup import minhash_signature

    p = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {"doc_id": range(200), "text": [f"alpha beta gamma delta {i}" for i in range(200)]}
    ).to_parquet(p)
    docs = spark.read.parquet(p)
    sig = minhash_signature(docs, k=4)
    # the kernel's input stage runs at session parallelism, not 1 task
    assert sig.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert sig.count() == 200


def test_spread_streaming_passthrough(spark, tmp_path):
    """Streaming frames have no .rdd — spread must pass them through."""
    import pandas as pd

    src = tmp_path / "stream_in"
    src.mkdir()
    pd.DataFrame({"doc_id": [1], "text": ["a b c"]}).to_parquet(
        str(src / "p0.parquet"))
    sdf = (spark.readStream.schema("doc_id long, text string")
           .parquet(str(src)))
    out = spread(sdf)
    assert out is sdf
