"""Dedup-pipeline scale probe: near_dup_clusters (MinHash-LSH pairs →
connected components → canonical flags) on replicated corpora.

Replication with identical texts is deliberately adversarial: every copy
of a document lands in the SAME LSH buckets, so the capped-bucket path
(functions/dedup.py _capped_bucket_pairs) and the star-contraction rounds
carry the load — the worst case a crawl corpus full of boilerplate
produces. Half the copies get a small suffix so near-dup (not just
exact-dup) edges appear too.

Writes BENCH/dedup_scale.json: wall seconds, docs/sec, cluster counts and
loadavg per corpus size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdalcubes_cpp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus(spark, k: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    reps = spark.range(k).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
            F.when(
                F.col("rep") % 2 == 0, F.col("text")
            ).otherwise(F.concat(F.col("text"), F.lit(" rev"), F.col("rep"))).alias("text"),
        )
    )


def main():
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    from gdalcubes_cpp_spark.functions.dedup import near_dup_clusters

    out = {"sf_dir": SF_DIR, "runs": []}
    for k in (1, 10):
        docs = corpus(spark, k).persist()
        n = docs.count()
        t0 = time.time()
        res = near_dup_clusters(docs, threshold=0.5)
        n_docs = res.count()
        n_canon = res.filter("is_canonical").count()
        wall = time.time() - t0
        docs.unpersist()
        out["runs"].append({
            "replication": k,
            "n_docs": n,
            "wall_s": round(wall, 2),
            "docs_per_sec": round(n / wall, 1),
            "rows": n_docs,
            "canonical": n_canon,
            "dedup_ratio": round(1.0 - n_canon / n, 4),
            "loadavg": round(os.getloadavg()[0], 1),
        })
        print(out["runs"][-1])
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "dedup_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
