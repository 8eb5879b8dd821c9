"""Big-big kNN-join scale probe: knn_join_ivf on replicated embedding
tables (each copy deterministically perturbed so vectors stay distinct).
Neither side broadcasts; the join is an equi-join on trained centroid
ids with nprobe-replicated queries. Writes BENCH/ann_scale.json."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdalcubes_cpp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus(spark, k: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    reps = spark.range(k).select(F.col("id").alias("rep"))
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: x + (F.col("rep") * 17 + i) % 101 / F.lit(1.0e5),
    )
    return base.crossJoin(reps).select(
        (F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
        pert.alias("embedding"),
    )


def main():
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    from pyspark.sql import functions as F

    from gdalcubes_cpp_spark.functions.ann import kmeans_centroids, knn_join_ivf

    out = {"sf_dir": SF_DIR, "runs": []}
    for k in (1, 10):
        emb = corpus(spark, k).persist()
        n = emb.count()
        t0 = time.time()
        cents = kmeans_centroids(emb, nlist=32, seed=7, max_iter=8)
        t_train = time.time() - t0
        queries = emb.filter(F.col("vec_id") % 100 == 0)
        t0 = time.time()
        res = knn_join_ivf(queries, emb, k=5, centroids=cents, nlist=32, nprobe=4)
        rows = res.count()
        t_join = time.time() - t0
        emb.unpersist()
        out["runs"].append({
            "replication": k,
            "n_vectors": n,
            "n_queries": n // 100,
            "train_s": round(t_train, 2),
            "join_s": round(t_join, 2),
            "pairs": rows,
            "queries_per_sec": round((n // 100) / t_join, 1),
            "loadavg": round(os.getloadavg()[0], 1),
        })
        print(out["runs"][-1])
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "ann_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
