"""Deduplication operators for web-scale corpora over the ``documents``
table: exact, MinHash+LSH, n-gram Jaccard, SimHash, embedding-cosine.

Design for 100 TB: every method reduces the O(n²) pair space to an
equi-join on a bucket key *before* any pairwise work:
- exact:   one groupBy on a content hash (md5) — one shuffle;
- minhash: shingles → k min-hashes → b band keys → self-join per band
           (classic Broder/LSH banding); duplicate candidate pairs from
           multiple bands are removed by keeping the first band only;
- simhash: 64-bit signature; bucket by 4 × 16-bit sub-keys (any pair with
           hamming distance ≤ 3 shares at least one sub-key — pigeonhole);
- cosine:  see functions/ann.py (LSH / IVF bucketing).

Hash choice: md5 — bit-identical in Spark and DuckDB, so the driver's
SQL oracle can re-derive signatures and verify candidate pairs EXACTLY.
MinHash uses the lexicographic minimum of md5(seed || shingle) per seed:
an order statistic on a uniform hash, the standard min-wise scheme.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalize_text


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array of the normalized text (may be empty)."""
    words = F.split(normalize_text(text), " ")
    k = F.size(words) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def exact_dups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: one shuffle on md5(text).
    Returns (content_hash, n_dups, keep_id) for groups with n >= 2."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") >= 2)
    )


def minhash_signature(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}) — per-seed minimum of md5(seed||shingle)."""
    sh = shingles(F.col(text_col), shingle_n)
    cols = {"doc_id": F.col(id_col)}
    exploded = docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("sh")))).alias(f"mh_{i}")
        for i in range(k)
    ]
    _ = cols
    return exploded.groupBy("doc_id").agg(*aggs)


def lsh_candidates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, bands: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs (doc_a < doc_b, band) — one pair appears
    once (kept in its smallest matching band; dedup via groupBy(min)).
    rows_per_band = k / bands; collision threshold ≈ (1/b)^(1/r)."""
    if k % bands:
        raise ValueError("k must be divisible by bands")
    r = k // bands
    sig = minhash_signature(docs, id_col, text_col, k, shingle_n)
    band_key = [
        F.md5(F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])).alias("band_key")
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_key[b]) for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "band"
        )
    )
    return pairs.groupBy("doc_a", "doc_b").agg(F.min("band").alias("band"))


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: set intersection over the
    shingle arrays (array_intersect/array_union — JVM-side)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    out = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return out.select("doc_a", "doc_b", "jaccard")


def near_dups_minhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, bands: int = 4, shingle_n: int = 3, threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify ≥ τ."""
    cand = lsh_candidates(docs, id_col, text_col, k, bands, shingle_n)
    jac = ngram_jaccard(docs, cand.select("doc_a", "doc_b"), id_col, text_col, shingle_n)
    return jac.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over normalized words: bit b of the signature is 1 iff
    the majority of word-hashes have bit b set. Pure Spark SQL: per-bit
    vote via sum over (hash >> b) & 1."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).filter(F.length("w") > 0)
    # 64-bit hash from md5 hex: two 32-bit halves via conv (conv to bigint is
    # exact up to 2^63; use 15 hex chars = 60 bits to stay positive/exact)
    h = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
    words = words.withColumn("h", h)
    votes = [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{b}")
        for b in range(60)
    ]
    per_doc = words.groupBy("doc_id").agg(*votes)
    sig = per_doc.select(
        "doc_id",
        sum(
            [F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(60)],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sig


def simhash_near_dups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Bucketing: split
    the 60-bit signature into 4 sub-keys of 15 bits; by pigeonhole any pair
    within distance 3 collides on >= 1 sub-key — candidate join per sub-key,
    then exact hamming verify (bit_count)."""
    sig = simhash(docs, id_col, text_col)
    parts = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(p).alias("part"),
                    F.shiftright(F.col("simhash"), p * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("sub"),
                )
                for p in range(4)
            ])
        ).alias("pk"),
    ).select("doc_id", "simhash", F.col("pk.part").alias("part"), F.col("pk.sub").alias("sub"))
    a, b = parts.alias("a"), parts.alias("b")
    cand = (
        a.join(b, ["part", "sub"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(ham <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )
