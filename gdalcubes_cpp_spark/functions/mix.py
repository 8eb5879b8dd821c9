"""Training-mix construction over the ``documents`` table: deterministic
sampling, stratified mix weights, and token-budget shard packing.

Design for 100 TB:
- Sampling is a pure FILTER on a content-derived hash — no RNG state, no
  shuffle, reproducible across engines and re-runs (md5 is bit-identical
  in Spark and DuckDB, so the driver oracle re-derives membership
  EXACTLY). Adding data to the corpus never flips the decision for an
  existing key (each key's hash is fixed), which is what incremental
  pipeline re-runs need.
- Shard packing avoids the global ordered cumulative sum (a single-
  partition sort at corpus scale): documents are first split into
  ``n_groups`` hash groups, each group is packed independently with one
  window partition, and the shard id is (group, local shard). All groups
  pack in parallel; budget overflow per shard is bounded by one document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# 15 lowercase hex chars = 60 bits: exact in an int64 in both engines, and
# equal-length lowercase-hex STRING comparison == numeric comparison.
_HEX_DIGITS = 15
_HEX_SPACE = 16 ** _HEX_DIGITS


def _hash_key(key: Column, seed: str) -> Column:
    """First 15 hex chars of md5(seed || key) — a uniform draw in [0, 16^15)
    encoded as a fixed-width lowercase hex string."""
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, _HEX_DIGITS)


def _threshold_hex(fraction: float) -> str:
    """fraction ∈ [0,1] → the 15-hex-digit threshold string such that
    P[hash < threshold] = floor(fraction·16^15)/16^15 ≈ fraction."""
    t = min(max(int(fraction * _HEX_SPACE), 0), _HEX_SPACE)
    if t == _HEX_SPACE:  # keep everything: 'f'*15 < 'g' for any hash value
        return "g"
    return format(t, f"0{_HEX_DIGITS}x")


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: str = "mix0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by md5(seed || key):
    deterministic, engine-portable, no RNG, no shuffle — Catalyst pushes
    the filter into the scan."""
    return df.filter(_hash_key(F.col(key_col), seed) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str = "doc_id",
    seed: str = "mix0",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (training-mix weights): e.g.
    ``{"en": 0.5, "de": 1.0}`` keeps half the English corpus and all the
    German one. Still a single scan-side filter (a CASE threshold per
    stratum); strata absent from ``fractions`` fall back to ``default``."""
    thr = F.lit(_threshold_hex(default))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(_hash_key(F.col(key_col), seed) < thr)


def pack_shards(
    df: DataFrame,
    weight_col: str,
    budget: float,
    key_col: str = "doc_id",
    n_groups: int = 256,
    seed: str = "shard0",
) -> DataFrame:
    """Assign every row to a training shard so each shard's total
    ``weight_col`` (token count, byte size, …) stays near ``budget``.

    Greedy sequential packing needs an ordered running total; a single
    global ordering would serialize the corpus through one partition, so
    rows are split into ``n_groups`` deterministic hash groups (md5 of the
    key — same groups on every engine and every re-run) and packed
    independently: within a group, rows are ordered by their hash and the
    EXCLUSIVE running weight sum picks the local shard,
    ``floor(cum_before / budget)``. Each shard therefore overshoots the
    budget by at most one document. Returns the input plus ``grp``,
    ``shard`` (local), and ``shard_id`` (globally unique =
    grp * 2^32 + shard).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    hk = _hash_key(F.col(key_col), seed)
    # first 4 hex chars = 16 bits, mod n_groups: deterministic, uniform
    grp = (
        F.conv(F.substring(hk, 1, 4), 16, 10).cast("long") % F.lit(n_groups)
    ).cast("int")
    d = df.withColumn("_hk", hk).withColumn("grp", grp)
    w = (
        W.partitionBy("grp")
        .orderBy("_hk", key_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(weight_col)).over(w), F.lit(0))
    out = d.withColumn(
        "shard", F.floor(cum_before / F.lit(float(budget))).cast("int")
    )
    return out.withColumn(
        "shard_id", (F.col("grp").cast("long") * F.lit(2**32) + F.col("shard")).cast("long")
    ).drop("_hk")


def training_mix(
    docs: DataFrame,
    strata_col: str,
    fractions: dict,
    weight_col: str,
    budget: float,
    key_col: str = "doc_id",
    n_groups: int = 256,
    seed: str = "mix0",
) -> DataFrame:
    """Stratified sample → shard packing in one call: the minimal
    "assemble a training mix" pipeline (choose mix weights per source /
    language, then cut the kept documents into budget-bounded shards)."""
    kept = stratified_sample(docs, strata_col, fractions, key_col, seed)
    return pack_shards(kept, weight_col, budget, key_col, n_groups, seed + "/pack")


def corpus_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    fractions: dict | None = None,
    min_quality: float = 0.0,
    dedup_threshold: float = 0.7,
    budget: float = 100_000.0,
    n_groups: int = 256,
    seed: str = "corpus0",
) -> DataFrame:
    """The full training-data path in one call:

        near-dup clusters -> keep one canonical doc per cluster
        -> text analysis + quality gate -> stratified mix weights
        -> token-budget shard packing

    Each stage is the scale-audited operator documented in PLANS.md /
    COVERAGE.md; this composition is what a 100 TB corpus actually runs.
    Stage plan shapes: LSH bucket joins + star-contraction rounds (dedup),
    one scan (analysis + quality + sampling filters — Catalyst fuses all
    three into the same Filter over the scan), one grouped-window exchange
    (packing). Returns the kept documents with ``cluster``, analysis
    columns, ``grp``/``shard``/``shard_id``.
    """
    from .dedup import near_dup_clusters
    from .text import analyze

    clusters = near_dup_clusters(
        docs, id_col, text_col, threshold=dedup_threshold
    ).filter(F.col("is_canonical"))
    kept = docs.join(
        clusters.select(F.col(id_col), "cluster"), id_col, "inner"
    )
    scored = analyze(kept, text_col).filter(F.col("quality") >= F.lit(min_quality))
    if fractions is not None:
        scored = stratified_sample(scored, strata_col, fractions, id_col, seed)
    return pack_shards(
        scored, "bpe_tokens", budget, id_col, n_groups, seed + "/pack"
    )
