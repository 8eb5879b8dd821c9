"""Text-analysis operators for large-scale training-data pipelines over the
``documents`` table: token counting, quality scoring, language ID,
fingerprinting. All native Spark SQL expressions (JVM-side, codegen'd) —
no Python UDFs — and every formula is reproducible in ANSI/DuckDB SQL so the
driver's oracle can value-check them.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# deliberately small, deterministic marker sets (not a real langid model —
# a scalable n-gram/stopword heuristic with the same Spark-side shape)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|und|ist|nicht|das)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
    "es": r"\b(el|la|los|que|es|una)\b",
}

BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # word / number / punct pieces


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + punct marks."""
    return F.regexp_count(text, F.lit(BPE_ISH))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    words = ws_token_count(text)
    stops = F.regexp_count(F.lower(text), F.lit(LANG_MARKERS["en"]))
    return F.when(words > 0, stops.cast("double") / words).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    letters = F.regexp_count(text, F.lit(r"[A-Za-z]"))
    words = ws_token_count(text)
    return F.when(words > 0, letters.cast("double") / words).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: favors mid-length documents,
    moderate punctuation, presence of stopwords, sane word lengths — the
    standard pretraining-corpus filters (C4/Gopher-style rules)."""
    n = F.length(text)
    len_score = F.least(n.cast("double") / 500.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    stop_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    wl = mean_word_len(text)
    wl_score = F.when((wl >= 2.5) & (wl <= 9.0), F.lit(1.0)).otherwise(F.lit(0.3))
    return (len_score * 0.3 + punct_pen * 0.25 + stop_score * 0.25 + wl_score * 0.2)


def lang_scores(text: Column) -> dict:
    t = F.lower(text)
    return {
        lang: F.regexp_count(t, F.lit(pat)).cast("double") / F.greatest(ws_token_count(text), F.lit(1)).cast("double")
        for lang, pat in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by marker-stopword density; 'und' if all zero.
    Ties break by the fixed en<de<fr<es priority (deterministic)."""
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct(scores[lang].alias("s"), F.lit(i).alias("p"), F.lit(lang).alias("l"))
          for i, lang in enumerate(LANG_MARKERS)]
    )
    best = F.array_max(F.transform(pairs, lambda s: F.struct(s["s"].alias("s"), (-s["p"]).alias("p"), s["l"].alias("l"))))
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def normalize_text(text: Column) -> Column:
    """lowercase, strip punctuation, collapse whitespace — the canonical
    form used for fingerprints and near-dup shingles."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (md5 is available
    and bit-identical in Spark and DuckDB — the cross-engine oracle hash)."""
    return F.md5(normalize_text(text))


def analyze(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis: all metrics as native columns."""
    from ..partition import spread

    docs = spread(docs)  # regex-heavy per row: widen single-row-group scans
    t = F.col(text_col)
    return docs.withColumns(
        {
            "ws_tokens": ws_token_count(t),
            "bpe_tokens": bpe_token_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "mean_word_len": mean_word_len(t),
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )


def unigram_lm_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> DataFrame:
    """Build the Laplace-smoothed unigram vocabulary (token, logp) of the
    ``vocab_size`` most frequent corpus tokens — the reference
    distribution to pass as ``vocab=`` to :func:`unigram_lm_scores` for
    the CCNet setup (score a NEW corpus against a held reference corpus).
    One capped token-count shuffle; the result is broadcastable."""
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.length("tok") > 0)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), "tok").limit(vocab_size)
    # Laplace: p(t) = (n_t + 1) / (total + V + 1); OOV -> 1 / (total + V + 1)
    tot = top.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("v")).collect()[0]
    denom = float(tot["t"] + tot["v"] + 1)
    return top.select(
        "tok", F.log((F.col("n") + 1) / F.lit(denom)).alias("logp")
    )


def unigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Corpus-trained unigram language-model score per document — the
    standard perplexity-style quality filter (CCNet-shape: score against
    a reference distribution, drop the tail). Returns
    (id, n_tokens, oov_ratio, lm_logprob) where lm_logprob is the mean
    log p(token) under Laplace-smoothed unigram probabilities of the
    ``vocab_size`` most frequent corpus tokens (OOV tokens take the
    smoothing floor mass).

    Scale shape: ONE token-count shuffle builds the vocabulary (capped —
    broadcastable), one broadcast join scores tokens, one per-doc
    aggregation. Pass ``vocab`` (from :func:`unigram_lm_vocab`, or any
    (token, logp) frame) to score a NEW corpus against a reference
    corpus's distribution — the actual CCNet filtering setup — without
    retraining."""
    from ..partition import spread

    docs = spread(docs)
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.length("tok") > 0)
    if vocab is None:
        vocab = unigram_lm_vocab(docs, text_col=text_col, vocab_size=vocab_size)
    # the OOV floor is one notch under the minimum vocab mass (for a
    # self-trained Laplace vocab this is exactly log(1/denom) when the
    # rarest kept token has n=1; for a reference vocab it is the same
    # conservative floor rule)
    floor = vocab.agg(F.min("logp")).collect()[0][0] - math.log(2.0)
    from pyspark.sql.functions import broadcast

    scored = toks.join(broadcast(vocab), "tok", "left").select(
        "_id",
        F.coalesce("logp", F.lit(float(floor))).alias("lp"),
        F.col("logp").isNull().cast("int").alias("oov"),
    )
    return scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("oov") / F.count(F.lit(1))).alias("oov_ratio"),
        F.avg("lp").alias("lm_logprob"),
    ).withColumnRenamed("_id", id_col)


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition/quality filters (Rae et al. 2021,
    "Scaling Language Models", App. A1.1 — the standard heuristics for
    pruning low-quality/repetitive web text before LLM training):

    - ``dup_line_frac``       — duplicated lines / total non-empty lines
    - ``dup_line_char_frac``  — characters in repeat occurrences of a
                                line / characters in all lines
    - ``top2_char_frac``      — chars covered by the most frequent word
                                2-gram (count * len(bigram) / len(text));
                                ties break to the LARGEST bigram string
    - ``alpha_word_frac``     — words containing an alphabetic char / words
    - ``symbol_word_ratio``   — '#' or '...' occurrences / words

    Scale shape: the line/word metrics are pure array expressions inside
    the scan (no shuffle, no UDF). The top-bigram mode is the one metric
    that needs an aggregation; it runs as explode + groupBy(doc, bigram)
    + max(struct(cnt, bigram)) — both aggs partial-combine map-side, and
    the key includes doc_id so the shuffle is skew-free even at 100 TB
    (no global hot key; a doc's bigrams co-locate). A per-doc quadratic
    higher-order-function formulation would avoid the shuffle but blows
    up on long documents; explode stays linear.

    Every formula is exact-integer arithmetic with one final division —
    reproducible bit-for-bit in DuckDB for the driver oracle
    (cf. reference src/... : the reference engine has no text pipeline;
    this family extends it for training-data curation)."""
    from ..partition import spread

    docs = spread(docs)
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(x) > 0)
    words = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    base = docs.select(
        F.col(id_col),
        F.length(t).alias("_nchars"),
        F.array_size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), 0)).alias("_nsym"),
        lines.alias("_lines"),
        words.alias("_words"),
    ).select(
        id_col, "_nchars", "_nsym", "_words",
        F.size("_words").alias("_nw"),
        F.size(F.filter("_words", lambda w: w.rlike("[A-Za-z]"))).alias("_nalpha"),
        F.size("_lines").alias("_nl"),
        F.size(F.array_distinct("_lines")).alias("_nld"),
        F.aggregate("_lines", F.lit(0), lambda a, x: a + F.length(x)).alias("_lc"),
        F.aggregate(F.array_distinct("_lines"), F.lit(0),
                    lambda a, x: a + F.length(x)).alias("_lcd"),
    )
    bigrams = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("_nw") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.col("_nw") - 2),
                    lambda i: F.concat(
                        F.element_at("_words", i + 1), F.lit(" "),
                        F.element_at("_words", i + 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    top = (
        bigrams.groupBy(id_col, "bigram").agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max(F.struct(F.col("cnt"), F.col("bigram"))).alias("_top"))
        .select(id_col, F.col("_top.cnt").alias("_tc"),
                F.col("_top.bigram").alias("_tb"))
    )
    zero = F.lit(0.0)
    out = base.join(top, on=id_col, how="left").select(
        id_col,
        F.when(F.col("_nl") > 0,
               (F.col("_nl") - F.col("_nld")).cast("double") / F.col("_nl"))
         .otherwise(zero).alias("dup_line_frac"),
        F.when(F.col("_lc") > 0,
               (F.col("_lc") - F.col("_lcd")).cast("double") / F.col("_lc"))
         .otherwise(zero).alias("dup_line_char_frac"),
        F.when((F.col("_nchars") > 0) & F.col("_tc").isNotNull(),
               (F.col("_tc") * F.length("_tb")).cast("double") / F.col("_nchars"))
         .otherwise(zero).alias("top2_char_frac"),
        F.when(F.col("_nw") > 0,
               F.col("_nalpha").cast("double") / F.col("_nw"))
         .otherwise(zero).alias("alpha_word_frac"),
        F.when(F.col("_nw") > 0,
               F.col("_nsym").cast("double") / F.col("_nw"))
         .otherwise(zero).alias("symbol_word_ratio"),
    )
    return out


# PII patterns — deliberately restricted to constructs with IDENTICAL
# semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
# bounded repetition, non-capturing groups, \b word boundaries. Both
# engines do leftmost-earliest non-overlapping matching for these, so
# counts and global replacement agree bit-for-bit cross-engine.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,2} [0-9]{3} [0-9]{3,4} [0-9]{2,4}"


def redact_pii(text: Column) -> Column:
    """Replace emails, then IPv4s, then intl-format phone numbers with
    typed placeholder tokens (this order prevents the IP pattern from
    matching digit runs inside an address already consumed as an email).
    Pure regexp_replace chain — scan-side, no shuffle, no UDF."""
    t = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_IPV4, "<IP>")
    return F.regexp_replace(t, PII_PHONE, "<PHONE>")


def pii_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII detection + redaction over the corpus (the standard
    pre-training privacy scrub — cf. BigScience ROOTS / Dolma pipelines):
    per-document counts of emails / IPv4 addresses / phone numbers, a
    combined ``pii_count``, and ``redacted_hash`` = md5 of the text after
    :func:`redact_pii` (the hash travels through the driver oracle instead
    of the full redacted text; equality proves the redaction byte-exact).

    Scale shape: pure column expressions inside the scan — zero UDFs,
    whole-stage codegen; at 100 TB this rides whatever scan the curation
    pipeline already does. One caveat: partition.spread widens a
    narrower-than-session-parallelism input with a round-robin shuffle
    first (regex-heavy rows; see partition.py), so an input deliberately
    coalesced below defaultParallelism does pay one exchange here."""
    from ..partition import spread

    docs = spread(docs)
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0)).alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), 0)).alias("n_phones"),
        (
            F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0))
            + F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0))
            + F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), 0))
        ).alias("pii_count"),
        F.md5(redact_pii(t)).alias("redacted_hash"),
    )
