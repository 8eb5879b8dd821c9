"""Streaming near-duplicate detection: continuous-ingestion dedup.

A 100 TB corpus is not ingested once — it ARRIVES. Batch LSH
(functions/dedup.py) answers "which docs in this table are near-dups";
this operator answers the streaming form: "is each NEWLY ARRIVED doc a
near-dup of anything seen so far", without re-scanning the corpus per
batch. Same public scheme (Broder minhash + banding, md5 hashes); the
seen-so-far side lives in bounded per-bucket operator state.

Plan shape: one mapInPandas (signatures) → stateless band explode → ONE
stateful exchange keyed on (band, band_key) via applyInPandasWithState.
State per bucket is a capped list of (doc_id, signature) — the same
``max_bucket`` representative cap that bounds the batch path's
mega-bucket blowup bounds the streaming state (empty/templated docs all
hash to one bucket; without the cap that bucket's state and its
per-arrival compare cost grow without limit).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

DOC_DDL = "doc_id long, text string"

_SEP = "\x1f"


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    sink: str,
    checkpoint: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 512,
):
    """File-source document stream -> near-dup candidate pairs
    ``(doc_a, doc_b, est_jaccard, band)`` where doc_b arrived in an
    EARLIER batch (or earlier in the same batch) and est_jaccard =
    fraction of agreeing minhash components (the standard unbiased
    Jaccard estimate) >= ``threshold``. A pair colliding in several
    bands emits once per band — downstream dedups on (doc_a, doc_b)
    exactly like the batch path keeps first-band candidates.
    Returns the StreamingQuery."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.dedup import minhash_signature

    if k % bands:
        raise ValueError("k must be divisible by bands")
    r = k // bands

    stream = spark.readStream.schema(DOC_DDL).parquet(input_dir)
    sig = minhash_signature(stream, k=k, shingle_n=shingle_n)
    # band rows CARRY the full signature: re-attaching it later would be a
    # stream-stream join (watermark state, latency) for no reason
    full = F.concat_ws("|", *[F.col(f"mh_{i}") for i in range(k)])
    banded = sig.select(
        "doc_id",
        full.alias("sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])
                    ).alias("band_key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            ids_s, sigs_s = state.get
            seen_ids = [int(v) for v in ids_s.split(_SEP)] if ids_s else []
            seen_sigs = sigs_s.split(_SEP) if sigs_s else []
        else:
            seen_ids, seen_sigs = [], []
        out = []
        arrivals = []
        for pdf in pdfs:
            arrivals.extend(zip((int(v) for v in pdf["doc_id"]), pdf["sig"]))
        arrivals.sort()  # deterministic order within a micro-batch
        for doc_id, s in arrivals:
            parts = s.split("|")
            for sid, ssig in zip(seen_ids, seen_sigs):
                if sid == doc_id:
                    continue
                sp = ssig.split("|")
                est = sum(a == b for a, b in zip(parts, sp)) / len(parts)
                if est >= threshold:
                    out.append((min(doc_id, sid), max(doc_id, sid), est, key[0]))
            if len(seen_ids) < max_bucket:  # same representative cap as batch
                seen_ids.append(doc_id)
                seen_sigs.append(s)
        state.update((
            _SEP.join(str(v) for v in seen_ids),
            _SEP.join(seen_sigs),
        ))
        yield pd.DataFrame(
            out, columns=["doc_a", "doc_b", "est_jaccard", "band"]
        )

    pairs = banded.groupBy("band", "band_key").applyInPandasWithState(
        fn,
        outputStructType="doc_a long, doc_b long, est_jaccard double, band int",
        stateStructType="ids string, sigs string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        pairs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
