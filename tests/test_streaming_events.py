"""Watermarked windowed event streaming (append mode, late-data drop) and
the applyInPandasWithState sessionization operator."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdalcubes_cpp_spark.streaming.events import (
    sessionize_stream,
    windowed_event_stream,
)


def _write(spark, path, rows, mode):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])
    spark.createDataFrame(pdf).write.mode(mode).parquet(path)


def test_watermarked_windows_and_late_drop(spark, tmp_path):
    in_dir, sink, cp = (str(tmp_path / d) for d in ("in", "sink", "cp"))
    T = pd.Timestamp("2024-01-01 10:00:00")
    h = pd.Timedelta(hours=1)
    m = pd.Timedelta(minutes=1)
    batch1 = [
        (1, T + 10 * m, "a", 1.0),
        (2, T + 20 * m, "a", 2.0),
        (3, T + h + 5 * m, "a", 3.0),
        (4, T + 3 * h + 59 * m, "a", 4.0),  # advances watermark to 11:59
    ]
    _write(spark, in_dir, batch1, "overwrite")
    q = windowed_event_stream(spark, in_dir, sink, cp, watermark="2 hours")
    q.awaitTermination(120)
    out1 = spark.read.parquet(sink).toPandas()
    # only the [10:00, 11:00) window is finalized (ends 11:00 <= 11:59)
    assert set(out1["ws"]) == {T}
    assert out1[out1["ws"] == T]["n"].iloc[0] == 2

    batch2 = [
        (5, T + 15 * m, "a", 99.0),        # LATE beyond watermark -> dropped
        (6, T + 6 * h, "a", 5.0),          # advances watermark to 14:00
    ]
    _write(spark, in_dir, batch2, "append")
    q2 = windowed_event_stream(spark, in_dir, sink, cp, watermark="2 hours")
    q2.awaitTermination(120)
    out2 = spark.read.parquet(sink).toPandas().sort_values("ws").reset_index(drop=True)
    # the 10:00 window emitted ONCE, count still 2 (late row dropped)
    w10 = out2[out2["ws"] == T]
    assert len(w10) == 1 and w10["n"].iloc[0] == 2
    # 11:00 and 13:00 windows now finalized
    assert T + h in set(out2["ws"])
    assert T + 3 * h in set(out2["ws"])


def test_sessionize_stream(spark, tmp_path):
    in_dir, sink, cp = (str(tmp_path / d) for d in ("in", "sink", "cp"))
    T = pd.Timestamp("2024-01-01 08:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # type 'a': two sessions separated by > 30 min
        (1, T, "a", 1.0),
        (2, T + 10 * m, "a", 1.0),
        (3, T + 20 * m, "a", 1.0),
        (4, T + 90 * m, "a", 1.0),
        (5, T + 95 * m, "a", 1.0),
        # type 'b': one session
        (6, T + 5 * m, "b", 1.0),
        (7, T + 6 * m, "b", 1.0),
    ]
    _write(spark, in_dir, rows, "overwrite")
    q = sessionize_stream(spark, in_dir, sink, cp, gap_minutes=30)
    q.awaitTermination(120)
    out = spark.read.parquet(sink).toPandas().sort_values(
        ["event_type", "session_start"]
    ).reset_index(drop=True)
    # CLOSED sessions emit: a's first session closes IN-BATCH (event 4 is
    # > 30 min after event 3), and b's session closes via the EVENT-TIME
    # timeout (the final availableNow batch sees watermark T+95m, past
    # b's last event + gap). a's second session stays open in state.
    assert len(out) == 2
    r = out.iloc[0]
    assert r["event_type"] == "a" and r["n_events"] == 3
    assert r["session_start"] == T and r["session_end"] == T + 20 * m
    rb = out.iloc[1]
    assert rb["event_type"] == "b" and rb["n_events"] == 2
    assert rb["session_start"] == T + 5 * m and rb["session_end"] == T + 6 * m
    # the BATCH TWIN (sessionize_batch) computes ALL sessions with the same
    # gap rule; the stream's closed session must be one of them, bit-equal
    from gdalcubes_cpp_spark.streaming.events import sessionize_batch

    batch = (
        sessionize_batch(
            spark.read.parquet(in_dir), key_col="event_type", gap_minutes=30
        )
        .toPandas()
        .sort_values(["event_type", "session"])
        .reset_index(drop=True)
    )
    assert len(batch) == 3  # a: two sessions, b: one
    want = {
        ("a", 1): (T, T + 20 * m, 3),
        ("a", 2): (T + 90 * m, T + 95 * m, 2),
        ("b", 1): (T + 5 * m, T + 6 * m, 2),
    }
    got = {
        (r_["event_type"], r_["session"]): (
            r_["session_start"], r_["session_end"], r_["n_events"]
        )
        for _, r_ in batch.iterrows()
    }
    assert got == want
    closed = got[("a", 1)]
    assert closed == (r["session_start"], r["session_end"], r["n_events"])
    assert got[("b", 1)] == (rb["session_start"], rb["session_end"], rb["n_events"])


def test_sessionize_batch_random_micros(spark):
    """Randomized microsecond-precision events vs a pure-python
    sessionizer — locks the exact gap semantics (strict >, micros, tie
    order) that the sf0.01 driver data cannot fully exercise."""
    import random

    rng = random.Random(11)
    base = pd.Timestamp("2024-03-01").value // 1000  # micros
    gap_us = 5 * 60 * 1_000_000
    rows = []
    eid = 0
    for user in range(7):
        t = base + rng.randrange(0, 10**9)
        for _ in range(rng.randrange(5, 60)):
            # gaps cluster around the threshold, including EXACT hits
            t += rng.choice([1, 10**6, gap_us - 1, gap_us, gap_us + 1,
                             rng.randrange(1, 2 * gap_us)])
            rows.append((eid, pd.Timestamp(t, unit="us"), user))
            eid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    )
    from gdalcubes_cpp_spark.streaming.events import sessionize_batch

    got = {
        (r["user_id"], r["session"]): (
            pd.Timestamp(r["session_start"]).value // 1000,
            pd.Timestamp(r["session_end"]).value // 1000,
            r["n_events"],
        )
        for r in sessionize_batch(df, gap_minutes=5).collect()
    }
    # pure-python oracle
    byu = {}
    for _eid, ts, u in rows:
        byu.setdefault(u, []).append(ts.value // 1000)
    want = {}
    for u, tss in byu.items():
        tss.sort()
        sess, start, last, n = 1, tss[0], tss[0], 0
        for t in tss:
            if t - last > gap_us:
                want[(u, sess)] = (start, last, n)
                sess, start, n = sess + 1, t, 0
            last = t
            n += 1
        want[(u, sess)] = (start, last, n)
    assert got == want


def test_sessionize_event_time_replay_determinism(spark, tmp_path):
    """Event-time timeout (r3 VERDICT next #10): the open session closes
    when the WATERMARK passes last+gap — a pure function of the data — so
    (a) a key with NO new events still closes once other keys advance the
    watermark, and (b) replaying the same batch sequence from scratch
    produces byte-identical closed sessions (no wall clock anywhere)."""
    T = pd.Timestamp("2024-01-01 08:00:00")
    m = pd.Timedelta(minutes=1)
    batch1 = [
        (1, T, "a", 1.0), (2, T + 10 * m, "a", 1.0), (3, T + 20 * m, "a", 1.0),
        (4, T + 90 * m, "a", 1.0), (5, T + 95 * m, "a", 1.0),
        (6, T + 5 * m, "b", 1.0), (7, T + 6 * m, "b", 1.0),
    ]
    batch2 = [(8, T + 300 * m, "a", 1.0)]

    def run_sequence(tag):
        in_dir, sink, cp = (str(tmp_path / f"{d}_{tag}") for d in ("in", "sink", "cp"))
        _write(spark, in_dir, batch1, "overwrite")
        q = sessionize_stream(spark, in_dir, sink, cp, gap_minutes=30)
        q.awaitTermination(120)
        _write(spark, in_dir, batch2, "append")
        q = sessionize_stream(spark, in_dir, sink, cp, gap_minutes=30)
        q.awaitTermination(120)
        out = spark.read.parquet(sink).toPandas()
        return out.sort_values(
            ["event_type", "session_start"]
        ).reset_index(drop=True)

    out = run_sequence("r1")
    # closed: a1 in-batch (batch 1), a2 in-batch (batch 2's 300m event),
    # and b via EVENT-TIME timeout — watermark T+95m passed b's
    # last(T+6m)+30m although 'b' itself saw no new event
    want = [
        ("a", T, T + 20 * m, 3),
        ("a", T + 90 * m, T + 95 * m, 2),
        ("b", T + 5 * m, T + 6 * m, 2),
    ]
    got = [
        (r["event_type"], r["session_start"], r["session_end"], r["n_events"])
        for _, r in out.iterrows()
    ]
    assert got == want
    # closed set == the batch twin's CLOSED sessions on the same data
    # (everything except the open tail at T+300m)
    from gdalcubes_cpp_spark.streaming.events import sessionize_batch

    allb = sessionize_batch(
        spark.createDataFrame(
            pd.DataFrame(batch1 + batch2,
                         columns=["event_id", "ts", "event_type", "value"])
        ),
        key_col="event_type", gap_minutes=30,
    ).toPandas()
    closed_batch = sorted(
        (r["event_type"], r["session_start"], r["session_end"], r["n_events"])
        for _, r in allb.iterrows()
        if not (r["event_type"] == "a" and r["session_start"] == T + 300 * m)
    )
    assert closed_batch == sorted(want)
    # full replay from scratch: identical output, event-time clocks only
    out2 = run_sequence("r2")
    assert out.equals(out2)


def test_sessionize_tws_matches_legacy(spark, tmp_path):
    """Spark 4's transformWithStateInPandas twin (typed state + explicit
    event-time timers, RocksDB store): identical closed sessions to the
    applyInPandasWithState engine on the same two-batch sequence."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas's python driver worker needs "
               "protobuf (not in this container)",
    )
    from gdalcubes_cpp_spark.streaming.events import sessionize_stream_tws

    T = pd.Timestamp("2024-01-01 08:00:00")
    m = pd.Timedelta(minutes=1)
    batch1 = [
        (1, T, "a", 1.0), (2, T + 10 * m, "a", 1.0), (3, T + 20 * m, "a", 1.0),
        (4, T + 90 * m, "a", 1.0), (5, T + 95 * m, "a", 1.0),
        (6, T + 5 * m, "b", 1.0), (7, T + 6 * m, "b", 1.0),
    ]
    batch2 = [(8, T + 300 * m, "a", 1.0)]

    def run(fn, tag):
        in_dir, sink, cp = (str(tmp_path / f"{d}_{tag}") for d in ("in", "sink", "cp"))
        _write(spark, in_dir, batch1, "overwrite")
        fn(spark, in_dir, sink, cp, gap_minutes=30).awaitTermination(120)
        _write(spark, in_dir, batch2, "append")
        fn(spark, in_dir, sink, cp, gap_minutes=30).awaitTermination(120)
        out = spark.read.parquet(sink).toPandas()
        return out.sort_values(["event_type", "session_start"]).reset_index(drop=True)

    got_tws = run(sessionize_stream_tws, "tws")
    got_legacy = run(sessionize_stream, "legacy")
    assert got_tws.equals(got_legacy)
    assert len(got_tws) == 3  # a1, a2, b (b closes purely by timer)
