"""Round-3 streaming: watermarked windowed aggs (late-data drop), session
windows, and the applyInPandasWithState custom stateful operator."""

import json
import time

import pytest
from pyspark.sql import functions as F

from lucille_spark.streaming.windows import (running_totals, session_windows,
                                             windowed_counts)

EV_SCHEMA = "user string, ts timestamp"


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_counts_batch_semantics(spark):
    rows = [("u1", "2024-01-01 10:00:30"), ("u1", "2024-01-01 10:04:00"),
            ("u1", "2024-01-01 10:06:00"), ("u2", "2024-01-01 10:07:10")]
    df = spark.createDataFrame(rows, "user string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = windowed_counts(df, "ts", ["user"], "5 minutes")
    got = {(str(r.window_start), r.user): r.n_events for r in out.collect()}
    assert got[("2024-01-01 10:00:00", "u1")] == 2
    assert got[("2024-01-01 10:05:00", "u1")] == 1
    assert got[("2024-01-01 10:05:00", "u2")] == 1


def test_session_windows_batch_semantics(spark):
    rows = [("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-01 10:03:00"),
            ("u1", "2024-01-01 10:30:00"), ("u2", "2024-01-01 10:00:00")]
    df = spark.createDataFrame(rows, "user string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = session_windows(df, "ts", ["user"], "10 minutes")
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r.user, []).append(r.n_events)
    assert sorted(per_user["u1"]) == [1, 2]   # 2 sessions: gap > 10 min
    assert per_user["u2"] == [1]


def test_streaming_windowed_counts_drop_late(spark, tmp_path):
    """Watermark contract end-to-end: an event arriving more than the
    watermark delay behind the max seen event time is DROPPED; finalized
    windows are emitted once (append mode)."""
    src = tmp_path / "src"
    src.mkdir()
    chk = str(tmp_path / "chk")

    # batch 1 first (the continuous query picks it up as microbatch 1):
    # establishes max event time 10:20 -> watermark 10:15; the 10:00-10:05
    # window for u1 has 2 events
    _write_jsonl(src / "b1.json", [
        {"user": "u1", "ts": "2024-01-01 10:00:10"},
        {"user": "u1", "ts": "2024-01-01 10:01:00"},
        {"user": "u1", "ts": "2024-01-01 10:20:00"},
    ])
    stream = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    agg = windowed_counts(stream, "ts", ["user"], "5 minutes",
                          watermark="5 minutes")
    q = (agg.writeStream.format("memory").queryName("winsink")
         .outputMode("append")
         .option("checkpointLocation", chk)
         .start())
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the already-finalized 10:00 window
        # (behind the 10:15 watermark -> dropped by the state store) + a
        # fresh event far ahead pushing the watermark forward
        _write_jsonl(src / "b2.json", [
            {"user": "u1", "ts": "2024-01-01 10:02:00"},  # late -> dropped
            {"user": "u1", "ts": "2024-01-01 11:00:00"},
        ])
        q.processAllAvailable()
        _write_jsonl(src / "b3.json", [
            {"user": "u1", "ts": "2024-01-01 12:00:00"},  # flush watermark
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM winsink").collect()
    got = {(str(r.window_start), r.user): r.n_events for r in rows}
    # the late 10:02 event did NOT bump the 10:00 window to 3
    assert got[("2024-01-01 10:00:00", "u1")] == 2
    assert got[("2024-01-01 10:20:00", "u1")] == 1
    assert got[("2024-01-01 11:00:00", "u1")] == 1


def test_running_totals_state_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: per-key totals accumulate in the state
    store across microbatches."""
    src = tmp_path / "src"
    src.mkdir()
    chk = str(tmp_path / "chk")

    _write_jsonl(src / "b1.json", [
        {"user": "u1", "ts": "2024-01-01 10:00:00"},
        {"user": "u1", "ts": "2024-01-01 10:01:00"},
        {"user": "u2", "ts": "2024-01-01 10:00:00"},
    ])
    stream = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    totals = running_totals(stream, "user")
    q = (totals.writeStream.format("memory").queryName("statesink")
         .outputMode("update")
         .option("checkpointLocation", chk)
         .start())
    try:
        q.processAllAvailable()
        _write_jsonl(src / "b2.json", [
            {"user": "u1", "ts": "2024-01-01 10:05:00"},
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM statesink").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append((r.total, r.batch_events))
    # u1: batch1 total 2, batch2 total 3 (state carried)
    assert (2, 2) in by_key["u1"] and (3, 1) in by_key["u1"]
    assert by_key["u2"] == [(1, 1)]
