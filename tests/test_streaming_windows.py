"""Streaming event-time operators: watermarked tumbling windows + stateful
sessionizer (applyInPandasWithState) — late data behind the watermark is
dropped, sessions close on gap or event-time timeout."""

import json
import os
import time

from lucene_plugin_spark.streaming.windows import (stream_sessionize,
                                                   stream_tumbling_counts)

SCHEMA = ("event_id long, user_id long, event_type string, ts timestamp, "
          "value double")


def _write(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, src_dir):
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).json(src_dir))


def test_streaming_watermark_and_sessions(spark, tmp_path):
    src = str(tmp_path / "ev")
    os.makedirs(src)
    # batch 0: two users inside hour 10; max event time 10:05
    _write(src, "b0.json", [
        {"event_id": 1, "user_id": 1, "event_type": "view",
         "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"event_id": 2, "user_id": 1, "event_type": "view",
         "ts": "2024-01-01 10:05:00", "value": 2.0},
        {"event_id": 3, "user_id": 2, "event_type": "click",
         "ts": "2024-01-01 10:00:00", "value": 5.0},
    ])
    time.sleep(1.2)  # file-source processes in mod-time order
    # batch 1: a far-later event (closes user 1's session; also advances the
    # watermark, which takes effect from the NEXT batch)
    _write(src, "b1.json", [
        {"event_id": 4, "user_id": 1, "event_type": "view",
         "ts": "2024-01-01 11:00:00", "value": 3.0},
    ])
    time.sleep(1.2)
    # batch 2: a TOO-LATE event — 07:00 is behind the committed watermark
    # (09:35 after batch 0, 10:30 after batch 1) -> dropped by the state op
    _write(src, "b2.json", [
        {"event_id": 5, "user_id": 2, "event_type": "late",
         "ts": "2024-01-01 07:00:00", "value": 99.0},
    ])

    wq = (stream_tumbling_counts(_stream(spark, src), watermark="30 minutes")
          .writeStream.format("memory").queryName("win_out")
          .outputMode("update").trigger(availableNow=True).start())
    wq.awaitTermination(180)
    win = spark.sql("SELECT * FROM win_out").collect()
    starts = {(r["window_start"].hour, r["event_type"]) for r in win}
    assert (10, "view") in starts and (11, "view") in starts
    # the 07:00 late event's window closed before the watermark ->
    # the row is dropped, no 07:00 window is ever emitted
    assert not any(r["window_start"].hour == 7 for r in win)

    sq = (stream_sessionize(_stream(spark, src), gap="30 minutes",
                            watermark="30 minutes")
          .writeStream.format("memory").queryName("sess_out")
          .outputMode("append").trigger(availableNow=True).start())
    sq.awaitTermination(180)
    sess = spark.sql("SELECT * FROM sess_out").collect()
    closed = {(r["user_id"], r["session_start"].hour, r["n_events"],
               r["sum_value"]) for r in sess}
    # user 1's hour-10 session closed by the 11:00 event: 2 events, 3.0 value
    assert (1, 10, 2, 3.0) in closed
    # user 2's session is still open (no later event, watermark never passes
    # its timeout) and the too-late 07:00 event did not open a new one
    assert not any(u == 2 for u, *_ in closed)


def test_streaming_exact_dedup(spark, tmp_path):
    from lucene_plugin_spark.streaming.windows import stream_exact_dedup
    src = str(tmp_path / "dup")
    os.makedirs(src)
    _write(src, "b0.json", [
        {"event_id": 1, "user_id": 1, "event_type": "view",
         "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"event_id": 2, "user_id": 1, "event_type": "view",
         "ts": "2024-01-01 10:01:00", "value": 2.0},
        {"event_id": 1, "user_id": 1, "event_type": "view",
         "ts": "2024-01-01 10:00:00", "value": 1.0},  # intra-batch dup
    ])
    time.sleep(1.2)
    _write(src, "b1.json", [
        {"event_id": 2, "user_id": 1, "event_type": "view",
         "ts": "2024-01-01 10:01:00", "value": 2.0},  # cross-batch replay
        {"event_id": 3, "user_id": 2, "event_type": "click",
         "ts": "2024-01-01 10:02:00", "value": 3.0},
    ])
    q = (stream_exact_dedup(_stream(spark, src), ["event_id"])
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    got = sorted(r["event_id"] for r in rows)
    assert got == [1, 2, 3]  # each id exactly once despite 2 duplicates
