"""Event-time window operators (ops/windows.py): tumbling windows, gap
sessions, JSON extraction — same expressions Structured Streaming runs."""

import datetime

import pyspark.sql.functions as F


def _events(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions separated by a 40-minute gap
    for i, off in enumerate([0, 5, 10, 50, 55]):
        rows.append((i, base + datetime.timedelta(minutes=off), 1, "click", 1.0,
                     '{"k": %d}' % i))
    # user 2: one session spanning an hour boundary
    rows.append((10, base + datetime.timedelta(minutes=55), 2, "view", 2.0, '{"k": 7}'))
    rows.append((11, base + datetime.timedelta(minutes=65), 2, "view", 2.0, '{"k": 8}'))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")


def test_tumbling_counts(spark):
    from lucene_plugin_spark.ops.windows import tumbling_counts
    out = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in tumbling_counts(_events(spark)).collect()}
    h0 = int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp())
    assert out[(h0, "click")] == (5, 5.0)
    assert out[(h0, "view")] == (1, 2.0)
    assert out[(h0 + 3600, "view")] == (1, 2.0)


def test_sessionize_gap_semantics(spark):
    from lucene_plugin_spark.ops.windows import sessionize
    rows = sessionize(_events(spark)).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append((r["session_start"], r["n_events"]))
    base = int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp())
    # user 1: [0,5,10] then 40-min gap then [50,55]
    assert sorted(per_user[1]) == [(base, 3), (base + 50 * 60, 2)]
    # user 2: 10-minute gap keeps one session across the hour boundary
    assert per_user[2] == [(base + 55 * 60, 2)]


def test_json_props(spark):
    from lucene_plugin_spark.ops.windows import json_props
    out = {r["event_id"]: r["k"] for r in json_props(_events(spark)).collect()}
    assert out[0] == 0 and out[4] == 4 and out[10] == 7
