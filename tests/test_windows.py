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


def test_hierarchical_rollup_equals_direct(spark):
    """Continuous-aggregate contract: hourly-from-minutely == hourly-from-raw."""
    import pyspark.sql.functions as F
    from lucene_plugin_spark.ops.windows import (hierarchical_rollup,
                                                 tumbling_counts)
    rows = [(i, i % 3, "t" + str(i % 2),
             f"2024-01-01 {10 + i % 3:02d}:{(7 * i) % 60:02d}:00", float(i))
            for i in range(40)]
    ev = (spark.createDataFrame(rows, "event_id long, user_id long, "
                                "event_type string, ts string, value double")
          .withColumn("ts", F.to_timestamp("ts")))
    direct = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
              for r in tumbling_counts(ev).collect()}
    tiered = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
              for r in hierarchical_rollup(ev).collect()}
    assert tiered == direct


def test_rollup_counts_has_subtotals(spark):
    import pyspark.sql.functions as F
    from lucene_plugin_spark.ops.windows import rollup_counts
    rows = [(1, 1, "a", "2024-01-01 10:05:00", 1.0),
            (2, 1, "b", "2024-01-01 10:10:00", 2.0),
            (3, 1, "a", "2024-01-01 11:05:00", 4.0)]
    ev = (spark.createDataFrame(rows, "event_id long, user_id long, "
                                "event_type string, ts string, value double")
          .withColumn("ts", F.to_timestamp("ts")))
    out = {(r["window_start"], r["key"]): (r["n_events"], r["sum_value"])
           for r in rollup_counts(ev).collect()}
    h10 = 1704103200
    assert out[(h10, "a")] == (1, 1.0)
    assert out[(h10, None)] == (2, 3.0)        # per-window subtotal
    assert out[(None, None)] == (3, 7.0)       # grand total
