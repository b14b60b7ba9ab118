"""Event-time window operators over the events stream table.

The reference has no event-time semantics (SURVEY.md §2.5: its only
streaming-ish machinery is the NRT soft-commit count-or-age trigger, W6) —
these are the engine's forward-looking analytics surface for stream tables,
built on Spark's native window primitives so the SAME expressions run under
Structured Streaming (``readStream`` + watermark) unchanged:

- ``tumbling_counts``  — fixed windows via ``F.window`` (epoch-aligned)
- ``sessionize``       — gap-based sessions via ``F.session_window``
- ``json_props``       — JSON scalar extraction from the props column
  (the Tika-structured-content analogue, S3: format-specific parsing stays
  a built-in JVM expression, never a Python UDF)

Timestamps are returned as epoch seconds (bigint) so results are timezone-
representation-free; session.py pins ``spark.sql.session.timeZone=UTC``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type", value_col: str = "value",
                    window: str = "1 hour") -> DataFrame:
    """(window_start, key, n_events, sum_value) per tumbling window.

    Two-phase hash aggregation (map-side partial) on (window, key); under
    streaming this is exactly ``withWatermark(ts).groupBy(window(...))``.
    """
    w = F.window(F.col(ts_col), window)
    return (events.groupBy(w.alias("w"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                    F.col(key_col), "n_events", "sum_value"))


def sliding_counts(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "event_type", value_col: str = "value",
                   window: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """(window_start, key, n_events, sum_value) per SLIDING window.

    ``F.window(ts, window, slide)`` assigns each event to window/slide
    overlapping windows (an internal explode — rows multiply by the overlap
    factor, then the same two-phase hash aggregation as tumbling).  Streaming
    form is identical under a watermark.
    """
    w = F.window(F.col(ts_col), window, slide)
    return (events.groupBy(w.alias("w"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                    F.col(key_col), "n_events", "sum_value"))


def sessionize(events: DataFrame, ts_col: str = "ts",
               user_col: str = "user_id", value_col: str = "value",
               gap: str = "30 minutes") -> DataFrame:
    """(user, session_start, n_events, sum_value) per gap-based session.

    ``F.session_window`` merges events whose inter-arrival gap is below
    ``gap`` (end-exclusive: a gap of exactly ``gap`` starts a new session);
    the equivalent ANSI-SQL formulation is lag + running break-count.
    """
    return (events.groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                           F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(F.col(user_col),
                    F.unix_timestamp(F.col("w.start")).alias("session_start"),
                    "n_events", "sum_value"))


def json_props(events: DataFrame, json_col: str = "props",
               key: str = "k") -> DataFrame:
    """(event_id, k) — JSON field extraction as a JVM built-in expression."""
    return events.select(
        "event_id",
        F.get_json_object(F.col(json_col), f"$.{key}").cast("long").alias(key))


def hierarchical_rollup(events: DataFrame, ts_col: str = "ts",
                        key_col: str = "event_type", value_col: str = "value",
                        fine: str = "1 minute",
                        coarse: str = "1 hour") -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the COARSE aggregate is
    computed from the FINE pre-aggregate, never from raw rows.

    This is the property that makes continuous aggregates cheap at 100 TB:
    the fine tier is the only scan of raw data; every coarser tier re-uses
    it (counts sum, sums sum — the algebraic-aggregate contract).  Returns
    (window_start, key, n_events, sum_value) at the coarse granularity,
    identical to aggregating raw rows directly (pytest + oracle pin it).
    """
    fine_agg = (events.groupBy(F.window(F.col(ts_col), fine).alias("w"),
                               F.col(key_col))
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(value_col).alias("sum_value")))
    return (fine_agg
            .groupBy(F.window(F.col("w.start"), coarse).alias("cw"),
                     F.col(key_col))
            .agg(F.sum("n_events").alias("n_events"),
                 F.round(F.sum("sum_value"), 6).alias("sum_value"))
            .select(F.unix_timestamp(F.col("cw.start")).alias("window_start"),
                    F.col(key_col), "n_events", "sum_value"))


def rollup_counts(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "event_type", value_col: str = "value",
                  window: str = "1 hour") -> DataFrame:
    """ROLLUP grouping over (window, key): per-(window, key) rows, per-window
    subtotals and the grand total in one pass (Spark's rollup = GROUPING
    SETS; two-phase hash agg underneath, same as a flat groupBy)."""
    w = F.window(F.col(ts_col), window)
    return (events
            .select(F.unix_timestamp(w.getField("start")).alias("window_start"),
                    F.col(key_col).alias("key"), F.col(value_col))
            .rollup("window_start", "key")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value")))
