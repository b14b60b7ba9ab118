"""Event-time streaming operators: watermarked windowed aggregation and a
custom stateful sessionizer (applyInPandasWithState).

The batch twins live in ``ops/windows.py`` (oracle-checked: ev_window_counts
/ ev_sessionize); these are the ``readStream`` forms — same output schemas,
plus the streaming-only semantics: a watermark bounds how late an event may
arrive (older rows are dropped, state for closed windows is reclaimed), and
sessions are tracked per key in executor state with an event-time timeout
instead of a global sort.

Scale notes: the windowed aggregation is Spark's native streaming state
store (RocksDB-backed on a real cluster) — partial aggregation per batch,
state keyed by (window, event_type).  The sessionizer keeps ONE small state
tuple per user_id; emission is vectorized numpy break-detection per batch,
not per-event Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)


def stream_tumbling_counts(events: DataFrame, ts_col: str = "ts",
                           window: str = "1 hour",
                           watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window counts over a streaming events frame.

    Output (window_start, event_type, n_events, sum_value) — the streaming
    twin of ``ops.windows.tumbling_counts``.  Rows later than ``watermark``
    behind the max seen event time are dropped; in append output mode a
    window emits once, when the watermark passes its end.
    """
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

_SESSION_STATE = StructType([
    StructField("start_s", DoubleType()),
    StructField("last_s", DoubleType()),
    StructField("n", LongType()),
    StructField("sv", DoubleType()),
])


def stream_sessionize(events: DataFrame, gap: str = "30 minutes",
                      ts_col: str = "ts",
                      watermark: str = "30 minutes") -> DataFrame:
    """Custom stateful operator: per-user sessions with an inactivity gap,
    via ``applyInPandasWithState`` (one state tuple per user; event-time
    timeout flushes a session once the watermark passes start+gap).

    A session CLOSES when a later event arrives >= gap after the previous
    one (emitted immediately) or when the event-time timeout fires.  The
    batch twin is ``ops.windows.sessionize``.
    """
    n, unit = gap.split()
    gap_s = float(n) * {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                        "hour": 3600, "hours": 3600}[unit]

    def fn(key, pdfs, state):
        uid = key[0]
        if state.hasTimedOut:
            if state.exists:
                start_s, last_s, cnt, sv = state.get
                state.remove()
                # micro-round the float-seconds state (float64 holds ~0.2 us
                # at epoch magnitude; a raw *1e9 would grow ns noise Arrow
                # refuses to cast away)
                yield pd.DataFrame({"user_id": [uid],
                                    "session_start": [pd.Timestamp(
                                        round(start_s * 1e6), unit="us")],
                                    "n_events": [cnt], "sum_value": [sv]})
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        ts = rows[ts_col].astype("int64").to_numpy() / 1e9  # epoch seconds
        val = rows["value"].to_numpy(np.float64)
        if state.exists:
            start_s, last_s, cnt, sv = state.get
            ts = np.concatenate([[last_s], ts])
            val = np.concatenate([[0.0], val])
            carried = (start_s, cnt, sv)
        else:
            carried = None
        brk = np.flatnonzero(np.diff(ts) >= gap_s) + 1  # first idx of each new session
        bounds = np.concatenate([[0], brk, [len(ts)]])
        out_start, out_n, out_sv = [], [], []
        for i in range(len(bounds) - 1):
            a, b = bounds[i], bounds[i + 1]
            seg_start, seg_n, seg_sv = ts[a], b - a, float(val[a:b].sum())
            if i == 0 and carried is not None:
                seg_start = carried[0]
                seg_n += carried[1] - 1   # the carried last_s row is a marker
                seg_sv += carried[2]
            if i < len(bounds) - 2:  # closed by a later event
                out_start.append(seg_start)
                out_n.append(seg_n)
                out_sv.append(seg_sv)
            else:  # still open: keep in state
                state.update((float(seg_start), float(ts[-1]),
                              int(seg_n), float(seg_sv)))
                state.setTimeoutTimestamp(int((ts[-1] + gap_s) * 1000))
        if out_start:
            yield pd.DataFrame({"user_id": uid,
                                "session_start": pd.to_datetime(
                                    (np.array(out_start) * 1e6).round()
                                    .astype("int64"), unit="us"),
                                "n_events": np.array(out_n, np.int64),
                                "sum_value": np.array(out_sv, np.float64)})

    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.col("user_id"))
            .applyInPandasWithState(fn, _SESSION_OUT, _SESSION_STATE,
                                    "append", "EventTimeTimeout"))


def stream_exact_dedup(events: DataFrame, key_cols: list[str] | None = None,
                       ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup — the streaming twin of ``ops.dedup``'s
    exact path, for at-least-once sources that can replay rows.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the key's first-seen event time, so state is bounded
    by the lateness budget instead of growing with the stream (a plain
    ``dropDuplicates`` on an unbounded stream leaks state forever — the
    standard production footgun this wrapper exists to avoid).  Duplicates
    arriving within the watermark window are suppressed; a replay later
    than the watermark is out of contract for the source.
    """
    if key_cols is None:
        key_cols = ["event_id"]
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))
