"""Gap-based sessionization of the events stream — the custom STATEFUL
operator of the extension surface (brief: "applyInPandasWithState for
custom stateful operators"; the reference has no streaming at all,
SURVEY §2.5).

Two forms sharing one pinned definition (a session = consecutive events
of a user with gaps ≤ GAP; session_start identifies the session):

* :func:`sessionize_batch` — window functions (lag → gap flag → running
  count), fully relational, DuckDB-mirrorable; the contract oracle and
  the ground truth for the streaming test.
* :func:`sessionize_stream` — ``applyInPandasWithState`` over
  ``groupBy(user_id)`` with event-time timeout: per-user state holds
  the open session (start, last_ts, n, sum); events extend it or close
  it (gap exceeded → emit), and the watermark timeout flushes idle
  sessions.  State is O(users), not O(events) — the scale property
  that makes this viable on an unbounded stream.

Scale notes: both forms shuffle once on user_id; per-user data is tiny.
Batch sessionization of 10^12 events works because the window sort is
per-user (partitioned), not global.
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MINUTES = 30
GAP = dt.timedelta(minutes=GAP_MINUTES)
WATERMARK = "10 minutes"

SESSION_SCHEMA = (
    "user_id long, session_start string, n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def sessionize_batch(events: DataFrame) -> DataFrame:
    """(user_id, session_start, n_events, sum_value) via window
    functions: gap flag = ts - lag(ts) > GAP, session id = running sum
    of flags per user."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # interval arithmetic: works for TIMESTAMP and TIMESTAMP_NTZ alike
    gap_flag = F.when(
        F.col("ts") - F.lag("ts").over(w)
        > F.expr(f"INTERVAL {GAP_MINUTES} MINUTES"),
        1,
    ).otherwise(0)
    with_sid = events.withColumn("sid", F.sum(gap_flag).over(w))
    return (
        with_sid.groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.count("*").alias("n_events"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 6).alias(
                "sum_value"
            ),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
    )


def sessionize_batch_sql(table: str = "events") -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS gap_flag
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sid AS (
  SELECT user_id, ts, value,
         sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(coalesce(sum(value), 0.0), 6) AS sum_value
FROM sid GROUP BY user_id, sid
"""


def _session_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    tz: str = "UTC",
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: fold this micro-batch's events (event-time
    order) into the open session; emit every session that closes."""
    (user_id,) = key
    gap_us = GAP_MINUTES * 60 * 1_000_000
    if state.exists:
        start, last, n, total = state.get
    else:
        start = last = n = 0
        total = 0.0

    closed = []
    if state.hasTimedOut:
        if n:
            closed.append((start, n, total))
        state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for ts, value in zip(rows["ts"], rows["value"]):
            t = pd.Timestamp(ts)
            if t.tzinfo is None:
                # Arrow hands Spark timestamps to pandas as naive
                # session-timezone wall clock; the event-time timeout
                # below must be a UTC epoch or Spark rejects it (or
                # flushes sessions hours late) off UTC
                t = t.tz_localize(tz)
            t_us = int(t.value // 1_000)
            if n and t_us - last > gap_us:
                closed.append((start, n, total))
                n, total = 0, 0.0
            if not n:
                start = t_us
            else:
                # late (out-of-order within the watermark) events may
                # precede the open session's bounds — absorb, don't
                # regress them
                start = min(start, t_us)
            last = max(last, t_us) if n else t_us
            n += 1
            if not pd.isna(value):
                # nulls contribute nothing, matching the batch oracle's
                # F.sum null-skipping
                total += float(value)
        state.update((start, last, n, total))
        # flush when the watermark passes the gap after the last event
        state.setTimeoutTimestamp(last // 1000 + GAP_MINUTES * 60 * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": pd.Series(
                    [user_id] * len(closed), dtype="int64"
                ),
                "session_start": [
                    # UTC epoch -> session-tz wall clock, matching the
                    # batch form's date_format output
                    pd.Timestamp(s, unit="us", tz="UTC")
                    .tz_convert(tz)
                    .strftime("%Y-%m-%d %H:%M:%S")
                    for s, _n, _t in closed
                ],
                "n_events": pd.Series(
                    [n for _s, n, _t in closed], dtype="int64"
                ),
                "sum_value": [round(t, 6) for _s, _n, t in closed],
            }
        )


def sessionize_stream(
    spark, input_path: str, out_dir: str, *, checkpoint: str | None = None
) -> DataFrame:
    """readStream -> groupBy(user_id).applyInPandasWithState with
    event-time timeout -> append sink; drained with availableNow.
    Sessions still open at end-of-input stay in state (exactly-once:
    they would emit when later data advances the watermark)."""
    os.makedirs(out_dir, exist_ok=True)
    ckpt = checkpoint or os.path.join(out_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_path)
        .withWatermark("ts", WATERMARK)
    )
    import functools

    tz = spark.conf.get("spark.sql.session.timeZone")
    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            functools.partial(_session_fn, tz=tz),
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = os.path.join(out_dir, "sessions")
    try:
        return spark.read.parquet(sink)
    except Exception:
        # append mode emitted nothing (all sessions still open): a
        # valid outcome, not an error
        return spark.createDataFrame([], SESSION_SCHEMA)
