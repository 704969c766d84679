"""Windowed event analytics: tumbling-window aggregation over the
``events`` table, in batch and as a watermarked Structured Streaming
job.

The reference has no streaming operators at all (SURVEY §2.5); this is
part of the training-data-pipeline extension surface (the brief's
"Structured Streaming for streams: readStream -> watermarks + windowed
aggs").  The batch and streaming versions share one aggregation
builder, so the streaming path is the same Catalyst plan plus state —
and the batch version serves as its oracle on finite data.

Scale notes: ``groupBy(window(ts), event_type)`` shuffles on the
window+type key — bounded cardinality, no skew risk; the 10-minute
watermark bounds state: late events beyond it are dropped and windows
finalize (append mode emits each window exactly once).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "1 hour"
WATERMARK = "10 minutes"

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _windowed_agg(events: DataFrame) -> DataFrame:
    """(window_start, event_type, n_events, sum_value, avg_k): tumbling
    1-hour windows; props is a JSON string, k extracted JVM-side."""
    return (
        events.groupBy(
            F.window("ts", WINDOW).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("int")), 6
            ).alias("avg_k"),
        )
        .select(
            # string timestamps: engines disagree on epoch precision
            # (ns vs us), strings hash identically everywhere
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
            "avg_k",
        )
    )


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Batch tumbling-window aggregation (the streaming job's oracle)."""
    return _windowed_agg(events)


def windowed_event_counts_sql(table: str = "events") -> str:
    """DuckDB mirror: window('1 hour') aligns to epoch = date_trunc."""
    return f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6)
         AS avg_k
FROM {table}
GROUP BY date_trunc('hour', ts), event_type
"""


def stream_windowed_counts(
    spark,
    input_path: str,
    out_dir: str,
    *,
    checkpoint: str | None = None,
) -> DataFrame:
    """readStream(parquet) -> watermark -> tumbling-window agg ->
    append-mode parquet sink, drained with availableNow.  Returns the
    finalized windows (append mode emits a window only once its
    watermark has passed, so on finite input the trailing window(s)
    remain open and unemitted — exactly-once semantics, not a bug)."""
    os.makedirs(out_dir, exist_ok=True)
    ckpt = checkpoint or os.path.join(out_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_path)
        .withWatermark("ts", WATERMARK)
    )
    q = (
        _windowed_agg(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = os.path.join(out_dir, "windows")
    try:
        return spark.read.parquet(sink)
    except Exception:
        # zero finalized windows (input shorter than window+watermark)
        return spark.createDataFrame(
            [],
            "window_start string, event_type string, n_events long, "
            "sum_value double, avg_k double",
        )
