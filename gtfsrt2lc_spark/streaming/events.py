"""Structured Streaming jobs — the reference's periodic-poll mode.

Reference analogs (SURVEY.md §2.8):
  T1 micro-batch trigger  (`lib/catchCancelled.js:12-32`, ~30 s poll)
  T2 event-time fallback  (`lib/Gtfsrt2LC.js:84`, per-update ts else header ts)
  T3 stateful dedup       (`lib/Gtfsrt2LC.js:667-751`, history store)
  T4 late/out-of-order    (watermark; in-batch it's the repair pass)

The KG pipeline itself runs as scheduled incremental batches over the
checkpoint manifest (plans/manifest.py) — the idiomatic Spark shape for
snapshot-based page corpora. This module provides the true-streaming
operators for event feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, update_ts: str = "ts", header_ts_lit=None) -> DataFrame:
    """T2: per-record event time with feed-header fallback
    (coalesce(update_ts, header_ts), ref lib/Gtfsrt2LC.js:84)."""
    header = F.lit(header_ts_lit).cast("timestamp") if header_ts_lit else F.col(update_ts)
    return df.withColumn("event_time", F.coalesce(F.col(update_ts), header))


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1: tumbling event-time windows with a watermark for late data."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "v",
        )
    )


def dedup_stream(stream: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """T3: stateful streaming dedup on a natural key — the history-store
    analog: within the watermark horizon each key emits once."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys + [ts_col])


def run_to_memory(stream_agg: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming aggregation to completion against a memory sink
    (test/smoke harness; production sinks are parquet/kafka/foreachBatch)."""
    q = (
        stream_agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
