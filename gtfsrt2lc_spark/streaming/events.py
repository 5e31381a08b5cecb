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


def differential_stream(
    stream: DataFrame,
    keys: list[str],
    value_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """T3/J6 faithful analog via ``applyInPandasWithState``: per natural key,
    emit a row only when its value signature differs from the last *emitted*
    one — unchanged records are suppressed, changed ones re-emitted.

    This is exactly the reference history store's differential semantics
    (`lib/Gtfsrt2LC.js:698-750`: compare stored {departureDelay, arrivalDelay,
    type} per key, put+emit on change, suppress on equality) — which
    ``dropDuplicates`` cannot express (a key that changes back to an earlier
    value must emit again). State is one signature string per key; groups are
    Arrow batches, the compare is a vectorized shift, no per-row Python.
    """
    import pandas as pd  # noqa: F401 (typing of the iterator)

    by_name = {f.name: f for f in stream.schema.fields}
    out_fields = [by_name[c] for c in (*keys, *value_cols, ts_col)]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    out_cols = [f.name for f in out_fields]

    def emit_changes(key, pdf_iter, state):
        last = state.get[0] if state.exists else None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="stable")
            sig = pdf[value_cols].astype(str).fillna("\0null").agg("|".join, axis=1)
            prev = sig.shift(1, fill_value=last if last is not None else "\0\0init")
            out = pdf.loc[(sig != prev).to_numpy(), out_cols]
            if len(sig):
                last = sig.iloc[-1]
            if len(out):
                yield out
        state.update((last,))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(*keys).applyInPandasWithState(
        emit_changes,
        outputStructType=out_schema,
        stateStructType="last_sig string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
