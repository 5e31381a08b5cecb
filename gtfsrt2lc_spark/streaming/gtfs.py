"""Streaming GTFS-RT poll mode — the reference's `lib/catchCancelled.js:12-32`
loop (re-parse the live feed every ~30 s against static indexes built once)
as a Structured Streaming job over a feed-drop directory.

Shape: ``readStream.format('binaryFile')`` watches a directory where each
poll lands one protobuf feed file -> ``foreachBatch`` decodes, converts to
Connections against the once-built ``GtfsIndexes`` (the reference's
index-reuse pattern, README.md:58), differential-filters against the
``HistoryStore`` (only new/changed connections emit — `lib/Gtfsrt2LC.js:667-751`),
and lands each epoch in its own overwrite-mode ``epoch=N`` directory
(replayed epochs rewrite identical content: exactly-once output).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gtfsrt2lc_spark.functions import hadoop_fs

BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, content binary"
)

# columns persisted per epoch (flat, parquet-friendly); DDL doubles as the
# read schema so an all-empty output dir still reads as 0 rows
_OUT_SCHEMA = (
    "type string, trip_id string, route_id string, service_day string, "
    "departure_stop string, arrival_stop string, departure_time bigint, "
    "arrival_time bigint, departure_delay bigint, arrival_delay bigint, "
    "headsign string, pickup_type string, drop_off_type string"
)
_OUT_COLS = [f.split(" ")[0] for f in _OUT_SCHEMA.split(", ")]


def _glob_escape(path: str) -> str:
    """Escape Hadoop glob metacharacters in a concrete file path so
    ``spark.read.load(path)`` reads exactly that file (GlobPattern treats
    ``* ? [ ] { } \\`` as pattern syntax)."""
    return re.sub(r"([*?\[\]{}\\])", r"\\\1", path)


def stream_feeds_to_connections(
    spark: SparkSession,
    feed_dir: str,
    pipeline,
    history_store,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the poll-mode streaming query; returns the StreamingQuery.

    ``pipeline`` is a prebuilt Gtfsrt2LCPipeline (indexes built ONCE, reused
    every micro-batch); ``history_store`` a HistoryStore whose state spans
    epochs, so an unchanged re-polled feed emits 0 connections (the
    reference's differential semantics, test/gtfsrt2lc.test.js:156).
    """
    from gtfsrt2lc_spark.functions.gtfsrt_proto import decode_feed_df

    feeds = (
        spark.readStream.format("binaryFile")
        .schema(BINARYFILE_SCHEMA)
        .load(feed_dir)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        # polls are SEQUENTIAL in the reference loop: when several feed
        # files land in one micro-batch, process them oldest-first so a
        # connection that changed between polls emits each state change in
        # order (one combined pass would emit contradictory rows and commit
        # an arbitrary one)
        files = sorted(
            (
                (r["modificationTime"], r["path"])
                for r in batch_df.select("path", "modificationTime").distinct().collect()
            )
        )
        for i, (_mt, path) in enumerate(files):
            # read THIS file directly rather than re-filtering batch_df:
            # the where(path==...) form re-scans the whole batch source per
            # file — O(files^2) bytes per micro-batch at high poll fan-in —
            # while a direct single-path load scans each feed exactly once.
            # The path is GLOB-ESCAPED (Hadoop's load() treats [, {, * as
            # pattern metacharacters — a feed named "feed[1].pb" would
            # otherwise read nothing or the wrong file). The direct load
            # assumes the drop dir is append-only between source snapshot
            # and processing; if a retention sweep deleted the file, fall
            # back to filtering the batch source snapshot, which still holds
            # the bytes.
            if hadoop_fs.exists(spark, path):
                src = (
                    spark.read.format("binaryFile")
                    .schema(BINARYFILE_SCHEMA)
                    .load(_glob_escape(path))
                    .select(F.col("content").alias("payload"))
                )
            else:  # retention sweep beat us to it: use the source snapshot
                src = batch_df.where(F.col("path") == path).select(
                    F.col("content").alias("payload")
                )
            updates = decode_feed_df(src)
            conns = pipeline.connections(updates)
            fresh = history_store.filter_new(conns).persist()
            n_fresh = fresh.count()
            target = os.path.join(out_dir, f"epoch={epoch_id}-{i}")
            # replay safety: write BEFORE commit; on a replayed epoch whose
            # states were already committed (crash between commit and the
            # streaming checkpoint), filter_new yields 0 — skipping the
            # overwrite preserves the previously written output instead of
            # erasing it with an empty frame. The existence check goes
            # through the Hadoop FileSystem API so it also holds when
            # out_dir is HDFS/S3, not just a driver-local path.
            already_written = hadoop_fs.exists(
                spark, os.path.join(target, "_SUCCESS")
            )
            if n_fresh > 0 or not already_written:
                fresh.select(*_OUT_COLS).write.mode("overwrite").parquet(target)
            if n_fresh > 0:  # also: no whole-store rewrite for no-op polls
                history_store.commit(fresh)
            fresh.unpersist()

    writer = feeds.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_stream_connections(spark: SparkSession, out_dir: str) -> DataFrame:
    """All connections emitted across epochs (each row is a state change —
    the differential emit log, not a snapshot)."""
    return (
        spark.read.schema(_OUT_SCHEMA)
        .option("basePath", out_dir)
        .parquet(out_dir)
    )
