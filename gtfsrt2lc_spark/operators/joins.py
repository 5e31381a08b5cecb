"""Temporal joins for training-data pipelines: as-of and point-in-interval.

No analog exists in the reference (SURVEY.md §2.3: "No theta/interval/as-of
joins exist") — these are the engine's extensions for event-log enrichment at
scale. Both avoid the O(|L|x|R|) nested-loop plan Spark would otherwise pick
for inequality predicates:

* ``asof_join``: one shuffle on the key column (union + ordered window),
  never a join explosion — the standard log-enrichment pattern.
* ``range_join_point``: bucketizes the interval side so the planner gets an
  equi-join on bucket id + a residual filter; each (point, interval) pair
  meets in exactly one bucket (the point's), so no post-dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` sharing ``on`` (inclusive, backward-looking).
    Inner semantics: left rows with no prior right row drop.

    Plan: tag both sides, union, one window ordered by (ts, side) per key,
    ``last(..., ignorenulls)`` carries the latest right payload forward.
    Exactly one hash shuffle on ``on`` — no inequality join, no explosion.
    Ties on equal ts resolve to the right row (inclusive), then to the
    largest right payload struct (deterministic).
    """
    reserved = {"_ts", "_side", "_l", "_r", "_match"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    rcols_suffixed = {f"{c}{suffix}" for c in right.columns if c != on}
    dup = rcols_suffixed & set(left.columns)
    if dup:
        raise ValueError(
            f"asof_join suffix {suffix!r} collides with left columns {sorted(dup)}"
        )
    # a NULL timestamp can never satisfy right_ts <= left_ts; dropping such
    # rows up front also keeps NULLS FIRST ordering from parking a null-ts
    # right payload at the start of every partition (where last(...,
    # ignorenulls) would carry it into every left row)
    left = left.where(F.col(left_ts).isNotNull())
    right = right.where(F.col(right_ts).isNotNull())
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c != on]
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols]).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = filled.where((F.col("_side") == 1) & F.col("_match").isNotNull())
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in rcols],
    )


def range_join_point(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_secs: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-interval join: left rows whose timestamp ``point`` falls in
    ``[lo, hi)`` of a right interval. Inner semantics; one output row per
    matching (left, right) pair.

    Plan: the interval side explodes to every ``bucket_secs`` bucket it
    overlaps (intervals are short relative to the data span, so this is a
    small constant factor); the point side computes a single bucket id; the
    join is then a plain equi-join on bucket + residual range filter —
    shuffle-partitionable and AQE-skew-splittable, where the naive
    inequality join would be a broadcast nested loop.
    """
    if "_bucket" in left.columns or "_bucket" in right.columns:
        raise ValueError("range_join_point reserves the column name '_bucket'")
    dup = {f"{c}{suffix}" for c in right.columns} & set(left.columns)
    if dup:
        raise ValueError(
            f"range_join_point suffix {suffix!r} collides with left columns {sorted(dup)}"
        )
    lcols = left.columns
    rcols = right.columns
    lb = left.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point)) / bucket_secs)
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo)) / bucket_secs),
                F.floor(F.unix_timestamp(F.col(hi)) / bucket_secs),
            )
        ),
    )
    rb = rb.select(
        "_bucket", *[F.col(c).alias(f"{c}{suffix}") for c in rcols]
    )
    j = lb.join(rb, "_bucket").where(
        (F.col(point) >= F.col(f"{lo}{suffix}"))
        & (F.col(point) < F.col(f"{hi}{suffix}"))
    )
    return j.select(*lcols, *[f"{c}{suffix}" for c in rcols])
