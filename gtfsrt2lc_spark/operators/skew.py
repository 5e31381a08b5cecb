"""Explicit skew handling: salted joins and two-phase salted aggregation.

The north rule calls for head-entity / hot-domain skew to be handled with
salted repartitioning in addition to AQE's runtime skew-join splitting
(enabled in session.py). AQE covers sort-merge joins it can observe; the
operators here cover the cases it can't:

  * ``salted_join`` — replicate the small side R times and scatter the hot
    keys of the big side across R salt buckets, so one hot key (a head
    entity like a country IRI, or one hot domain) no longer lands in a
    single task.
  * ``salted_agg_min`` / ``salted_agg_count`` — two-phase aggregation with
    an explicit salt for aggregations whose single hot group would
    otherwise bottleneck the final reduce (Spark's partial aggregation
    already map-side-combines; the salt phase additionally splits the
    *final* per-group reduce).

All salting is deterministic: salt = pmod(xxhash64(salt_source), R).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_source: Column | None = None) -> DataFrame:
    """Deterministic salt column in [0, n_salts). By default salts on the
    whole row hash of provided columns order; pass an explicit high-card
    column (e.g. url) for stability across schema changes."""
    src = salt_source if salt_source is not None else F.xxhash64(*df.columns)
    return df.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys.

    big rows get salt = hash(entire row) % R; the small side is exploded
    R times so every (key, salt) pair exists. The shuffle key becomes
    (key, salt) — a hot key spreads over R tasks. Output matches
    ``big.join(small, on, how)`` exactly (asserted by tests).
    """
    b = with_salt(big, n_salts)
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with ``partial_aggs``,
    then groupBy(keys) with ``final_aggs`` over the partial columns.

    Caller supplies decomposable pairs, e.g. partial ``count(*) as c`` with
    final ``sum(c) as n``, or partial ``min(x) as m`` with final
    ``min(m) as x_min``.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_distinct_min(
    df: DataFrame, keys: list[str], value_col: str, n_salts: int = 8, out_col: str | None = None
) -> DataFrame:
    """Deduplicate by ``keys`` keeping min(value) — the triple-dedup shape
    (groupBy(s,p,o).agg(min(url))) with the final reduce split by salt."""
    out = out_col or value_col
    return salted_agg(
        df,
        keys,
        [F.min(value_col).alias("_pmin")],
        [F.min("_pmin").alias(out)],
        n_salts=n_salts,
    )
