"""Ordered per-group (window) operators — the reference's semantic core.

The reference runs per-trip ordered passes (stops by stop_sequence):
pairwise connection formation (W9, `lib/Gtfsrt2LC.js:162-229`), forward-fill
of delays (W2, `:494-508`), time/delay derivation (W4/W5, `:539-591`).
Re-expressed as Spark window functions — one shuffle on the partition key,
then pure codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pairwise_lead(
    df: DataFrame, part_cols: list[str], order_col: str, value_cols: list[str]
) -> DataFrame:
    """Zip each row with its successor within the group: n rows -> n-1 pairs.

    Ref W9: consecutive stop pairs -> Connections (`lib/Gtfsrt2LC.js:162-229`).
    Output keeps part_cols + order_col + value_cols + next_<value_cols>.
    """
    w = Window.partitionBy(*part_cols).orderBy(order_col)
    out = df.select(*part_cols, order_col, *value_cols)
    for v in value_cols:
        out = out.withColumn(f"next_{v}", F.lead(v).over(w))
    return out.where(F.col(f"next_{value_cols[0]}").isNotNull())


def locf(
    df: DataFrame, part_cols: list[str], order_col: str, value_col: str, out_col: str | None = None
) -> DataFrame:
    """Last-observation-carried-forward (forward fill) of nulls.

    Ref W2: unmatched stops inherit the previous update's delay
    (`lib/Gtfsrt2LC.js:494-508`).
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col or f"{value_col}_filled", F.last(value_col, ignorenulls=True).over(w)
    )


def sessionize(
    df: DataFrame,
    part_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event exceeds ``gap_seconds`` (lag + running count of session starts)."""
    w = Window.partitionBy(*part_cols).orderBy(ts_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("_new", is_new).withColumn(
        session_col, F.sum("_new").over(wsum)
    ).drop("_new")


def topk_per_group(
    df: DataFrame, part_cols: list[str], order_by: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """Deterministic top-k per group via row_number (map-side reducible)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
