"""Distributed prefix sum and capacity packing (training-batch construction).

``F.sum().over(Window.orderBy(...))`` with no partition key collapses to a
SINGLE-partition exchange — the classic Spark scan anti-pattern: one reducer
streams the whole corpus. ``prefix_sum`` is the scale path: range-partition
by the order column (ordered partitions), aggregate one subtotal per
partition, prefix-scan the P subtotals driver-side (P values, KBs), and add
each partition's offset in a narrow Arrow pass. The result is the EXACT
global running sum, independent of partitioning.

``sequence_pack`` builds on it: assign documents (in deterministic id order)
to fixed-capacity token bins by their starting offset — the sequential
packing a streaming pre-training corpus actually uses (bin boundary = every
``capacity`` tokens of the running total).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` in ``order_col`` order.

    Two-phase scan (no single-reducer window): range repartition + in-
    partition sort give globally ordered partitions; per-partition subtotals
    (one row each) prefix-scan on the driver; a narrow mapInPandas adds each
    partition's base offset to its local cumulative sum. ``order_col``
    values must be distinct (they define the order)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # stage so the subtotal pass and the scan pass see identical partitions
    # (repartitionByRange samples; two separate computations could disagree)
    part = part.localCheckpoint(eager=True)
    subtotals = {
        r["_pid"]: r["s"]
        for r in part.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    }  # <= n rows — bounded driver collect
    bases = {}
    acc = 0
    for pid in sorted(subtotals):
        bases[pid] = acc
        acc += subtotals[pid] or 0
    b_bases = df.sparkSession.sparkContext.broadcast(bases)

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = None  # carried across batches within one partition
        for pdf in batches:
            if running is None:
                running = b_bases.value.get(int(pdf["_pid"].iloc[0]), 0) if len(pdf) else 0
            cum = pdf[value_col].cumsum() + running
            running = int(cum.iloc[-1]) if len(pdf) else running
            yield pdf.assign(**{out_col: cum}).drop(columns=["_pid"])

    return part.mapInPandas(op, schema=schema)


def sequence_pack(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, offset, bin, overflow): sequential fixed-capacity
    packing in ``id_col`` order. ``offset`` is the document's starting token
    position in the global stream, ``bin = offset // capacity`` its training
    batch, ``overflow`` marks documents longer than a whole bin (they span
    bins and need splitting/truncation downstream)."""
    ps = prefix_sum(
        df.select(F.col(id_col), F.col(tokens_col)),
        id_col,
        tokens_col,
        out_col="_cum",
        num_partitions=num_partitions,
    )
    offset = F.col("_cum") - F.col(tokens_col)
    return ps.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        offset.cast("long").alias("offset"),
        F.floor(offset / capacity).cast("long").alias("bin"),
        (F.col(tokens_col) > capacity).alias("overflow"),
    )
