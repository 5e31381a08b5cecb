"""Distributed prefix sum and capacity packing (training-batch construction).

``F.sum().over(Window.orderBy(...))`` with no partition key collapses to a
SINGLE-partition exchange — the classic Spark scan anti-pattern: one reducer
streams the whole corpus. ``prefix_sum`` is the scale path:

  1. one cheap aggregate finds (min, max) of the order column;
  2. a DETERMINISTIC bucket id is computed per row from uniform value ranges
     (a plain column expression — no sampling, no partition-layout
     dependence, nothing to checkpoint);
  3. one subtotal row per bucket is collected and prefix-scanned on the
     driver (<= n values, KBs);
  4. ``applyInPandas`` per bucket sorts the bucket, cumsums, and adds the
     bucket's base offset.

The result is the EXACT global running sum, independent of partitioning and
cluster layout. Buckets hold ~|df|/n rows each (uniform order values), so
``num_partitions`` bounds per-task memory; skewed order distributions skew
bucket sizes but never correctness.

``sequence_pack`` builds on it: assign documents (in deterministic id order)
to fixed-capacity token bins by their starting offset — the sequential
packing a streaming pre-training corpus actually uses (bin boundary = every
``capacity`` tokens of the running total).
"""

from __future__ import annotations

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

    ``order_col`` must be numeric, non-null, with distinct values (it
    defines the order); ``value_col`` must be non-null.

    The operator makes three passes over ``df`` (min/max, subtotals, scan)
    and does NOT cache between them — an internal ``persist()`` with no
    caller-visible handle would leak a cached DataFrame for the session
    lifetime (streaming/bench loops accumulate them until memory pressure).
    The passes therefore re-evaluate the input plan, which is cheap for the
    normal case (narrow projection over a deterministic source) and exactly
    Spark's own multi-consumer semantics. PRECONDITION: the input plan must
    be deterministic (true for file scans + column ops); nondeterministic
    upstreams (rand(), sampling, non-idempotent UDFs) must be pinned by the
    caller — ``df.persist()``/``localCheckpoint()`` around the call, with
    the caller owning the unpersist — or the subtotal and cumsum passes may
    disagree on bucket contents."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    mm = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"
    if mm["lo"] is None:  # empty input
        return spark.createDataFrame([], out_schema)
    lo, hi = float(mm["lo"]), float(mm["hi"])
    span = (hi - lo) or 1.0
    # F.least ignores NULL operands, so a NULL order value must map to a
    # NULL pid explicitly (it then trips the NULL guard below) rather than
    # silently landing in the last bucket
    pid = F.when(
        F.col(order_col).isNotNull(),
        F.least(
            F.floor((F.col(order_col) - F.lit(lo)) / F.lit(span) * n), F.lit(n - 1)
        ).cast("int"),
    )
    part = df.withColumn("_pid", pid)

    subtotals = {
        r["_pid"]: r["s"]
        for r in part.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    }  # <= n rows — bounded driver collect
    if None in subtotals:
        raise ValueError(f"prefix_sum: {order_col!r} contains NULLs")
    bases, acc = {}, 0
    for p in sorted(subtotals):
        bases[p] = acc
        acc += subtotals[p] or 0
    b_bases = spark.sparkContext.broadcast(bases)

    def add(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        base = b_bases.value.get(int(pdf["_pid"].iloc[0]), 0)
        return pdf.assign(
            **{out_col: pdf[value_col].cumsum() + base}
        ).drop(columns=["_pid"])

    return part.groupBy("_pid").applyInPandas(add, schema=out_schema)


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


def shard_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global corpus shuffle for training-data export:
    (*input columns, shard, pos).

    Training runs need documents in an order uncorrelated with crawl/source
    order, reproducible across engines and cluster sizes — ``rand()`` gives
    neither. Rows hash to one of ``n_shards`` shards by the engine-portable
    poly-hash of ``salt || key`` (vary ``salt`` per epoch for a fresh
    permutation), and ``pos`` is the row's rank within its shard ordered by
    (hash, key) — ties on the hash stay deterministic via the unique key.

    Scale posture: the per-shard ``row_number`` window is a hash
    repartition into ``n_shards`` balanced groups plus a sort within each —
    physically identical to the shuffle-writer plan
    (``repartition(shard).sortWithinPartitions``) a 100 TB export job runs;
    no global single-reducer ordering anywhere. Choose ``n_shards`` ≈ the
    target output file count, sized so one shard sorts in executor memory
    (spills gracefully otherwise).
    """
    from pyspark.sql import Window

    from gtfsrt2lc_spark.functions.hashing import poly_hash

    h = poly_hash(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % F.lit(n_shards)).cast("bigint")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(key_col))
    return out.withColumn("pos", F.row_number().over(w).cast("bigint")).drop("_h")
