"""Distributed prefix sum + sequence packing (operators/scan.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gtfsrt2lc_spark.operators.scan import prefix_sum, sequence_pack


def test_prefix_sum_matches_window_form(spark):
    """The two-phase scan equals the single-reducer window cumsum exactly,
    across partition counts."""
    df = spark.range(0, 1000).select(
        F.col("id"), ((F.col("id") * 37) % 100 + 1).alias("v")
    )
    expected = {
        r["id"]: r["c"]
        for r in df.withColumn(
            "c", F.sum("v").over(Window.orderBy("id"))
        ).collect()
    }
    for n in (1, 3, 16):
        got = {
            r["id"]: r["running_total"]
            for r in prefix_sum(df, "id", "v", num_partitions=n).collect()
        }
        assert got == expected, f"num_partitions={n}"


def test_prefix_sum_never_single_partitions(spark):
    """Plan-shape guard: the scan must not collapse to a SinglePartition
    exchange (the global-window anti-pattern it replaces)."""
    df = spark.range(0, 100).select(F.col("id"), F.lit(2).alias("v"))
    out = prefix_sum(df, "id", "v", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_prefix_sum_rejects_null_order(spark):
    import pytest

    df = spark.createDataFrame([(1, 5), (None, 7)], "id long, v long")
    with pytest.raises(ValueError, match="contains NULLs"):
        prefix_sum(df, "id", "v").collect()


def test_sequence_pack_bins(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 40), (3, 30), (4, 200), (5, 10)], "doc long, n long"
    )
    got = {r["doc"]: (r["offset"], r["bin"], r["overflow"])
           for r in sequence_pack(df, "doc", "n", capacity=100).collect()}
    assert got == {
        1: (0, 0, False),     # tokens 0-49   -> bin 0
        2: (50, 0, False),    # tokens 50-89  -> bin 0
        3: (90, 0, False),    # starts at 90  -> bin 0 (spans into 1)
        4: (120, 1, True),    # 200 > capacity -> overflow
        5: (320, 3, False),
    }


def test_sequence_pack_leaves_no_cached_rdds(spark):
    """Lifetime guard: the operator must not leak session-lifetime cache
    entries (it previously persisted an internal projection no caller could
    unpersist)."""
    before = dict(spark.sparkContext._jsc.getPersistentRDDs())
    df = spark.range(0, 500).select(
        F.col("id"), ((F.col("id") * 13) % 50 + 1).alias("n")
    )
    result = sequence_pack(df, "id", "n", capacity=256)
    assert result.count() == 500
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert set(after) == set(before), "sequence_pack leaked cached RDDs"
