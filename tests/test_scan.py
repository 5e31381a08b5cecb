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


def test_shard_shuffle_is_deterministic_and_layout_independent(spark):
    """Every row gets exactly one (shard, pos); pos is a dense 1..n_shard
    rank; the full assignment is identical across partition layouts (the
    reproducibility contract a training dataloader depends on)."""
    from gtfsrt2lc_spark.operators.scan import shard_shuffle

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    base = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_shuffle(df, "doc_id", n_shards=8, salt="ep0").collect()
    }
    assert len(base) == 500
    by_shard: dict = {}
    for s, p in base.values():
        assert 0 <= s < 8
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {s} rank not dense"
    for n in (1, 7):
        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shard_shuffle(
                df.repartition(n), "doc_id", n_shards=8, salt="ep0"
            ).collect()
        }
        assert got == base, f"layout {n} changed the permutation"


def test_shard_shuffle_salt_changes_permutation(spark):
    """A different epoch salt yields a different permutation (fresh epoch
    order), still covering every row exactly once."""
    from gtfsrt2lc_spark.operators.scan import shard_shuffle

    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_shuffle(df, "doc_id", 8, "ep0").collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_shuffle(df, "doc_id", 8, "ep1").collect()}
    assert set(a) == set(b) == set(range(300))
    assert a != b
