"""asof_join / range_join_point — correctness vs naive plans."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from gtfsrt2lc_spark.operators.joins import asof_join, range_join_point


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(12), "b"), (2, _ts(9), "c"), (3, _ts(9), "d")],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(11), 110.0), (2, _ts(9, 30), 200.0)],
        "user_id int, ts timestamp, value double",
    )
    out = {
        (r.tag, r.value_r)
        for r in asof_join(left, right, "user_id").collect()
    }
    # tag a: inclusive match at equal ts; tag b: latest of the two priors;
    # tag c: right is later -> drops; tag d: no right rows for user 3 -> drops
    assert out == {("a", 100.0), ("b", 110.0)}


def test_asof_join_matches_naive(spark):
    left = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 37 % 1000).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(80).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 53 % 1000).alias("ts"),
        F.col("id").alias("rid"),
    )
    got = asof_join(left, right, "k")
    naive = (
        left.alias("l")
        .join(right.alias("r"), (F.col("l.k") == F.col("r.k")) & (F.col("l.ts") >= F.col("r.ts")))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "l.lid"
                ).orderBy(F.col("r.ts").desc(), F.struct("r.ts", "r.rid").desc())
            ),
        )
        .where("rn = 1")
        .select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid"))
    )
    a = {(r.lid, r.rid_r) for r in got.select("lid", "rid_r").collect()}
    b = {(r.lid, r.rid) for r in naive.collect()}
    assert a == b and len(a) > 0


def test_range_join_point(spark):
    left = spark.createDataFrame(
        [(1, _ts(10, 30)), (2, _ts(11, 59)), (3, _ts(12, 0)), (4, _ts(23, 0))],
        "eid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(10), _ts(12)), (20, _ts(11), _ts(13))],
        "wid int, lo timestamp, hi timestamp",
    )
    got = {
        (r.eid, r.wid_r)
        for r in range_join_point(left, right, "ts", "lo", "hi").collect()
    }
    # hi is exclusive: eid 3 at 12:00 misses window 10 but hits window 20
    assert got == {(1, 10), (2, 10), (2, 20), (3, 20)}


def test_range_join_matches_naive(spark):
    left = spark.range(300).select(
        F.col("id").alias("eid"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 97) % 100000).alias("ts"),
    )
    right = spark.range(40).select(
        F.col("id").alias("wid"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 2311) % 90000).alias("lo"),
    ).withColumn("hi", F.col("lo") + F.expr("INTERVAL 2 HOURS"))
    got = {
        (r.eid, r.wid_r)
        for r in range_join_point(left, right, "ts", "lo", "hi").collect()
    }
    naive = {
        (r.eid, r.wid)
        for r in left.join(
            right, (left.ts >= right.lo) & (left.ts < right.hi)
        ).collect()
    }
    assert got == naive and len(got) > 0


def test_range_join_plan_is_equijoin(spark):
    left = spark.range(10).select(
        F.col("id").alias("eid"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    right = spark.range(5).select(
        F.col("id").alias("wid"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 7).alias("lo"),
    ).withColumn("hi", F.col("lo") + F.expr("INTERVAL 1 HOUR"))
    plan = range_join_point(left, right, "ts", "lo", "hi")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # bucketed equi-join, not O(n^2)


def test_asof_join_null_ts_never_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, None, "b")], "user_id int, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, 5.0)], "user_id int, ts timestamp, value double"
    )
    # null-ts right rows are not carryable payloads; null-ts left rows drop
    assert asof_join(left, right, "user_id").count() == 0


def test_asof_join_reserved_names(spark):
    df = spark.createDataFrame([(1, _ts(10), 0)], "user_id int, ts timestamp, _side int")
    import pytest as _pt

    with _pt.raises(ValueError, match="_side"):
        asof_join(df, df.drop("_side"), "user_id")
