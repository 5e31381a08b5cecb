"""Salted join / aggregation: output parity with unsalted equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gtfsrt2lc_spark.operators.skew import salted_agg, salted_distinct_min, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key carrying 90% of rows + a long tail
    rows = [("hot", i, f"u{i:05d}") for i in range(1800)]
    rows += [(f"k{i % 40}", i, f"v{i:05d}") for i in range(200)]
    return spark.createDataFrame(rows, "k string, v long, u string")


@pytest.fixture(scope="module")
def dim(spark):
    keys = ["hot"] + [f"k{i}" for i in range(40)]
    return spark.createDataFrame([(k, len(k)) for k in keys], "k string, klen int")


def test_salted_join_matches_plain(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("klen").alias("kl")
    )
    salted = salted_join(skewed, dim, "k", n_salts=7).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("klen").alias("kl")
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salted_join_left(skewed, dim):
    extra = skewed.union(skewed.sparkSession.createDataFrame([("orphan", 1, "x")], skewed.schema))
    plain = extra.join(dim, "k", "left").count()
    salted = salted_join(extra, dim, "k", n_salts=5, how="left").count()
    assert salted == plain


def test_salted_agg_count(skewed):
    got = {
        r["k"]: r["n"]
        for r in salted_agg(
            skewed, ["k"], [F.count("*").alias("_c")], [F.sum("_c").alias("n")], n_salts=6
        ).collect()
    }
    want = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_salted_distinct_min(skewed):
    got = {
        (r["k"],): r["u"]
        for r in salted_distinct_min(skewed, ["k"], "u", n_salts=4).collect()
    }
    want = {
        (r["k"],): r["u"]
        for r in skewed.groupBy("k").agg(F.min("u").alias("u")).collect()
    }
    assert got == want
