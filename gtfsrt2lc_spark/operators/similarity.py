"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — the *scalable* baseline: queries are
broadcast, the corpus scan is embarrassingly partition-parallel, and top-k
reduces map-side via window row_number (no global sort of scores).

Scale path: random-hyperplane LSH bucketing — candidates share a signature
bucket in >=1 of t tables; exact cosine re-ranks candidates only. All math is
JVM-side higher-order functions (zip_with/aggregate); no UDF.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in float64 (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query. (query_id, vec_id, cos, rank).

    queries is small -> broadcast; ties broken by corpus id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def _bucket_key(vec: Column, planes: list[list[float]]) -> Column:
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same random-hyperplane bucket in any
    of n_tables tables; exact cosine re-rank on candidates.

    At 100 TB the bucket join replaces the full scan: corpus is hashed once
    per table (narrow), the join key is (table, bucket) so the shuffle is
    bounded by bucket sizes, and AQE splits skewed buckets.
    """
    tables = _hyperplanes(dim, n_bits, n_tables, seed)

    def with_buckets(df: DataFrame, side: str) -> DataFrame:
        v = F.col(vec_col)
        buckets = F.array(
            *[
                F.struct(F.lit(t).alias("table_id"), _bucket_key(v, tables[t]).alias("bucket"))
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.explode(buckets).alias("b"),
        ).select(
            f"{side}_id", f"{side}_vec", F.col("b.table_id").alias("table_id"), F.col("b.bucket").alias("bucket")
        )

    c = with_buckets(corpus, "c")
    q = with_buckets(queries, "q")
    cand = (
        c.join(q, ["table_id", "bucket"])
        .where(F.col("c_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"), F.col("c_id").alias("vec_id"), "cos", "rank"
        )
    )
