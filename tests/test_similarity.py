"""Similarity search: brute-force cosine top-k + LSH-bucketed ANN."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from gtfsrt2lc_spark.operators.similarity import brute_force_topk, cosine, lsh_topk

DIM = 16


def _vecs(n=100, seed=7):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        out.append((i, v))
    # plant a close neighbor of vector 0
    base = out[0][1]
    out.append((n, [x + rng.gauss(0, 0.01) for x in base]))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(_vecs(), "vec_id long, embedding array<float>")


def test_cosine_column(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
                               "a array<float>, b array<float>")
    got = [r["c"] for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert got == [1.0, 0.0]


def test_brute_force_topk_finds_planted_neighbor(emb):
    q = emb.where(F.col("vec_id") == 0)
    top = brute_force_topk(emb, q, k=3)
    rows = top.orderBy("rank").collect()
    assert rows[0]["vec_id"] == 100  # planted near-duplicate
    assert rows[0]["cos"] > 0.99
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_lsh_topk_recovers_close_neighbor(emb):
    q = emb.where(F.col("vec_id") == 0)
    approx = lsh_topk(emb, q, dim=DIM, k=3, n_bits=6, n_tables=6)
    rows = approx.orderBy("rank").collect()
    assert rows, "LSH returned no candidates"
    assert rows[0]["vec_id"] == 100  # near-identical vector shares every bucket


def test_lsh_is_subset_quality(emb):
    """LSH top-1 cosine should be close to exact top-1 for every query."""
    q = emb.where(F.col("vec_id") < 5)
    exact = {r["query_id"]: r["cos"] for r in brute_force_topk(emb, q, k=1).collect()}
    approx = {r["query_id"]: r["cos"] for r in
              lsh_topk(emb, q, dim=DIM, k=1, n_bits=4, n_tables=8).collect()}
    for qid, c in approx.items():
        assert c <= exact[qid] + 1e-9


def test_ivf_full_probe_equals_brute_force(emb):
    """n_probe == n_cells degrades IVF to exact search — outputs must match."""
    from gtfsrt2lc_spark.operators.similarity import ivf_topk

    q = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos"])
             for r in brute_force_topk(emb, q, k=3).collect()}
    full = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos"])
            for r in ivf_topk(emb, q, dim=DIM, k=3, n_cells=4, n_probe=4,
                              sample_size=101, kmeans_iters=5).collect()}
    assert full == exact


def test_ivf_probe_subset_recall(emb):
    """Partial probing still finds the planted near-duplicate (its cell is
    always the query's own top probe) and never invents better scores."""
    from gtfsrt2lc_spark.operators.similarity import ivf_topk

    q = emb.where(F.col("vec_id") == 0)
    rows = ivf_topk(emb, q, dim=DIM, k=3, n_cells=8, n_probe=2,
                    sample_size=101, kmeans_iters=5).orderBy("rank").collect()
    assert rows and rows[0]["vec_id"] == 100 and rows[0]["cos"] > 0.99
    exact_top = brute_force_topk(emb, q, k=1).collect()[0]["cos"]
    assert rows[0]["cos"] <= exact_top + 1e-9


def test_ivf_deterministic(emb):
    from gtfsrt2lc_spark.operators.similarity import ivf_topk

    q = emb.where(F.col("vec_id") < 3)

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["cos"])
            for r in ivf_topk(emb, q, dim=DIM, k=3, n_cells=8, n_probe=3,
                              sample_size=101, kmeans_iters=5).collect()
        )

    assert run() == run()


def test_lsh_topk_no_broadcast_hint_when_disabled(spark, emb):
    """broadcast_queries=False must leave the join planner-chosen: identical
    results, no broadcast-hint OOM hazard for large query sets."""
    queries = emb.where(F.col("vec_id") < 3)
    hinted = lsh_topk(emb, queries, dim=DIM, k=5)
    unhinted = lsh_topk(emb, queries, dim=DIM, k=5, broadcast_queries=False)
    assert sorted(map(tuple, unhinted.collect())) == sorted(
        map(tuple, hinted.collect())
    )


def test_reserved_constant_column_rejected(spark, emb):
    """An input already carrying the operator's reserved constant column name
    must fail fast with a clear ValueError, not an ambiguous-reference
    AnalysisException mid-plan (same contract as dedup_exact)."""
    poisoned = emb.withColumn("_tables", F.lit(1))
    q = poisoned.where(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="_tables.*reserved"):
        lsh_topk(poisoned, q, dim=DIM, k=3)
