"""Hot-band / hot-bucket quadratic-blowup guards (round-6 verdict item 1).

A banded LSH candidate join is quadratic in the bucket size: a skewed
100x-scale dictionary (millions of short or near-identical surfaces
collapsing to one MinHash band signature) makes one hot band
|q_band|x|d_band| — AQE's skew-join can split that across tasks but cannot
shrink it. The fix counts band frequencies on the STATIC, precomputed
dictionary side (linking.FuzzyDictionary) and drops buckets above a
configurable ceiling; dedup's banded self-join paths carry the same
opt-in discipline (_cap_band_buckets).

The pathological fixture: surfaces "aaa", "aaaa", ... share the single
character-3-gram "aaa", hence identical shingle sets, identical MinHash
signatures, and ONE shared bucket per band — a degenerate band of size
n_hot, by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_HOT = 400  # pathological surfaces all sharing every band


@pytest.fixture(scope="module")
def hot_dictionary(spark, corpus_dfs):
    """Golden-corpus surfaces + N_HOT degenerate surfaces that all collapse
    to the same LSH bands (identical {hash('aaa')} shingle set)."""
    _, _, surfaces, _ = corpus_dfs
    hot = spark.createDataFrame(
        [(("a" * (k + 3)), f"hot_{k:05d}", 0.1) for k in range(N_HOT)],
        "surface string, record_id string, prior double",
    )
    return surfaces.unionByName(hot)


def test_hot_band_cap_bounds_dictionary_buckets(hot_dictionary):
    from gtfsrt2lc_spark.operators.linking import FuzzyDictionary

    uncapped = FuzzyDictionary(hot_dictionary, max_band_size=None)
    worst = (
        uncapped.bands_df.groupBy("band").count().agg(F.max("count")).collect()[0][0]
    )
    assert worst >= N_HOT, "fixture must actually produce a hot band"

    capped = FuzzyDictionary(hot_dictionary, max_band_size=50)
    worst_capped = (
        capped.bands_df.groupBy("band").count().agg(F.max("count")).collect()[0][0]
    )
    assert worst_capped <= 50


def test_hot_band_cap_bounds_candidate_set(spark, hot_dictionary):
    """A query colliding ONLY with the hot band proposes zero candidates
    under the cap (vs ~N_HOT uncapped) — the quadratic term is gone."""
    from gtfsrt2lc_spark.operators.linking import FuzzyDictionary, _prep_bands

    q = spark.createDataFrame([("aaaaaaa",)], "surface string")

    def n_candidates(fd):
        qb = _prep_bands(q, "q", fd._perms, fd.bands)
        return (
            qb.join(fd.bands_df, "band")
            .dropDuplicates(["surface_q", "surface_d"])
            .count()
        )

    assert n_candidates(FuzzyDictionary(hot_dictionary, max_band_size=None)) >= N_HOT
    assert n_candidates(FuzzyDictionary(hot_dictionary, max_band_size=50)) == 0


def test_hot_band_cap_preserves_golden_linking(spark, hot_dictionary, corpus_dfs, corpus):
    """Healthy surfaces keep their own (small) band buckets: linking results
    on the golden typo queries are IDENTICAL with the cap active, even with
    the degenerate surfaces present in the same dictionary."""
    from gtfsrt2lc_spark.operators.linking import link_fuzzy

    queries = spark.createDataFrame(
        [("Ada Lovelacee",), ("Grace Hoper",), ("Stark Industres",)],
        "surface string",
    )
    golden = {
        (r["surface"], r["record_id"], r["score"])
        for r in link_fuzzy(queries, hot_dictionary, max_band_size=None).collect()
    }
    capped = {
        (r["surface"], r["record_id"], r["score"])
        for r in link_fuzzy(queries, hot_dictionary, max_band_size=50).collect()
    }
    assert capped == golden
    assert len(capped) == 3


def test_link_fuzzy_rejects_mismatched_prepped_params(spark, corpus_dfs):
    """Explicit hash params contradicting a supplied FuzzyDictionary raise
    instead of silently linking with the wrong parameters (ADVICE r5)."""
    from gtfsrt2lc_spark.operators.linking import FuzzyDictionary, link_fuzzy

    _, _, surfaces, _ = corpus_dfs
    fd = FuzzyDictionary(surfaces, n_hashes=32, bands=16)
    q = spark.createDataFrame([("Ada Lovelacee",)], "surface string")
    with pytest.raises(ValueError, match="contradict"):
        link_fuzzy(q, None, n_hashes=16, prepped=fd)
    with pytest.raises(ValueError, match="seed"):
        link_fuzzy(q, None, seed=7, prepped=fd)
    # matching explicit params and omitted params both pass
    assert link_fuzzy(q, None, n_hashes=32, bands=16, prepped=fd).count() >= 0
    assert link_fuzzy(q, None, prepped=fd).count() >= 0


def test_minhash_neardup_band_cap(spark):
    """dedup mirror: a boilerplate cluster (identical token sets) stops
    proposing O(m^2) pairs under the cap; a healthy near-dup pair in the
    same corpus survives untouched."""
    from gtfsrt2lc_spark.operators.dedup import neardup_pairs_minhash

    boiler = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(40)]
    healthy = [
        (1000, "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(boiler + healthy, "doc_id long, text string")
    exact = neardup_pairs_minhash(df, "doc_id", "text", jaccard_threshold=0.7)
    assert exact.where(F.col("doc_a") < 1000).count() == 40 * 39 // 2
    capped = neardup_pairs_minhash(
        df, "doc_id", "text", jaccard_threshold=0.7, max_band_size=10
    )
    rows = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert rows == {(1000, 1001)}


def test_embedding_neardup_bucket_cap(spark):
    """dedup mirror for the embedding LSH path: a near-constant vector
    cluster is capped out; a healthy close pair survives."""
    from gtfsrt2lc_spark.operators.dedup import neardup_pairs_embedding

    hot = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]
    pair = [(1000, [0.0, 1.0, 1.0, 0.0]), (1001, [0.0, 1.0, 0.98, 0.01])]
    df = spark.createDataFrame(hot + pair, "vec_id long, embedding array<double>")
    exact = neardup_pairs_embedding(
        df, "vec_id", "embedding", cos_threshold=0.95, method="lsh", dim=4
    )
    assert exact.where(F.col("id_a") < 1000).count() == 30 * 29 // 2
    capped = neardup_pairs_embedding(
        df, "vec_id", "embedding", cos_threshold=0.95, method="lsh", dim=4,
        max_bucket_size=8,
    )
    rows = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert rows == {(1000, 1001)}
