"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — the *scalable* baseline: queries are
broadcast, the corpus scan is embarrassingly partition-parallel, and top-k
reduces map-side via window row_number (no global sort of scores).

Scale paths:
  * random-hyperplane LSH bucketing — candidates share a signature bucket in
    >=1 of t tables; exact cosine re-ranks candidates only.
  * IVF (inverted-file) — a deterministic sample-trained coarse quantizer
    partitions the corpus into cells; queries probe only the n_probe nearest
    cells. The cell assignment is the partitioning key, so at 100 TB the
    search is an equi-join on cell_id instead of a full scan.
All scoring math is JVM-side higher-order functions (zip_with/aggregate);
no UDF anywhere.
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

    Norms are computed ONCE per vector in the projections below the join
    (guide §1.2 per-task work): ``cosine()`` inline would re-fold
    ``norm(c_vec)`` for every (query, corpus) pair — 2/3 of the per-pair
    flops for nothing when |queries| > 1. Same arithmetic, same order
    (dot / (norm_q * norm_c)), so the rounded values are bit-identical.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("_qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn")), 6
            ),
        )
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


def _with_constant_table(df: DataFrame, col_name: str, value, ddl: str) -> DataFrame:
    """Attach a (nested-array) constant to every row via a single-row
    broadcast relation instead of a literal expression tree.

    Literal trees grow with the constant's size: n_cells x dim doubles embed
    in every serialized task binary (TaskSetManager 'very large task'
    warnings) and inflate Janino codegen. A broadcast nested-loop join
    against a one-row LocalRelation ships the constant ONCE per executor and
    keeps the row math in whole-stage codegen.

    ``col_name`` is reserved: raises ValueError if the input already carries
    it (same contract as dedup_exact's reserved-column guard) — the
    alternative is a confusing ambiguous-reference AnalysisException deep in
    lsh_topk/ivf_topk."""
    if col_name in df.columns:
        raise ValueError(
            f"input DataFrame already has a column named '{col_name}' "
            f"(reserved by this operator); rename it first"
        )
    one = df.sparkSession.createDataFrame([(value,)], f"{col_name} {ddl}")
    return df.crossJoin(F.broadcast(one))


def _bucket_structs(vec: Column, tables_col: Column) -> Column:
    """array<struct<table_id,bucket>> of sign-bit bucket keys, one per table
    (tables_col: array<array<array<double>>> from _with_constant_table)."""
    return F.transform(
        tables_col,
        lambda planes, t: F.struct(
            t.cast("int").alias("table_id"),
            F.array_join(
                F.transform(
                    planes,
                    lambda p: F.when(dot(vec, p) >= 0, F.lit("1")).otherwise(F.lit("0")),
                ),
                "",
            ).alias("bucket"),
        ),
    )


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
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = same random-hyperplane bucket in any
    of n_tables tables; exact cosine re-rank on candidates.

    At 100 TB the bucket join replaces the full scan: corpus is hashed once
    per table (narrow), the join key is (table, bucket) so the shuffle is
    bounded by bucket sizes, and AQE splits skewed buckets.

    Shuffle discipline: the bucket join replicates every corpus row
    x n_tables, so it runs on the NARROW (id, table_id, bucket) frames; the
    vectors join back to the deduped (q_id, c_id) candidate pairs, so each
    corpus vector shuffles at most once instead of x n_tables.

    ``broadcast_queries`` (default True) pins the query side of both joins
    as a broadcast — right for the common case of a small query batch, but a
    hard broadcast hint bypasses the planner's size check and can OOM on a
    LARGE query set. Pass False for big query DataFrames: the joins become
    planner-chosen (sort-merge/shuffle-hash, AQE may still re-plan small
    sides to broadcast at runtime), which is the symmetric big-join shape.
    """

    def _q(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_queries else df
    tables = _hyperplanes(dim, n_bits, n_tables, seed)

    def with_buckets(df: DataFrame, side: str) -> DataFrame:
        with_tables = _with_constant_table(
            df, "_tables", tables, "array<array<array<double>>>"
        )
        return with_tables.select(
            F.col(id_col).alias(f"{side}_id"),
            F.explode(_bucket_structs(F.col(vec_col), F.col("_tables"))).alias("b"),
        ).select(
            f"{side}_id", F.col("b.table_id").alias("table_id"), F.col("b.bucket").alias("bucket")
        )

    c = with_buckets(corpus, "c")
    q = with_buckets(queries, "q")
    cand = (
        c.join(_q(q), ["table_id", "bucket"])
        .where(F.col("c_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    # norms fold once per vector in these projections, not once per
    # candidate pair (see brute_force_topk); same arithmetic order.
    c_vecs = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    q_vecs = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        cand.join(c_vecs, "c_id")
        .join(_q(q_vecs), "q_id")
        .withColumn(
            "cos",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn")), 6
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"), F.col("c_id").alias("vec_id"), "cos", "rank"
        )
    )


def _train_centroids(
    corpus: DataFrame,
    dim: int,
    n_cells: int,
    id_col: str,
    vec_col: str,
    sample_size: int,
    iters: int,
    seed: int,
) -> list[list[float]]:
    """Deterministic k-means coarse quantizer from a seeded, id-ordered sample.

    IVF recipe: train on a driver-side sample (sample_size rows ~= a few MB,
    independent of corpus size), broadcast the centroid table. Determinism:
    the sample is `orderBy(id).limit(n)` (stable regardless of partitioning)
    and init is a seeded shuffle of sample indices — no wall clock, no
    engine-native rand(). Returns L2-normalized centroids so cell assignment
    is argmax of a plain dot product.
    """
    import math

    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(sample_size)
        .collect()
    )
    vecs = [[float(x) for x in r["v"]] for r in rows]
    if len(vecs) < n_cells:
        raise ValueError(f"sample ({len(vecs)}) smaller than n_cells ({n_cells})")

    def _norm(v: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    rng = random.Random(seed)
    idx = list(range(len(vecs)))
    rng.shuffle(idx)
    cents = [_norm(vecs[i]) for i in idx[:n_cells]]
    for _ in range(iters):
        sums = [[0.0] * dim for _ in range(n_cells)]
        counts = [0] * n_cells
        for v in vecs:
            best, best_dot = 0, -math.inf
            for c_i, c in enumerate(cents):
                d = sum(a * b for a, b in zip(v, c))
                if d > best_dot:
                    best, best_dot = c_i, d
            counts[best] += 1
            s = sums[best]
            for j, x in enumerate(v):
                s[j] += x
        cents = [
            _norm(sums[i]) if counts[i] else cents[i] for i in range(n_cells)
        ]
    return cents


def _cell_scores(vec: Column, cents_col: Column) -> Column:
    """array<struct<dot,cell_id>> of centroid dot products (struct ordered so
    array_max / sort compare by dot first, cell_id as deterministic tiebreak).
    ``cents_col`` is the array<array<double>> centroid table attached via
    ``_with_constant_table`` — shipped once per executor, not per task."""
    return F.transform(
        cents_col,
        lambda cv, i: F.struct(
            F.round(dot(vec, cv), 9).alias("dot"),
            i.cast("int").alias("cell_id"),
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file index: corpus rows live in their
    nearest centroid's cell; each query scans only its n_probe nearest cells.

    (query_id, vec_id, cos, rank) — same shape/scoring as brute_force_topk;
    with n_probe == n_cells the output is exactly the brute-force result.
    At scale: cell assignment is one narrow pass (the centroid table rides a
    one-row broadcast relation — shipped once per executor, never inside
    task binaries), the probe is an equi-join on cell_id —
    a keyed shuffle of 1/(n_cells/n_probe) of the corpus — and the re-rank
    runs only inside probed cells. Hot cells split via AQE skew-join.
    """
    cents = _train_centroids(
        corpus, dim, n_cells, id_col, vec_col, sample_size, kmeans_iters, seed
    )
    cents_ddl = "array<array<double>>"
    c = _with_constant_table(corpus, "_cents", cents, cents_ddl).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        F.array_max(_cell_scores(F.col(vec_col), F.col("_cents")))["cell_id"].alias("cell_id"),
        norm(F.col(vec_col)).alias("_cn"),  # once per vector, not per pair
    )
    probes = F.transform(
        F.slice(
            F.reverse(F.array_sort(_cell_scores(F.col(vec_col), F.col("_cents")))),
            1,
            n_probe,
        ),
        lambda s: s["cell_id"],
    )
    q = _with_constant_table(queries, "_cents", cents, cents_ddl).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probes).alias("cell_id"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        c.join(F.broadcast(q), "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )
