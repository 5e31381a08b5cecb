"""Graph analytics over the materialized triple store: degrees + PageRank.

Once the KG pipeline has emitted a deduplicated (subj, pred, obj) edge
list, downstream consumers rank entities by structural importance —
which canonical records are hubs, which mentions are load-bearing — the
same question gtfsrt2lc users answer by counting connections per stop /
route over the emitted Linked Connections (ref analog: the per-trip
connection fan-out implicitly ranked by `lib/Gtfsrt2LC.js:438-665`'s
grouping; here it is generalized to explicit degree and PageRank scores
over the entity graph).

Scale posture (100 TB / 10^9-vertex graphs):
- ``degrees``: two narrow keyed aggregations (8-byte-ish vertex keys, long
  counts), map-side combinable, then one outer merge join; no payload ever
  rides an exchange.
- ``pagerank``: fixed-iteration power method as a driver-side loop of
  DataFrame ops — the standard Spark formulation (same semantics as the
  classic Spark PageRank example and GraphFrames' `pageRank(maxIter=N)`).
  Each iteration is exactly ONE new shuffle: contributions aggregate by
  ``dst``; the join of ranks to the static ``(src, out_degree)`` table
  reuses the rank frame's ``vertex`` partitioning from the previous
  iteration's aggregation. Ranks are a narrow (vertex, double) frame.
  ``localCheckpoint`` every ``rounds_per_checkpoint`` iterations truncates
  lineage so plan size stays bounded at any iteration count (the
  connected-components discipline, `operators/components.py:105`).
  Dangling vertices (no out-edges) contribute nothing — the un-normalized
  "0.15 + 0.85 * incoming" formulation, deterministic and oracle-friendly;
  total mass is not conserved, by design, matching the reference Spark
  example rather than the stochastic-matrix variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triple_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot delta of two triple stores: (subj, pred, obj, status) with
    status in {added, removed, kept} — the re-crawl maintenance question
    ("what changed in the KG between two crawls") a consumer of the
    incremental manifest asks next (ref analog: the differential history
    store that emits only changed connections per feed poll,
    `lib/Gtfsrt2LC.js:545-560` / `plans/gtfs.py:542` — generalized from
    per-key last-state to whole-snapshot set algebra).

    Scale posture: both sides reduce to DISTINCT (s, p, o) then meet in a
    single full-outer sort-merge join on all three columns — one shuffle
    per side on the triple key, no payload beyond the triple itself, and
    co-partitioned storage (bucketed by subj) lets AQE elide the exchange
    entirely. Status is derived from null-sides, so the plan is exactly
    the anti-join pair a naive added/removed formulation would run twice,
    at half the cost.
    """
    o = old.select("subj", "pred", "obj").distinct().withColumn("_o", F.lit(1))
    n = new.select("subj", "pred", "obj").distinct().withColumn("_n", F.lit(1))
    return (
        o.join(n, ["subj", "pred", "obj"], "full_outer")
        .select(
            "subj",
            "pred",
            "obj",
            F.when(F.col("_o").isNull(), F.lit("added"))
            .when(F.col("_n").isNull(), F.lit("removed"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex (vertex, out_degree, in_degree) over an edge list.

    ``edges`` has columns (src, dst); parallel edges count once each —
    pre-``distinct`` the input for simple-graph semantics.
    """
    outd = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("out_degree")
    )
    ind = edges.groupBy(F.col("dst").alias("vertex")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        outd.join(ind, "vertex", "full_outer")
        .select(
            "vertex",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    rounds_per_checkpoint: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges.

    rank_0(v) = 1.0 for every vertex (src or dst of any edge);
    rank_t(v) = (1 - damping) + damping * sum over in-edges (u, v) of
    rank_{t-1}(u) / out_degree(u).

    Returns (vertex, rank) for all vertices, rank as double. Fixed
    iteration count (not convergence-tested) keeps the result an exact,
    SQL-expressible function of the input — the DuckDB oracle unrolls the
    same ``iterations`` steps.
    """
    edges = edges.select("src", "dst")
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    # static per-source fan-out; joined per iteration on src
    outd = edges.groupBy("src").agg(F.count("*").alias("_od"))
    contrib_src = edges.join(outd, "src")
    ranks = verts.withColumn("rank", F.lit(1.0))
    for i in range(iterations):
        contribs = (
            contrib_src.join(ranks.withColumnRenamed("vertex", "src"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("rank") / F.col("_od")).alias("_in"))
        )
        ranks = verts.join(contribs, "vertex", "left").select(
            "vertex",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("_in", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % rounds_per_checkpoint == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
