"""operators/graph: degrees + fixed-iteration PageRank.

PageRank expectations are hand-computed on a 4-vertex graph, so a wrong
damping constant, a dropped dangling vertex, or an extra normalization all
fail against literal numbers rather than a reimplementation.
"""

from __future__ import annotations

import pytest

from gtfsrt2lc_spark.operators.graph import degrees, pagerank

# a -> b, a -> c, b -> c, c -> a, d -> c   (d has no in-edges; a,b,c cycle)
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_degrees(spark, edges_df):
    got = {r["vertex"]: (r["out_degree"], r["in_degree"]) for r in degrees(edges_df).collect()}
    assert got == {
        "a": (2, 1),
        "b": (1, 1),
        "c": (1, 3),
        "d": (1, 0),
    }


def _expected_ranks(iterations: int, damping: float = 0.85) -> dict[str, float]:
    """Independent dense-python power method with the same semantics."""
    out = {"a": ["b", "c"], "b": ["c"], "c": ["a"], "d": ["c"]}
    ranks = {v: 1.0 for v in "abcd"}
    for _ in range(iterations):
        contrib: dict[str, float] = {v: 0.0 for v in "abcd"}
        for u, nbrs in out.items():
            for v in nbrs:
                contrib[v] += ranks[u] / len(nbrs)
        ranks = {v: (1 - damping) + damping * c for v, c in contrib.items()}
    return ranks


def test_pagerank_one_iteration_literals(spark, edges_df):
    # by hand: contrib(a)=rank(c)/1=1, contrib(b)=rank(a)/2=0.5,
    # contrib(c)=0.5+1+1=2.5, contrib(d)=0
    got = {r["vertex"]: r["rank"] for r in pagerank(edges_df, iterations=1).collect()}
    assert got["a"] == pytest.approx(0.15 + 0.85 * 1.0)
    assert got["b"] == pytest.approx(0.15 + 0.85 * 0.5)
    assert got["c"] == pytest.approx(0.15 + 0.85 * 2.5)
    assert got["d"] == pytest.approx(0.15)  # no in-edges: reset mass only


def test_pagerank_three_iterations_matches_dense_reference(spark, edges_df):
    got = {r["vertex"]: r["rank"] for r in pagerank(edges_df, iterations=3).collect()}
    want = _expected_ranks(3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_checkpoint_boundary_is_transparent(spark, edges_df):
    """Lineage truncation must not change values: run with a checkpoint
    every iteration and compare to the unchunked plan."""
    a = {r["vertex"]: r["rank"]
         for r in pagerank(edges_df, iterations=3, rounds_per_checkpoint=1).collect()}
    b = {r["vertex"]: r["rank"] for r in pagerank(edges_df, iterations=3).collect()}
    assert a == pytest.approx(b)


def test_pagerank_hub_ranks_highest_on_skewed_graph(spark):
    """A head-entity hub (everyone links to it) must dominate."""
    edges = [(f"v{i}", "hub") for i in range(1, 20)] + [("hub", "v1")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = {r["vertex"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    assert ranks["hub"] > 5 * ranks["v2"]


def test_triple_diff_statuses(spark):
    from gtfsrt2lc_spark.operators.graph import triple_diff

    old = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("a", "p", "y")],  # dup collapses
        ["subj", "pred", "obj"],
    )
    new = spark.createDataFrame(
        [("a", "p", "y"), ("b", "q", "z")], ["subj", "pred", "obj"]
    )
    got = {(r["subj"], r["pred"], r["obj"]): r["status"]
           for r in triple_diff(old, new).collect()}
    assert got == {
        ("a", "p", "x"): "removed",
        ("a", "p", "y"): "kept",
        ("b", "q", "z"): "added",
    }
