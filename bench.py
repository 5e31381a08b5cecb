"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is docs/sec of the flagship KG pipeline (Arrow-UDF
extraction -> SVO -> entity linking -> canonicalization -> triple dedup) over
a CC-style page corpus synthesized at a size proportional to the SF — the
BASELINE.json throughput target. Relational/corpus operator timings ride
along in "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "semi_join",
    "best_match_join",
    "group_collect",
    "pairwise_lead",
    "locf",
    "sessionize",
    "topk_per_group",
    "time_buckets",
    "asof_join",
    "range_join",
    "doc_fingerprint",
    "doc_simhash",
    "token_count",
    "quality_score",
    "pii_scrub",
    "paragraph_dedup",
    "repair_pass",
    "sequence_packing",
    "corpus_clean",
    "neardup_clusters",
    "cut_spans",
    "entity_pagerank",
    "alignment_pass",
    "ann_cosine_topk",
    "svo_extract",
    "kg_pipeline_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # Pin the bench (and every child: JVM, python UDF workers inherit
    # affinity) to exactly the advertised core budget BEFORE the session
    # starts — the same faithful-executor-proxy rationale as
    # scripts/bench_scaling.py --pin. On a 32-core host with cpus=32 this is
    # a no-op; with a smaller budget it stops python workers from spilling
    # onto unadvertised cores and tightens run-to-run spread.
    try:
        os.sched_setaffinity(0, set(range(int(cpus))))
    except (AttributeError, OSError, ValueError):
        pass  # non-Linux or budget > host cores: run unpinned

    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(
        app_name="gtfsrt2lc_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # one untimed warmup pass (codegen, page cache, python workers, shuffle
    # service), then five timed passes per query; on this shared VM any pass
    # can hit a throttling stall, so the JSON records the FULL per-pass
    # spread ("queries_raw") alongside min ("queries" — the steady-state
    # headline, convention unchanged since r2), median ("queries_median")
    # and stdev ("queries_stdev") so a regression is classifiable as real vs
    # host noise without re-running (a real regression moves the median; a
    # throttle spike widens the spread/stdev).
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
    for name in BENCH_QUERIES:  # warmup, untimed
        qs[name](spark, sf_dir).count()
    raw: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _pass in range(n_passes):
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).count()
            raw[name].append(round(time.monotonic() - t0, 3))
    timings = {name: min(ts) for name, ts in raw.items()}
    medians = {name: sorted(ts)[len(ts) // 2] for name, ts in raw.items()}
    stdevs = {
        name: round((sum((t - sum(ts) / len(ts)) ** 2 for t in ts) / len(ts)) ** 0.5, 3)
        for name, ts in raw.items()
    }

    # flagship: full KG pipeline over a synthesized CC-style page corpus.
    # Pages are STAGED TO PARQUET once (pyarrow, untimed) and read back:
    # timing a LocalRelation corpus would ship ~3 MB of page payload inside
    # every task binary (the TaskSetManager large-task warning) and scans a
    # shape no real job has — the pipeline always reads files.
    from gtfsrt2lc_spark.fixtures.pages import PREDICATES, build_corpus, corpus_dataframes
    from gtfsrt2lc_spark.plans.kg_pipeline import KGPipeline

    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", str(int(1000000 * sf) if sf > 0 else 4000)))
    corpus = build_corpus(n_pages=n_pages, seed=42)
    _, records, surfaces, sameas = corpus_dataframes(spark, corpus)
    pages = _stage_pages(spark, corpus, n_pages)
    n_docs = pages.count()  # materialize/list input outside the timed window
    pipe = KGPipeline(records, surfaces, sameas,
                      {ph: loc for ph, (loc, _, _) in PREDICATES.items()})
    pipe.canonical_map()  # KB prep is amortized across micro-batches; not timed

    pipe.triples(pages.limit(500)).count()  # warm the flagship plan, untimed
    pipe.cleanup()
    kg_raw = []
    for _pass in range(n_passes):
        t0 = time.monotonic()
        n_triples = pipe.triples(pages).count()
        kg_raw.append(round(time.monotonic() - t0, 3))
        pipe.cleanup()
    kg_secs = min(kg_raw)
    raw["kg_pipeline_pages"] = kg_raw
    timings["kg_pipeline_pages"] = round(kg_secs, 3)
    medians["kg_pipeline_pages"] = sorted(kg_raw)[len(kg_raw) // 2]
    stdevs["kg_pipeline_pages"] = round(
        (sum((t - sum(kg_raw) / len(kg_raw)) ** 2 for t in kg_raw) / len(kg_raw)) ** 0.5, 3
    )
    docs_per_sec = n_docs / kg_secs if kg_secs > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "kg_pipeline_docs_per_sec",
                "value": round(docs_per_sec, 2),
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "queries_stdev": stdevs,
                "queries_raw": raw,
                "sf": sf,
                "n_docs": n_docs,
                "n_triples": n_triples,
                "cpus": int(cpus),
            }
        )
    )


def _stage_pages(spark, corpus, n_pages: int):
    """Write the corpus pages to a keyed parquet dir once; reuse across runs
    at the same size/seed. Returns the file-backed DataFrame."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"kgbench_pages_{n_pages}_s42")
    marker = os.path.join(out, "_STAGED")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        pages = corpus.pages
        shard_rows = max(1, (len(pages) + 31) // 32)
        for i in range(0, len(pages), shard_rows):
            chunk = pages[i : i + shard_rows]
            table = pa.table(
                {
                    "url": pa.array([p["url"] for p in chunk], pa.string()),
                    "warc_ts": pa.array(
                        [p["warc_ts"].replace(tzinfo=None) for p in chunk],
                        pa.timestamp("us"),
                    ),
                    "html": pa.array([p["html"] for p in chunk], pa.binary()),
                    "text": pa.array([p["text"] for p in chunk], pa.string()),
                    "lang": pa.array([p["lang"] for p in chunk], pa.string()),
                }
            )
            pq.write_table(table, os.path.join(out, f"shard_{i // shard_rows:03d}.parquet"))
        open(marker, "w").close()
    return spark.read.parquet(out)


if __name__ == "__main__":
    main()
