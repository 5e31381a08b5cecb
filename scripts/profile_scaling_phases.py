"""Per-phase wall-clock decomposition of the CC-weight scaling workload.

Runs the exact submit_pipeline work (staged corpus -> run_incremental) but
times each phase cumulatively by forcing materialization boundaries, at ONE
parallelism level per invocation (pin with taskset, matching
bench_scaling --pin). Comparing the per-phase walls at N vs 4N shows WHICH
phase fails to scale instead of guessing from end-to-end totals.

Usage:
    taskset -c 0-7 python scripts/profile_scaling_phases.py \
        --corpus /tmp/kgcorpus_ccweight_2m --cores 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cores", type=int, required=True)
    args = ap.parse_args()

    try:
        os.sched_setaffinity(0, set(range(args.cores)))
    except (AttributeError, OSError, ValueError):
        pass

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from gtfsrt2lc_spark.fixtures.pages import PREDICATES
    from gtfsrt2lc_spark.operators.dedup import latest_by_key
    from gtfsrt2lc_spark.plans.kg_pipeline import KGPipeline

    pages = spark.read.parquet(os.path.join(args.corpus, "pages"))
    records = spark.read.parquet(os.path.join(args.corpus, "records"))
    surfaces = spark.read.parquet(os.path.join(args.corpus, "surfaces"))
    sameas = spark.read.parquet(os.path.join(args.corpus, "sameas"))
    pages.count()  # materialize input listing/page cache, untimed

    pipe = KGPipeline(records, surfaces, sameas,
                      {ph: loc for ph, (loc, _, _) in PREDICATES.items()})
    pipe.scratch_dir = tempfile.mkdtemp(prefix=f"kg_prof_{args.cores}_")
    pipe.canonical_map()
    pipe.triples(pages.where(F.pmod(F.xxhash64("url"), F.lit(100)) == 0)).count()
    pipe.cleanup()

    phases: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        phases[name] = round(time.monotonic() - t0, 2)
        return out

    # 1. latest-wins dedup alone (winner agg + semi join, payload in plan)
    timed("latest_scan", lambda: latest_by_key(
        pages, "url", "warc_ts", unique_order=True
    ).select(F.count("*"), F.sum(F.length("html"))).collect())

    # 2. + extraction UDF (count chars so the UDF runs for every row)
    timed("extract", lambda: pipe.extracted(pages)
          .select(F.sum(F.length("extracted_text"))).collect())

    # 3. + sentence split + SVO regex
    timed("mentions", lambda: pipe.mentions(pipe.extracted(pages)).count())

    # 4. + linking (stage write happens inside)
    timed("linked", lambda: pipe.linked(
        pipe.mentions(pipe.extracted(pages))).count())
    pipe.cleanup()

    # 5. full triples (linking re-runs; terminal dedup + canon joins)
    timed("triples_count", lambda: pipe.triples(pages).count())
    pipe.cleanup()

    print(json.dumps({"cores": args.cores, "phases": phases}))


if __name__ == "__main__":
    main()
