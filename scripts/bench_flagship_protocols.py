"""Flagship bench protocol comparison + distributed-mapping variant.

Round-3 verdict asked for two artifacts this script produces in one session:

1. The r02 protocol (LocalRelation corpus in-plan) and the r03+ protocol
   (pages staged to parquet, the shape every real job reads) side-by-side
   on the same corpus/seed — decomposing "staging changed the measured work"
   from "the pipeline got slower".
2. The 100 TB path measured: the same staged-protocol flagship with
   ``max_local_surfaces=0``, forcing the fully distributed surface-mapping
   branch (no driver-side collect), so the web-scale fallback has a number
   instead of only a test.

Writes BENCH/flagship_protocols_r04.json and prints it.

Usage: python scripts/bench_flagship_protocols.py [--n-pages 109069]
       [--cpus 32] [--passes 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timed_passes(pipe, pages, n_passes: int) -> list[float]:
    out = []
    for _ in range(n_passes):
        t0 = time.monotonic()
        pipe.triples(pages).count()
        out.append(round(time.monotonic() - t0, 3))
        pipe.cleanup()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=109069)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()

    try:
        os.sched_setaffinity(0, set(range(args.cpus)))
    except (AttributeError, OSError, ValueError):
        pass

    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(
        app_name="flagship_protocols",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from gtfsrt2lc_spark.fixtures.pages import PREDICATES, build_corpus, corpus_dataframes
    from gtfsrt2lc_spark.plans.kg_pipeline import KGPipeline

    corpus = build_corpus(n_pages=args.n_pages, seed=42)
    pages_local, records, surfaces, sameas = corpus_dataframes(spark, corpus)
    pages_staged = bench._stage_pages(spark, corpus, args.n_pages)
    n_docs = pages_staged.count()
    preds = {ph: loc for ph, (loc, _, _) in PREDICATES.items()}

    pipe = KGPipeline(records, surfaces, sameas, preds)
    pipe.canonical_map()
    pipe.triples(pages_staged.limit(500)).count()  # warm, untimed
    pipe.cleanup()

    staged = _timed_passes(pipe, pages_staged, args.passes)
    localrel = _timed_passes(pipe, pages_local, args.passes)

    # 100 TB path: distributed surface mapping (driver collect forced off)
    pipe_dist = KGPipeline(records, surfaces, sameas, preds, max_local_surfaces=0)
    pipe_dist.canonical_map()
    pipe_dist.triples(pages_staged.limit(500)).count()
    pipe_dist.cleanup()
    dist = _timed_passes(pipe_dist, pages_staged, args.passes)

    result = {
        "n_pages": args.n_pages,
        "n_docs": n_docs,
        "cpus": args.cpus,
        "staged_parquet_raw": staged,
        "staged_parquet_min": min(staged),
        "local_relation_raw": localrel,
        "local_relation_min": min(localrel),
        "distributed_mapping_raw": dist,
        "distributed_mapping_min": min(dist),
        "docs_per_sec_staged": round(n_docs / min(staged), 1),
        "docs_per_sec_local_relation": round(n_docs / min(localrel), 1),
        "docs_per_sec_distributed_mapping": round(n_docs / min(dist), 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "flagship_protocols_r04.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
