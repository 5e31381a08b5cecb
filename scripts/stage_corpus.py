"""Stage a deterministic synthetic page corpus to parquet (once, untimed).

The scaling protocol runs the pipeline twice (local[N] / local[4N]) over the
SAME staged input — this script produces it. Kept separate from the timed
job so corpus synthesis never pollutes throughput numbers.

Usage: python scripts/stage_corpus.py --n-pages 1000000 --out /tmp/kgcorpus
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=1000000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shards", type=int, default=16, help="parallel generator shards")
    ap.add_argument("--noise", type=int, nargs=2, default=(1, 3),
                    help="min/max filler sentences per page (bench: 25 45)")
    args = ap.parse_args()

    from gtfsrt2lc_spark.fixtures.pages import build_corpus, corpus_dataframes
    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(app_name="stage_corpus", master="local[16]",
                      shuffle_partitions=16, driver_memory="48g")
    t0 = time.monotonic()
    # shard the generator so pages land in Spark incrementally (python lists
    # of millions of pages would hold GBs on the driver otherwise)
    per = args.n_pages // args.shards
    wrote_kb = False
    for s in range(args.shards):
        c = build_corpus(n_pages=per, seed=args.seed + s, noise_range=tuple(args.noise))
        pages, records, surfaces, sameas = corpus_dataframes(spark, c)
        # shard urls are disambiguated by seed-dependent domains already,
        # but page ids repeat across shards -> rewrite url with shard prefix
        from pyspark.sql import functions as F

        pages = pages.withColumn(
            "url", F.concat(F.lit(f"https://s{s}."), F.regexp_replace("url", r"^https://", ""))
        )
        pages.coalesce(8).write.mode("append").parquet(os.path.join(args.out, "pages"))
        if not wrote_kb:
            records.write.mode("overwrite").parquet(os.path.join(args.out, "records"))
            surfaces.write.mode("overwrite").parquet(os.path.join(args.out, "surfaces"))
            sameas.write.mode("overwrite").parquet(os.path.join(args.out, "sameas"))
            wrote_kb = True
        print(f"shard {s + 1}/{args.shards} staged ({time.monotonic() - t0:.0f}s)")
    n = spark.read.parquet(os.path.join(args.out, "pages")).count()
    print(f"staged {n} page rows to {args.out} in {time.monotonic() - t0:.0f}s")


if __name__ == "__main__":
    main()
