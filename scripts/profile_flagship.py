"""Phase-level wall-clock profile of the flagship KG pipeline.

Decomposes one `pipe.triples(pages).count()` into its serial-path phases so
optimization targets are measured, not guessed:

  stage_mentions   extract + SVO + parquet stage write (the heavy pass)
  probe_collect    UNMATCHED-surface anti-join probe (collects only surfaces
                   the exact dictionary misses — empty on clean corpora)
  mapping_build    LocalRelation of dict (+ fuzzy LSH when unmatched exist)
  final_count      staged-mentions re-read, mapping/canon joins, dedup, count

Usage:
    python scripts/profile_flagship.py [--n-pages 109069] [--cpus 32] [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=109069)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(
        app_name="profile_flagship",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )

    from pyspark.sql import functions as F

    from gtfsrt2lc_spark.fixtures.pages import PREDICATES, build_corpus, corpus_dataframes
    from gtfsrt2lc_spark.plans.kg_pipeline import KGPipeline

    sys.path.insert(0, REPO)
    import bench

    corpus = build_corpus(n_pages=args.n_pages, seed=42)
    _, records, surfaces, sameas = corpus_dataframes(spark, corpus)
    pages = bench._stage_pages(spark, corpus, args.n_pages)
    n_docs = pages.count()
    pipe = KGPipeline(records, surfaces, sameas,
                      {ph: loc for ph, (loc, _, _) in PREDICATES.items()})
    pipe.canonical_map()
    # warm codegen/python workers once, untimed
    pipe.triples(pages.limit(500)).count()
    pipe.cleanup()

    for p in range(args.passes):
        t: dict[str, float] = {}
        t0 = time.monotonic()
        mentions = pipe.mentions(pipe.extracted(pages))
        staged = pipe._stage(mentions)
        t["stage_mentions"] = time.monotonic() - t0

        t0 = time.monotonic()
        dic_local = pipe._resolved_dictionary()
        dict_df = spark.createDataFrame(
            list(dic_local.items()), "surface string, record_id string"
        )
        head = (
            staged.select(
                F.explode(F.array("subj_surface", "obj_surface")).alias("surface")
            )
            .join(F.broadcast(dict_df.select("surface")), "surface", "left_anti")
            .distinct()
            .limit((pipe.max_local_surfaces or 10**9) + 1)
            .collect()
        )
        t["probe_collect"] = time.monotonic() - t0

        t0 = time.monotonic()
        rows = list(dic_local.items())
        if head:
            from gtfsrt2lc_spark.operators.linking import link_fuzzy

            fz = link_fuzzy(
                spark.createDataFrame(
                    [(r["surface"],) for r in head], "surface string"
                ),
                pipe.surfaces,
                jaccard_threshold=pipe.fuzzy_threshold,
            ).collect()
            rows.extend((r["surface"], r["record_id"]) for r in fz)
        mapping = F.broadcast(
            spark.createDataFrame(rows, "surface string, record_id string")
        )
        t["mapping_build"] = time.monotonic() - t0

        t0 = time.monotonic()
        m = staged.join(
            mapping.withColumnRenamed("surface", "subj_surface").withColumnRenamed(
                "record_id", "subj_surface_record"),
            "subj_surface",
        ).join(
            mapping.withColumnRenamed("surface", "obj_surface").withColumnRenamed(
                "record_id", "obj_surface_record"),
            "obj_surface",
        )
        canon = F.broadcast(pipe.canonical_map())
        pred_map = F.create_map(*[F.lit(x) for kv in pipe.predicates.items() for x in kv])
        tri = (
            m.join(canon.select(F.col("record_id").alias("subj_surface_record"),
                                F.col("iri").alias("subj")), "subj_surface_record")
            .join(canon.select(F.col("record_id").alias("obj_surface_record"),
                               F.col("iri").alias("obj")), "obj_surface_record")
            .withColumn("pred", pred_map[F.col("pred_phrase")])
            .groupBy("subj", "pred", "obj").agg(F.min("url").alias("graph"))
        )
        n = tri.count()
        t["final_count"] = time.monotonic() - t0
        t["total"] = sum(t.values())
        pipe.cleanup()
        print(json.dumps({"pass": p, "n_docs": n_docs, "n_triples": n,
                          "n_unmatched": len(head),
                          **{k: round(v, 3) for k, v in t.items()}}))


if __name__ == "__main__":
    main()
