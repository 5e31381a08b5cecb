"""Benchmark-decontamination at production n-gram sizes (round-6 verdict
item 4).

The driver-gated oracle (`__spark_entry__.q_decontaminate`) runs n=4 at
test SF; production decontamination (GPT-3 appx. C, Llama, FineWeb) uses
8-13-gram windows. `_word_ngrams` builds n element_at+concat expressions
per gram inside one `transform` lambda, so the question this bench answers
is whether the Catalyst expression tree and the generated code stay
reasonable as n grows — and what the wall-clock cost curve looks like on
the sf0.1 documents corpus.

For each n in {4, 8, 13} it records:
  * wall seconds per pass (3 passes, min + all raws) for the full
    decontaminate plan (eval-side distinct grams broadcast, training grams
    streamed through the broadcast hash join, per-doc countDistinct);
  * rows returned (contaminated docs found at that n);
  * codegen evidence: number of WholeStageCodegen subtrees in
    explain('codegen') and the largest generated-code size (chars) across
    subtrees — a Janino/JIT blowup would show up as a huge subtree or a
    missing WholeStageCodegen wrap around the n-gram projection.

Each n now runs TWO variants: "string" (concat_ws gram keys, the oracle
shape) and "hashed" (`word_ngram_hashes` 64-bit xxhash64 keys, the
production fast path) — same plan otherwise, so the delta isolates the
gram-key representation cost.

Writes BENCH/<out-name> (default decontaminate_ngrams_hashed_r06.json)
and prints it.

Usage: python scripts/bench_decontaminate_ngrams.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def decontaminate_at_n(spark, sf_dir: str, n: int, hashed: bool = False):
    from pyspark.sql import functions as F

    from __spark_entry__ import _word_ngrams
    from gtfsrt2lc_spark.functions.hashing import tokens, word_ngram_hashes

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    builder = word_ngram_hashes if hashed else _word_ngrams
    grams = d.select(
        "doc_id", F.explode(builder(tokens(F.col("text")), n)).alias("g")
    )
    ev = grams.where(F.col("doc_id") % 50 == 0).select("g").distinct()
    return (
        grams.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_hits"))
    )


def codegen_evidence(spark, build_df) -> dict:
    """Subtree count + max generated-code size from explain('codegen').

    AQE wraps the plan in AdaptiveSparkPlan, under which debugCodegen
    finds zero subtrees before execution — so the probe builds the plan
    with AQE off (codegen itself is identical; AQE only re-plans exchanges
    at runtime) and restores the setting after."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    buf = io.StringIO()
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        with contextlib.redirect_stdout(buf):
            build_df().explain("codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    text = buf.getvalue()
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    n_subtrees = int(m.group(1)) if m else 0
    # subtrees are delimited by '== Subtree N / M ...' headers
    sizes = [len(part) for part in re.split(r"== Subtree \d+ / \d+", text)[1:]]
    return {
        "wholestage_subtrees": n_subtrees,
        "max_subtree_code_chars": max(sizes, default=0),
        "explain_chars": len(text),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out-name", default="decontaminate_ngrams_hashed_r06.json")
    args = ap.parse_args()

    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(
        app_name="decontaminate_ngrams",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from gtfsrt2lc_spark.functions.hashing import tokens
    from __spark_entry__ import _word_ngrams

    result = {"sf_dir": args.sf_dir, "cpus": args.cpus, "ns": {}}
    for n in (4, 8, 13):
        per = {"string": None, "hashed": None}
        for hashed in (False, True):
            variant = "hashed" if hashed else "string"
            t_plan0 = time.monotonic()
            # forces full analysis + code generation of the (non-AQE) plan
            ev = codegen_evidence(
                spark,
                lambda: decontaminate_at_n(spark, args.sf_dir, n, hashed=hashed),
            )
            plan_sec = round(time.monotonic() - t_plan0, 3)
            decontaminate_at_n(spark, args.sf_dir, n, hashed=hashed).count()  # warm
            per[variant] = {
                "raw_sec": [], "plan_compile_sec": plan_sec, **ev,
            }
        # passes INTERLEAVED string,hashed,string,hashed,... so host-speed
        # drift on this shared VM hits both variants equally (the r6 first
        # cut ran all string passes then all hashed and the drift swamped
        # the comparison)
        rows = {}
        for _ in range(args.passes):
            for hashed in (False, True):
                variant = "hashed" if hashed else "string"
                t0 = time.monotonic()
                rows[variant] = decontaminate_at_n(
                    spark, args.sf_dir, n, hashed=hashed
                ).count()
                per[variant]["raw_sec"].append(round(time.monotonic() - t0, 3))
        # eval-side broadcast payload: distinct gram count and the bytes
        # each representation broadcasts (strings vs 8-byte hashes) — the
        # scale argument for the hashed path lives here, not in local wall
        d = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        g = d.select(
            "doc_id", F.explode(_word_ngrams(tokens(F.col("text")), n)).alias("g")
        )
        st = (
            g.where(F.col("doc_id") % 50 == 0).select("g").distinct()
            .agg(F.count("*").alias("cnt"), F.sum(F.length("g")).alias("str_bytes"))
            .collect()[0]
        )
        eval_stats = {
            "eval_distinct_grams": st["cnt"],
            "eval_broadcast_bytes_string": st["str_bytes"],
            "eval_broadcast_bytes_hashed": 8 * st["cnt"],
        }
        for variant in ("string", "hashed"):
            raw = per[variant]["raw_sec"]
            per[variant].update(
                min_sec=min(raw),
                median_sec=sorted(raw)[len(raw) // 2],
                contaminated_docs=rows[variant],
            )
            print(f"n={n} {variant}: min {min(raw)}s raw {raw} "
                  f"rows {rows[variant]} "
                  f"subtrees {per[variant]['wholestage_subtrees']} "
                  f"max_code {per[variant]['max_subtree_code_chars']}")
        result["ns"][str(n)] = {**per, **eval_stats}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
