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

Writes BENCH/decontaminate_ngrams_r06.json and prints it.

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


def decontaminate_at_n(spark, sf_dir: str, n: int):
    from pyspark.sql import functions as F

    from __spark_entry__ import _word_ngrams
    from gtfsrt2lc_spark.functions.hashing import tokens

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    grams = d.select(
        "doc_id", F.explode(_word_ngrams(tokens(F.col("text")), n)).alias("g")
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
    ap.add_argument("--out-name", default="decontaminate_ngrams_r06.json")
    args = ap.parse_args()

    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(
        app_name="decontaminate_ngrams",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    result = {"sf_dir": args.sf_dir, "cpus": args.cpus, "ns": {}}
    for n in (4, 8, 13):
        df = decontaminate_at_n(spark, args.sf_dir, n)
        t_plan0 = time.monotonic()
        # forces full analysis + code generation of the (non-AQE) plan
        ev = codegen_evidence(spark, lambda: decontaminate_at_n(spark, args.sf_dir, n))
        plan_sec = round(time.monotonic() - t_plan0, 3)
        df.count()  # warm, untimed
        raw = []
        rows = None
        for _ in range(args.passes):
            t0 = time.monotonic()
            rows = decontaminate_at_n(spark, args.sf_dir, n).count()
            raw.append(round(time.monotonic() - t0, 3))
        result["ns"][str(n)] = {
            "raw_sec": raw,
            "min_sec": min(raw),
            "contaminated_docs": rows,
            "plan_compile_sec": plan_sec,
            **ev,
        }
        print(f"n={n}: min {min(raw)}s raw {raw} rows {rows} "
              f"subtrees {ev['wholestage_subtrees']} "
              f"max_code {ev['max_subtree_code_chars']}")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
