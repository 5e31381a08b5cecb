"""Gopher repetition filter: hashed vs string gram keys (round 6).

`_topgram_frac` switched its per-doc n-gram count key from the concatenated
gram string to `word_ngram_hashes` (64-bit xxhash64 over the n token
columns). Unlike decontamination — where the training grams stream straight
into a broadcast join and never shuffle — this query's
groupBy(doc_id, gram) is a REAL shuffle of every gram key, so the
representation shows up in shuffle bytes as well as wall time.

Interleaves hashed/string passes (host-speed drift on this shared VM hits
both equally) and reports the shuffle-key payload analytically: the count
of exploded grams and the bytes each key representation carries into
groupBy(doc_id, g) — strings (sum of gram lengths) vs 8 bytes per gram.

Writes BENCH/<out-name> (default gopher_hashed_r06.json) and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gopher_variant(spark, sf_dir: str, hashed: bool):
    from pyspark.sql import functions as F

    from __spark_entry__ import _word_ngrams
    from gtfsrt2lc_spark.functions.hashing import tokens, word_ngram_hashes

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    builder = word_ngram_hashes if hashed else _word_ngrams

    def topgram(n: int):
        ex = d.select(
            "doc_id", F.explode(builder(tokens(F.col("text")), n)).alias("g")
        )
        cnt = ex.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        return cnt.groupBy("doc_id").agg(
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 6
            ).alias(f"top{n}gram_frac")
        )

    out = topgram(2).join(topgram(3), "doc_id")
    return out.select(
        "doc_id",
        "top2gram_frac",
        "top3gram_frac",
        ((F.col("top2gram_frac") <= 0.20) & (F.col("top3gram_frac") <= 0.18)).alias(
            "keep"
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--out-name", default="gopher_hashed_r06.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gtfsrt2lc_spark.session import get_spark
    from gtfsrt2lc_spark.functions.hashing import tokens
    from __spark_entry__ import _word_ngrams

    spark = get_spark(
        app_name="gopher_hashed",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    raws = {"string": [], "hashed": []}
    rows = {}
    for hashed in (False, True):  # warm both, untimed
        gopher_variant(spark, args.sf_dir, hashed).count()
    for _ in range(args.passes):
        for hashed in (False, True):
            v = "hashed" if hashed else "string"
            t0 = time.monotonic()
            rows[v] = gopher_variant(spark, args.sf_dir, hashed).count()
            raws[v].append(round(time.monotonic() - t0, 3))

    # analytic shuffle payload: exploded gram count (2- and 3-grams) and the
    # key bytes each representation carries into groupBy(doc_id, g)
    d = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    stats = {}
    for n in (2, 3):
        g = d.select(F.explode(_word_ngrams(tokens(F.col("text")), n)).alias("g"))
        st = g.agg(
            F.count("*").alias("cnt"), F.sum(F.length("g")).alias("str_bytes")
        ).collect()[0]
        stats[f"{n}gram"] = {
            "exploded_grams": st["cnt"],
            "key_bytes_string": st["str_bytes"],
            "key_bytes_hashed": 8 * st["cnt"],
        }

    result = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "rows": rows,
        "passes_interleaved": True,
        "string": {"raw_sec": raws["string"], "min_sec": min(raws["string"]),
                   "median_sec": sorted(raws["string"])[len(raws["string"]) // 2]},
        "hashed": {"raw_sec": raws["hashed"], "min_sec": min(raws["hashed"]),
                   "median_sec": sorted(raws["hashed"])[len(raws["hashed"]) // 2]},
        "gram_key_payload": stats,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
