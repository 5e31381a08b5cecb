"""Measure the latest-wins dedup escape hatch (round-4 verdict item 3).

`latest_by_key(broadcast_dups=True)` — the default — resolves re-crawl
winners with a duplicate-keys-only stats join under an explicit broadcast
hint, so the html payload never transits an exchange. The
`broadcast_dups=False` fallback exists for corpora whose DUPLICATE key set
is itself too large to broadcast (billions of re-crawled urls): it takes
one payload shuffle instead of a possible broadcast OOM. The fallback was
semantics-tested but never measured; this script times the full pipeline
both ways on the same staged corpus, interleaved and pinned exactly like
the scaling protocol, so the artifact quantifies what the default buys
(expect the fallback to reproduce the pre-fix payload-shuffle wall that
capped round-3 throughput at ~7.5k docs/sec at 8 cores).

Writes BENCH/broadcast_dups_compare_r05.json.

Usage: python scripts/bench_broadcast_dups.py --corpus /tmp/kgcorpus_ccweight_2m
       [--cores 8] [--repeats 2] [--pin]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.bench_scaling import _package_zip, corpus_stats, run_once  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--pin", action="store_true")
    ap.add_argument("--out-name", default="broadcast_dups_compare_r05.json")
    args = ap.parse_args()

    zip_path = _package_zip()
    results = {
        "corpus_stats": corpus_stats(args.corpus),
        "cores": args.cores,
        "pinned": args.pin,
        "runs": [],
    }
    tp: dict[str, list[float]] = {"broadcast": [], "fallback": []}
    t_start = time.monotonic()
    # interleave variants for the same host-noise fairness as the scaling spins
    for _ in range(args.repeats):
        for label, extra in (("broadcast", []), ("fallback", ["--no-broadcast-dups"])):
            off = round(time.monotonic() - t_start, 1)
            r = run_once(args.cores, args.corpus, zip_path, pin=args.pin,
                         extra_args=extra)
            r["variant"] = label
            r["t_offset_sec"] = off
            results["runs"].append(r)
            tp[label].append(r["docs_per_sec"])
    results.update({
        "broadcast_docs_per_sec_best": max(tp["broadcast"]),
        "fallback_docs_per_sec_best": max(tp["fallback"]),
        "default_speedup_over_fallback": round(
            max(tp["broadcast"]) / max(tp["fallback"]), 3
        ),
    })
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out_name), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
