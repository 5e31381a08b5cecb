"""Measure the latest-wins dedup escape hatch (round-4 verdict item 3).

`latest_by_key(broadcast_dups=True)` — the default — resolves re-crawl
winners with a duplicate-keys-only stats join under an explicit broadcast
hint, so the html payload never transits an exchange. The
`broadcast_dups=False` fallback exists for corpora whose DUPLICATE key set
is itself too large to broadcast (billions of re-crawled urls): it takes
one payload shuffle instead of a possible broadcast OOM. The fallback was
semantics-tested but never measured; this script times the full pipeline
three ways on the same staged corpus, interleaved and pinned exactly like
the scaling protocol. On a corpus whose dup-stats side fits under AQE's
own broadcast threshold the plain fallback measures "hint vs
optimizer-decides" (AQE broadcasts anyway); the forced-SMJ variant
disables auto-broadcast to mechanically emulate the unbroadcastable
dup-stats case, reproducing the pre-fix payload-shuffle wall with the
event-log shuffle audit attached as proof.

Writes BENCH/broadcast_dups_compare_r05.json.

Usage: python scripts/bench_broadcast_dups.py --corpus /tmp/kgcorpus_ccweight_2m
       [--cores 8] [--repeats 2] [--pin]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.analyze_eventlog import parse_eventlog, payload_shuffle_audit  # noqa: E402
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
    # Three variants, interleaved for the same host-noise fairness as the
    # scaling spins:
    #   broadcast     — the default: dup-stats join under an explicit hint.
    #   fallback      — broadcast_dups=False: on THIS corpus the ~99k-row
    #                   dup-stats side still sits under AQE's own 10 MB
    #                   threshold, so AQE broadcasts it anyway; measures
    #                   "hint vs optimizer-decides", not the wall.
    #   fallback_smj  — broadcast_dups=False with auto-broadcast disabled:
    #                   mechanically emulates the billion-dup-key corpus
    #                   whose dup-stats CANNOT broadcast, forcing the
    #                   sort-merge plan that shuffles every payload byte —
    #                   the r04 pre-fix wall, reproduced on purpose. Each
    #                   run is event-logged and shuffle-audited so the
    #                   artifact SHOWS the payload transiting the exchange.
    no_bcast_confs = [
        "spark.sql.autoBroadcastJoinThreshold=-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold=-1",
    ]
    variants = (
        ("broadcast", [], None),
        ("fallback", ["--no-broadcast-dups"], None),
        ("fallback_smj", ["--no-broadcast-dups"], no_bcast_confs),
    )
    tp: dict[str, list[float]] = {label: [] for label, _, _ in variants}
    t_start = time.monotonic()
    for _ in range(args.repeats):
        for label, extra, confs in variants:
            off = round(time.monotonic() - t_start, 1)
            evdir = tempfile.mkdtemp(prefix=f"bdups_ev_{label}_")
            r = run_once(args.cores, args.corpus, zip_path, pin=args.pin,
                         eventlog_dir=evdir, extra_args=extra,
                         extra_confs=confs)
            log = max(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
            stages, _a0, _a1 = parse_eventlog(log)
            r["shuffle_audit"] = payload_shuffle_audit(
                stages, 0.3,
                scan_bytes=results["corpus_stats"]["parquet_bytes"])
            r["variant"] = label
            r["t_offset_sec"] = off
            results["runs"].append(r)
            tp[label].append(r["docs_per_sec"])
    results.update({
        "broadcast_docs_per_sec_best": max(tp["broadcast"]),
        "fallback_docs_per_sec_best": max(tp["fallback"]),
        "fallback_smj_docs_per_sec_best": max(tp["fallback_smj"]),
        "default_speedup_over_fallback": round(
            max(tp["broadcast"]) / max(tp["fallback"]), 3
        ),
        "default_speedup_over_forced_smj": round(
            max(tp["broadcast"]) / max(tp["fallback_smj"]), 3
        ),
    })
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out_name), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
