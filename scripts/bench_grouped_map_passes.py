"""Classify the r3->r4 alignment_pass / repair_pass median regressions.

The r04 verdict flagged +16% / +5% median moves on the two Arrow
grouped-map oracle queries and asked for real-vs-noise classification with
evidence. Both queries are 40-group driver-visible oracles whose wall time
is dominated by fixed per-job cost (scheduling + an events-table scan +
one Arrow stage over ~40 tiny groups), so the hypothesis is host-window
noise, not an Arrow-path regression. This bench tests that hypothesis
three ways in one pinned session:

1. MANY interleaved passes (default 15, vs bench.py's 5) of both queries,
   so the median estimate is tight enough to compare against r3/r4.
2. A SCAN-ONLY baseline each pass (same events scan + count, no Arrow
   stage): if the grouped-map queries moved but scan-minus-subtracted
   marginals did not, the move lives in fixed job overhead, not in
   _repair_and_pair / _check_update.
3. A single-thread raw-CPU calibration probe each pass (the scaling
   protocol's trick): records the host-throttle state alongside every
   sample so a widened spread is attributable.

Writes BENCH/grouped_map_passes_r05.json.

Usage: python scripts/bench_grouped_map_passes.py [--passes 15] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_probe() -> float:
    """Single-thread fixed-work probe; returns seconds (lower = cleaner)."""
    t0 = time.monotonic()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 31 + i) % 2147483647
    return round(time.monotonic() - t0, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=15)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    try:
        os.sched_setaffinity(0, set(range(args.cpus)))
    except (AttributeError, OSError, ValueError):
        pass

    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(
        app_name="grouped_map_passes",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    qs = entrymod.queries()

    def scan_only(spark_, sf_dir):
        # the same physical input the two oracle queries scan, no Arrow stage
        return (
            spark_.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .where(F.col("event_id") < 1600)
            .select("event_id")
        )

    targets = {
        "alignment_pass": lambda: qs["alignment_pass"](spark, args.sf_dir).count(),
        "repair_pass": lambda: qs["repair_pass"](spark, args.sf_dir).count(),
        "scan_only": lambda: scan_only(spark, args.sf_dir).count(),
    }
    for fn in targets.values():  # warmup, untimed
        fn()

    raw: dict[str, list[float]] = {k: [] for k in targets}
    probes: list[float] = []
    for _ in range(args.passes):
        probes.append(_cpu_probe())
        for name, fn in targets.items():
            t0 = time.monotonic()
            fn()
            raw[name].append(round(time.monotonic() - t0, 3))

    def stats(ts: list[float]) -> dict:
        return {
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "mean": round(statistics.fmean(ts), 3),
            "stdev": round(statistics.pstdev(ts), 3),
            "raw": ts,
        }

    med_scan = statistics.median(raw["scan_only"])
    out = {
        "passes": args.passes,
        "cpus": args.cpus,
        "sf_dir": args.sf_dir,
        "pinned": True,
        "cpu_probe_sec": stats(probes),
        "queries": {k: stats(v) for k, v in raw.items()},
        # marginal cost of the Arrow grouped-map stage over the shared scan
        "arrow_marginal_median": {
            k: round(statistics.median(raw[k]) - med_scan, 3)
            for k in ("alignment_pass", "repair_pass")
        },
        "reference_medians": {
            "r3": {"alignment_pass": 0.484, "repair_pass": 0.575},
            "r4": {"alignment_pass": 0.561, "repair_pass": 0.604},
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "grouped_map_passes_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
