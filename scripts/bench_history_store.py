"""HistoryStore commit-cost micro-bench: O(changed buckets), not O(store).

Round 1 flagged the old full-store-rewrite commit as a scale-killer for the
streaming poll mode (every poll re-wrote the entire history). The bucketed
generation store fixes that; this bench MEASURES it: build a store with N
keys, then commit a small delta and record (a) wall time, (b) how many
parquet data files the commit wrote, and (c) how many pre-existing files it
left byte-identical. The delta commit's written-file count tracks the
number of affected buckets — constant as the store grows — while the
baseline full commit scales with N.

Writes BENCH/history_store_run.json. Usage:
    python scripts/bench_history_store.py [--sizes 20000 100000 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_STATE = (
    "rule_key string, service_day string, departure_delay bigint, "
    "arrival_delay bigint, type string"
)


def _data_files(root: str) -> dict[str, float]:
    return {
        str(p): p.stat().st_mtime_ns
        for p in pathlib.Path(root).rglob("*.parquet")
        if p.is_file()
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[20_000, 100_000, 500_000])
    ap.add_argument("--delta", type=int, default=10)
    ap.add_argument("--n-buckets", type=int, default=64)
    args = ap.parse_args()

    from gtfsrt2lc_spark.plans.gtfs import HistoryStore
    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(app_name="history_store_bench", master="local[8]",
                      shuffle_partitions=8)

    def states(lo: int, hi: int, dep: int = 60):
        return spark.range(lo, hi).selectExpr(
            "concat('rule/', id) AS rule_key",
            "'20240115' AS service_day",
            f"CAST({dep} AS BIGINT) AS departure_delay",
            "CAST(60 AS BIGINT) AS arrival_delay",
            "'Connection' AS type",
        )

    out = {"n_buckets": args.n_buckets, "delta_keys": args.delta, "sizes": []}
    for n in args.sizes:
        root = tempfile.mkdtemp(prefix="histbench_")
        store = HistoryStore(spark, root, n_buckets=args.n_buckets)
        t0 = time.monotonic()
        store.commit(states(0, n))
        full_s = time.monotonic() - t0
        before = _data_files(root)

        t0 = time.monotonic()
        store.commit(states(n, n + args.delta, dep=99))
        delta_s = time.monotonic() - t0
        after = _data_files(root)

        untouched = sum(
            1 for p, m in before.items() if p in after and after[p] == m
        )
        written = len([p for p in after if p not in before])
        m = store._manifest()
        gen = f"gen-{m['seq']:06d}"
        out["sizes"].append({
            "store_keys": n,
            "full_commit_s": round(full_s, 2),
            "delta_commit_s": round(delta_s, 2),
            "delta_files_written": written,
            "delta_buckets_rewritten": len(m["gens"].get(gen, [])),
            "preexisting_files_untouched": untouched,
            "preexisting_files_total": len(before),
        })
        print(json.dumps(out["sizes"][-1]))
        shutil.rmtree(root, ignore_errors=True)

    with open(os.path.join(REPO, "BENCH", "history_store_run.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
