"""Per-query isolation bench (guide §1.1/§1.4): time individual queries()
entries exactly the way the frozen bench.py does (warmup + N timed
``.count()`` passes, min/median reported), without paying for the whole
suite. Optionally dumps ``explain("formatted")`` per query for the
plans/r07 before/after artifacts.

Usage:
    python scripts/bench_extra.py --sf-dir /root/testdata/sf1.0 \
        [--passes 5] [--cpus 32] [--explain-dir plans/r07 --label before] \
        [--noop] query [query ...]

``--noop`` times ``df.write.format("noop")`` instead of ``.count()`` —
computes every column (guide §1.4); count() is what the frozen bench times,
so count() is the default for before/after parity.
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--label", default="before")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    try:
        os.sched_setaffinity(0, set(range(args.cpus)))
    except (AttributeError, OSError, ValueError):
        pass

    from gtfsrt2lc_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out = {}
    for name in args.queries:
        df = qs[name](spark, args.sf_dir)
        if args.explain_dir:
            import io
            from contextlib import redirect_stdout

            os.makedirs(args.explain_dir, exist_ok=True)
            path = os.path.join(args.explain_dir, f"{name}_{args.label}.txt")
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"{name} warmup")
        run(qs[name](spark, args.sf_dir))  # warmup, untimed (bench.py protocol)
        ts = []
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.monotonic()
            run(qs[name](spark, args.sf_dir))
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = {
            "raw": ts,
            "min": min(ts),
            "median": sorted(ts)[len(ts) // 2],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "mode": "noop" if args.noop else "count",
                      "cpus": args.cpus, "results": out}))


if __name__ == "__main__":
    main()
