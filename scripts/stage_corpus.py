"""Stage a deterministic synthetic page corpus to parquet (once, untimed).

The scaling protocol runs the pipeline twice (local[N] / local[4N]) over the
SAME staged input — this script produces it. Generation is sharded across
processes and written directly with pyarrow (no Spark needed), so corpus
synthesis never pollutes throughput numbers and multi-GB corpora stage in
minutes.

Usage:
    python scripts/stage_corpus.py --n-pages 2000000 --noise 25 45 \
        --out /tmp/kgcorpus_heavy2m
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_shard(args: tuple) -> int:
    shard, per, seed, noise, out = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gtfsrt2lc_spark.fixtures.pages import build_corpus

    c = build_corpus(n_pages=per, seed=seed + shard, noise_range=noise)
    prefix = f"https://s{shard}."
    urls = [prefix + p["url"][len("https://"):] for p in c.pages]
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [p["warc_ts"].replace(tzinfo=None) for p in c.pages], pa.timestamp("us")
            ),
            "html": pa.array([p["html"] for p in c.pages], pa.binary()),
            "text": pa.array([p["text"] for p in c.pages], pa.string()),
            "lang": pa.array([p["lang"] for p in c.pages], pa.string()),
        }
    )
    os.makedirs(os.path.join(out, "pages"), exist_ok=True)
    pq.write_table(table, os.path.join(out, "pages", f"shard_{shard:03d}.parquet"))

    if shard == 0:
        kb = {
            "records": ({"record_id": pa.string(), "name": pa.string(), "entity_type": pa.string()},
                        [dict(zip(("record_id", "name", "entity_type"), r)) for r in c.records]),
            "surfaces": ({"surface": pa.string(), "record_id": pa.string(), "prior": pa.float64()},
                         [dict(zip(("surface", "record_id", "prior"), r)) for r in c.surfaces]),
            "sameas": ({"src": pa.string(), "dst": pa.string()},
                       [dict(zip(("src", "dst"), r)) for r in c.sameas]),
        }
        for name, (schema, rows) in kb.items():
            cols = {k: pa.array([r[k] for r in rows], t) for k, t in schema.items()}
            os.makedirs(os.path.join(out, name), exist_ok=True)
            pq.write_table(pa.table(cols), os.path.join(out, name, "part_000.parquet"))
    return len(c.pages)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=1000000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--procs", type=int, default=16)
    ap.add_argument("--noise", type=int, nargs=2, default=(1, 3),
                    help="min/max filler sentences per page (bench: 25 45)")
    args = ap.parse_args()

    t0 = time.monotonic()
    per = args.n_pages // args.shards
    jobs = [(s, per, args.seed, tuple(args.noise), args.out) for s in range(args.shards)]
    with mp.Pool(args.procs) as pool:
        counts = pool.map(_write_shard, jobs)
    print(f"staged {sum(counts)} page rows to {args.out} in {time.monotonic() - t0:.0f}s")


if __name__ == "__main__":
    main()
