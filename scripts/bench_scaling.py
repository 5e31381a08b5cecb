"""Scaling-efficiency measurement (BASELINE.md protocol).

Runs the full KG pipeline via spark-submit --py-files at two parallelism
levels (local[8] = N, local[32] = 4N) over the SAME staged input, and
reports throughput at both plus efficiency = speedup / 4.

Because local[8] -> local[32] shares one memory bus / host scheduler, the
script also runs a RAW-CPU CALIBRATION (embarrassingly parallel sha256 burn
at N and 4N processes): the calibration speedup is the hardware ceiling this
host can deliver, and the report includes pipeline efficiency normalized to
that ceiling — the quantity that actually isolates engine (scheduler +
shuffle) overhead, per the caveat in BENCH/BASELINE.md.

Writes BENCH/scaling_run.json.

Usage: python scripts/bench_scaling.py [--corpus DIR] [--repeats 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # `from scripts...` when invoked as a script
    sys.path.insert(0, REPO)


def _burn(n: int) -> int:
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def cpu_calibration(n: int, total_hashes: int = 96_000_000) -> dict[int, float]:
    """Raw-CPU throughput (hashes/s) at n and 4n processes, same total work;
    best of 2 to damp shared-host noise."""
    out: dict[int, float] = {}
    for procs in (n, n * 4):
        best = 0.0
        for _ in range(2):
            tasks = [total_hashes // procs] * procs
            t0 = time.monotonic()
            with mp.Pool(procs) as p:
                p.map(_burn, tasks)
            best = max(best, total_hashes / (time.monotonic() - t0))
        out[procs] = best
    return out


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _package_zip() -> str:
    path = os.path.join(tempfile.gettempdir(), "gtfsrt2lc_spark.zip")
    with zipfile.ZipFile(path, "w") as zf:
        pkg = os.path.join(REPO, "gtfsrt2lc_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def corpus_stats(corpus: str) -> dict:
    """MEASURED corpus provenance for the artifact (round-4 verdict: the old
    artifact recorded the unused --n-pages CLI default, claiming 1M pages over
    a 2.08M-doc staging). Row count + distinct urls come from the parquet
    itself (duckdb when available, no Spark session needed); bytes from the
    filesystem. duckdb is OPTIONAL (ADVICE r5): a host without it still gets
    filesystem-only stats with a provenance note, instead of the whole
    scaling run dying before any Spark work."""
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(corpus)
        for f in files
    )
    stats = {"corpus": corpus, "parquet_bytes": total_bytes}
    try:
        import duckdb

        pages_glob = os.path.join(corpus, "pages", "*.parquet")
        n_rows, n_urls = duckdb.sql(
            f"SELECT count(*), count(DISTINCT url) FROM read_parquet('{pages_glob}')"
        ).fetchone()
        stats.update({"page_rows": n_rows, "distinct_urls": n_urls})
    except ImportError:
        n_files = sum(len(files) for _r, _d, files in os.walk(corpus))
        stats.update({
            "page_rows": None,
            "distinct_urls": None,
            "n_files": n_files,
            "provenance_note": "duckdb unavailable: filesystem-only stats "
                               "(bytes + file count); row counts unmeasured",
        })
    return stats


def run_once(
    cores: int, corpus: str, zip_path: str, pin: bool = False,
    eventlog_dir: str | None = None, extra_args: list[str] | None = None,
    extra_confs: list[str] | None = None,
) -> dict:
    out = tempfile.mkdtemp(prefix=f"kg_scale_{cores}_")
    cmd = []
    if pin:
        # Pin the WHOLE job (JVM task threads + python UDF workers) to
        # exactly `cores` host cores. Without this, local[N]'s N python
        # workers run on host cores BEYOND the N task threads, so "local[2]"
        # consumes up to 4 cores while "local[8]" (16 threads) saturates and
        # gains nothing — inflating the small-N baseline ~15-20% and
        # deflating measured N->4N efficiency. A real N-core executor's
        # python workers share its N cores (YARN/k8s cgroups enforce it), so
        # pinning is the FAITHFUL cluster proxy, not a benchmark trick.
        cmd += ["taskset", "-c", f"0-{cores - 1}"]
    cmd += [
        _spark_submit(),
        "--master", f"local[{cores}]",
        "--py-files", zip_path,
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", f"spark.sql.shuffle.partitions={cores * 2}",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=1000",
        # 24g, not larger: oversized heaps measurably degrade this workload
        # (G1 behavior with large text batches; 48g ~1.5x slower, 80g ~3x)
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.ui.enabled=false",
    ]
    if eventlog_dir is not None:
        cmd += [
            "--conf", "spark.eventLog.enabled=true",
            "--conf", f"spark.eventLog.dir=file://{eventlog_dir}",
        ]
    for c in extra_confs or []:
        cmd += ["--conf", c]
    cmd += [
        os.path.join(REPO, "scripts", "submit_pipeline.py"),
        "--corpus", corpus,
        "--out", os.path.join(out, "kg"),
        "--warmup",
    ] + (extra_args or [])
    res = subprocess.run(cmd, capture_output=True, text=True, check=False)
    for line in reversed(res.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(res.stdout[-2000:] + "\n" + res.stderr[-4000:] + "\n")
    raise RuntimeError(f"no JSON from spark-submit local[{cores}]")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=1000000)
    ap.add_argument("--corpus", default=None, help="pre-staged corpus dir; staged if absent")
    # N=2 -> 4N=8 is the faithful single-host proxy for 4x executors: both
    # points sit below this host's contention knee (shared-VM throttling
    # flattens wall-clock scaling beyond ~8-16 busy threads; see the raw-CPU
    # calibration it reports). Pass --n 8 for the 8->32 stress variant.
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out-name", default="scaling_run.json",
                    help="artifact filename under BENCH/ (e.g. scaling_run_ccweight_r03.json)")
    ap.add_argument("--pin", action="store_true",
                    help="taskset each run to exactly its core budget (faithful "
                         "executor proxy: python UDF workers share the executor's "
                         "cores on a real cluster)")
    ap.add_argument("--forensics", action="store_true",
                    help="event-log every run and audit per-stage shuffle-write "
                         "bytes; FAIL (exit 1) if any stage shuffles more than "
                         "--forensics-threshold of the scan input — the "
                         "payload-leaked-into-an-exchange signature that broke "
                         "round-4 scaling")
    ap.add_argument("--forensics-threshold", type=float, default=0.3)
    ap.add_argument("--max-local-dictionary", type=int, default=None,
                    help="forwarded to submit_pipeline.py / KGPipeline: 0 "
                         "forces the fully distributed dictionary path (the "
                         "100x-KB posture) through the N->4N protocol")
    ap.add_argument("--max-local-surfaces", type=int, default=None,
                    help="forwarded to submit_pipeline.py / KGPipeline: 0 "
                         "forces the fully distributed fuzzy patch (unmatched "
                         "surfaces never collected)")
    ap.add_argument("--dirty-pages", type=int, default=0,
                    help="union N deterministic out-of-dictionary pages into "
                         "every leg's input, so the fuzzy MinHash-LSH linking "
                         "branch runs inside the N->4N protocol (it is a "
                         "no-op on the clean staged corpus otherwise)")
    ap.add_argument("--canonical-urls", action="store_true",
                    help="forwarded: KGPipeline(canonical_urls=True)")
    ap.add_argument("--job", choices=["kg", "cut_spans"], default="kg",
                    help="forwarded to submit_pipeline.py: which timed job "
                         "runs under the N->4N protocol (kg = full pipeline, "
                         "cut_spans = exact-substring dedup cut)")
    ap.add_argument("--no-broadcast-cuts", action="store_true",
                    help="forwarded: cut_spans takes the doc-keyed payload "
                         "shuffle instead of broadcasting per-doc cut arrays")
    ap.add_argument("--messy-urls", action="store_true",
                    help="forwarded: restage pages with messy url spellings "
                         "(untimed) so canonical-key dedup does real collapse "
                         "work inside the N->4N protocol")
    args = ap.parse_args()

    staged_here = False
    corpus = args.corpus or os.path.join(tempfile.gettempdir(), f"kgcorpus_{args.n_pages}")
    if not os.path.exists(os.path.join(corpus, "pages")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "stage_corpus.py"),
             "--n-pages", str(args.n_pages), "--out", corpus],
            check=True,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        staged_here = True

    zip_path = _package_zip()
    # provenance is MEASURED from the staged parquet, never echoed from CLI
    # defaults (the round-4 artifacts recorded n_pages=1000000 over a 2.08M
    # corpus because --n-pages was unused when --corpus was passed)
    results = {"corpus_stats": corpus_stats(corpus), "pinned": args.pin, "runs": []}
    if staged_here:
        results["staging_args"] = {"n_pages": args.n_pages}
    extra_args = []
    if args.max_local_dictionary is not None:
        extra_args += ["--max-local-dictionary", str(args.max_local_dictionary)]
        results["max_local_dictionary"] = args.max_local_dictionary
    if args.max_local_surfaces is not None:
        extra_args += ["--max-local-surfaces", str(args.max_local_surfaces)]
        results["max_local_surfaces"] = args.max_local_surfaces
    if args.dirty_pages > 0:
        extra_args += ["--dirty-pages", str(args.dirty_pages)]
        results["dirty_pages"] = args.dirty_pages
    if args.job != "kg":
        extra_args += ["--job", args.job]
        results["job"] = args.job
    if args.no_broadcast_cuts:
        extra_args += ["--no-broadcast-cuts"]
        results["broadcast_cuts"] = False
    if args.canonical_urls:
        extra_args += ["--canonical-urls"]
        results["canonical_urls"] = True
    if args.messy_urls:
        extra_args += ["--messy-urls"]
        results["messy_urls"] = True
    tp: dict[int, list[float]] = {args.n: [], args.n * 4: []}
    flagged_any = False
    # INTERLEAVE the two levels (N, 4N, N, 4N, ...): shared-host throttle
    # windows drift on minute scales, so consecutive same-level repeats see
    # correlated speed while the ratio between adjacent opposite-level runs
    # stays fair; the artifact records per-run start offsets for forensics.
    t_start = time.monotonic()
    for _ in range(args.repeats):
        for cores in (args.n, args.n * 4):
            off = round(time.monotonic() - t_start, 1)
            evdir = tempfile.mkdtemp(prefix="kg_scale_ev_") if args.forensics else None
            r = run_once(cores, corpus, zip_path, pin=args.pin,
                         eventlog_dir=evdir, extra_args=extra_args)
            r["t_offset_sec"] = off
            if evdir is not None:
                import glob as _glob

                from scripts.analyze_eventlog import (
                    parse_eventlog, payload_shuffle_audit)

                log = max(_glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
                stages, _a0, _a1 = parse_eventlog(log)
                # Spark 4.1 event logs carry ~no task Input Metrics for these
                # parquet scans; the measured corpus bytes are the denominator
                audit = payload_shuffle_audit(
                    stages, args.forensics_threshold,
                    scan_bytes=results["corpus_stats"]["parquet_bytes"])
                r["shuffle_audit"] = audit
                if audit["flagged"]:
                    flagged_any = True
                    sys.stderr.write(
                        f"FORENSICS: payload shuffle detected at local[{cores}]: "
                        f"{json.dumps(audit['flagged'])}\n"
                    )
            results["runs"].append(r)
            tp[cores].append(r["docs_per_sec"])
    best = {c: max(v) for c, v in tp.items()}

    speedup = best[args.n * 4] / best[args.n]
    eff = speedup / 4
    cal = cpu_calibration(args.n)
    cal_speedup = cal[args.n * 4] / cal[args.n]
    results.update(
        {
            "throughput_N": best[args.n],
            "throughput_4N": best[args.n * 4],
            "speedup": round(speedup, 3),
            "efficiency": round(eff, 3),
            "cpu_calibration_hashes_per_sec": {str(k): round(v) for k, v in cal.items()},
            "cpu_calibration_speedup": round(cal_speedup, 3),
            "hardware_ceiling_efficiency": round(cal_speedup / 4, 3),
            # engine overhead isolated from the shared-host CPU ceiling
            "normalized_efficiency": round(speedup / cal_speedup, 3),
            "passes_north_rule_raw": eff >= 0.8,
            "passes_north_rule_normalized": speedup / cal_speedup >= 0.8,
        }
    )
    if args.forensics:
        results["forensics_flagged"] = flagged_any
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out_name), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    if flagged_any:
        sys.exit(1)  # fail loudly: a payload is transiting an exchange


if __name__ == "__main__":
    main()
