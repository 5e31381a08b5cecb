"""Scaling-efficiency measurement (BASELINE.md protocol).

Runs the full KG pipeline via spark-submit --py-files at two parallelism
levels (local[8] = N, local[32] = 4N) over the SAME synthesized input, and
reports throughput at both plus efficiency = (T_N / T_4N) / 4.

Writes BENCH/scaling_run.json and regenerates the results table in
BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--n-pages 40000] [--repeats 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def run_once(cores: int, corpus: str, zip_path: str) -> dict:
    out = tempfile.mkdtemp(prefix=f"kg_scale_{cores}_")
    cmd = [
        _spark_submit(),
        "--master", f"local[{cores}]",
        "--py-files", zip_path,
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", f"spark.sql.shuffle.partitions={cores * 2}",
        "--conf", "spark.driver.memory=48g",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "scripts", "submit_pipeline.py"),
        "--corpus", corpus,
        "--out", os.path.join(out, "kg"),
        "--warmup",
    ]
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
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    corpus = args.corpus or os.path.join(tempfile.gettempdir(), f"kgcorpus_{args.n_pages}")
    if not os.path.exists(os.path.join(corpus, "pages")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "stage_corpus.py"),
             "--n-pages", str(args.n_pages), "--out", corpus],
            check=True,
            env={**os.environ, "PYTHONPATH": REPO},
        )

    zip_path = _package_zip()
    results = {"n_pages": args.n_pages, "corpus": corpus, "runs": []}
    best = {}
    for cores in (args.n, args.n * 4):
        tp = []
        for _ in range(args.repeats):
            r = run_once(cores, corpus, zip_path)
            results["runs"].append(r)
            tp.append(r["docs_per_sec"])
        best[cores] = max(tp)

    speedup = best[args.n * 4] / best[args.n]
    eff = speedup / 4
    results.update(
        {
            "throughput_N": best[args.n],
            "throughput_4N": best[args.n * 4],
            "speedup": round(speedup, 3),
            "efficiency": round(eff, 3),
            "passes_north_rule": eff >= 0.8,
        }
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_run.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
