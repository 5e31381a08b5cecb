"""Run the scaling workload once with spark.eventLog enabled, then decompose
wall-clock from the event log: per-stage wall, task-time sum, parallelism
achieved (task-sec / stage-wall / cores), shuffle and I/O volume, and the
DRIVER GAPS between stages (time no stage was running = serial driver work).

This pins down the non-scaling component of the N->4N protocol with Spark's
own metrics instead of end-to-end guessing.

Usage:
    python scripts/analyze_eventlog.py --corpus /tmp/kgcorpus_ccweight_2m --cores 8
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_with_eventlog(cores: int, corpus: str) -> str:
    sys.path.insert(0, REPO)
    from scripts.bench_scaling import _package_zip, _spark_submit

    evdir = tempfile.mkdtemp(prefix="spark_events_")
    out = tempfile.mkdtemp(prefix=f"kg_ev_{cores}_")
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        _spark_submit(),
        "--master", f"local[{cores}]",
        "--py-files", _package_zip(),
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", f"spark.sql.shuffle.partitions={cores * 2}",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=1000",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir=file://{evdir}",
        os.path.join(REPO, "scripts", "submit_pipeline.py"),
        "--corpus", corpus,
        "--out", os.path.join(out, "kg"),
        "--warmup",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, check=False)
    for line in reversed(res.stdout.splitlines()):
        if line.startswith("{"):
            print("RUN:", line)
            break
    logs = glob.glob(os.path.join(evdir, "*"))
    if not logs:
        sys.stderr.write(res.stderr[-3000:])
        raise RuntimeError("no event log produced")
    return max(logs, key=os.path.getmtime)


def parse_eventlog(path: str) -> tuple[list[dict], int | None, int | None]:
    """Per-stage metric dicts (sorted by submission time) + app start/end ms.

    Accepts a single-file event log or a v2 rolling dir; .zstd parts are
    decoded via the system zstd binary. Importable: bench_scaling's
    --forensics guard and the detector unit test both reuse this parser."""
    if os.path.isdir(path):  # eventlog v2 rolling dir
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
        if not parts:
            raise RuntimeError(f"no events_* file in {path}")
    else:
        parts = [path]

    def lines():
        for p in parts:
            if p.endswith(".zstd"):
                # zstd-compressed rolling log. Prefer pyarrow's streaming
                # codec (always present in this stack); the system zstd
                # binary is only a fallback — hosts routinely lack it.
                import io

                try:
                    import pyarrow as pa

                    raw = pa.input_stream(p, compression="zstd").read()
                except Exception:
                    raw = subprocess.run(["zstd", "-dc", p],
                                         capture_output=True,
                                         check=True).stdout
                yield from io.TextIOWrapper(io.BytesIO(raw), encoding="utf-8")
            else:
                with open(p) as f:
                    yield from f

    stages = {}  # (stageId, attempt) -> dict
    callsites = {}  # stageId -> job callsite (repo-relative file:line)
    sql_descs = {}  # executionId (str) -> description
    app_start = app_end = None
    for line in lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if not e:
            # valid JSON without an "Event" key (ADVICE r5: the endswith
            # dispatch below would AttributeError on None and kill the run)
            continue
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e.endswith("SparkListenerSQLExecutionStart"):
            sql_descs[str(ev.get("executionId"))] = ev.get("description") or ""
        elif e == "SparkListenerJobStart":
            # Stage names under AQE are a useless `withThreadLocalCaptured`
            # anonfun; the job's callSite carries the real repo file:line.
            # Fallback: the owning SQL execution's description (PySpark
            # actions surface as e.g. `parquet at NativeMethodAccessorImpl`).
            props = ev.get("Properties") or {}
            cs = props.get("callSite.short") or ""
            if not cs and props.get("spark.sql.execution.id") is not None:
                cs = sql_descs.get(str(props["spark.sql.execution.id"]), "")
            # strip the --py-files staging prefix down to the package path
            if ".zip/" in cs:
                cs = cs.split(" at ")[0] + " at " + cs.split(".zip/")[-1]
            for si in ev.get("Stage Infos", []):
                if cs:
                    callsites[si["Stage ID"]] = cs
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si["Stage Attempt ID"])
            st = stages.setdefault(key, {
                "task_ms": 0, "gc_ms": 0, "cpu_ns": 0,
                "shuffle_write": 0, "shuffle_read": 0,
                "input": 0, "output": 0, "python_ms": 0})
            st["name"] = si["Stage Name"].split("\n")[0][:70]
            st["tasks"] = si["Number of Tasks"]
            st["t0"] = si.get("Submission Time")
            st["t1"] = si.get("Completion Time")
        elif e == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            st = stages.setdefault(key, {
                "name": "?", "tasks": 0, "t0": None, "t1": None,
                "task_ms": 0, "gc_ms": 0, "cpu_ns": 0,
                "shuffle_write": 0, "shuffle_read": 0,
                "input": 0, "output": 0, "python_ms": 0})
            m = ev.get("Task Metrics") or {}
            st["task_ms"] += m.get("Executor Run Time", 0)
            st["gc_ms"] += m.get("JVM GC Time", 0)
            st["cpu_ns"] += m.get("Executor CPU Time", 0)
            st["shuffle_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            st["shuffle_read"] += sr.get("Local Bytes Read", 0) + sr.get(
                "Remote Bytes Read", 0)
            st["input"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
            st["output"] += (m.get("Output Metrics") or {}).get("Bytes Written", 0)
    for (sid, _att), st in stages.items():
        if sid in callsites:
            st["callsite"] = callsites[sid]
    done = sorted(stages.values(), key=lambda s: s.get("t0") or 0)
    return done, app_start, app_end


def payload_shuffle_audit(
    stages: list[dict], threshold_frac: float = 0.3, scan_bytes: int | None = None
) -> dict:
    """Detect a payload leaking into an exchange — the failure class that
    silently broke N->4N scaling in round 4 (latest_by_key sort-merge-joining
    1.9 GB of html once its winner set outgrew the broadcast threshold).

    Signature: a stage whose SHUFFLE-WRITE bytes exceed ``threshold_frac`` of
    the corpus scan volume. Healthy stages in this engine shuffle digests,
    keys, and aggregates — orders of magnitude below the corpus scan — so a
    shuffle within a constant factor of the input IS the payload.

    Denominator: Spark 4.1's event log reports ~zero task-level Input Metrics
    for these parquet scans (the r05 spin1 artifact flagged healthy 2% digest
    shuffles against a 2 MB phantom denominator on a 2 GB corpus), so callers
    that know the corpus size on disk MUST pass ``scan_bytes``; the audit uses
    whichever of (max SINGLE-STAGE task input, scan_bytes) is larger and
    records which one it trusted. The max single stage — not the cross-stage
    SUM (ADVICE r5): summed task input double-counts staged-parquet re-reads
    and warmup scans, and an inflated denominator can push a real payload
    shuffle under the threshold and silently weaken the regression gate. Both
    values land in the artifact for forensics. With no denominator available
    nothing can be flagged, and the artifact says so (``no_denominator``)
    instead of silently passing.

    Returns {"denominator_bytes", "denominator_source", "task_input_bytes"
    (cross-stage sum, recorded only), "max_stage_input_bytes", "scan_bytes",
    "max_shuffle_write_bytes", "flagged": [stage dicts]}; callers fail
    loudly when flagged is non-empty."""
    task_input_sum = sum(s.get("input", 0) for s in stages)
    max_stage_input = max((s.get("input", 0) for s in stages), default=0)
    denom = max(max_stage_input, scan_bytes or 0)
    source = (
        "none" if denom == 0
        else "max_stage_input_metrics" if max_stage_input >= (scan_bytes or 0)
        else "corpus_scan_bytes"
    )
    flagged = [
        {
            "stage": s.get("callsite") or s.get("name", "?"),
            "shuffle_write_bytes": s["shuffle_write"],
            "input_frac": round(s["shuffle_write"] / denom, 3),
        }
        for s in stages
        if denom and s.get("shuffle_write", 0) > threshold_frac * denom
    ]
    return {
        "denominator_bytes": denom,
        "denominator_source": source,
        "task_input_bytes": task_input_sum,
        "max_stage_input_bytes": max_stage_input,
        "scan_bytes": scan_bytes,
        "no_denominator": denom == 0,
        "max_shuffle_write_bytes": max(
            (s.get("shuffle_write", 0) for s in stages), default=0
        ),
        "threshold_frac": threshold_frac,
        "flagged": flagged,
    }


def analyze(path: str, cores: int) -> None:
    all_stages, app_start, app_end = parse_eventlog(path)
    done = [s for s in all_stages if s.get("t0") and s.get("t1")]
    total = (app_end - app_start) / 1000 if app_end else None
    print(f"\napp wall: {total:.1f}s  cores={cores}")
    print(f"{'stage':<70} {'wall_s':>7} {'tasks':>5} {'par':>5} "
          f"{'cpu_s':>7} {'gc_s':>5} {'in_MB':>7} {'sw_MB':>7} {'sr_MB':>7} {'out_MB':>7}")
    for s in done:
        wall = (s["t1"] - s["t0"]) / 1000
        if wall < 0.3:
            continue
        par = (s["task_ms"] / 1000) / wall / cores if wall else 0
        label = s.get("callsite") or s["name"]
        print(f"{label[:70]:<70} {wall:>7.1f} {s['tasks']:>5} {par:>5.2f} "
              f"{s['cpu_ns'] / 1e9:>7.1f} {s['gc_ms'] / 1000:>5.1f} "
              f"{s['input'] / 1e6:>7.0f} {s['shuffle_write'] / 1e6:>7.0f} "
              f"{s['shuffle_read'] / 1e6:>7.0f} {s['output'] / 1e6:>7.0f}")

    # driver gaps: time between consecutive stage intervals with nothing running
    iv = sorted([(s["t0"], s["t1"]) for s in done])
    merged = []
    for a, b in iv:
        if merged and a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    gap = sum((merged[i + 1][0] - merged[i][1]) for i in range(len(merged) - 1)) / 1000
    covered = sum(b - a for a, b in merged) / 1000
    print(f"\nstage-covered wall: {covered:.1f}s   inter-stage driver gaps: {gap:.1f}s")
    busy = sum(s["task_ms"] for s in done) / 1000
    print(f"total task-sec: {busy:.1f}  ideal wall at {cores} cores: {busy / cores:.1f}s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--log", default=None, help="analyze an existing event log")
    args = ap.parse_args()
    path = args.log or run_with_eventlog(args.cores, args.corpus)
    print("event log:", path)
    analyze(path, args.cores)


if __name__ == "__main__":
    main()
