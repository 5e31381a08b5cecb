"""Event-log forensics regression guard (round-4 verdict item 6).

The payload-shuffle detector is what found round 4's real scale bug —
latest_by_key silently sort-merge-joining 1.9 GB of html through an exchange
once its winner set outgrew the broadcast threshold. These tests pin the
detector itself so `bench_scaling.py --forensics` keeps failing loudly on
that signature. Spark-free: the parser consumes the JSON-lines event-log
format directly (SparkListener* events, one per line).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.analyze_eventlog import parse_eventlog, payload_shuffle_audit  # noqa: E402


def _task_end(stage_id, input_bytes=0, shuffle_write=0):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": stage_id,
        "Stage Attempt ID": 0,
        "Task Metrics": {
            "Executor Run Time": 100,
            "Input Metrics": {"Bytes Read": input_bytes},
            "Shuffle Write Metrics": {"Shuffle Bytes Written": shuffle_write},
        },
    }


def _stage_done(stage_id, name):
    return {
        "Event": "SparkListenerStageCompleted",
        "Stage Info": {
            "Stage ID": stage_id,
            "Stage Attempt ID": 0,
            "Stage Name": name,
            "Number of Tasks": 2,
            "Submission Time": 1000 + stage_id,
            "Completion Time": 2000 + stage_id,
        },
    }


def _write_log(tmp_path, events):
    p = tmp_path / "app-0001"
    p.write_text("\n".join(json.dumps(e) for e in events) + "\n")
    return str(p)


def test_parse_eventlog_aggregates_per_stage(tmp_path):
    log = _write_log(tmp_path, [
        {"Event": "SparkListenerApplicationStart", "Timestamp": 500},
        _task_end(0, input_bytes=600_000_000, shuffle_write=1_000_000),
        _task_end(0, input_bytes=400_000_000, shuffle_write=2_000_000),
        _stage_done(0, "scan pages"),
        _task_end(1, shuffle_write=5_000_000),
        _stage_done(1, "digest exchange"),
        {"Event": "SparkListenerApplicationEnd", "Timestamp": 9500},
    ])
    stages, t0, t1 = parse_eventlog(log)
    assert (t0, t1) == (500, 9500)
    assert len(stages) == 2
    scan = next(s for s in stages if s["name"] == "scan pages")
    assert scan["input"] == 1_000_000_000
    assert scan["shuffle_write"] == 3_000_000
    assert scan["tasks"] == 2


def test_audit_passes_digest_only_shuffles(tmp_path):
    # healthy engine shape: 1 GB scanned, only digests/keys shuffle (MBs)
    log = _write_log(tmp_path, [
        _task_end(0, input_bytes=1_000_000_000, shuffle_write=4_000_000),
        _stage_done(0, "scan pages"),
        _task_end(1, shuffle_write=12_000_000),
        _stage_done(1, "dedup stats exchange"),
    ])
    stages, _, _ = parse_eventlog(log)
    audit = payload_shuffle_audit(stages, threshold_frac=0.3)
    assert audit["flagged"] == []
    assert audit["denominator_bytes"] == 1_000_000_000
    assert audit["denominator_source"] == "max_stage_input_metrics"


def test_audit_flags_payload_shuffle(tmp_path):
    # the round-4 bug signature: shuffle-write within a constant factor of
    # the corpus scan (html payload transiting a sort-merge exchange)
    log = _write_log(tmp_path, [
        _task_end(0, input_bytes=1_000_000_000, shuffle_write=0),
        _stage_done(0, "scan pages"),
        _task_end(1, shuffle_write=900_000_000),
        _stage_done(1, "sort merge join html"),
    ])
    stages, _, _ = parse_eventlog(log)
    audit = payload_shuffle_audit(stages, threshold_frac=0.3)
    assert len(audit["flagged"]) == 1
    f = audit["flagged"][0]
    assert f["stage"] == "sort merge join html"
    assert f["shuffle_write_bytes"] == 900_000_000
    assert f["input_frac"] == 0.9


def test_audit_scan_bytes_denominator_when_input_metrics_absent(tmp_path):
    # Spark 4.1 reality (r05 spin1): task Input Metrics ~zero for parquet
    # scans, so a healthy 44 MB digest shuffle was flagged at 21x a 2 MB
    # phantom denominator. With the measured corpus bytes passed in, the
    # same log is judged against the true scan volume.
    log = _write_log(tmp_path, [
        _task_end(0, input_bytes=30_000, shuffle_write=44_000_000),
        _stage_done(0, "digest exchange"),
    ])
    stages, _, _ = parse_eventlog(log)
    healthy = payload_shuffle_audit(stages, 0.3, scan_bytes=2_000_000_000)
    assert healthy["flagged"] == []
    assert healthy["denominator_source"] == "corpus_scan_bytes"
    assert healthy["denominator_bytes"] == 2_000_000_000
    # and a genuine payload shuffle still flags against the scan volume
    log2 = _write_log(tmp_path, [
        _task_end(0, shuffle_write=1_900_000_000),
        _stage_done(0, "sort merge join html"),
    ])
    stages2, _, _ = parse_eventlog(log2)
    bad = payload_shuffle_audit(stages2, 0.3, scan_bytes=2_000_000_000)
    assert len(bad["flagged"]) == 1
    assert bad["flagged"][0]["input_frac"] == 0.95


def test_audit_zero_input_never_divides_by_zero():
    audit = payload_shuffle_audit(
        [{"name": "x", "input": 0, "shuffle_write": 10}], threshold_frac=0.3
    )
    assert audit["flagged"] == []
    assert audit["denominator_bytes"] == 0
    assert audit["no_denominator"] is True


def test_parse_eventlog_attaches_job_callsites(tmp_path):
    # AQE stage names are an anonfun; the JobStart callSite carries the
    # repo file:line (with the --py-files zip prefix stripped)
    log = _write_log(tmp_path, [
        {"Event": "SparkListenerJobStart", "Job ID": 0,
         "Stage Infos": [{"Stage ID": 0}],
         "Properties": {"callSite.short":
                        "collect at /tmp/spark-x/userFiles-y/gtfsrt2lc_spark"
                        ".zip/gtfsrt2lc_spark/operators/dedup.py:55"}},
        _task_end(0, shuffle_write=5),
        _stage_done(0, "$anonfun$withThreadLocalCaptured$2 at Completable"),
    ])
    stages, _, _ = parse_eventlog(log)
    assert stages[0]["callsite"] == (
        "collect at gtfsrt2lc_spark/operators/dedup.py:55")


def test_audit_denominator_is_max_single_stage_not_sum(tmp_path):
    # ADVICE r5: summed task input double-counts staged-parquet re-reads —
    # three stages each re-reading the same 1 GB sum to 3 GB, and a real
    # 500 MB payload shuffle (50% of the true scan) would hide at 17% of
    # the inflated denominator. The max single stage keeps the gate honest.
    log = _write_log(tmp_path, [
        _task_end(0, input_bytes=1_000_000_000),
        _stage_done(0, "scan pages"),
        _task_end(1, input_bytes=1_000_000_000),
        _stage_done(1, "re-read stage parquet"),
        _task_end(2, input_bytes=1_000_000_000, shuffle_write=500_000_000),
        _stage_done(2, "sort merge join html"),
    ])
    stages, _, _ = parse_eventlog(log)
    audit = payload_shuffle_audit(stages, threshold_frac=0.3)
    assert audit["denominator_bytes"] == 1_000_000_000
    assert audit["task_input_bytes"] == 3_000_000_000  # recorded, not trusted
    assert audit["max_stage_input_bytes"] == 1_000_000_000
    assert len(audit["flagged"]) == 1
    assert audit["flagged"][0]["input_frac"] == 0.5


def test_parse_eventlog_tolerates_eventless_json_lines(tmp_path):
    # ADVICE r5: a valid-JSON line without an "Event" key used to
    # AttributeError on None.endswith and kill the whole forensics run
    log = _write_log(tmp_path, [
        {"some": "metadata line", "Event": None},
        {"no_event_key": True},
        _task_end(0, input_bytes=5, shuffle_write=1),
        _stage_done(0, "scan"),
    ])
    stages, _, _ = parse_eventlog(log)
    assert len(stages) == 1
