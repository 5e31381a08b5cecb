"""Checkpoint manifest: idempotent resume (ref test mirror:
`test/gtfsrt2lc.test.js:117-159` — second run over same input emits 0)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gtfsrt2lc_spark.fixtures.pages import PREDICATES
from gtfsrt2lc_spark.plans.kg_pipeline import KGPipeline
from gtfsrt2lc_spark.plans.manifest import read_manifest, read_triples, run_incremental


@pytest.fixture(scope="module")
def pipeline(corpus_dfs):
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    return KGPipeline(records, surfaces, sameas, preds)


def test_idempotent_rerun(spark, corpus_dfs, pipeline, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_out"))
    pages = corpus_dfs[0]

    m1 = run_incremental(spark, pages, pipeline, out, n_buckets=8, run_id="r1")
    assert m1["parts"] == 8
    assert m1["n_triples"] > 0

    # full golden parity through the manifest path too
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in read_triples(spark, out).collect()
    }
    assert got == corpus.golden_triples

    # second run: everything checkpointed -> no new work, no new triples
    m2 = run_incremental(spark, pages, pipeline, out, n_buckets=8, run_id="r2")
    assert m2 == {"parts": 0, "n_docs": 0, "n_triples": 0, "wall_ms": 0}


def test_partial_failure_resume(spark, corpus_dfs, pipeline, corpus, tmp_path_factory):
    """Crash-after-half simulation: run over a subset of buckets, then the
    full input — only pending buckets process, and the union is complete."""
    out = str(tmp_path_factory.mktemp("kg_out_partial"))
    pages = corpus_dfs[0]
    half = pages.where(F.pmod(F.xxhash64("url"), F.lit(8)).cast("int") < 4)

    m1 = run_incremental(spark, half, pipeline, out, n_buckets=8, run_id="r1")
    assert m1["parts"] == 4

    m2 = run_incremental(spark, pages, pipeline, out, n_buckets=8, run_id="r2")
    assert m2["parts"] == 4  # only the missing half

    got = {
        (r["subj"], r["pred"], r["obj"]) for r in read_triples(spark, out).collect()
    }
    assert got == corpus.golden_triples

    mf = read_manifest(spark, out)
    assert mf.count() == 8
    assert mf.where(F.col("status") == "done").count() == 8
    # lineage: per-partition metrics recorded (n_docs counts page rows,
    # re-crawl snapshots included)
    row = mf.agg(F.sum("n_docs").alias("d")).collect()[0]
    assert row["d"] == pages.count()


def test_scratch_dir_scoped_under_out_dir(spark, corpus_dfs, corpus, tmp_path_factory):
    """Stage checkpoints must land on the (shared) out_dir filesystem, not a
    driver-local tmp dir — the multi-node correctness posture — and be gone
    after the run."""
    import glob
    import os
    import tempfile

    out = str(tmp_path_factory.mktemp("kg_out_scratch"))
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    pipe = KGPipeline(records, surfaces, sameas, preds)

    before_tmp = set(glob.glob(os.path.join(tempfile.gettempdir(), "kgstage_*")))
    m = run_incremental(spark, pages, pipe, out, n_buckets=4, run_id="rs")
    assert m["parts"] == 4

    # no driver-local fallback dirs were created ...
    after_tmp = set(glob.glob(os.path.join(tempfile.gettempdir(), "kgstage_*")))
    assert after_tmp == before_tmp
    # ... the out_dir-scoped scratch was used and is fully cleaned up ...
    assert not os.path.exists(os.path.join(out, "_stage")) or not os.listdir(
        os.path.join(out, "_stage")
    )
    # ... and the pipeline is reusable (scratch ownership released)
    assert pipe.scratch_dir is None


def test_explicit_scratch_dir_used_and_cleaned(spark, corpus_dfs, corpus, tmp_path):
    """A caller-provided scratch_dir receives the stage parquet and cleanup()
    removes the stages but leaves the caller's root alone."""
    import os

    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    scratch = str(tmp_path / "scratch")
    pipe = KGPipeline(records, surfaces, sameas, preds, scratch_dir=scratch)

    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.triples(pages).collect()
    }
    assert got == corpus.golden_triples
    stages = os.listdir(scratch)
    assert stages and all(s.startswith("stage-") for s in stages)

    pipe.cleanup()
    assert os.listdir(scratch) == []


def test_failed_run_releases_scratch_ownership(spark, corpus_dfs, tmp_path_factory):
    """A run that fails mid-pipeline must delete its owned _stage scratch and
    reset pipeline.scratch_dir, so a retry re-acquires a fresh scratch instead
    of treating the stale one as caller-owned (and leaking it forever)."""
    import os

    out = str(tmp_path_factory.mktemp("kg_out_fail"))
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    pipe = KGPipeline(records, surfaces, sameas, preds)

    boom = RuntimeError("mid-run failure")
    real_triples = pipe.triples

    def failing_triples(pages_df, with_part=False):
        # fail AFTER the stage checkpoint has been written to scratch
        df = real_triples(pages_df, with_part=with_part)
        raise boom

    pipe.triples = failing_triples
    with pytest.raises(RuntimeError, match="mid-run failure"):
        run_incremental(spark, pages, pipe, out, n_buckets=4, run_id="rx")

    assert pipe.scratch_dir is None  # ownership released
    stage_root = os.path.join(out, "_stage")
    leftovers = os.listdir(stage_root) if os.path.exists(stage_root) else []
    assert leftovers == []  # failed run's stage parquet deleted

    # the retry works end-to-end with the same pipeline object
    pipe.triples = real_triples
    m = run_incremental(spark, pages, pipe, out, n_buckets=4, run_id="retry")
    assert m["parts"] == 4
    assert pipe.scratch_dir is None


def test_triple_write_one_file_per_bucket(spark, corpus_dfs, tmp_path_factory):
    """Regression guard for the anti-scaling write: the dynamic-partition
    triple write must land O(1) files per bucket dir, not
    shuffle_partitions x buckets (file-commit churn that grew with core
    count)."""
    import os

    out = str(tmp_path_factory.mktemp("kg_out_files"))
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    pipe = KGPipeline(records, surfaces, sameas, preds)
    run_incremental(spark, pages, pipe, out, n_buckets=8, run_id="rf")

    tdir = os.path.join(out, "triples")
    part_dirs = [d for d in os.listdir(tdir) if d.startswith("part_id=")]
    assert part_dirs
    for d in part_dirs:
        files = [f for f in os.listdir(os.path.join(tdir, d)) if f.startswith("part-")]
        assert len(files) <= 2, f"{d} has {len(files)} files (write not clustered)"
