"""End-to-end golden-triple parity (the BASELINE.json correctness target).

Mirrors the reference's fixture-driven E2E tests with exact golden counts
(`test/gtfsrt2lc.test.js:394-485`): the synthetic corpus plants every fact,
so the expected (subj, pred, obj) set is known by construction; we assert
precision and recall >= 0.95 (they should be 1.0 on the clean corpus).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gtfsrt2lc_spark.fixtures.pages import PREDICATES
from gtfsrt2lc_spark.plans.kg_pipeline import KGPipeline


@pytest.fixture(scope="module")
def pipeline(corpus_dfs):
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    return KGPipeline(records, surfaces, sameas, preds)


@pytest.fixture(scope="module")
def result_triples(pipeline, corpus_dfs):
    pages = corpus_dfs[0]
    return {
        (r["subj"], r["pred"], r["obj"])
        for r in pipeline.triples(pages).collect()
    }


def test_precision_recall(result_triples, corpus):
    golden = corpus.golden_triples
    assert golden, "corpus must plant facts"
    tp = len(result_triples & golden)
    precision = tp / len(result_triples) if result_triples else 0.0
    recall = tp / len(golden)
    assert precision >= 0.95, f"precision {precision:.3f}; spurious: {sorted(result_triples - golden)[:5]}"
    assert recall >= 0.95, f"recall {recall:.3f}; missed: {sorted(golden - result_triples)[:5]}"


def test_triples_well_formed(result_triples):
    for s, p, o in result_triples:
        assert s.startswith("http://example.org/kg/entity/")
        assert p.startswith("http://example.org/kg/ontology#")
        assert o.startswith("http://example.org/kg/entity/")


def test_strategy_equivalence(pipeline, corpus_dfs, spark, result_triples):
    """Broadcast-join plan vs forced shuffle plan give identical triples —
    the analog of the reference's MemStore/grep/LevelStore equivalence
    (`test/gtfsrt2lc.test.js:394-485`)."""
    pages = corpus_dfs[0]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffled = {
            (r["subj"], r["pred"], r["obj"])
            for r in pipeline.triples(pages.repartition(7)).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert shuffled == result_triples


def test_latest_wins_recrawl(pipeline, corpus_dfs, corpus, spark):
    """Re-crawled urls: only the newest snapshot contributes (T3 analog)."""
    pages = corpus_dfs[0]
    n_urls = pages.select("url").distinct().count()
    n_rows = pages.count()
    assert n_rows > n_urls, "corpus must contain re-crawled urls"
    extracted = pipeline.extracted(pages)
    assert extracted.count() == n_urls


def test_fuzzy_linking_recovers_typos(spark, corpus_dfs, corpus):
    """A typo'd surface links to the right record via MinHash-LSH."""
    _, records, surfaces, sameas = corpus_dfs
    from gtfsrt2lc_spark.operators.linking import link_fuzzy

    queries = spark.createDataFrame(
        [("Ada Lovelacee",), ("Grace Hoper",), ("Stark Industres",)], "surface string"
    )
    got = {r["surface"]: r["record_id"] for r in link_fuzzy(queries, surfaces).collect()}
    rec_by_name = {name: rid for rid, name, _ in corpus.records}
    assert got.get("Ada Lovelacee") == rec_by_name["Ada Lovelace"]
    assert got.get("Grace Hoper") == rec_by_name["Grace Hopper"]
    assert got.get("Stark Industres") == rec_by_name["Stark Industries"]


def test_fuzzy_link_band_join_shuffles_no_shingles(spark, corpus_dfs):
    """Plan-shape guard: link_fuzzy's band join replicates rows x bands, so
    no shingle-set column may ride a band-keyed Exchange — sets join back to
    the deduped candidate pairs only (same discipline as the dedup family)."""
    import contextlib
    import io
    import re

    _, _, surfaces, _ = corpus_dfs
    from gtfsrt2lc_spark.operators.linking import link_fuzzy

    queries = spark.createDataFrame([("Ada Lovelacee",)], "surface string")
    out = link_fuzzy(queries, surfaces)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    checked = 0
    for block in buf.getvalue().split("\n\n"):
        lines = block.strip().splitlines()
        if not lines or "Exchange" not in lines[0]:
            continue
        args = next((ln for ln in lines if ln.startswith("Arguments:")), "")
        inp = next((ln for ln in lines if ln.startswith("Input")), "")
        if "band" in args:
            checked += 1
            cols = re.findall(r"[\[, ]([A-Za-z_][A-Za-z0-9_]*)#", inp)
            assert not any(c.startswith("sh_") for c in cols), cols
    assert checked > 0, "expected a band-keyed Exchange in the plan"


def _dirty_pages(spark, pages):
    """Clean corpus + pages whose fact sentences carry OUT-OF-DICTIONARY
    (typo'd) surfaces — one in the subject slot, one in the object slot —
    so linked()'s miss counter is provably non-zero and the fuzzy branch
    under test actually executes (a clean corpus takes the miss==0 elision
    fast path and never reaches it)."""
    from datetime import datetime

    from gtfsrt2lc_spark.fixtures.pages import _render_page

    typo_sentences = [
        ("https://dirty.example.net/t/1", "Ada Lovelacee works for Acme Corp."),
        ("https://dirty.example.net/t/2", "Alan Turing works for Stark Industres."),
    ]
    rows = [
        (
            url,
            datetime(2024, 6, 1, 0, 0, i),
            _render_page(url, "dirty.example.net", "en", [s], False).encode("utf-8"),
            None,
            "en",
        )
        for i, (url, s) in enumerate(typo_sentences)
    ]
    dirty = spark.createDataFrame(rows, pages.schema)
    expected_extra = {
        (
            "http://example.org/kg/entity/Ada_Lovelace",
            "http://example.org/kg/ontology#worksFor",
            "http://example.org/kg/entity/Acme_Corp",
        ),
        (
            "http://example.org/kg/entity/Alan_Turing",
            "http://example.org/kg/ontology#worksFor",
            "http://example.org/kg/entity/Stark_Industries",
        ),
    }
    return pages.unionByName(dirty), expected_extra


def _triple_set(pipe, pages):
    try:
        return {
            (r["subj"], r["pred"], r["obj"]) for r in pipe.triples(pages).collect()
        }
    finally:
        pipe.cleanup()


def test_fuzzy_patch_recovers_dirty_corpus(spark, corpus_dfs, result_triples):
    """Out-of-dictionary surfaces force miss>0: the probe-elision fast path
    must NOT fire, the fuzzy patch must recover exactly the typo'd facts,
    and everything else must match the clean-corpus golden set."""
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    dirty, extra = _dirty_pages(spark, pages)
    got = _triple_set(KGPipeline(records, surfaces, sameas, preds), dirty)
    assert got == result_triples | extra


def test_distributed_fuzzy_mapping_equivalence(spark, corpus_dfs, result_triples):
    """max_local_surfaces=0 + a dirty corpus forces the fully DISTRIBUTED
    fuzzy mapping (the web-scale branch where the unmatched surface set must
    never be collected); the triple set must be identical to the driver-side
    fast path — the engine's MemStore/LevelStore-style duality. The dirty
    pages guarantee miss>0, so the branch under test genuinely runs (with a
    clean corpus the miss==0 elision would short-circuit it)."""
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    dirty, extra = _dirty_pages(spark, pages)
    pipe = KGPipeline(records, surfaces, sameas, preds, max_local_surfaces=0)
    got = _triple_set(pipe, dirty)
    assert got == result_triples | extra


def test_distributed_dictionary_equivalence(spark, corpus_dfs, result_triples):
    """max_local_dictionary=0 forces the 100x-KB path: the dictionary is
    never collected (no broadcast LocalRelation, no driver dict), the
    canonical map stays a staged distributed relation, and the exact+fuzzy
    mapping joins run distributed — triples must still be identical."""
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    dirty, extra = _dirty_pages(spark, pages)
    pipe = KGPipeline(records, surfaces, sameas, preds, max_local_dictionary=0)
    assert pipe._resolved_dictionary() is None  # over-cap probe engaged
    got = _triple_set(pipe, dirty)
    assert not pipe._canonical_local
    assert got == result_triples | extra
    # clean corpus through the same path (fuzzy finds nothing to recover)
    pipe2 = KGPipeline(records, surfaces, sameas, preds, max_local_dictionary=0)
    assert _triple_set(pipe2, pages) == result_triples


def test_broadcast_dups_escape_hatch(spark, corpus_dfs, result_triples):
    """broadcast_dups=False (the billion-dup-key fallback) must change the
    physical join strategy only — identical triples."""
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    pipe = KGPipeline(records, surfaces, sameas, preds, broadcast_dups=False)
    assert _triple_set(pipe, pages) == result_triples


def test_link_fuzzy_prepped_equivalence(spark, corpus_dfs, corpus):
    """A precomputed FuzzyDictionary gives byte-identical links to the
    build-inline path, and serves multiple query batches."""
    _, _, surfaces, _ = corpus_dfs
    from gtfsrt2lc_spark.operators.linking import FuzzyDictionary, link_fuzzy

    q1 = spark.createDataFrame(
        [("Ada Lovelacee",), ("Grace Hoper",)], "surface string"
    )
    q2 = spark.createDataFrame([("Stark Industres",)], "surface string")
    direct = {
        (r["surface"], r["record_id"], r["score"])
        for r in link_fuzzy(q1, surfaces).collect()
    }
    fd = FuzzyDictionary(surfaces)
    reused = {
        (r["surface"], r["record_id"], r["score"])
        for r in link_fuzzy(q1, None, prepped=fd).collect()
    }
    assert reused == direct
    batch2 = {r["surface"]: r["record_id"] for r in link_fuzzy(q2, None, prepped=fd).collect()}
    rec_by_name = {name: rid for rid, name, _ in corpus.records}
    assert batch2.get("Stark Industres") == rec_by_name["Stark Industries"]


def test_fuzzy_dictionary_reused_across_batches(spark, corpus_dfs, result_triples):
    """Two dirty micro-batches through ONE pipeline build the dictionary-side
    LSH tables exactly once (the reference's index-reuse pattern): the second
    batch adds only its own stage checkpoint, results stay golden, and
    cleanup() invalidates the cache with the staged parquet."""
    pages, records, surfaces, sameas = corpus_dfs
    preds = {phrase: local for phrase, (local, _, _) in PREDICATES.items()}
    dirty, extra = _dirty_pages(spark, pages)
    pipe = KGPipeline(records, surfaces, sameas, preds)
    try:
        got1 = {
            (r["subj"], r["pred"], r["obj"]) for r in pipe.triples(dirty).collect()
        }
        fd = pipe._fuzzy_dict
        assert fd is not None  # dirty batch engaged the fuzzy pass
        n_stages = len(pipe._scratch)
        got2 = {
            (r["subj"], r["pred"], r["obj"]) for r in pipe.triples(dirty).collect()
        }
        assert pipe._fuzzy_dict is fd  # built once, reused
        assert len(pipe._scratch) == n_stages + 1  # only batch 2's own stage
        assert got1 == got2 == result_triples | extra
    finally:
        pipe.cleanup()
    assert pipe._fuzzy_dict is None  # staged tables gone -> cache reset
