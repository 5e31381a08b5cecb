"""Text-extraction invariants: determinism + byte identity (input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gtfsrt2lc_spark.functions.text import extract_text_bytes, extract_text_str


def test_boilerplate_stripped():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>.a{}</style></head><body><!-- c --><p>Hello &amp; world.</p>"
        b"<div>Second line.</div></body></html>"
    )
    out = extract_text_bytes(html)
    assert "var x" not in out and ".a{}" not in out and "c -->" not in out
    assert "Hello & world." in out
    assert "Second line." in out


def test_entities_and_numeric_refs():
    assert extract_text_str("a &lt;b&gt; &#65; &#x42; &nbsp;c") == "a <b> A B c"


def test_malformed_html_recovers():
    out = extract_text_bytes(b"<p>Keep this.</p><div><p>trailing unclosed < fragment")
    assert "Keep this." in out
    assert "trailing unclosed" in out


def test_non_utf8_bytes_replaced():
    out = extract_text_bytes(b"<p>ok \xff\xfe bad</p>")
    assert out.startswith("ok ")


def test_udf_matches_pure_function(spark, corpus, corpus_dfs):
    """The Arrow UDF must be byte-identical to the pure extractor per url —
    the BASELINE.json input_hint invariant."""
    pages, *_ = corpus_dfs
    from gtfsrt2lc_spark.functions.text import extract_text_udf
    from gtfsrt2lc_spark.operators.dedup import latest_by_key

    latest = latest_by_key(pages, "url", "warc_ts")
    got = {
        r["url"]: r["t"]
        for r in latest.select("url", extract_text_udf(F.col("html")).alias("t")).collect()
    }
    assert got == corpus.golden_text


def test_pre_extracted_text_column_consistent(corpus):
    """Where the corpus pre-populates `text`, it equals the extractor output."""
    for p in corpus.pages:
        if p["text"] is not None:
            assert p["text"] == extract_text_bytes(p["html"])
