"""gtfsrt2lc_spark — a PySpark-native knowledge-graph construction engine.

A brand-new engine with the query/data-processing capabilities of
linkedconnections/gtfsrt2lc (record -> Linked Data pipeline), re-expressed
Spark-first and generalized to Common-Crawl-style web-page corpora:

  pages(url, warc_ts, html, text, lang)
    -> vectorized Arrow-UDF text extraction        (ref: lib/Gtfsrt2LC.js:61-66, protobuf decode analog)
    -> mention detection + SVO triple extraction   (ref: lib/Gtfsrt2LC.js:162-229, pairwise connection formation analog)
    -> broadcast-dictionary entity linking +
       MinHash-LSH blocking                        (ref: lib/Gtfsrt2LC.js:323-394, trip deduction analog)
    -> connected-components canonicalization       (ref: lib/Gtfsrt2LC.js:438-665, repair pass analog)
    -> IRI minting                                 (ref: lib/Utils.js:9-66, URI templates)
    -> deduplicated (subj, pred, obj) triple store (ref: lib/Connections2Triples.js:14-104)
    -> N-Quads / JSON-LD serialization, resumable via a checkpoint manifest
       (ref: lib/Gtfsrt2LC.js:667-751, history store analog)

All computation is DataFrame/SQL-first; Python appears only in Arrow-batched
pandas UDFs (HTML text extraction) — never row-at-a-time.
"""

__version__ = "0.1.0"

from gtfsrt2lc_spark.session import get_spark  # noqa: F401
