"""N-Quads / N-Triples serialization as DataFrame text.

Reference analog: `lib/Connections2Triples.js:14-104` (each connection ->
12 RDF quads, serialized by n3). Here each (subj, pred, obj[, graph]) row
becomes one N-Quads line via JVM-side ``format_string`` — no Python, no
driver-side loop; the writer is a plain distributed text write.

Object terms: values starting with ``http://``/``https://``/``_:`` serialize
as IRIs/bnodes, anything else as a typed or plain literal (caller passes
``obj_datatype`` to type it, e.g. xsd:dateTime / xsd:integer, matching the
reference's typed literals at `lib/Connections2Triples.js:59,69`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def term(col: Column, datatype: Column | None = None) -> Column:
    """Render an RDF term: IRI, bnode, or (typed) literal."""
    is_iri = col.startswith("http://") | col.startswith("https://")
    is_bnode = col.startswith("_:")
    lit = F.concat(F.lit('"'), _escape_literal(col), F.lit('"'))
    if datatype is not None:
        lit = F.concat(lit, F.lit("^^<"), datatype, F.lit(">"))
    return (
        F.when(is_iri, F.concat(F.lit("<"), col, F.lit(">")))
        .when(is_bnode, col)
        .otherwise(lit)
    )


def to_nquads_lines(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    graph: str | None = "graph",
    obj_datatype: str | None = None,
) -> DataFrame:
    """One column ``line`` of N-Quads (or N-Triples when graph is None)."""
    dt = F.col(obj_datatype) if obj_datatype else None
    parts = [
        term(F.col(subj)),
        F.lit(" "),
        term(F.col(pred)),
        F.lit(" "),
        term(F.col(obj), dt),
    ]
    if graph is not None:
        parts += [F.lit(" "), term(F.col(graph))]
    parts += [F.lit(" .")]
    return triples.select(F.concat(*parts).alias("line"))


def write_nquads(triples: DataFrame, path: str, graph: str | None = "graph") -> None:
    to_nquads_lines(triples, graph=graph).write.mode("overwrite").text(path)


_NQ_PATTERN = (
    r"^(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+"
    r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\"(?:\^\^<([^>]*)>)?)"
    r"(?:\s+<([^>]*)>)?\s+\.$"
)


def _unescape_literal(col: Column) -> Column:
    # single-pass-safe: park escaped backslashes in a sentinel first
    sentinel = "\u0000"
    out = F.regexp_replace(col, r"\\\\", sentinel)
    out = F.regexp_replace(out, r'\\"', '"')
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r"\\t", "\t")
    return F.regexp_replace(out, sentinel, r"\\")


def read_nquads(spark, path: str) -> DataFrame:
    """Parse N-Quads text back into (subj, pred, obj, obj_datatype, graph)."""
    lines = spark.read.text(path)
    p = _NQ_PATTERN
    return lines.select(
        F.when(F.regexp_extract("value", p, 1) != "", F.regexp_extract("value", p, 1))
        .otherwise(F.regexp_extract("value", p, 2))
        .alias("subj"),
        F.regexp_extract("value", p, 3).alias("pred"),
        F.when(F.regexp_extract("value", p, 4) != "", F.regexp_extract("value", p, 4))
        .when(F.regexp_extract("value", p, 5) != "", F.regexp_extract("value", p, 5))
        .otherwise(_unescape_literal(F.regexp_extract("value", p, 6)))
        .alias("obj"),
        F.nullif(F.regexp_extract("value", p, 7), F.lit("")).alias("obj_datatype"),
        F.nullif(F.regexp_extract("value", p, 8), F.lit("")).alias("graph"),
    ).where(F.col("pred") != "")
