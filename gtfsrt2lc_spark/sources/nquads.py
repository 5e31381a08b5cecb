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
    # sentinel-free single pass: split on escaped backslashes, unescape each
    # segment, re-join with a literal backslash. (A sentinel character can
    # collide with data — a literal NUL round-tripped to a backslash before.)
    def _unesc_segment(seg: Column) -> Column:
        out = F.regexp_replace(seg, r'\\"', '"')
        out = F.regexp_replace(out, r"\\n", "\n")
        out = F.regexp_replace(out, r"\\r", "\r")
        out = F.regexp_replace(out, r"\\t", "\t")
        return out

    return F.array_join(
        F.transform(F.split(col, r"\\\\"), _unesc_segment), "\\"
    )


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


# ---------------------------------------------------------------------------
# Turtle (ref: `lib/Gtfsrt2LC.js:254-261` pipes quads through n3 StreamWriter
# with prefixes xsd/lc/gtfs; here prefix compression is a JVM-side expression
# and the @prefix block is a sidecar header, like the JSON-LD context —
# distributed text parts cannot prepend)
# ---------------------------------------------------------------------------

TURTLE_PREFIXES = {
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "lc": "http://semweb.mmlab.be/ns/linkedconnections#",
    "gtfs": "http://vocab.gtfs.org/terms#",
}

# conservative PN_LOCAL subset: compress only when the remainder is plainly
# safe; anything else falls back to the always-valid <full-IRI> form
_PN_LOCAL_SAFE = r"^[A-Za-z0-9][A-Za-z0-9_.\-]*$"


def _prefixed(col: Column, prefixes: dict[str, str]) -> Column:
    """Compress an IRI to pfx:local when a namespace matches (longest first),
    else render <iri>; bnodes pass through."""
    out = term(col)
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        local = F.substring(col, len(ns) + 1, 2_000_000)
        out = F.when(
            col.startswith(ns) & local.rlike(_PN_LOCAL_SAFE),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(out)
    return out


def to_turtle_lines(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    obj_datatype: str | None = None,
    prefixes: dict[str, str] | None = None,
) -> DataFrame:
    """One Turtle statement per row with prefixed-name compression.

    Statement-per-line Turtle (no subject grouping): grouping by subject
    would force a shuffle purely for output cosmetics; per-statement lines
    keep the write a narrow map over the triples and remain valid Turtle.
    """
    pfx = TURTLE_PREFIXES if prefixes is None else prefixes
    return triples.select(
        F.concat(
            _prefixed(F.col(subj), pfx),
            F.lit(" "),
            _prefixed(F.col(pred), pfx),
            F.lit(" "),
            _object_term(obj, obj_datatype, pfx),
            F.lit(" ."),
        ).alias("line")
    )


def _object_term(
    obj: str, obj_datatype: str | None, pfx: dict[str, str]
) -> Column:
    is_iri = F.col(obj).startswith("http://") | F.col(obj).startswith("https://")
    is_bnode = F.col(obj).startswith("_:")
    lit = F.concat(F.lit('"'), _escape_literal(F.col(obj)), F.lit('"'))
    if obj_datatype:
        lit = F.when(
            F.col(obj_datatype).isNotNull(),
            F.concat(lit, F.lit("^^"), _prefixed(F.col(obj_datatype), pfx)),
        ).otherwise(lit)
    return (
        F.when(is_iri, _prefixed(F.col(obj), pfx))
        .when(is_bnode, F.col(obj))
        .otherwise(lit)
    )


def to_turtle_blocks(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    obj_datatype: str | None = None,
    prefixes: dict[str, str] | None = None,
) -> DataFrame:
    """One Turtle block per SUBJECT — predicate lists joined with ``;``, the
    reference's n3 StreamWriter output shape (lib/Gtfsrt2LC.js:254-261):

        subj pred1 obj1 ;
            pred2 obj2 .

    Opt-in byte-closer parity mode: grouping costs one keyed shuffle on the
    subject (collect_list is partial-aggregated map-side, and subjects are
    high-cardinality so the shuffle is well-spread); the ``(pred, obj)``
    list is sorted for deterministic output. Statement-per-line
    ``to_turtle_lines`` remains the scale default — no shuffle for output
    cosmetics."""
    pfx = TURTLE_PREFIXES if prefixes is None else prefixes
    po = F.concat(
        _prefixed(F.col(pred), pfx), F.lit(" "), _object_term(obj, obj_datatype, pfx)
    )
    return (
        triples.select(_prefixed(F.col(subj), pfx).alias("s"), po.alias("po"))
        .groupBy("s")
        .agg(F.sort_array(F.collect_list("po")).alias("pos"))
        .select(
            F.concat(
                F.col("s"),
                F.lit(" "),
                F.array_join("pos", " ;\n    "),
                F.lit(" ."),
            ).alias("line")
        )
    )


def write_turtle(
    triples: DataFrame,
    path: str,
    obj_datatype: str | None = None,
    prefixes: dict[str, str] | None = None,
    group_subjects: bool = False,
) -> None:
    """Distributed Turtle write: statement parts + `prefixes.ttl` sidecar
    holding the @prefix block (consumers concatenate sidecar + parts).
    ``group_subjects=True`` emits per-subject ``;`` blocks (reference n3
    parity, one extra subject-keyed shuffle) instead of one statement per
    line."""
    import os

    pfx = TURTLE_PREFIXES if prefixes is None else prefixes
    render = to_turtle_blocks if group_subjects else to_turtle_lines
    render(triples, obj_datatype=obj_datatype, prefixes=pfx).write.mode(
        "overwrite"
    ).text(path)
    with open(os.path.join(path, "prefixes.ttl"), "w") as f:
        for p, ns in sorted(pfx.items()):
            f.write(f"@prefix {p}: <{ns}> .\n")
