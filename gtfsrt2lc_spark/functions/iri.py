"""IRI minting — the reference's URI-template layer re-expressed as Columns.

The reference fills RFC-6570 templates with values resolved from row fields or
user ``resolve`` JS expressions evaluated with ``eval`` (`lib/Utils.js:9-66`,
eval at `:28`). Arbitrary eval is out of scope by design; instead templates
compile to Column expressions built from ``concat``/``url_encode``/
``regexp_replace`` — JVM-side, codegen-friendly, deterministic.

Template syntax: ``http://ex.org/{name}`` substitutes column ``name``;
``{name|slug}`` applies slugification, ``{name|urlencode}`` percent-encodes,
``{name|date:<java pattern>}`` formats a timestamp (ref F5,
`lib/Utils.js:38-44`).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_VAR = re.compile(r"\{([^}|]+)(?:\|([^}]+))?\}")


def slug(col: Column) -> Column:
    """Runs of non-alphanumerics -> '_', trimmed — matches
    fixtures.pages.slugify byte-for-byte for ASCII input."""
    return F.regexp_replace(
        F.regexp_replace(col, r"[^A-Za-z0-9]+", "_"), r"^_+|_+$", ""
    )


def _apply_transform(col: Column, spec: str | None) -> Column:
    if spec is None:
        return col.cast("string")
    if spec == "slug":
        return slug(col.cast("string"))
    if spec == "urlencode":
        return F.url_encode(col.cast("string"))
    if spec.startswith("date:"):
        return F.date_format(col, spec[len("date:"):])
    raise ValueError(f"unknown template transform: {spec}")


def compile_template(template: str, columns: dict[str, Column] | None = None) -> Column:
    """Compile an IRI template into a single concat Column.

    ``columns`` maps variable names to Columns; unmapped names resolve via
    ``F.col(name)``.
    """
    parts: list[Column] = []
    pos = 0
    for m in _VAR.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name, spec = m.group(1), m.group(2)
        col = (columns or {}).get(name, F.col(name))
        parts.append(_apply_transform(col, spec))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def entity_iri(name: Column) -> Column:
    return F.concat(F.lit("http://example.org/kg/entity/"), slug(name))


def predicate_iri(local: Column) -> Column:
    return F.concat(F.lit("http://example.org/kg/ontology#"), local)
