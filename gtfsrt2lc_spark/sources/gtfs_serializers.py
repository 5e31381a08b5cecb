"""Linked-Connections serializers + URI-template layer, Column-compiled.

Reference parity:
  * URI templates + resolve mini-expressions (`lib/Utils.js:9-66`): the
    reference evals arbitrary user JS; here the documented idioms (README.md:
    78-121 — object paths, `.replace(/\\s/gi,'')`, `+` concat, `.split(s)[i]`,
    `.substring(a,b)`, `format(ts, "pattern")`) compile to Catalyst Columns.
    Anything outside the grammar raises — the escape hatch is passing a
    Column directly in ``extra_resolvers``.
  * 12 RDF quads per connection (`lib/Connections2Triples.js:31-101`)
  * JSON-LD context + compacted nodes (`lib/Connections2JSONLD.js:11-96`)
  * CSV (`lib/Connections2CSV.js:9-20`) — including the reference's quirky
    header quoting, reproduced verbatim for byte parity
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ISO_MS = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

LC = "http://semweb.mmlab.be/ns/linkedconnections#"
GTFS = "http://vocab.gtfs.org/terms#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"


# ---------------------------------------------------------------------------
# resolve-expression compiler (F7/F10)
# ---------------------------------------------------------------------------

_RE_FORMAT = re.compile(r"^format\(\s*([\w.]+)\s*,\s*\"([^\"]*)\"\s*\)$")
_RE_REPLACE = re.compile(r"^(.*)\.replace\(/(.+?)/g?i?g?\s*,\s*'([^']*)'\)$")
_RE_SPLIT = re.compile(r"^(.*)\.split\('([^']*)'\)\[(\d+)\]$")
_RE_SUBSTR = re.compile(r"^(.*)\.substring\((\d+)\s*,\s*(\d+)\)$")


def _base_path(path: str, stop_type: str | None) -> Column:
    parts = path.split(".")
    src, rest = parts[0], parts[1:]
    if src == "trips":
        if rest == ["startTime"]:
            return F.col("tripStartTime")
        return F.col(".".join(["trip"] + rest))
    if src == "routes":
        return F.col(".".join(["route"] + rest))
    if src == "stops":
        if stop_type is None:
            raise ValueError("stops.* used outside a stop-typed template")
        return F.col(".".join([stop_type] + rest))
    if src == "connection":
        if rest and rest[0] in ("departureStop", "arrivalStop", "trip", "route"):
            return F.col(".".join(rest))
        if rest == ["departureTime"]:
            return F.col("departureTime")
        if rest == ["arrivalTime"]:
            return F.col("arrivalTime")
        return F.col(".".join(rest))
    raise ValueError(f"unknown source in resolve path: {path}")


def compile_resolve(expr: str, stop_type: str | None = None) -> Column:
    """Compile one resolve mini-expression to a Column."""
    expr = expr.strip().rstrip(";").strip()
    # top-level '+' concatenation (operands contain no '+')
    if " + " in expr:
        return F.concat(
            *[compile_resolve(p, stop_type).cast("string") for p in expr.split(" + ")]
        )
    m = _RE_FORMAT.match(expr)
    if m:
        return F.date_format(_base_path(m.group(1), stop_type), m.group(2))
    m = _RE_REPLACE.match(expr)
    if m:
        return F.regexp_replace(
            compile_resolve(m.group(1), stop_type).cast("string"), m.group(2), m.group(3)
        )
    m = _RE_SPLIT.match(expr)
    if m:
        return F.split(compile_resolve(m.group(1), stop_type).cast("string"), re.escape(m.group(2)))[
            int(m.group(3))
        ]
    m = _RE_SUBSTR.match(expr)
    if m:
        a, b = int(m.group(2)), int(m.group(3))
        return F.substring(compile_resolve(m.group(1), stop_type).cast("string"), a + 1, b - a)
    if re.fullmatch(r"[\w.]+(\(.*\))?", expr):
        fm = re.fullmatch(r"([\w.]*?)\.(startTime|departureTime|arrivalTime)\((.*)\)", expr)
        if fm:  # e.g. trips.startTime(yyyyMMdd'T'HHmm) template shorthand
            base = _base_path(f"{fm.group(1)}.{fm.group(2)}", stop_type)
            return F.date_format(base, fm.group(3))
        return _base_path(expr, stop_type)
    raise ValueError(
        f"resolve expression outside the supported grammar: {expr!r} — "
        "pass a Column via extra_resolvers instead"
    )


_VAR = re.compile(r"\{([^}]+)\}")


def compile_uri_template(
    template: str,
    resolve: dict[str, str] | None,
    stop_type: str | None = None,
    extra_resolvers: dict[str, Column] | None = None,
) -> Column:
    """RFC-6570-style template -> concat Column with percent-encoding."""
    parts: list[Column] = []
    pos = 0
    resolve = resolve or {}
    for m in _VAR.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        var = m.group(1)
        if extra_resolvers and var in extra_resolvers:
            col = extra_resolvers[var]
        elif var in resolve:
            col = compile_resolve(resolve[var], stop_type)
        else:
            col = compile_resolve(var, stop_type)
        enc = F.regexp_replace(F.url_encode(col.cast("string")), r"\+", "%20")
        parts.append(enc)
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts)


def with_connection_uris(conns: DataFrame, uris: dict) -> DataFrame:
    resolve = uris.get("resolve")
    return (
        conns.withColumn(
            "departureStopURI",
            compile_uri_template(uris["stop"], resolve, "departureStop"),
        )
        .withColumn(
            "arrivalStopURI", compile_uri_template(uris["stop"], resolve, "arrivalStop")
        )
        .withColumn("routeURI", compile_uri_template(uris["route"], resolve))
        .withColumn("tripURI", compile_uri_template(uris["trip"], resolve))
        .withColumn("connectionURI", compile_uri_template(uris["connection"], resolve))
    )


def schedule_relationship_iri(col: Column) -> Column:
    """F8 (`lib/Utils.js:68-79`): code -> gtfs:* CURIE."""
    c = col.cast("int")
    return (
        F.when(c.isNull() | (c == 0), "gtfs:Regular")
        .when(c == 1, "gtfs:NotAvailable")
        .when(c == 2, "gtfs:MustPhone")
        .when(c == 3, "gtfs:MustCoordinateWithDriver")
        .otherwise(F.lit(None).cast("string"))
    )


def _expand_curie(col: Column) -> Column:
    return F.regexp_replace(col, "^gtfs:", GTFS)


def connections_to_quads(conns: DataFrame, uris: dict) -> DataFrame:
    """One connection -> 12 RDF triples (S10, lib/Connections2Triples.js:31-101).
    Output: (subj, pred, obj, obj_datatype) — obj_datatype null for IRIs."""
    c = with_connection_uris(conns, uris)
    iri = lambda x: (x, None)  # noqa: E731

    def lit(val: Column, dt: str) -> tuple[Column, Column]:
        return (val, F.lit(dt))

    type_obj = F.when(
        F.col("type") == "Connection", F.lit(LC + "Connection")
    ).otherwise(F.lit(LC + "CancelledConnection"))
    pairs: list[tuple[str, tuple]] = [
        (RDF_TYPE, iri(type_obj)),
        (LC + "departureStop", iri(F.col("departureStopURI"))),
        (LC + "arrivalStop", iri(F.col("arrivalStopURI"))),
        (LC + "departureTime", lit(F.date_format("departureTime", ISO_MS), XSD + "dateTime")),
        (LC + "arrivalTime", lit(F.date_format("arrivalTime", ISO_MS), XSD + "dateTime")),
        (LC + "departureDelay", lit(F.col("departure_delay").cast("string"), XSD + "integer")),
        (LC + "arrivalDelay", lit(F.col("arrival_delay").cast("string"), XSD + "integer")),
        (GTFS + "headsign", lit(F.col("headsign"), XSD + "string")),
        (GTFS + "trip", iri(F.col("tripURI"))),
        (GTFS + "route", iri(F.col("routeURI"))),
        (GTFS + "dropOffType", iri(_expand_curie(schedule_relationship_iri(F.col("drop_off_type"))))),
        (GTFS + "pickupType", iri(_expand_curie(schedule_relationship_iri(F.col("pickup_type"))))),
    ]
    quads = F.array(
        *[
            F.struct(
                F.col("connectionURI").alias("subj"),
                F.lit(p).alias("pred"),
                o[0].cast("string").alias("obj"),
                (o[1] if o[1] is not None else F.lit(None).cast("string")).alias("obj_datatype"),
            )
            for p, o in pairs
        ]
    )
    return c.select(F.explode(quads).alias("q")).select(
        "q.subj", "q.pred", "q.obj", "q.obj_datatype"
    )


JSONLD_CONTEXT = {
    "@context": {
        "xsd": XSD,
        "lc": LC,
        "gtfs": GTFS,
        "Connection": "lc:Connection",
        "CancelledConnection": "lc:CancelledConnection",
        "departureStop": {"@type": "@id", "@id": "lc:departureStop"},
        "arrivalStop": {"@type": "@id", "@id": "lc:arrivalStop"},
        "departureTime": {"@id": "lc:departureTime", "@type": "xsd:dateTime"},
        "arrivalTime": {"@id": "lc:arrivalTime", "@type": "xsd:dateTime"},
        "departureDelay": {"@id": "lc:departureDelay", "@type": "xsd:integer"},
        "arrivalDelay": {"@id": "lc:arrivalDelay", "@type": "xsd:integer"},
        "direction": {"@id": "gtfs:headsign", "@type": "xsd:string"},
        "gtfs:trip": {"@type": "@id"},
        "gtfs:route": {"@type": "@id"},
    }
}


def connections_to_jsonld_lines(conns: DataFrame, uris: dict) -> DataFrame:
    """One compacted JSON-LD node per line (lib/Connections2JSONLD.js:79-93)."""
    c = with_connection_uris(conns, uris)
    node = F.to_json(
        F.struct(
            F.col("connectionURI").alias("@id"),
            F.col("type").alias("@type"),
            F.col("departureStopURI").alias("departureStop"),
            F.col("arrivalStopURI").alias("arrivalStop"),
            F.date_format("departureTime", ISO_MS).alias("departureTime"),
            F.date_format("arrivalTime", ISO_MS).alias("arrivalTime"),
            F.col("departure_delay").alias("departureDelay"),
            F.col("arrival_delay").alias("arrivalDelay"),
            F.col("tripURI").alias("gtfs:trip"),
            F.col("routeURI").alias("gtfs:route"),
            F.col("trip.trip_headsign").alias("direction"),
            schedule_relationship_iri(F.col("pickup_type")).alias("gtfs:pickupType"),
            schedule_relationship_iri(F.col("drop_off_type")).alias("gtfs:dropOffType"),
        )
    )
    return c.select(node.alias("line"))


def write_connections_jsonld(conns: DataFrame, uris: dict, path: str) -> None:
    connections_to_jsonld_lines(conns, uris).write.mode("overwrite").text(path)
    with open(os.path.join(path, "context.jsonld"), "w") as f:
        json.dump(JSONLD_CONTEXT, f, sort_keys=True)


CSV_HEADER = (
    '"type",departureStop","departureTime","departureDelay",arrivalStop",'
    '"arrivalTime","arrivalDelay","headsign",trip","route"'
)


def connections_to_csv_lines(conns: DataFrame) -> DataFrame:
    """CSV rows (lib/Connections2CSV.js:14-17); header emitted by the writer."""
    line = F.concat_ws(
        ",",
        F.col("type"),
        F.col("departureStop.stop_name"),
        F.date_format("departureTime", ISO_MS),
        F.col("departure_delay").cast("string"),
        F.col("arrivalStop.stop_name"),
        F.date_format("arrivalTime", ISO_MS),
        F.col("arrival_delay").cast("string"),
        F.col("headsign"),
        F.col("trip.trip_id"),
        F.col("route.route_long_name"),
    )
    return conns.select(line.alias("line"))
