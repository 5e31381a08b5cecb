"""N-Quads / JSON-LD serialization round-trips (ref: Connections2Triples /
Connections2JSONLD output formats, `test/gtfsrt2lc.test.js:267-392`)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from gtfsrt2lc_spark.sources.jsonld import to_jsonld_lines, write_jsonld
from gtfsrt2lc_spark.sources.nquads import read_nquads, to_nquads_lines, write_nquads

TRIPLES = [
    ("http://ex.org/e/A", "http://ex.org/o#p", "http://ex.org/e/B", "http://src/1"),
    ("http://ex.org/e/A", "http://ex.org/o#p", "http://ex.org/e/C", "http://src/2"),
    ("http://ex.org/e/B", "http://ex.org/o#q", 'lit with "quotes" and \\slash', "http://src/3"),
]


def _df(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string, graph string")


def test_nquads_lines(spark):
    lines = sorted(r["line"] for r in to_nquads_lines(_df(spark)).collect())
    assert lines[0] == "<http://ex.org/e/A> <http://ex.org/o#p> <http://ex.org/e/B> <http://src/1> ."
    assert '"lit with \\"quotes\\" and \\\\slash"' in lines[2]


def test_nquads_roundtrip(spark, tmp_path):
    path = str(tmp_path / "nq")
    write_nquads(_df(spark), path)
    back = read_nquads(spark, path)
    got = {(r["subj"], r["pred"], r["obj"], r["graph"]) for r in back.collect()}
    assert got == set(TRIPLES)


def test_ntriples_mode(spark):
    lines = to_nquads_lines(_df(spark), graph=None).collect()
    assert all(r["line"].count("<http://src/") == 0 for r in lines)


def test_jsonld_nodes(spark, tmp_path):
    path = str(tmp_path / "jld")
    write_jsonld(_df(spark), path)
    assert os.path.exists(os.path.join(path, "context.jsonld"))
    nodes = [json.loads(r["line"]) for r in to_jsonld_lines(_df(spark)).collect()]
    by_id = {n["@id"]: n for n in nodes}
    assert set(by_id["http://ex.org/e/A"]["props"]["http://ex.org/o#p"]) == {
        "http://ex.org/e/B",
        "http://ex.org/e/C",
    }


def test_turtle_lines_prefix_compression(spark):
    from gtfsrt2lc_spark.sources.nquads import to_turtle_lines

    rows = [
        ("http://vocab.gtfs.org/terms#trip", "http://semweb.mmlab.be/ns/linkedconnections#departureStop",
         "http://vocab.gtfs.org/terms#Regular", None),
        ("http://ex.org/e/A", "http://semweb.mmlab.be/ns/linkedconnections#departureTime",
         "2019-06-04T09:32:00.000Z", "http://www.w3.org/2001/XMLSchema#dateTime"),
        ("http://ex.org/e/with space", "http://ex.org/o#p", 'say "hi"', None),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string, dt string")
    lines = sorted(r["line"] for r in to_turtle_lines(df, obj_datatype="dt").collect())
    assert "gtfs:trip lc:departureStop gtfs:Regular ." in lines
    assert '"2019-06-04T09:32:00.000Z"^^xsd:dateTime .' in lines[0] or any(
        'xsd:dateTime' in l for l in lines)
    # non-compressible IRI falls back to <...>; literal stays escaped
    assert any(l.startswith("<http://ex.org/e/with space>") for l in lines)
    assert any('"say \\"hi\\""' in l for l in lines)


def test_turtle_write_sidecar(spark, tmp_path):
    from gtfsrt2lc_spark.sources.nquads import write_turtle

    path = str(tmp_path / "ttl")
    write_turtle(_df(spark).drop("graph"), path)
    with open(os.path.join(path, "prefixes.ttl")) as f:
        header = f.read()
    assert "@prefix gtfs: <http://vocab.gtfs.org/terms#> ." in header
    assert "@prefix lc: <http://semweb.mmlab.be/ns/linkedconnections#> ." in header
    assert "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> ." in header


def test_turtle_blocks_group_subjects(spark):
    """Opt-in n3-parity mode: one block per subject, predicate list joined
    with ';', deterministic (sorted) order, golden-exact."""
    from gtfsrt2lc_spark.sources.nquads import to_turtle_blocks

    rows = [
        ("http://vocab.gtfs.org/terms#trip",
         "http://semweb.mmlab.be/ns/linkedconnections#departureStop",
         "http://vocab.gtfs.org/terms#Regular", None),
        ("http://vocab.gtfs.org/terms#trip",
         "http://semweb.mmlab.be/ns/linkedconnections#arrivalStop",
         "http://ex.org/e/B", None),
        ("http://ex.org/e/A",
         "http://semweb.mmlab.be/ns/linkedconnections#departureTime",
         "2019-06-04T09:32:00.000Z", "http://www.w3.org/2001/XMLSchema#dateTime"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string, dt string")
    blocks = sorted(r["line"] for r in to_turtle_blocks(df, obj_datatype="dt").collect())
    assert blocks == [
        '<http://ex.org/e/A> lc:departureTime "2019-06-04T09:32:00.000Z"^^xsd:dateTime .',
        "gtfs:trip lc:arrivalStop <http://ex.org/e/B> ;\n"
        "    lc:departureStop gtfs:Regular .",
    ]


def test_turtle_blocks_equivalent_to_lines(spark):
    """Round-trip: expanding each ';' block back to statements yields exactly
    the statement-per-line output — grouping is cosmetic, never semantic."""
    from gtfsrt2lc_spark.sources.nquads import to_turtle_blocks, to_turtle_lines

    df = _df(spark)
    flat = sorted(r["line"] for r in to_turtle_lines(df).collect())
    expanded = []
    for r in to_turtle_blocks(df).collect():
        block = r["line"]
        assert block.endswith(" .")
        subj, rest = block[:-2].split(" ", 1)
        for po in rest.split(" ;\n    "):
            expanded.append(f"{subj} {po} .")
    assert sorted(expanded) == flat


def test_turtle_write_grouped(spark, tmp_path):
    from gtfsrt2lc_spark.sources.nquads import write_turtle

    path = str(tmp_path / "ttl_grouped")
    write_turtle(_df(spark).drop("graph"), path, group_subjects=True)
    body = ""
    for part in sorted(os.listdir(path)):
        if part.startswith("part-"):
            body += open(os.path.join(path, part)).read()
    assert " ;\n    " in body  # at least one multi-predicate subject grouped
    assert os.path.exists(os.path.join(path, "prefixes.ttl"))
