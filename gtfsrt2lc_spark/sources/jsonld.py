"""JSON-LD serialization.

Reference analog: `lib/Connections2JSONLD.js:56-96` — a hardcoded ``@context``
emitted once, then one compacted node per record. Spark text writes cannot
prepend a header inside distributed part files, so the context is written as
a sidecar ``context.jsonld`` (documented divergence; consumers concatenate),
and each triple group becomes one JSON object line (NDJSON-LD).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CONTEXT = {
    "@context": {
        "kg": "http://example.org/kg/ontology#",
        "ent": "http://example.org/kg/entity/",
        "prov": "http://www.w3.org/ns/prov#",
    }
}


def to_jsonld_lines(triples: DataFrame) -> DataFrame:
    """Group triples by subject into one compacted node per line:
    {"@id": subj, "<pred>": [{"@id": obj}, ...], "prov:wasDerivedFrom": graph}
    """
    nodes = (
        triples.groupBy("subj", "pred")
        .agg(F.sort_array(F.collect_set("obj")).alias("objs"), F.min("graph").alias("graph"))
        .groupBy("subj")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct(F.col("pred"), F.col("objs"))))
            ).alias("props"),
            F.min("graph").alias("graph"),
        )
    )
    return nodes.select(
        F.to_json(
            F.struct(
                F.col("subj").alias("@id"),
                F.col("props"),
                F.col("graph").alias("wasDerivedFrom"),
            )
        ).alias("line")
    )


def write_jsonld(triples: DataFrame, path: str, context: dict | None = None) -> None:
    to_jsonld_lines(triples).write.mode("overwrite").text(path)
    with open(os.path.join(path, "context.jsonld"), "w") as f:
        json.dump(context or DEFAULT_CONTEXT, f, sort_keys=True)
