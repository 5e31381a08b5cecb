"""Reference-scale GTFS benchmark (single-node throughput parity evidence).

The reference's only quantitative performance artifact is its CI budget: the
full jest suite — dominated by converting a 209-entity GTFS-RT feed against
the NMBS static bundle (19,704 trips / 283,628 stop_times) through MemStore,
MemStore+grep and LevelStore — must finish in < 180 s
(/root/reference/test/gtfsrt2lc.test.js:34, package.json:13). The reference
itself cannot be executed here (its npm deps are not vendored and the sandbox
has no network), so this script synthesizes a deterministic same-scale bundle
and times OUR full CLI conversion (CSV static read -> index build -> decode ->
repair -> pairing -> 12-quad explode -> N-Triples write) at the same shape.

Usage: python scripts/bench_gtfs_scale.py [workdir]
Prints one JSON line with per-mode wall seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRIPS = 19_704
N_STOPS = 2_600
N_ROUTES = 1_000
N_ENTITIES = 209
SERVICE = "WK"


def synthesize(spark, root: str) -> None:
    """Deterministic NMBS-shaped bundle, generated distributed (no RNG)."""
    from pyspark.sql import functions as F

    static_dir = os.path.join(root, "static")
    os.makedirs(static_dir, exist_ok=True)

    def write_csv(df, name: str) -> None:
        tmp = os.path.join(root, f"_{name}")
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        shutil.move(os.path.join(tmp, part), os.path.join(static_dir, f"{name}.txt"))
        shutil.rmtree(tmp, ignore_errors=True)

    stops = spark.range(1, N_STOPS + 1).select(
        F.format_string("S%04d", "id").alias("stop_id"),
        F.format_string("C%04d", "id").alias("stop_code"),
        F.format_string("Station %d", "id").alias("stop_name"),
        (F.lit(50.0) + F.col("id") / 1000.0).cast("string").alias("stop_lat"),
        (F.lit(4.0) + F.col("id") / 1000.0).cast("string").alias("stop_lon"),
    )
    write_csv(stops, "stops")

    routes = spark.range(1, N_ROUTES + 1).select(
        F.format_string("R%04d", "id").alias("route_id"),
        F.format_string("IC%d", "id").alias("route_short_name"),
        F.format_string("Intercity Line %d", "id").alias("route_long_name"),
        F.lit("2").alias("route_type"),
    )
    write_csv(routes, "routes")

    trips = spark.range(0, N_TRIPS).select(
        F.col("id").alias("i"),
        F.format_string("R%04d", (F.col("id") % N_ROUTES) + 1).alias("route_id"),
        F.lit(SERVICE).alias("service_id"),
        F.format_string("T%05d", "id").alias("trip_id"),
        F.format_string("City %d", F.col("id") % 40).alias("trip_headsign"),
        F.format_string("%d", 7000 + F.col("id") % 999).alias("trip_short_name"),
        (F.col("id") % 2).cast("string").alias("direction_id"),
    )
    write_csv(trips.drop("i"), "trips")

    # ~283k stop_times: 8-20 stops per trip (deterministic), 3-min spacing,
    # hours may exceed 23 for late trips (exercises F1 duration parsing)
    n_st = (F.col("i") * 7 % 13 + 8).cast("int")
    base_min = (F.col("i") * 11 % (26 * 60)).cast("int")  # up to 26:00
    st = (
        trips.select("i", "trip_id", F.explode(F.sequence(F.lit(1), n_st)).alias("seq"),
                     base_min.alias("base_min"))
        .withColumn("dep_min", F.col("base_min") + F.col("seq") * 3)
        .select(
            "trip_id",
            F.format_string(
                "%02d:%02d:00",
                ((F.col("dep_min") - 1) / 60).cast("int"),
                (F.col("dep_min") - 1) % 60,
            ).alias("arrival_time"),
            F.format_string(
                "%02d:%02d:00",
                (F.col("dep_min") / 60).cast("int"),
                F.col("dep_min") % 60,
            ).alias("departure_time"),
            F.col("seq").cast("string").alias("stop_sequence"),
            F.format_string(
                "S%04d",
                (F.xxhash64("trip_id") + F.col("seq") * 17) % N_STOPS
                + ((F.xxhash64("trip_id") + F.col("seq") * 17) % N_STOPS < 0).cast("int") * N_STOPS
                + 1,
            ).alias("stop_id"),
            F.lit("0").alias("pickup_type"),
            F.lit("0").alias("drop_off_type"),
        )
    )
    write_csv(st, "stop_times")

    cal = spark.createDataFrame(
        [(SERVICE, "1", "1", "1", "1", "1", "1", "1", "20240101", "20241231")],
        "service_id string, monday string, tuesday string, wednesday string, "
        "thursday string, friday string, saturday string, sunday string, "
        "start_date string, end_date string",
    )
    write_csv(cal, "calendar")

    # 209-entity RT feed over evenly-spaced trips, 1-5 stop updates each
    from gtfsrt2lc_spark.functions.gtfsrt_proto import encode_feed

    entities = []
    for k in range(N_ENTITIES):
        i = (k * 94) % N_TRIPS
        base = (i * 11) % (26 * 60)
        start = f"{base // 60:02d}:{base % 60:02d}:00"
        n_upd = k % 5 + 1
        stus = [
            {
                "stop_sequence": 2 + j * 2,
                "departure_delay": 60 * ((k + j) % 10),
                "arrival_delay": 60 * ((k + j) % 10),
            }
            for j in range(n_upd)
        ]
        entities.append(
            {
                "entity_id": str(k),
                "trip_update": {
                    "trip": {
                        "trip_id": f"T{i:05d}",
                        "start_date": "20240115",
                        "start_time": start,
                    },
                    "stop_time_updates": stus,
                    "timestamp": 1705312800,
                },
            }
        )
    with open(os.path.join(root, "feed.pb"), "wb") as f:
        f.write(encode_feed(1705312800, entities))


def main() -> None:
    from gtfsrt2lc_spark.cli import main as cli_main
    from gtfsrt2lc_spark.session import get_spark

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="gtfs_scale_")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="gtfs_scale_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    t0 = time.monotonic()
    synthesize(spark, root)
    synth_s = round(time.monotonic() - t0, 1)

    results: dict[str, float] = {}
    for tag, extra in {
        "memstore": [],
        "grep": ["-g"],
        "levelstore": ["-S", "LevelStore"],
    }.items():
        out = os.path.join(root, f"out_{tag}")
        t0 = time.monotonic()
        cli_main(
            ["rt2lc", "-r", os.path.join(root, "feed.pb"),
             "-s", os.path.join(root, "static"),
             "-o", out, "-f", "ntriples", *extra],
            spark=spark,
        )
        results[tag] = round(time.monotonic() - t0, 2)
        n_lines = sum(
            sum(1 for _ in open(os.path.join(out, p)))
            for p in os.listdir(out) if p.startswith("part-")
        )
        results[f"{tag}_triples"] = n_lines

    print(json.dumps({
        "bench": "gtfs_reference_scale",
        "shape": {"trips": N_TRIPS, "stops": N_STOPS, "routes": N_ROUTES,
                  "rt_entities": N_ENTITIES},
        "synthesize_s_untimed": synth_s,
        "reference_budget_s": 180.0,
        "results": results,
    }))


if __name__ == "__main__":
    main()
