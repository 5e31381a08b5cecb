"""Synthetic GTFS static bundle + binary GTFS-RT feeds with golden counts.

Mirrors the reference's recorded fixtures (`test/data/`, FIXTURES.md) in
miniature: trips of 13/4/19 stops with partial updates must yield exactly
12/3/17 connections (ref `test/gtfsrt2lc.test.js:420-422`), a cancelled
10-stop trip yields 9 CancelledConnections (ref :515), a no-start-date feed
exercises findTripStartDate, and a tripId-less feed exercises deduction —
including the +24h rollover quirk (ref lib/Gtfsrt2LC.js:354-359).

Everything is deterministic; RT feeds are real protobuf wire bytes produced
by functions/gtfsrt_proto.encode_feed.
"""

from __future__ import annotations

from gtfsrt2lc_spark.functions.gtfsrt_proto import encode_feed

SERVICE_DAY = "20240115"  # a Monday
HEADER_TS = 1705305600  # 2024-01-15T08:00:00Z
DAY0 = 1705276800  # 2024-01-15T00:00:00Z


def _hms(total_minutes: int) -> str:
    h, m = divmod(total_minutes, 60)
    return f"{h:02d}:{m:02d}:00"


def _stop_times(trip_id: str, n: int, start_min: int, spacing: int = 5):
    rows = []
    for i in range(1, n + 1):
        t = start_min + (i - 1) * spacing
        rows.append(
            {
                "trip_id": trip_id,
                "stop_sequence": str(i),
                "stop_id": f"S{i:02d}",
                "arrival_time": _hms(t),
                "departure_time": _hms(t + 1),
                "pickup_type": "0",
                "drop_off_type": "0",
            }
        )
    return rows


def static_tables() -> dict[str, list[dict]]:
    stops = [
        {
            "stop_id": f"S{i:02d}",
            "stop_code": f"C{i:02d}" if i % 3 else "",
            "stop_name": f"Station {i}",
            "stop_lat": str(50.0 + i * 0.01),
            "stop_lon": str(4.0 + i * 0.01),
        }
        for i in range(1, 26)
    ]
    routes = [
        {"route_id": "R1", "route_short_name": "IC1",
         "route_long_name": "Airport Express Line", "route_type": "2"},
        {"route_id": "R2", "route_short_name": "L2",
         "route_long_name": "Coastal Local", "route_type": "2"},
        {"route_id": "R3", "route_short_name": "IC3",
         "route_long_name": "Mountain Crossing", "route_type": "2"},
        {"route_id": "R4", "route_short_name": "N4",
         "route_long_name": "Night Owl", "route_type": "3"},
    ]
    trips = [
        {"route_id": "R1", "service_id": "WK", "trip_id": "T13",
         "trip_headsign": "City A", "trip_short_name": "7701", "direction_id": "0"},
        {"route_id": "R2", "service_id": "WK", "trip_id": "T04",
         "trip_headsign": "Beach", "trip_short_name": "7702", "direction_id": "0"},
        {"route_id": "R3", "service_id": "WK", "trip_id": "T19",
         "trip_headsign": "Summit", "trip_short_name": "7703", "direction_id": "1"},
        {"route_id": "R1", "service_id": "WK", "trip_id": "TC10",
         "trip_headsign": "City A", "trip_short_name": "7704", "direction_id": "0"},
        # deduction decoys/targets: same route+direction, different start time
        {"route_id": "R1", "service_id": "WK", "trip_id": "T13B",
         "trip_headsign": "City A", "trip_short_name": "7705", "direction_id": "0"},
        # rollover trip: first departure 25:10 (service-day rollover)
        {"route_id": "R4", "service_id": "WK", "trip_id": "T25",
         "trip_headsign": "Owl", "trip_short_name": "7706", "direction_id": "0"},
        # weekend-only decoy for calendar filtering
        {"route_id": "R1", "service_id": "WE", "trip_id": "T13W",
         "trip_headsign": "City A", "trip_short_name": "7707", "direction_id": "0"},
    ]
    stop_times = (
        _stop_times("T13", 13, 8 * 60)
        + _stop_times("T04", 4, 9 * 60)
        + _stop_times("T19", 19, 10 * 60)
        + _stop_times("TC10", 10, 11 * 60)
        + _stop_times("T13B", 13, 12 * 60)
        + _stop_times("T13W", 13, 8 * 60)  # same 08:00 start as T13, WE service
        + [
            {"trip_id": "T25", "stop_sequence": str(i), "stop_id": f"S{i:02d}",
             "arrival_time": f"{25 + (i - 1)}:10:00",
             "departure_time": f"{25 + (i - 1)}:11:00",
             "pickup_type": "0", "drop_off_type": "0"}
            for i in range(1, 4)
        ]
    )
    calendar = [
        {"service_id": "WK", "monday": "1", "tuesday": "1", "wednesday": "1",
         "thursday": "1", "friday": "1", "saturday": "0", "sunday": "0",
         "start_date": "20240101", "end_date": "20241231"},
        {"service_id": "WE", "monday": "0", "tuesday": "0", "wednesday": "0",
         "thursday": "0", "friday": "0", "saturday": "1", "sunday": "1",
         "start_date": "20240101", "end_date": "20241231"},
    ]
    calendar_dates = [
        # WK removed on Jan 16; WE added on Jan 15 (exception paths)
        {"service_id": "WK", "date": "20240116", "exception_type": "2"},
        {"service_id": "WE", "date": "20240115", "exception_type": "1"},
    ]
    return {
        "stops": stops, "routes": routes, "trips": trips,
        "stop_times": stop_times, "calendar": calendar,
        "calendar_dates": calendar_dates,
    }


def _stu(seq=None, stop=None, ad=None, at=None, dd=None, dt=None, rel=None):
    return {
        "stop_sequence": seq, "stop_id": stop,
        "arrival_delay": ad, "arrival_time": at,
        "departure_delay": dd, "departure_time": dt,
        "schedule_relationship": rel,
    }


def gap_feed() -> bytes:
    """Golden: exactly 12 + 3 + 17 connections (ref :420-422 analog)."""
    entities = [
        # T13: update at first stop -> all 13 stops complete -> 12 connections
        {"entity_id": "e-t13", "trip_update": {
            "trip": {"trip_id": "T13", "start_date": SERVICE_DAY, "start_time": "08:01:00"},
            "timestamp": HEADER_TS,
            "stop_time_updates": [
                _stu(seq=1, dd=120),                      # delay-only (W5 derives time)
                _stu(seq=5, dd=300, dt=DAY0 + 8 * 3600 + 21 * 60 + 300),
            ],
        }},
        # T04: arrival-only update at stop 2 -> W3 synthesizes stop 1 ->
        # 4 stops complete -> 3 connections
        {"entity_id": "e-t04", "trip_update": {
            "trip": {"trip_id": "T04", "start_date": SERVICE_DAY},
            "stop_time_updates": [_stu(seq=2, ad=60)],
        }},
        # T19: first update at stop 3 (arrival+departure) -> W3 adds stop 2 ->
        # 18 stops complete -> 17 connections; includes an unknown live stop
        # (P6 skip) and a v2.0-style stopId-less update
        {"entity_id": "e-t19", "trip_update": {
            "trip": {"trip_id": "T19", "start_date": SERVICE_DAY},
            "timestamp": HEADER_TS + 60,
            "stop_time_updates": [
                _stu(seq=3, ad=90, dd=90),
                _stu(stop="SXX", ad=10),                  # unknown stop -> skipped
                _stu(seq=10, dd=None, dt=DAY0 + 10 * 3600 + 46 * 60 + 180),  # time-only (W4)
            ],
        }},
        # entity without tripUpdate -> filtered (P2)
        {"entity_id": "e-empty"},
        # trip unknown to static data -> silently dropped (P3)
        {"entity_id": "e-ghost", "trip_update": {
            "trip": {"trip_id": "GHOST", "start_date": SERVICE_DAY},
            "stop_time_updates": [_stu(seq=1, dd=5)],
        }},
    ]
    return encode_feed(HEADER_TS, entities)


GOLDEN_GAP_COUNTS = {"T13": 12, "T04": 3, "T19": 17}


def cancellation_feed() -> bytes:
    """Golden: exactly 9 CancelledConnections (ref :515 analog)."""
    entities = [
        {"entity_id": "e-c1", "trip_update": {
            "trip": {"trip_id": "TC10", "start_date": SERVICE_DAY,
                     "schedule_relationship": 3},
            "stop_time_updates": [_stu(seq=1, dd=0)],
        }},
    ]
    return encode_feed(HEADER_TS, entities)


GOLDEN_CANCELLED = 9


def no_start_date_feed() -> bytes:
    """findTripStartDate path (ref :396-425; bustang analog)."""
    entities = [
        {"entity_id": "e-nsd", "trip_update": {
            "trip": {"trip_id": "T13"},
            "stop_time_updates": [_stu(seq=1, dd=30)],
        }},
    ]
    return encode_feed(HEADER_TS, entities)


def deduce_feed() -> bytes:
    """tripId-less updates (ref :323-394): route+direction+startTime+calendar.

    e-d1 -> T13 (weekday service; the WE decoy T13W shares the 08:01 start
    but doesn't run on a Monday). e-d2 -> T25 via the +24h rollover
    (01:11 start vs static 25:11)."""
    entities = [
        {"entity_id": "e-d1", "trip_update": {
            "trip": {"route_id": "R1", "direction_id": 0,
                     "start_time": "08:01:00", "start_date": SERVICE_DAY},
            "stop_time_updates": [_stu(seq=1, dd=45)],
        }},
        {"entity_id": "e-d2", "trip_update": {
            "trip": {"route_id": "R4", "direction_id": 0,
                     "start_time": "01:11:00", "start_date": SERVICE_DAY},
            "stop_time_updates": [_stu(seq=1, dd=15)],
        }},
    ]
    return encode_feed(HEADER_TS, entities)


def spark_static(spark):
    """Static tables as string-typed DataFrames (CSV-shaped)."""
    t = static_tables()
    out = {}
    for name, rows in t.items():
        cols = list(rows[0].keys())
        out[name] = spark.createDataFrame(
            [tuple(r[c] for c in cols) for r in rows],
            ", ".join(f"{c} string" for c in cols),
        )
    return out


def spark_feed(spark, payload: bytes):
    return spark.createDataFrame([(payload,)], "payload binary")
