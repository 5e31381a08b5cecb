"""Minimal GTFS-RT FeedMessage wire-format codec (pure Python, no deps).

Decodes exactly the fields the reference consumes
(`lib/Gtfsrt2LC.js:61-66,80-92,144-147,428-430,539-591`):

  FeedMessage
    1: header  { 1: gtfs_realtime_version, 3: timestamp }
    2: entity[] { 1: id, 2: is_deleted,
                  3: trip_update {
                       1: trip { 1: trip_id, 5: route_id, 6: direction_id,
                                 2: start_time, 3: start_date,
                                 4: schedule_relationship },
                       2: stop_time_update[] {
                            1: stop_sequence, 4: stop_id,
                            2: arrival  { 1: delay, 2: time },
                            3: departure{ 1: delay, 2: time },
                            5: schedule_relationship },
                       4: timestamp } }

Field numbers follow the published gtfs-realtime.proto. The decoder is a
plain varint/length-delimited wire parser — deterministic, total (malformed
input yields an empty message rather than a crash), and exercised through an
Arrow ``mapInPandas`` stage like every other binary payload in this engine.

An encoder for the same subset lives here too, used by the fixture generator
to produce real binary feeds for tests (mirror of the reference's recorded
`test/data/*.pb` fixtures).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while pos < len(buf):
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            break
    raise ValueError("truncated varint")


def _write_varint(value: int) -> bytes:
    out = bytearray()
    if value < 0:
        value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for one message body."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # fixed64
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _signed32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_event(buf: bytes) -> dict:
    out = {"delay": None, "time": None}
    for f, _wt, v in _iter_fields(buf):
        if f == 1:
            out["delay"] = _signed32(v)
        elif f == 2:
            out["time"] = v
    return out


def _decode_stu(buf: bytes) -> dict:
    out = {
        "stop_sequence": None, "stop_id": None,
        "arrival_delay": None, "arrival_time": None,
        "departure_delay": None, "departure_time": None,
        "schedule_relationship": None,
    }
    for f, _wt, v in _iter_fields(buf):
        if f == 1:
            out["stop_sequence"] = v
        elif f == 4:
            out["stop_id"] = v.decode("utf-8", "replace")
        elif f == 2:
            ev = _decode_event(v)
            out["arrival_delay"], out["arrival_time"] = ev["delay"], ev["time"]
        elif f == 3:
            ev = _decode_event(v)
            out["departure_delay"], out["departure_time"] = ev["delay"], ev["time"]
        elif f == 5:
            out["schedule_relationship"] = v
    return out


def _decode_trip(buf: bytes) -> dict:
    out = {
        "trip_id": None, "route_id": None, "direction_id": None,
        "start_time": None, "start_date": None, "schedule_relationship": None,
    }
    for f, _wt, v in _iter_fields(buf):
        if f == 1:
            out["trip_id"] = v.decode("utf-8", "replace")
        elif f == 5:
            out["route_id"] = v.decode("utf-8", "replace")
        elif f == 6:
            out["direction_id"] = v
        elif f == 2:
            out["start_time"] = v.decode("utf-8", "replace")
        elif f == 3:
            out["start_date"] = v.decode("utf-8", "replace")
        elif f == 4:
            out["schedule_relationship"] = v
    return out


def _decode_trip_update(buf: bytes) -> dict:
    out = {"trip": None, "stop_time_updates": [], "timestamp": None}
    for f, _wt, v in _iter_fields(buf):
        if f == 1:
            out["trip"] = _decode_trip(v)
        elif f == 2:
            out["stop_time_updates"].append(_decode_stu(v))
        elif f == 4:
            out["timestamp"] = v
    return out


def decode_feed(data: bytes | None) -> dict:
    """FeedMessage bytes -> {header_ts, entities:[...]}. Total function:
    malformed input -> empty feed (the engine's P2-style silent skip).

    Gzipped payloads (feed files stored compressed, or a pre-decompression
    HTTP body) are sniffed by magic and gunzipped first — S2's file half
    (lib/Gtfsrt2LC.js:298-320 handles the HTTP half). Safe sniff: 0x1f 0x8b
    as a FeedMessage would be field 3 wiretype 7, which protobuf reserves."""
    out = {"header_ts": None, "entities": []}
    if not data:
        return out
    if data[:2] == b"\x1f\x8b":
        import gzip
        import zlib

        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            # truncated body raises EOFError, bit-flipped data zlib.error —
            # neither subclasses OSError; all three mean malformed input
            return out
    try:
        for f, _wt, v in _iter_fields(data):
            if f == 1:
                for hf, _hwt, hv in _iter_fields(v):
                    if hf == 3:
                        out["header_ts"] = hv
            elif f == 2:
                ent = {"entity_id": None, "is_deleted": False, "trip_update": None}
                for ef, _ewt, ev in _iter_fields(v):
                    if ef == 1:
                        ent["entity_id"] = ev.decode("utf-8", "replace")
                    elif ef == 2:
                        ent["is_deleted"] = bool(ev)
                    elif ef == 3:
                        ent["trip_update"] = _decode_trip_update(ev)
                out["entities"].append(ent)
    except (ValueError, IndexError, TypeError, AttributeError):
        # wire-type-mismatched or truncated garbage: a field decoded as the
        # wrong primitive (int where a submessage/string was expected)
        # surfaces as TypeError/AttributeError in the nested decoders —
        # same malformed-input contract as a bad varint
        return {"header_ts": None, "entities": []}
    return out


# ---------------------------------------------------------------------------
# encode (fixtures only)
# ---------------------------------------------------------------------------


def _field(num: int, wt: int, payload: bytes) -> bytes:
    return _write_varint((num << 3) | wt) + payload


def _len_field(num: int, body: bytes) -> bytes:
    return _field(num, 2, _write_varint(len(body)) + body)


def _varint_field(num: int, v: int) -> bytes:
    return _field(num, 0, _write_varint(v))


def _encode_event(delay: int | None, time: int | None) -> bytes:
    body = b""
    if delay is not None:
        body += _varint_field(1, delay)
    if time is not None:
        body += _varint_field(2, time)
    return body


def encode_feed(header_ts: int | None, entities: list[dict]) -> bytes:
    """Inverse of decode_feed for the supported subset (fixture generator)."""
    out = _len_field(1, _len_field(1, b"2.0") + (_varint_field(3, header_ts) if header_ts else b""))
    for ent in entities:
        body = _len_field(1, (ent.get("entity_id") or "").encode())
        if ent.get("is_deleted"):
            body += _varint_field(2, 1)
        tu = ent.get("trip_update")
        if tu:
            tu_body = b""
            trip = tu.get("trip") or {}
            trip_body = b""
            if trip.get("trip_id") is not None:
                trip_body += _len_field(1, trip["trip_id"].encode())
            if trip.get("start_time") is not None:
                trip_body += _len_field(2, trip["start_time"].encode())
            if trip.get("start_date") is not None:
                trip_body += _len_field(3, trip["start_date"].encode())
            if trip.get("schedule_relationship") is not None:
                trip_body += _varint_field(4, trip["schedule_relationship"])
            if trip.get("route_id") is not None:
                trip_body += _len_field(5, trip["route_id"].encode())
            if trip.get("direction_id") is not None:
                trip_body += _varint_field(6, trip["direction_id"])
            tu_body += _len_field(1, trip_body)
            for stu in tu.get("stop_time_updates", []):
                s = b""
                if stu.get("stop_sequence") is not None:
                    s += _varint_field(1, stu["stop_sequence"])
                if stu.get("arrival_delay") is not None or stu.get("arrival_time") is not None:
                    s += _len_field(2, _encode_event(stu.get("arrival_delay"), stu.get("arrival_time")))
                if stu.get("departure_delay") is not None or stu.get("departure_time") is not None:
                    s += _len_field(3, _encode_event(stu.get("departure_delay"), stu.get("departure_time")))
                if stu.get("stop_id") is not None:
                    s += _len_field(4, stu["stop_id"].encode())
                if stu.get("schedule_relationship") is not None:
                    s += _varint_field(5, stu["schedule_relationship"])
                tu_body += _len_field(2, s)
            if tu.get("timestamp") is not None:
                tu_body += _varint_field(4, tu["timestamp"])
            body += _len_field(3, tu_body)
        out += _len_field(2, body)
    return out


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------

UPDATES_SCHEMA = (
    "entity_id string, is_deleted boolean, trip_id string, route_id string, "
    "direction_id int, start_time string, start_date string, "
    "trip_schedule_relationship int, update_ts bigint, header_ts bigint, "
    "stop_time_updates array<struct<"
    "stop_sequence:int, stop_id:string, arrival_delay:int, arrival_time:bigint, "
    "departure_delay:int, departure_time:bigint, schedule_relationship:int>>"
)


def decode_feed_df(feeds: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary FeedMessage column -> one row per entity with tripUpdate
    (ref S3 + P1/P2: decode, keep only entities with a trip_update).

    Arrow mapInPandas: the binary decode is the sanctioned Python stage,
    1:N batch expansion (one feed -> many entities)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "entity_id", "is_deleted", "trip_id", "route_id", "direction_id",
            "start_time", "start_date", "trip_schedule_relationship",
            "update_ts", "header_ts", "stop_time_updates",
        ]
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                feed = decode_feed(bytes(payload) if payload is not None else None)
                for ent in feed["entities"]:
                    tu = ent.get("trip_update")
                    if not tu:  # P2 entity filter (ref lib/Gtfsrt2LC.js:80)
                        continue
                    trip = tu.get("trip") or {}
                    rows.append(
                        (
                            ent["entity_id"],
                            bool(ent["is_deleted"]),
                            trip.get("trip_id"),
                            trip.get("route_id"),
                            trip.get("direction_id"),
                            trip.get("start_time"),
                            trip.get("start_date"),
                            trip.get("schedule_relationship"),
                            tu.get("timestamp"),
                            feed["header_ts"],
                            [
                                (
                                    s["stop_sequence"], s["stop_id"],
                                    s["arrival_delay"], s["arrival_time"],
                                    s["departure_delay"], s["departure_time"],
                                    s["schedule_relationship"],
                                )
                                for s in tu.get("stop_time_updates", [])
                            ],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return feeds.mapInPandas(op, schema=UPDATES_SCHEMA)
