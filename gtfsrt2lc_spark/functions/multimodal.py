"""Multimodal column operators: images/audio/video as opaque binary + metadata.

A training-data pipeline at corpus scale treats media as ``binary`` columns
with typed metadata structs. The Spark-side plumbing here is real and tested —
schemas, Arrow batch shapes, ``mapInPandas`` partition iteration, partition
sizing — while the codec work (actual JPEG/PNG/audio decode) is stubbed
behind ``MEDIA_DECODERS``: the container image has no imaging libraries, so
the default decoder is a deterministic header parser for the formats'
magic-byte layouts (real enough to extract width/height for PNG/GIF/BMP and
format tags elsewhere), and a hook point accepts a real decoder when the
dependency exists.

Reference analog: the undecoded protobuf payload (`lib/Gtfsrt2LC.js:61-66`) —
binary in, typed struct out, never row-at-a-time Python.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_STRUCT = (
    "struct<format:string,width:int,height:int,n_bytes:bigint,is_valid:boolean>"
)


def sniff_format(data: bytes | None) -> str | None:
    if not data:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"OggS":
        return "ogg"
    if data[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def parse_dimensions(data: bytes, fmt: str) -> tuple[int | None, int | None]:
    """Header-only dimension extraction — deterministic, dependency-free."""
    try:
        if fmt == "png" and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
            return int(w), int(h)
        if fmt == "gif" and len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
            return int(w), int(h)
        if fmt == "bmp" and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            return int(w), int(abs(h))
    except struct.error:
        pass
    return None, None


def decode_pixels(data: bytes, fmt: str):
    """Full pixel decode — requires an imaging library not present in this
    container. The Spark plumbing around it (schema, batching) is real;
    plug a decoder into MEDIA_DECODERS to activate."""
    raise NotImplementedError(
        "pixel decode requires an imaging library (PIL/opencv); "
        "register one in MEDIA_DECODERS"
    )


# hook point: format -> callable(bytes) -> (width, height)
MEDIA_DECODERS: dict[str, Callable[[bytes], tuple[int, int]]] = {}


def extract_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Append a typed metadata struct per media blob via mapInPandas.

    Arrow-batched: each partition iterates pandas batches; per-element work
    is header sniffing (O(1) per blob regardless of size)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", meta {MEDIA_META_STRUCT}"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for data in pdf[media_col]:
                b = bytes(data) if data is not None else None
                fmt = sniff_format(b)
                if b is None or fmt is None:
                    metas.append(
                        {"format": None, "width": None, "height": None,
                         "n_bytes": 0, "is_valid": False}
                    )
                    continue
                if fmt in MEDIA_DECODERS:
                    w, h = MEDIA_DECODERS[fmt](b)
                else:
                    w, h = parse_dimensions(b, fmt)
                metas.append(
                    {"format": fmt, "width": w, "height": h,
                     "n_bytes": len(b), "is_valid": fmt != "unknown"}
                )
            yield pdf.assign(meta=metas)

    return df.mapInPandas(op, schema=out_schema)


def frame_sample_plan(df: DataFrame, media_col: str = "media", every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    based on metadata (frame extraction itself is the stubbed decode).
    Demonstrates the 1:N mapInPandas expansion shape used at scale."""
    with_meta = extract_media_meta(df, media_col)
    # without a real container parser, assume a deterministic nominal frame
    # count derived from blob size (documented stub; replace with decoder)
    n_frames = (F.col("meta.n_bytes") / F.lit(1024)).cast("int") + 1
    return (
        with_meta.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))))
        .drop(media_col)
    )
