"""Multimodal column operators: images/audio/video as opaque binary + metadata.

A training-data pipeline at corpus scale treats media as ``binary`` columns
with typed metadata structs. The Spark-side plumbing here is real and tested —
schemas, Arrow batch shapes, ``mapInPandas`` partition iteration, partition
sizing. Pixel decode is REAL for uncompressed 24-bit BMP (pure
struct + numpy, dependency-free), driving the full decode -> resize ->
grayscale-feature path end-to-end; JPEG/PNG/audio codecs need imaging
libraries absent from this container and sit behind the same
``PIXEL_DECODERS`` hook (register a PIL/opencv-backed callable to
activate — the surrounding Spark plumbing is identical). Header-only
metadata (format sniff, PNG/GIF/BMP dimensions) is dependency-free for all
formats.

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


def decode_bmp(data: bytes):
    """REAL pixel decode for uncompressed 24-bit BMP — dependency-free
    (pure struct + numpy), deterministic. Returns an (h, w, 3) uint8 RGB
    array. BMP stores rows bottom-up, BGR, each row padded to 4 bytes."""
    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    if w <= 0 or pixel_offset < 54:
        # negative width would make row_bytes negative (frombuffer would
        # read-all and reshape would infer dims — garbage decoded silently);
        # a pixel offset inside the header would decode header bytes as pixels
        raise ValueError(f"malformed BMP header (width={w}, offset={pixel_offset})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = pixel_offset + row_bytes * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pixel_offset)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(arr, out_w: int, out_h: int):
    """Deterministic nearest-neighbor resize (numpy index sampling)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def decode_pixels(data: bytes, fmt: str):
    """Full pixel decode. BMP decodes for real (pure numpy); other formats
    need an imaging library not present in this container — the Spark
    plumbing around them (schema, batching) is identical, so registering a
    PIL/opencv-backed callable in PIXEL_DECODERS activates them."""
    dec = PIXEL_DECODERS.get(fmt)
    if dec is None:
        raise NotImplementedError(
            f"pixel decode for {fmt!r} requires an imaging library "
            "(PIL/opencv); register one in PIXEL_DECODERS"
        )
    return dec(data)


# hook points:
#   MEDIA_DECODERS: format -> callable(bytes) -> (width, height)   (metadata)
#   PIXEL_DECODERS: format -> callable(bytes) -> ndarray (h, w, 3) (pixels)
MEDIA_DECODERS: dict[str, Callable[[bytes], tuple[int, int]]] = {}
PIXEL_DECODERS: dict[str, Callable[[bytes], object]] = {"bmp": decode_bmp}


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


def media_features(
    df: DataFrame, media_col: str = "media", size: int = 8
) -> DataFrame:
    """Decode -> nearest-neighbor resize to size x size -> grayscale feature
    vector (row-major, /255), the standard image-embedding pre-processing
    shape, end-to-end through Arrow mapInPandas. Formats without a
    registered PIXEL_DECODERS entry (e.g. jpeg/png in this container) yield
    a NULL feature and decodable=false rather than failing the batch —
    corpus-scale jobs must tolerate undecodable blobs.

    Output: input columns + (width int, height int, decodable boolean,
    feature array<float> of size*size grayscale values)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", width int, height int, decodable boolean, feature array<float>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, oks, feats = [], [], [], []
            for data in pdf[media_col]:
                b = bytes(data) if data is not None else None
                fmt = sniff_format(b)
                dec = PIXEL_DECODERS.get(fmt) if fmt else None
                if b is None or dec is None:
                    widths.append(None); heights.append(None)
                    oks.append(False); feats.append(None)
                    continue
                try:
                    arr = dec(b)
                except (ValueError, NotImplementedError):
                    widths.append(None); heights.append(None)
                    oks.append(False); feats.append(None)
                    continue
                h, w = arr.shape[:2]
                if h == 0 or w == 0:  # degenerate-but-valid header (0-dim)
                    widths.append(None); heights.append(None)
                    oks.append(False); feats.append(None)
                    continue
                small = resize_nearest(arr, size, size).astype("float64")
                gray = (small[:, :, 0] + small[:, :, 1] + small[:, :, 2]) / (3.0 * 255.0)
                widths.append(w); heights.append(h); oks.append(True)
                feats.append(gray.reshape(-1).tolist())
            yield pdf.assign(width=widths, height=heights, decodable=oks, feature=feats)

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
