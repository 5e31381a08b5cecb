"""Multimodal plumbing: binary media columns + typed metadata via mapInPandas.

BMP pixel decode is real (pure numpy) and drives the decode -> resize ->
featurize path end-to-end; JPEG/PNG decode sits behind the PIXEL_DECODERS
hook (no imaging libs in the container). Spark-side schema/batching/
expansion shapes asserted throughout.
"""

from __future__ import annotations

import struct

import pytest

from gtfsrt2lc_spark.functions.multimodal import (
    decode_pixels,
    extract_media_meta,
    frame_sample_plan,
    sniff_format,
)


def _png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x08"


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h)


MEDIA = [
    (1, _png(640, 480)),
    (2, _gif(32, 16)),
    (3, b"\xff\xd8\xff\xe0 jpeg-ish"),
    (4, b"RIFF\x00\x00\x00\x00WAVEfmt "),
    (5, b"not media at all"),
    (6, None),
]


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(MEDIA, "id long, media binary")


def test_sniff_format():
    assert sniff_format(_png(1, 1)) == "png"
    assert sniff_format(b"GIF87a\x01\x00\x01\x00") == "gif"
    assert sniff_format(b"\xff\xd8\xff") == "jpeg"
    assert sniff_format(b"junk") == "unknown"
    assert sniff_format(None) is None


def test_extract_media_meta(media_df):
    got = {r["id"]: r["meta"].asDict() for r in extract_media_meta(media_df).collect()}
    assert got[1] == {"format": "png", "width": 640, "height": 480,
                      "n_bytes": len(MEDIA[0][1]), "is_valid": True}
    assert got[2]["format"] == "gif" and got[2]["width"] == 32 and got[2]["height"] == 16
    assert got[3]["format"] == "jpeg" and got[3]["width"] is None
    assert got[4]["format"] == "wav"
    assert got[5] == {"format": "unknown", "width": None, "height": None,
                      "n_bytes": 16, "is_valid": False}
    assert got[6]["is_valid"] is False and got[6]["n_bytes"] == 0


def test_meta_schema_stable(media_df):
    out = extract_media_meta(media_df)
    assert out.schema["meta"].dataType.simpleString() == (
        "struct<format:string,width:int,height:int,n_bytes:bigint,is_valid:boolean>"
    )


def test_frame_sample_expansion(media_df):
    frames = frame_sample_plan(media_df.where("id = 1"), every_n=1)
    rows = frames.collect()
    assert len(rows) >= 1
    assert all(r["frame_idx"] >= 0 for r in rows)
    assert "media" not in frames.columns  # blob dropped after expansion


def test_pixel_decode_png_needs_library():
    # png stays behind the PIXEL_DECODERS hook (no imaging lib in container)
    with pytest.raises(NotImplementedError):
        decode_pixels(b"\x89PNG", "png")


def _bmp(pixels):
    """Build an uncompressed 24-bit BMP from [[(r,g,b), ...], ...] rows."""
    h = len(pixels)
    w = len(pixels[0])
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)  # BGR
        body += line + b"\x00" * (row_bytes - len(line))
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + body


def test_bmp_pixel_decode_exact():
    """BMP decodes for real: exact RGB values, row order, padding handled."""
    px = [[(255, 0, 0), (0, 255, 0), (10, 20, 30)],
          [(0, 0, 255), (1, 2, 3), (4, 5, 6)]]
    arr = decode_pixels(_bmp(px), "bmp")
    assert arr.shape == (2, 3, 3)
    assert [tuple(int(v) for v in arr[y][x]) for y in range(2) for x in range(3)] == [
        (255, 0, 0), (0, 255, 0), (10, 20, 30), (0, 0, 255), (1, 2, 3), (4, 5, 6)
    ]


def test_media_features_end_to_end(spark):
    """Full decode -> resize -> grayscale featurize through mapInPandas;
    undecodable formats yield NULL feature rows, not failures."""
    from gtfsrt2lc_spark.functions.multimodal import media_features

    solid = [[(90, 90, 90)] * 4 for _ in range(4)]  # 4x4 uniform gray
    df = spark.createDataFrame(
        [(1, _bmp(solid)), (2, _png(8, 8)), (3, None)], "id long, media binary"
    )
    rows = {r["id"]: r for r in media_features(df, size=2).collect()}
    assert rows[1]["decodable"] and (rows[1]["width"], rows[1]["height"]) == (4, 4)
    assert rows[1]["feature"] == pytest.approx([90 / 255.0] * 4)
    assert not rows[2]["decodable"] and rows[2]["feature"] is None
    assert not rows[3]["decodable"] and rows[3]["feature"] is None


def test_media_features_degenerate_dimensions(spark):
    """A valid-header BMP with zero width/height marks undecodable instead
    of killing the batch (resize of an empty array would IndexError)."""
    from gtfsrt2lc_spark.functions.multimodal import media_features

    zero_w = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 0, 2, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    df = spark.createDataFrame([(1, zero_w)], "id long, media binary")
    row = media_features(df, size=2).collect()[0]
    assert not row["decodable"] and row["feature"] is None


def test_bmp_rejects_malformed_headers():
    """Negative width / in-header pixel offset must raise, not silently
    decode junk (negative row_bytes would make frombuffer read-all and
    reshape infer dims)."""
    from gtfsrt2lc_spark.functions.multimodal import decode_bmp

    neg_w = (
        b"BM" + struct.pack("<IHHI", 90, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, -2, 3, 1, 24, 0, 36, 0, 0, 0, 0)
        + b"\x00" * 36
    )
    with pytest.raises(ValueError):
        decode_bmp(neg_w)
    bad_offset = (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 10)
        + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 0, 0, 0, 0)
        + b"\x00" * 16
    )
    with pytest.raises(ValueError):
        decode_bmp(bad_offset)


def test_partitioned_batching(spark, media_df):
    """mapInPandas must behave identically across partition layouts."""
    one = {r["id"]: r["meta"]["format"] for r in extract_media_meta(media_df.coalesce(1)).collect()}
    many = {r["id"]: r["meta"]["format"] for r in extract_media_meta(media_df.repartition(5)).collect()}
    assert one == many
