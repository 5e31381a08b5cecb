"""Multimodal plumbing: binary media columns + typed metadata via mapInPandas.

Codec decode is stubbed (no imaging libs in the container); the Spark-side
schema/batching/expansion shapes are real and asserted here.
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


def test_pixel_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_pixels(b"\x89PNG", "png")


def test_partitioned_batching(spark, media_df):
    """mapInPandas must behave identically across partition layouts."""
    one = {r["id"]: r["meta"]["format"] for r in extract_media_meta(media_df.coalesce(1)).collect()}
    many = {r["id"]: r["meta"]["format"] for r in extract_media_meta(media_df.repartition(5)).collect()}
    assert one == many
