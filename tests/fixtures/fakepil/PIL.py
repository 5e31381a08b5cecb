"""Deterministic PIL test double (CI has no Pillow; pip install is banned).

Implements exactly the Pillow surface `_decode_jpeg_pillow` touches —
``Image.open(fileobj)`` -> context manager -> ``.convert("RGB")`` ->
``np.asarray(...)`` — so the OPTIONAL-Pillow jpeg path and the Arrow
plumbing behind it execute for real in this container. Shipped to Spark
python workers via ``sc.addPyFile`` by tests/test_multimodal.py.

The fake only "decodes" blobs carrying the FAKEPIL0 magic after a real JPEG
SOI marker (so sniff_format classifies them as jpeg); anything else raises
ValueError, keeping every other jpeg blob on the decodable=false path — the
double cannot mask a behavior change for real data.

Fixture layout (little-endian, after the 4-byte SOI/APP0 prefix):
    bytes 4-12   b"FAKEPIL0"
    bytes 12-17  <HHBBB>  width, height, r, g, b   (solid-color image)
"""

import struct

import numpy as np

_MAGIC = b"FAKEPIL0"


class _FakeImage:
    def __init__(self, w: int, h: int, rgb: tuple[int, int, int]):
        self._arr = np.full((h, w, 3), rgb, dtype=np.uint8)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def convert(self, mode: str):
        assert mode == "RGB"
        return self

    def __array__(self, dtype=None, copy=None):
        return self._arr if dtype is None else self._arr.astype(dtype)


class Image:
    @staticmethod
    def open(fp):
        data = fp.read()
        if data[4:12] != _MAGIC:
            raise ValueError("fake PIL decodes only FAKEPIL0 fixtures")
        w, h, r, g, b = struct.unpack("<HHBBB", data[12:19])
        return _FakeImage(w, h, (r, g, b))


def make_fixture(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Bytes that sniff as jpeg (SOI+APP0 prefix) and decode via this fake."""
    return b"\xff\xd8\xff\xe0" + _MAGIC + struct.pack("<HHBBB", w, h, *rgb)
