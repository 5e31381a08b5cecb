"""Driver-side HTTP(S) ingestion for feeds and static GTFS (ref S1/S2/S4).

Parity target: the reference fetches the GTFS-RT feed with custom headers and
up to 10 redirects (lib/Gtfsrt2LC.js:270-291), rejects HTTP >= 400
(lib/Gtfsrt2LC.js:293-297), transparently gunzips/inflates the response body
per Content-Encoding and passes unknown encodings through
(lib/Gtfsrt2LC.js:298-320), and downloads the static GTFS zip the same way
(lib/GtfsIndex.js:24-72).

This is deliberately a DRIVER-side stdlib fetch, not a Spark source: a GTFS-RT
feed is one small protobuf document per poll (KBs-MBs), so distributing the
fetch buys nothing and would multiply requests against the transit agency's
endpoint. The fetched bytes land in a local staging file that the existing
binaryFile scan / zip extraction consumes — the distributed plan downstream is
unchanged.
"""

from __future__ import annotations

import gzip
import shutil
import urllib.error
import urllib.request
import zlib


def is_url(path: str) -> bool:
    return path.startswith("http://") or path.startswith("https://")


class _CappedRedirects(urllib.request.HTTPRedirectHandler):
    """urllib's default redirect cap is already 10 — the reference's
    maxRedirections (lib/Gtfsrt2LC.js:280) — but make it explicit/tunable."""

    def __init__(self, max_redirects: int) -> None:
        self.max_redirections = max_redirects


def _decompress(body: bytes, encoding: str | None) -> bytes:
    """Content-Encoding handling, mirroring lib/Gtfsrt2LC.js:298-320:
    gzip -> gunzip, deflate -> inflate (zlib or raw stream), anything else
    passes through untouched (the reference's 'fake-format' coverage test)."""
    if not encoding:
        return body
    enc = encoding.strip().lower()
    if enc == "gzip":
        return gzip.decompress(body)
    if enc == "deflate":
        try:
            return zlib.decompress(body)
        except zlib.error:  # some servers send raw deflate without zlib header
            return zlib.decompress(body, -zlib.MAX_WBITS)
    return body


def fetch_bytes(
    url: str,
    headers: dict[str, str] | None = None,
    max_redirects: int = 10,
    timeout: float = 60.0,
) -> bytes:
    """GET ``url`` -> decompressed body bytes.

    Raises IOError on HTTP >= 400 with the reference's message shape
    ('Request <url> failed with HTTP response code <status>',
    lib/Gtfsrt2LC.js:295)."""
    req = urllib.request.Request(url, headers=dict(headers or {}))
    opener = urllib.request.build_opener(_CappedRedirects(max_redirects))
    try:
        with opener.open(req, timeout=timeout) as res:
            body = res.read()
            encoding = res.headers.get("Content-Encoding")
    except urllib.error.HTTPError as e:
        raise IOError(
            f"Request {url} failed with HTTP response code {e.code}"
        ) from e
    return _decompress(body, encoding)


def _pump(src, dst, decomp, chunk_size: int, new_member=None) -> None:
    """Stream src -> dst through an incremental zlib decompressor.

    ``new_member`` is a factory for a fresh decompressor used to continue
    across concatenated stream members (multi-member gzip, RFC 1952 §2.2) —
    the buffered path's gzip.decompress is multi-member-aware, and the
    streaming path must match it instead of silently truncating after the
    first member. When ``new_member`` is None (deflate), trailing bytes after
    the stream are an error, not silent truncation."""
    while True:
        chunk = src.read(chunk_size)
        if not chunk:
            break
        dst.write(decomp.decompress(chunk))
        while decomp.eof and decomp.unused_data:
            tail = decomp.unused_data
            if new_member is None:
                raise IOError(
                    f"{len(tail)} trailing bytes after end of deflate stream"
                )
            decomp = new_member()
            dst.write(decomp.decompress(tail))
    dst.write(decomp.flush())


def fetch_to_file(
    path_or_url: str,
    dest: str,
    headers: dict[str, str] | None = None,
    max_redirects: int = 10,
    timeout: float = 60.0,
    chunk_size: int = 1 << 20,
) -> str:
    """Stage a URL (fetched + decompressed) or a local file at ``dest``.

    The staging-file indirection mirrors lib/GtfsIndex.js:60 (download ->
    /tmp/gtfs.zip -> unzip); callers hand ``dest`` to the zip extractor or
    the binaryFile scan. The body STREAMS to disk in ``chunk_size`` pieces
    (incremental gzip/deflate decompression) — the reference pipes the
    static-GTFS download straight to a write stream (lib/GtfsIndex.js:56-66),
    and buffering a multi-GB agency zip plus its decompressed copy in driver
    memory is exactly the failure mode streaming avoids."""
    if not is_url(path_or_url):
        shutil.copyfile(path_or_url, dest)
        return dest
    req = urllib.request.Request(path_or_url, headers=dict(headers or {}))
    opener = urllib.request.build_opener(_CappedRedirects(max_redirects))
    try:
        with opener.open(req, timeout=timeout) as res:
            enc = (res.headers.get("Content-Encoding") or "").strip().lower()
            with open(dest, "wb") as f:
                if enc == "gzip":
                    gz = lambda: zlib.decompressobj(16 + zlib.MAX_WBITS)  # noqa: E731
                    _pump(res, f, gz(), chunk_size, new_member=gz)
                elif enc == "deflate":
                    # sniff zlib-vs-raw on the first chunk, then stream
                    first = res.read(chunk_size)
                    d = zlib.decompressobj()
                    try:
                        out = d.decompress(first)
                    except zlib.error:  # raw deflate without zlib header
                        d = zlib.decompressobj(-zlib.MAX_WBITS)
                        out = d.decompress(first)
                    f.write(out)
                    if d.eof and d.unused_data:
                        raise IOError(
                            f"{len(d.unused_data)} trailing bytes after end of "
                            "deflate stream"
                        )
                    _pump(res, f, d, chunk_size)
                else:  # unknown encodings pass through untouched
                    shutil.copyfileobj(res, f, chunk_size)
    except urllib.error.HTTPError as e:
        raise IOError(
            f"Request {path_or_url} failed with HTTP response code {e.code}"
        ) from e
    return dest
