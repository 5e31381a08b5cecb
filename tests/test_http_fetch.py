"""HTTP ingestion parity (ref S1/S2/S4): fetch with headers + redirects,
gzip/deflate decompression, 4xx rejects (ref lib/Gtfsrt2LC.js:270-321,
lib/GtfsIndex.js:24-72, test/gtfsrt2lc.test.js:677-697)."""

from __future__ import annotations

import csv
import gzip
import io
import json
import os
import threading
import zipfile
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from gtfsrt2lc_spark.cli import main
from gtfsrt2lc_spark.fixtures.gtfs import gap_feed, static_tables
from gtfsrt2lc_spark.sources.http_fetch import fetch_bytes, fetch_to_file

FEED = gap_feed()
API_KEY = "sesame"


def _static_zip_bytes() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, rows in static_tables().items():
            s = io.StringIO()
            w = csv.DictWriter(s, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
            z.writestr(f"{name}.txt", s.getvalue())
    return buf.getvalue()


STATIC_ZIP = _static_zip_bytes()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # silence
        pass

    def _send(self, body: bytes, code: int = 200, **headers) -> None:
        self.send_response(code)
        for k, v in headers.items():
            self.send_header(k.replace("_", "-"), v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        p = self.path
        if p == "/feed.pb":
            self._send(FEED)
        elif p == "/feed.gz":
            self._send(gzip.compress(FEED), Content_Encoding="gzip")
        elif p == "/feed.deflate":
            self._send(zlib.compress(FEED), Content_Encoding="deflate")
        elif p == "/feed.fake":
            self._send(FEED, Content_Encoding="fake-format")
        elif p == "/redirect":
            self._send(b"", 302, Location="/feed.pb")
        elif p == "/loop":
            self._send(b"", 302, Location="/loop")
        elif p == "/guarded.pb":
            if self.headers.get("api-Key") == API_KEY:
                self._send(FEED)
            else:
                self._send(b"denied", 401)
        elif p == "/gtfs.zip":
            self._send(STATIC_ZIP)
        elif p == "/feed.gz2":
            # concatenated two-member gzip body (RFC 1952 §2.2: valid, and
            # what rolling log compressors produce)
            half = len(FEED) // 2
            self._send(
                gzip.compress(FEED[:half]) + gzip.compress(FEED[half:]),
                Content_Encoding="gzip",
            )
        elif p == "/feed.deflate_trailing":
            self._send(zlib.compress(FEED) + b"JUNKJUNK", Content_Encoding="deflate")
        else:
            self._send(b"not here", 404)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_plain(server):
    assert fetch_bytes(f"{server}/feed.pb") == FEED


def test_fetch_gzip_and_deflate(server):
    # ref lib/Gtfsrt2LC.js:303-307 — transparent decompression per encoding
    assert fetch_bytes(f"{server}/feed.gz") == FEED
    assert fetch_bytes(f"{server}/feed.deflate") == FEED


def test_fetch_unknown_encoding_passthrough(server):
    # ref test/gtfsrt2lc.test.js:688-696 ('fake-format' body passes through)
    assert fetch_bytes(f"{server}/feed.fake") == FEED


def test_fetch_follows_redirect(server):
    assert fetch_bytes(f"{server}/redirect") == FEED


def test_fetch_redirect_loop_capped(server):
    with pytest.raises(Exception):
        fetch_bytes(f"{server}/loop", max_redirects=5)


def test_fetch_4xx_rejects(server):
    # ref lib/Gtfsrt2LC.js:293-297 + test/gtfsrt2lc.test.js:677-686
    with pytest.raises(IOError, match="HTTP response code 404"):
        fetch_bytes(f"{server}/missing")
    with pytest.raises(IOError, match="HTTP response code 401"):
        fetch_bytes(f"{server}/guarded.pb")


def test_fetch_custom_headers(server):
    assert fetch_bytes(f"{server}/guarded.pb", {"api-Key": API_KEY}) == FEED


def test_fetch_to_file_local_copy(server, tmp_path):
    src = tmp_path / "in.bin"
    src.write_bytes(b"abc")
    dest = tmp_path / "out.bin"
    assert fetch_to_file(str(src), str(dest)) == str(dest)
    assert dest.read_bytes() == b"abc"


def test_cli_end_to_end_over_http(server, spark, tmp_path):
    """rt2lc with URL feed + URL static zip + headers == local-file run."""
    out_http = tmp_path / "http_out"
    rc = main(
        ["rt2lc", "-r", f"{server}/guarded.pb", "-s", f"{server}/gtfs.zip",
         "-H", json.dumps({"api-Key": API_KEY}), "-f", "json",
         "-o", str(out_http)],
        spark=spark,
    )
    assert rc == 0

    staged = tmp_path / "local"
    staged.mkdir()
    (staged / "feed.pb").write_bytes(FEED)
    zpath = staged / "gtfs.zip"
    zpath.write_bytes(STATIC_ZIP)
    out_file = tmp_path / "file_out"
    rc = main(
        ["rt2lc", "-r", str(staged / "feed.pb"), "-s", str(zpath),
         "-f", "json", "-o", str(out_file)],
        spark=spark,
    )
    assert rc == 0

    def lines(d):
        out = []
        for part in sorted(os.listdir(d)):
            if part.startswith("part-"):
                out += [ln for ln in open(os.path.join(d, part)).read().splitlines() if ln]
        return sorted(out)

    assert lines(out_http) == lines(out_file)
    assert len(lines(out_http)) > 0


def test_cli_rt2json_over_http(server, capsys):
    rc = main(["rt2json", "-r", f"{server}/feed.pb"])
    assert rc == 0
    feed = json.loads(capsys.readouterr().out)
    assert len(feed["entities"]) > 0


def test_cli_invalid_headers_json(server, spark, tmp_path):
    # ref bin/gtfsrt2lc.js:57 error message
    with pytest.raises(SystemExit, match="valid JSON string"):
        main(
            ["rt2lc", "-r", f"{server}/feed.pb", "-s", f"{server}/gtfs.zip",
             "-H", "{not json", "-o", str(tmp_path / "x")],
            spark=spark,
        )


def test_gzipped_feed_file_sniffed(tmp_path):
    """S2's file half: a .pb.gz feed on disk decodes identically."""
    from gtfsrt2lc_spark.functions.gtfsrt_proto import decode_feed

    assert decode_feed(gzip.compress(FEED)) == decode_feed(FEED)
    assert decode_feed(b"\x1f\x8b garbage")["entities"] == []
    # truncated gzip raises EOFError, bit-flipped zlib.error — both must
    # fall under the total-function contract, not crash the decode task
    assert decode_feed(gzip.compress(FEED)[:20])["entities"] == []
    corrupt = bytearray(gzip.compress(FEED))
    corrupt[15] ^= 0xFF
    assert decode_feed(bytes(corrupt))["entities"] == []


def test_fetch_to_file_streams_compressed_urls(server, tmp_path):
    """fetch_to_file decompresses gzip/deflate incrementally to disk with a
    tiny chunk size (forcing many decompress steps), byte-identical to the
    buffered fetch."""
    for path in ("feed.gz", "feed.deflate", "feed.pb", "feed.fake"):
        dest = tmp_path / path.replace(".", "_")
        fetch_to_file(f"{server}/{path}", str(dest), chunk_size=7)
        assert dest.read_bytes() == FEED, path


def test_fetch_to_file_multimember_gzip(server, tmp_path):
    """Streaming gzip path must decode ALL members of a concatenated gzip
    body (RFC 1952 §2.2), matching the buffered fetch_bytes — not silently
    truncate after the first member."""
    assert fetch_bytes(f"{server}/feed.gz2") == FEED  # buffered path baseline
    dest = tmp_path / "multi"
    fetch_to_file(f"{server}/feed.gz2", str(dest), chunk_size=7)
    assert dest.read_bytes() == FEED


def test_fetch_to_file_deflate_trailing_junk_raises(server, tmp_path):
    """Trailing bytes after a deflate stream are an error, not silent
    truncation (there is no multi-member deflate)."""
    with pytest.raises(IOError, match="trailing bytes"):
        fetch_to_file(
            f"{server}/feed.deflate_trailing", str(tmp_path / "t"), chunk_size=7
        )


def test_fetch_to_file_4xx_rejects(server, tmp_path):
    with pytest.raises(IOError, match="HTTP response code 404"):
        fetch_to_file(f"{server}/missing", str(tmp_path / "x"))


def test_cli_staging_dirs_registered_for_cleanup(server, tmp_path, monkeypatch):
    """Every staging dir the CLI creates is registered for removal at exit
    (a long-lived poller must not fill /tmp)."""
    import gtfsrt2lc_spark.cli as cli

    removed = []
    monkeypatch.setattr(
        cli.atexit, "register", lambda fn, *a, **kw: removed.append(a[0])
    )
    d = cli._staging_dir("probe_")
    assert os.path.isdir(d)
    assert removed == [d]
