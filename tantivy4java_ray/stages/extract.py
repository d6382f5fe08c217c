"""Frozen deterministic HTML -> text extraction (fallback path).

The reference has NO html extractor — it ingests pre-extracted text via
``Document.addText`` (``core/Document.java:133``); the per-row "byte-identical
extracted text per url" invariant (BASELINE.json) therefore attaches to
(a) passing a non-null ``text`` column through unmodified, and (b) this
frozen extractor when ``text`` is null. Goldens in
``tests/test_extract.py`` pin the bytes.

Pure regex + html.unescape; vectorized at the batch level by mapping over a
binary Arrow column (the only per-row Python work in the build, and it runs
only for rows with null ``text``).
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCRIPT = re.compile(rb"(?is)<(script|style|noscript)\b.*?</\1\s*>")
_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_BLOCK = re.compile(
    rb"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|"
    rb"header|footer|blockquote|pre|hr|title)\b[^>]*>")
_TAG = re.compile(rb"(?s)<[^>]*>")
_WS = re.compile(r"[ \t\r\f\v]*\n[ \t\r\f\v]*")
_SPACES = re.compile(r"[ \t\r\f\v]+")
_NL = re.compile(r"\n{2,}")


def extract_text(html_bytes: bytes | str | None) -> str:
    """One document; deterministic, frozen by goldens. Accepts str too
    (source parquet commonly stores html as utf8, not binary) — encoded
    to the same bytes the binary path sees, so the golden output is
    identical either way."""
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, str):
        html_bytes = html_bytes.encode("utf-8", errors="surrogatepass")
    b = _SCRIPT.sub(b" ", html_bytes)
    b = _COMMENT.sub(b" ", b)
    b = _BLOCK.sub(b"\n", b)
    b = _TAG.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    s = _SPACES.sub(" ", s)
    s = _WS.sub("\n", s)
    s = _NL.sub("\n", s)
    return s.strip()


def fill_text_from_html(text_col: pa.Array | pa.ChunkedArray,
                        html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Return ``text`` with nulls replaced by ``extract_text(html)``."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    # normalize the TYPE up front: the no-null early return used to
    # keep large_string while the fill path cast to string, so block
    # schemas flapped with the null distribution of the data
    if not pa.types.is_string(text_col.type):
        text_col = text_col.cast(pa.string())
    null_mask = text_col.is_null()
    mask = np.asarray(null_mask.to_numpy(zero_copy_only=False), bool)
    if not mask.any():
        return text_col
    # Python objects only for the NULL rows (the extractor is per-row
    # Python by necessity — frozen golden bytes); the scatter back into
    # the column is one Arrow kernel, so non-null text never round-trips
    # through pylist.
    null_idx = np.flatnonzero(mask)
    htmls = html_col.take(pa.array(null_idx, pa.int64())).to_pylist()
    repl = pa.array([extract_text(h) for h in htmls], pa.string())
    return pc.replace_with_mask(
        text_col.cast(pa.string()), null_mask, repl)
