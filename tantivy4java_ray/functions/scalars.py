"""Scalar helpers mirrored from the reference (SURVEY.md §2.8):

- IP normalization / IPv4<->IPv6 expansion (``native/src/ip_expansion.rs``)
- microsecond-precision date parse/format (``DateMicrosecondPrecisionTest``)
- facet path encode/decode (``util/Facet.java``)
- UTF-8-safe truncation for column statistics
  (``parquet_companion/indexing.rs`` statistics_truncate_length=256)
- deterministic 64-bit string fingerprint (the reference's hidden
  ``_phash_<field>`` columns, ``indexing.rs:57-78``; 0 reserved for null)
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pandas as pd


def normalize_ip(value: str) -> str:
    """Canonical *display* form: IPv4 -> IPv4-mapped IPv6
    (``::ffff:a.b.c.d``), IPv6 compressed lowercase. Used for the
    stored/fast column, NOT for dictionary terms (text order on this
    form is not numeric order: ``::ffff:9.0.0.1`` sorts after
    ``::ffff:10.255.255.255``)."""
    addr = ipaddress.ip_address(value.strip())
    if isinstance(addr, ipaddress.IPv4Address):
        return f"::ffff:{addr}"
    if addr.ipv4_mapped is not None:
        return f"::ffff:{addr.ipv4_mapped}"
    return addr.compressed


def ip_term(value: str) -> str:
    """Dictionary-term form: the address as a fixed-width 32-hex-digit
    u128 (IPv4 mapped into ``::ffff:0:0/96`` first). Lexicographic order
    on this form IS numeric u128 order, so term-range windows compare
    IPs numerically — the reference's semantics (u128 fast-field ranges,
    ``native/src/ip_expansion.rs``, ``split/SplitRangeQuery.java:12-78``).
    Same trick as the order-preserving ``\\x02`` f64 JSON terms."""
    addr = ipaddress.ip_address(value.strip())
    if isinstance(addr, ipaddress.IPv4Address):
        n = 0xFFFF_0000_0000 | int(addr)
    else:
        n = int(addr)
    return format(n, "032x")


def expand_ip_query_bounds(lower: str | None, upper: str | None
                           ) -> tuple[str | None, str | None]:
    """Range bounds encoded the same way dictionary terms are. ``is not
    None``, not falsiness: an empty-string bound is an invalid address
    (ip_term raises), NOT an unbounded range."""
    return (ip_term(lower) if lower is not None else None,
            ip_term(upper) if upper is not None else None)


def parse_date_us(value) -> int:
    """Anything date-like -> int64 microseconds since epoch (sub-ms
    precision preserved; ``SubMillisecondPrecisionTest`` contract)."""
    return int(np.datetime64(value, "us").astype(np.int64))


def format_date_us(us: int) -> str:
    return str(np.datetime64(int(us), "us"))


# -- facets (hierarchical paths "/a/b/c") -----------------------------------

def facet_encode(*parts: str) -> str:
    """('tools', 'saw') -> '/tools/saw'. Escapes '\\' as well as '/':
    escaping only the separator is not injective (a segment ending in
    '\\' would encode identically to a merged segment)."""
    return "/" + "/".join(
        p.replace("\\", "\\\\").replace("/", "\\/") for p in parts)


def facet_parts(path: str) -> list[str]:
    if path.startswith("/"):
        path = path[1:]   # exactly ONE leading separator, not lstrip:
        # an empty first segment ('/\x2f a' forms) must survive
    out, cur, esc = [], [], False
    for ch in path:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == "/":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    if out == [""]:
        return []   # facet_parts("/") == facet_parts("") == []
    return out


def facet_ancestors(path: str) -> list[str]:
    """'/a/b/c' -> ['/a', '/a/b', '/a/b/c'] — indexed so prefix queries
    and per-level facet counts are dictionary lookups."""
    parts = facet_parts(path)
    return [facet_encode(*parts[:i + 1]) for i in range(len(parts))]


# -- misc -------------------------------------------------------------------

def truncate_utf8(s: str, max_bytes: int = 256) -> str:
    """UTF-8-safe truncation (never split a codepoint)."""
    b = s.encode()
    if len(b) <= max_bytes:
        return s
    return b[:max_bytes].decode("utf-8", errors="ignore")


def string_fingerprint(values) -> np.ndarray:
    """u64 fingerprint per value; 0 reserved for null (the reference's
    ``_phash`` convention). NUL bytes are escaped INJECTIVELY first
    (U+FFFD -> U+FFFD'1' then NUL -> U+FFFD'0'): pandas' C-string
    siphash stops at the first NUL, so 'a', 'a\\x00b' and 'a\\x00c'
    would otherwise all collide — and a bare NUL->U+FFFD replacement
    would deterministically alias 'a\\x00b' with a literal 'a\\uFFFDb'."""
    arr = np.asarray(values, dtype=object)
    mask = pd.isna(arr)
    esc = np.fromiter(
        (isinstance(v, str)
         and ("\x00" in v or "\N{REPLACEMENT CHARACTER}" in v)
         for v in arr), bool, len(arr))
    if esc.any():
        arr = arr.copy()
        for i in np.flatnonzero(esc):
            arr[i] = (arr[i]
                      .replace("\N{REPLACEMENT CHARACTER}",
                               "\N{REPLACEMENT CHARACTER}1")
                      .replace("\x00", "\N{REPLACEMENT CHARACTER}0"))
    out = pd.util.hash_array(arr).astype(np.uint64)
    out[out == 0] = 1  # keep 0 exclusively for null
    out[mask] = 0
    return out
