"""Text analyzers — vectorized over Arrow string columns.

Re-implements the reference's analyzer semantics
(``native/src/text_analyzer.rs:208-244``):

- ``default`` / ``simple``: split at non-alphanumeric (Unicode), lowercase,
  drop tokens longer than 255 bytes (Quickwit-compatible limit,
  ``text_analyzer.rs:12-14``).
- ``whitespace``: split at Unicode whitespace, lowercase, 255-byte limit.
- ``keyword`` / ``raw``: whole input is one token; no lowercasing, no limit
  (``text_analyzer.rs:224-241``).
- ``en_stem``: default + a light Porter-style suffix stripper (the reference
  exposes tantivy's en_stem under custom registration; ours is registered
  but NOT part of the byte-identical contract).

Unlike the reference (per-document Rust calls through JNI), tokenization here
is a *columnar* kernel: one ``pyarrow.compute.split_pattern_regex`` call per
batch (RE2, C++), then numpy for positions — no Python loop over rows.

Token positions are assigned after empty-token removal and *before* the long
-token filter (matching tantivy, where the tokenizer numbers tokens and
``RemoveLongFilter`` drops them leaving position gaps). Golden fixtures in
``tests/test_analyzer.py`` freeze this contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_TOKEN_LIMIT = 255  # bytes, Quickwit-compatible (text_analyzer.rs:12-14)
LEGACY_TOKEN_LIMIT = 40    # tantivy legacy default (text_analyzer.rs:16-18)

# RE2 character classes. \p{L}: letters, \p{N}: numbers — the complement of
# Rust's char::is_alphanumeric() split in SimpleTokenizer.
_SIMPLE_SPLIT = r"[^\p{L}\p{N}]+"
# Unicode whitespace (WhitespaceTokenizer splits on char::is_whitespace).
_WS_SPLIT = r"[\s\p{Z}\x{0085}\x{2028}\x{2029}]+"


@dataclass(frozen=True)
class TextAnalyzer:
    """An analyzer = splitter + lowercase flag + byte-length limit."""

    name: str = "default"
    split_pattern: str | None = _SIMPLE_SPLIT  # None => raw (whole string)
    lowercase: bool = True
    token_limit: int | None = DEFAULT_TOKEN_LIMIT
    stem: bool = False

    def tokenize(self, text: str | None) -> list[str]:
        """Single-string convenience (tests / query analysis)."""
        if text is None:
            return []
        toks, _pos = self.tokenize_with_positions(text)
        return toks

    def tokenize_with_positions(self, text: str) -> tuple[list[str], list[int]]:
        t, p = _cached_single_tokenize(self, text)
        return list(t), list(p)


@lru_cache(maxsize=16_384)
def _cached_single_tokenize(analyzer: "TextAnalyzer", text: str
                            ) -> tuple[tuple, tuple]:
    """Single-string tokenize goes through the SAME Arrow column kernels
    (the byte-identical invariant) but the per-call kernel dispatch is
    ~1 ms — an LRU makes repeated query analysis (the steady-state QPS
    path) free. Analyzers are frozen dataclasses, so they key safely."""
    out = tokenize_column(pa.array([text]), analyzer)
    return tuple(out["token"]), tuple(out["position"])


_REGISTRY: dict[str, TextAnalyzer] = {}


def register_tokenizer(name: str, analyzer: TextAnalyzer) -> None:
    """Analyzer registry (reference: ``core/Index.java:307-312``)."""
    _REGISTRY[name] = analyzer


def get_analyzer(name: str) -> TextAnalyzer:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown tokenizer {name!r}; registered: "
                       f"{sorted(_REGISTRY)}") from None


for _n in ("default", "simple"):
    register_tokenizer(_n, TextAnalyzer(_n, _SIMPLE_SPLIT, True,
                                        DEFAULT_TOKEN_LIMIT))
register_tokenizer("whitespace", TextAnalyzer("whitespace", _WS_SPLIT, True,
                                              DEFAULT_TOKEN_LIMIT))
for _n in ("keyword", "raw"):
    register_tokenizer(_n, TextAnalyzer(_n, None, False, None))
register_tokenizer("en_stem", TextAnalyzer("en_stem", _SIMPLE_SPLIT, True,
                                           DEFAULT_TOKEN_LIMIT, stem=True))


_STEM_SUFFIXES = ("ational", "iveness", "fulness", "ousness", "ization",
                  "ations", "ingly", "ation", "ement", "ness", "tion", "ment",
                  "edly", "ings", "ies", "ied", "ing", "est", "ed", "es",
                  "ly", "s")


def _stem_array(tokens: np.ndarray) -> np.ndarray:
    """A light, deterministic suffix stripper (NOT full Porter)."""
    out = tokens.copy()
    for i, t in enumerate(tokens):
        for suf in _STEM_SUFFIXES:
            if t.endswith(suf) and len(t) - len(suf) >= 3:
                out[i] = t[: len(t) - len(suf)]
                break
    return out


def tokenize_column(col: pa.Array | pa.ChunkedArray,
                    analyzer: TextAnalyzer,
                    include_tokens: bool = True) -> dict[str, np.ndarray]:
    """Tokenize a string column; fully vectorized and dictionary-encoded.

    Per-token Python strings are NEVER materialized: the flat token array is
    ``dictionary_encode``d in Arrow (C++), so only the batch *vocabulary*
    becomes Python objects. This is the difference between ~700k and several
    million tokens/s per core.

    Returns flat numpy arrays:
      - ``row``:      int64, index of the source row for each token
      - ``codes``:    int64 vocabulary code per token
      - ``vocab``:    object array of unique token strings (``token[i] ==
                      vocab[codes[i]]``)
      - ``token``:    object tokens (refcount bumps into vocab, cheap)
      - ``position``: int32 token position within the row (post empty-filter,
                      pre long-filter — see module docstring)
      - ``row_token_counts``: int64 per input row (doc length for fieldnorms)
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_rows = len(col)

    def _result(parents: np.ndarray, codes: np.ndarray, vocab: np.ndarray,
                positions: np.ndarray) -> dict[str, np.ndarray]:
        counts = np.bincount(parents, minlength=n_rows).astype(np.int64)
        out = {"row": parents, "codes": codes, "vocab": vocab,
               "position": positions, "row_token_counts": counts}
        if include_tokens:  # skip the per-token object array in hot paths
            out["token"] = (vocab[codes] if len(codes)
                            else np.empty(0, object))
        return out

    if n_rows == 0:
        return _result(np.empty(0, np.int64), np.empty(0, np.int64),
                       np.empty(0, object), np.empty(0, np.int32))

    if analyzer.split_pattern is None:
        # raw/keyword: whole value is one token, nulls and empties excluded
        valid = pc.and_(col.is_valid(),
                        pc.greater(pc.binary_length(col), 0))
        vmask = np.asarray(valid.to_numpy(zero_copy_only=False), bool)
        rows = np.flatnonzero(vmask).astype(np.int64)
        enc = col.filter(pa.array(vmask)).dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        vocab = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False),
                           object)
        return _result(rows, codes, vocab, np.zeros(len(rows), np.int32))

    txt = pc.utf8_lower(col) if analyzer.lowercase else col
    lists = pc.split_pattern_regex(txt, pattern=analyzer.split_pattern)
    flat = pc.list_flatten(lists)                       # drops null rows
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    parents = np.asarray(parents, np.int64)
    byte_len = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    byte_len = np.asarray(byte_len, np.int64)

    # 1) drop empty tokens produced by leading/trailing separators
    keep = byte_len > 0
    parents = parents[keep]

    # 2) positions within each row (parents is non-decreasing)
    if len(parents):
        from tantivy4java_ray.nputil import repeat_int
        change = np.empty(len(parents), bool)
        change[0] = True
        np.not_equal(parents[1:], parents[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        run_lens = np.diff(np.append(starts, len(parents)))
        positions = (np.arange(len(parents), dtype=np.int64)
                     - repeat_int(starts, run_lens)).astype(np.int32)
    else:
        positions = np.empty(0, np.int32)

    # 3) RemoveLongFilter: drop tokens over the byte limit, keep positions
    if analyzer.token_limit is not None:
        keep2 = byte_len[keep] <= analyzer.token_limit
        if not keep2.all():
            parents = parents[keep2]
            positions = positions[keep2]
            final = keep.copy()
            final[keep] = keep2
            keep = final

    enc = flat.filter(pa.array(keep)).dictionary_encode()
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
    vocab = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False), object)

    if analyzer.stem and len(vocab):
        stemmed = _stem_array(vocab)
        # stemming may merge vocabulary entries -> re-encode codes
        import pandas as pd
        new_codes, uniq = pd.factorize(stemmed, sort=False)
        codes = new_codes.astype(np.int64)[codes]
        vocab = np.asarray(uniq, object)

    return _result(parents, codes, vocab, positions)


def analyze_query_text(field_tokenizer: str, text: str) -> list[str]:
    """Analyze query text with a field's analyzer (parseQuery path only —
    term queries are NOT analyzed; ``DefaultTokenizerCaseTest.java:90-110``)."""
    return get_analyzer(field_tokenizer).tokenize(text)
