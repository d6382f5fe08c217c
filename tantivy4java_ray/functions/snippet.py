"""Snippet / highlight generation — per-hit best fragment with ``<b>``
highlight markup (reference: ``query/SnippetGenerator.java``,
``native/src/query/snippet.rs:16-152``).

Post-processing map over retrieved hit rows: given the document text and
the query's analyzed terms, pick the window with the highest sum of term
scores and wrap matched tokens in ``<b>..</b>``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from tantivy4java_ray.analyzer import get_analyzer
from tantivy4java_ray.query import Occur, Query


@dataclass
class Snippet:
    """Fragment + highlight ranges (``query/Snippet.java:46-68`` —
    ``getFragment()`` is the raw window, ``getHighlighted()`` the
    [start, end) character ranges INTO the fragment, ``toHtml()`` the
    ``<b>``-marked rendering)."""

    fragment: str
    highlighted: list[tuple[int, int]] = dc_field(default_factory=list)

    def to_html(self) -> str:
        out: list[str] = []
        pos = 0
        for s, e in self.highlighted:
            out.append(self.fragment[pos:s])
            out.append("<b>")
            out.append(self.fragment[s:e])
            out.append("</b>")
            pos = e
        out.append(self.fragment[pos:])
        return "".join(out)


def _collect_terms(q: Query, field: str) -> set[str]:
    """Terms the query matches IN ``field`` — terms that matched other
    fields must not highlight here (reference SnippetGenerator collects
    per field)."""
    k = q.kind
    if k == "term":
        return {q.params[1]} if q.params[0] == field else set()
    if k == "term_set":
        return set(q.params[1]) if q.params[0] == field else set()
    if k == "phrase":
        return ({w for _, w in q.params[1]}
                if q.params[0] == field else set())
    if k == "fuzzy":
        # the base term is the best highlightable approximation (the
        # full within-distance expansion isn't enumerable here)
        return {q.params[1]} if q.params[0] == field else set()
    if k == "bool":
        out: set[str] = set()
        for occ, sub in q.params:
            if occ != Occur.MUST_NOT:
                out |= _collect_terms(sub, field)
        return out
    if k in ("boost", "const"):
        return _collect_terms(q.params[0], field)
    if k == "dismax":
        out = set()
        for sub in q.params[0]:
            out |= _collect_terms(sub, field)
        return out
    return set()


class SnippetGenerator:
    """Build once per (query, field); ``snippet_from_text`` per hit."""

    def __init__(self, query: Query, field: str = "text",
                 tokenizer: str = "default", max_chars: int = 150):
        self.terms = _collect_terms(query, field)
        self.analyzer = get_analyzer(tokenizer)
        self.max_chars = max_chars
        # token spans come from a regex matching the analyzer's token shape
        self._tok_re = re.compile(r"[^\W_]+", re.UNICODE)
        # normalize surface tokens the same way the FIELD's analyzer
        # normalized the indexed terms: a bare .lower() never matches
        # stemmed dictionaries ('running' vs indexed 'runn') and wrongly
        # lowercases raw/case-sensitive fields
        from functools import lru_cache

        @lru_cache(maxsize=4096)
        def _norm(tok: str) -> str | None:
            toks = self.analyzer.tokenize(tok)
            return toks[0] if len(toks) == 1 else None

        self._norm = _norm

    def set_max_num_chars(self, n: int) -> None:
        self.max_chars = n

    def snippet_from_text(self, text: str | None) -> str:
        """-> highlighted best fragment ('' when nothing matches)."""
        return self.snippet(text).to_html()

    def snippet(self, text: str | None) -> Snippet:
        """-> :class:`Snippet` (fragment + highlight ranges), the
        ``snippetFromDoc`` analog."""
        if not text:
            return Snippet("")
        matches = []
        for m in self._tok_re.finditer(text):
            if self._norm(m.group(0)) in self.terms:
                matches.append((m.start(), m.end()))
        if not matches:
            return Snippet("")
        # best window: maximize number of matched tokens within max_chars
        best_i, best_n = 0, 0
        j = 0
        for i in range(len(matches)):
            if j < i:
                j = i
            while (j + 1 < len(matches)
                   and matches[j + 1][1] - matches[i][0] <= self.max_chars):
                j += 1
            n = j - i + 1
            if n > best_n:
                best_i, best_n = i, n
        start = matches[best_i][0]
        m_end = matches[best_i][1]
        # expand left to a word boundary, bound the fragment; the walk
        # stops where the backoff started — an unbounded walk through a
        # long unbroken run could push the matched term past frag_end,
        # yielding a snippet without the hit
        # backoff is budgeted against max_chars so the primary match
        # always fits inside [frag_start, frag_start + max_chars)
        backoff = min(20, max(0, self.max_chars - (m_end - start)))
        frag_start = max(0, start - backoff)
        while frag_start > 0 and not text[frag_start - 1].isspace():
            frag_start -= 1
            if m_end - frag_start > self.max_chars:
                frag_start = max(0, start - backoff)
                break
        frag_end = min(len(text), frag_start + self.max_chars)
        frag = text[frag_start:frag_end]
        ranges = []
        for s, e in matches:
            s -= frag_start
            e -= frag_start
            if s < 0 or e > len(frag):
                continue
            ranges.append((s, e))
        return Snippet(frag, ranges)


def highlight_hits(reader, query: Query, doc_ids, *, field: str = "text",
                   max_chars: int = 150) -> list[str]:
    """Retrieve docs and produce one snippet per hit."""
    fcfg = reader.schema.get_field(field)
    gen = SnippetGenerator(query, field, fcfg.tokenizer, max_chars)
    tbl = reader.retrieve_docs(doc_ids, columns=[field])
    return [gen.snippet_from_text(t) for t in tbl.column(field).to_pylist()]
