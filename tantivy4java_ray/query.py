"""Query model: an immutable composable tree + the ``parseQuery``
mini-language.

Mirrors the reference's query surface (``query/Query.java:54-451``; AST
inventory ``native/src/split_query/parse_query.rs:376-424``): term, termSet,
all, phrase(+slop), fuzzy, boolean MUST/SHOULD/MUST_NOT, disjunction-max,
boost, const-score, range, regex, wildcard, exists, more-like-this.

Semantics pinned by tests (tests/test_query_parser.py, tests/test_search.py):

- ``Query.term`` is NOT analyzed — exact bytes against the dictionary
  (``DefaultTokenizerCaseTest.java:90-110``); only ``parse_query`` analyzes.
- boolean scoring: sum of matching MUST+SHOULD clause scores; MUST_NOT
  filters without scoring (``query/Occur.java``).
- fuzzy/regex/wildcard/term-range match with constant score 1.0 (automaton
  queries in tantivy score 1.0).
- dismax score = max + tie_breaker * (sum - max).
- quoted single-token phrases parse to plain term queries
  (``fix_quoted_single_terms``, ``native/src/index.rs:552-600``).
- wildcard patterns are lowercased only when the field's tokenizer
  lowercases (``native/src/query/wildcard.rs:8-16``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import IntEnum
from typing import Any


class Occur(IntEnum):
    """``query/Occur.java`` (values per ``TantivyTest.java:57-59``)."""

    MUST = 1
    SHOULD = 2
    MUST_NOT = 3


@dataclass(frozen=True)
class Query:
    kind: str
    params: tuple = ()

    # -- factories (Query.java surface) -------------------------------------
    @staticmethod
    def term(field: str, value: Any) -> "Query":
        return Query("term", (field, _term_str(value)))

    @staticmethod
    def term_set(field: str, values: list) -> "Query":
        return Query("term_set", (field, tuple(_term_str(v) for v in values)))

    @staticmethod
    def all() -> "Query":
        return Query("all")

    @staticmethod
    def match_none() -> "Query":
        return Query("none")

    @staticmethod
    def phrase(field: str, words: list, slop: int = 0) -> "Query":
        # elements may be plain words or (position, word) pairs
        elems = []
        for i, w in enumerate(words):
            if isinstance(w, tuple):
                elems.append((int(w[0]), str(w[1])))
            else:
                elems.append((i, str(w)))
        return Query("phrase", (field, tuple(elems), int(slop)))

    @staticmethod
    def fuzzy_term(field: str, value: str, distance: int = 1,
                   transposition_cost_one: bool = True,
                   prefix: bool = False) -> "Query":
        return Query("fuzzy", (field, value, distance,
                               transposition_cost_one, prefix))

    @staticmethod
    def boolean(clauses: list[tuple[Occur, "Query"]]) -> "Query":
        return Query("bool", tuple((Occur(o), q) for o, q in clauses))

    @staticmethod
    def disjunction_max(queries: list["Query"],
                        tie_breaker: float = 0.0) -> "Query":
        return Query("dismax", (tuple(queries), float(tie_breaker)))

    @staticmethod
    def boost(query: "Query", factor: float) -> "Query":
        return Query("boost", (query, float(factor)))

    @staticmethod
    def const_score(query: "Query", score: float) -> "Query":
        return Query("const", (query, float(score)))

    @staticmethod
    def range(field: str, lower: Any = None, upper: Any = None,
              include_lower: bool = True, include_upper: bool = True) -> "Query":
        return Query("range", (field, lower, upper,
                               include_lower, include_upper))

    @staticmethod
    def regex(field: str, pattern: str, lenient: bool = False) -> "Query":
        return Query("regex", (field, pattern, lenient))

    @staticmethod
    def wildcard(field: str, pattern: str, lenient: bool = False) -> "Query":
        return Query("wildcard", (field, pattern, lenient))

    @staticmethod
    def exists(field: str) -> "Query":
        return Query("exists", (field,))

    # -- JSON subpath queries (Query.java:320-366; terms are encoded as
    #    'path\x01value' in the dictionary, json_query.rs analog) ---------
    @staticmethod
    def json_term(field: str, path: str, value: Any) -> "Query":
        return Query("term", (field, f"{path}\x01{_term_str(value)}"))

    @staticmethod
    def json_range(field: str, path: str, lower: Any = None,
                   upper: Any = None, include_lower: bool = True,
                   include_upper: bool = True) -> "Query":
        """int/float bounds -> numeric compare over the typed \\x02 terms
        (order-preserving f64 encoding); str bounds -> lexicographic over
        the \\x01 string terms."""
        def conv(v: Any):
            if v is None or (isinstance(v, (int, float))
                             and not isinstance(v, bool)):
                return v
            return _term_str(v)
        return Query("json_range", (field, path, conv(lower), conv(upper),
                                    include_lower, include_upper))

    @staticmethod
    def json_exists(field: str, path: str,
                    check_subpaths: bool = True) -> "Query":
        """``Query.jsonExistsQuery`` analog; ``check_subpaths=False``
        matches only docs with a VALUE at the exact path — a doc where
        only ``path.sub`` exists does not count
        (``query/Query.java:417-420``)."""
        return Query("json_exists", (field, path, check_subpaths))

    @staticmethod
    def more_like_this(doc_fields: dict[str, str], *, max_query_terms: int = 25,
                       min_term_freq: int = 1, min_doc_freq: int = 1,
                       max_doc_freq: int | None = None,
                       min_word_length: int = 0,
                       max_word_length: int | None = None,
                       boost_factor: float = 1.0,
                       stop_words: tuple[str, ...] = ()) -> "Query":
        """``Query.moreLikeThisQuery`` full parameter surface
        (``query/Query.java:238-246``): term-selection filters on doc
        frequency bounds, word BYTE length (tantivy measures ``&str``
        length in bytes), and a stop-word list; ``boost_factor`` scales
        the expanded query's scores."""
        return Query("more_like_this",
                     (tuple(sorted(doc_fields.items())), max_query_terms,
                      min_term_freq, min_doc_freq, max_doc_freq,
                      min_word_length, max_word_length, boost_factor,
                      tuple(stop_words)))

    def to_dict(self) -> dict:
        """QueryAst-JSON-style serialization (``SplitQuery.toQueryAstJson``
        analog) — plain dicts, broadcastable to query actors."""
        def conv(x: Any) -> Any:
            if isinstance(x, Query):
                return x.to_dict()
            if isinstance(x, tuple):
                return [conv(e) for e in x]
            if isinstance(x, Occur):
                return int(x)
            return x
        return {"kind": self.kind, "params": conv(self.params)}

    @staticmethod
    def from_dict(d: dict) -> "Query":
        """Inverse of ``to_dict`` — ``Query.from_dict(q.to_dict()) == q``
        for every query kind (pinned by tests). The stable wire form for
        cross-version actors and external callers (the reference's split
        protocol is documented JSON, ``SplitQuery.java:23``,
        ``parse_query.rs:376-424``)."""
        def conv(x: Any) -> Any:
            if isinstance(x, dict) and "kind" in x and "params" in x:
                return Query.from_dict(x)
            if isinstance(x, list):
                return tuple(conv(e) for e in x)
            return x
        kind = d["kind"]
        params = conv(d["params"])
        if kind == "bool":
            params = tuple((Occur(int(o)), q) for o, q in params)
        return Query(kind, params)

    def to_json(self) -> str:
        """Canonical JSON wire form (sorted keys, no whitespace). Range
        bounds must be JSON-representable (numbers / strings / null);
        use ISO strings for dates."""
        import json
        return json.dumps(self.to_dict(), separators=(",", ":"),
                          sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Query":
        import json
        return Query.from_dict(json.loads(s))


def _term_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


# ---------------------------------------------------------------------------
# parseQuery mini-language (core/Index.java:240-272 surface)
#
# grammar:   expr    := clause (("AND"|"OR") clause)*
#            clause  := ["+"|"-"|"NOT"] atom ["^" number]
#            atom    := "(" expr ")" | field ":" value | value
#            value   := quoted-phrase ["~" slop] | range | bare-term
#                       bare-term may carry wildcards (* ?) or "~d" fuzz
#            range   := ("[" | "{") lo "TO" hi ("]" | "}")
# Default occur for space-separated clauses is SHOULD; AND binds its two
# neighbors into MUST (Lucene-style, pinned by tests).
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<lparen>\() | (?P<rparen>\)) |
      (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
      (?P<plus>\+) | (?P<minus>-) |
      (?P<quoted>"(?P<qbody>[^"]*)"(?:~(?P<qslop>\d+))?) |
      (?P<range>[\[{][^\]}]*\s+TO\s+[^\]}]*[\]}]) |
      (?P<term>[^\s()"\[{]+)
    )""", re.VERBOSE)


class QueryParseError(ValueError):
    pass


def _tokenize_query(s: str, lenient: bool = False) -> list[tuple[str, Any]]:
    toks: list[tuple[str, Any]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            if lenient:
                # skip the untokenizable character (e.g. an unclosed
                # quote) — lenient mode must survive the LEXER too, not
                # just unknown fields / missing parens
                pos += 1
                continue
            raise QueryParseError(f"cannot tokenize at {s[pos:]!r}")
        pos = m.end()
        if m.group("quoted"):
            toks.append(("quoted", (m.group("qbody"), int(m.group("qslop") or 0))))
        elif m.group("range"):
            toks.append(("range", m.group("range")))
        elif m.group("term"):
            toks.append(("term", m.group("term")))
        else:
            for g in ("lparen", "rparen", "and", "or", "not", "plus", "minus"):
                if m.group(g):
                    toks.append((g, m.group(g)))
                    break
    return toks


def parse_query(text: str, schema: "Any", default_fields: list[str] | None = None,
                lenient: bool = False) -> Query:
    """Parse the query mini-language against an ``IndexSchema``.

    ``default_fields`` defaults to all text fields
    (``core/Index.java:240-247``).
    """
    from tantivy4java_ray.analyzer import get_analyzer
    from tantivy4java_ray.schema import FieldType

    if default_fields is None:
        default_fields = [f.name for f in schema.text_fields]

    toks = _tokenize_query(text, lenient)
    ptr = [0]
    # field scope for 'field:(...)' groups (a stack: groups may nest)
    scope_stack: list[list[str]] = []

    def peek() -> tuple[str, Any] | None:
        return toks[ptr[0]] if ptr[0] < len(toks) else None

    def eat() -> tuple[str, Any]:
        t = toks[ptr[0]]
        ptr[0] += 1
        return t

    def analyze_to_query(fname: str, raw: str, slop: int | None,
                         as_phrase: bool) -> Query | None:
        fcfg = schema.get_field(fname)
        if fcfg.type is not FieldType.TEXT:
            return Query.term(fname, raw)
        tokens, positions = get_analyzer(
            fcfg.tokenizer).tokenize_with_positions(raw)
        if not tokens:
            return None
        if len(tokens) == 1:
            # quoted single-token phrase -> plain term (index.rs:552-600)
            return Query.term(fname, tokens[0])
        if as_phrase:
            # analyzer positions, not enumerate(): RemoveLongFilter
            # gaps must survive into the phrase offsets the same way
            # they were indexed (tantivy keeps gaps in query analysis)
            return Query.phrase(fname, list(zip(positions, tokens)),
                                slop or 0)
        return Query.boolean([(Occur.SHOULD, Query.term(fname, t))
                              for t in tokens])

    def value_query(fname: str | None, kind: str, val: Any) -> Query | None:
        fields = ([fname] if fname
                  else scope_stack[-1] if scope_stack else default_fields)
        if not fields:
            # tantivy's QueryParser errors with NoDefaultFieldDeclared
            # rather than silently matching nothing (query_parser.rs);
            # schemas with zero TEXT fields hit this on unfielded clauses.
            if lenient:
                return None
            raise QueryParseError(
                "no default fields: the schema has no TEXT fields and no "
                "default_fields were given; qualify the clause as field:term")
        subs: list[Query] = []
        for f in fields:
            if f not in schema:
                if lenient:
                    continue
                raise QueryParseError(f"unknown field {f!r}")
            q = _value_query_one(f, kind, val)
            if q is not None:
                subs.append(q)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return Query.boolean([(Occur.SHOULD, q) for q in subs])

    def _value_query_one(f: str, kind: str, val: Any) -> Query | None:
        from tantivy4java_ray.schema import FieldType
        fcfg = schema.get_field(f)
        if kind == "quoted":
            body, slop = val
            return analyze_to_query(f, body, slop, as_phrase=True)
        if kind == "range":
            # DOTALL: the lexer's range class accepts embedded newlines,
            # so the re-parse here must too (else m is None and lenient
            # mode would crash on a token the lexer accepted).
            m = re.match(r"([\[{])\s*(.*?)\s+TO\s+(.*?)\s*([\]}])", val,
                         re.DOTALL)
            if m is None:
                if lenient:
                    return None
                raise QueryParseError(f"malformed range {val!r}")
            lo, hi = m.group(2), m.group(3)
            lo = None if lo in ("*", "") else lo
            hi = None if hi in ("*", "") else hi
            return Query.range(f, lo, hi, m.group(1) == "[", m.group(4) == "]")
        term: str = val
        fm = re.fullmatch(r"(.+?)~(\d+)?", term)
        if fm and fcfg.type is FieldType.TEXT:
            base = fm.group(1)
            dist = int(fm.group(2)) if fm.group(2) else 1
            toks_ = get_analyzer(fcfg.tokenizer).tokenize(base)
            if toks_:
                return Query.fuzzy_term(f, toks_[0], dist)
            return None
        if "*" in term or "?" in term:
            return Query.wildcard(f, term)
        return analyze_to_query(f, term, None, as_phrase=False)

    def parse_atom() -> tuple[Query | None, Occur]:
        occur = Occur.SHOULD
        t = peek()
        if t is None:
            # a trailing '+'/'-'/NOT with nothing bound to it
            if lenient:
                return None, occur
            raise QueryParseError("unexpected end of query")
        if t[0] in ("plus", "minus", "not"):
            eat()
            occur = Occur.MUST if t[0] == "plus" else Occur.MUST_NOT
            q, _ = parse_atom()
            return q, occur
        if t[0] == "lparen":
            eat()
            q = parse_expr()
            if peek() and peek()[0] == "rparen":
                eat()
            elif not lenient:
                raise QueryParseError("missing )")
            return _maybe_boost(q), occur
        kind, val = eat()
        fname = None
        if kind == "term" and ":" in val:
            fname, rest = val.split(":", 1)
            if rest == "" and peek() and peek()[0] in ("quoted", "range"):
                kind, val = eat()
            elif rest == "" and peek() and peek()[0] == "lparen":
                # 'field:(a b)' scopes the whole group to the field —
                # parsing the group unscoped would silently search every
                # default field
                eat()
                scope_stack.append([fname])
                try:
                    q = parse_expr()
                finally:
                    scope_stack.pop()
                if peek() and peek()[0] == "rparen":
                    eat()
                elif not lenient:
                    raise QueryParseError("missing )")
                return _maybe_boost(q), occur
            else:
                kind, val = "term", rest
        q = value_query(fname, kind, val)
        return _maybe_boost(q), occur

    def _maybe_boost(q: Query | None) -> Query | None:
        t = peek()
        if q is not None and t and t[0] == "term" and t[1].startswith("^"):
            eat()
            try:
                q = Query.boost(q, float(t[1][1:]))
            except ValueError:
                if not lenient:
                    raise QueryParseError(f"bad boost {t[1]!r}")
        return q

    def parse_expr() -> Query:
        clauses: list[tuple[Occur, Query]] = []
        pending_and = False
        while True:
            t = peek()
            if t is None or t[0] == "rparen":
                break
            if t[0] == "and":
                eat()
                pending_and = True
                continue
            if t[0] == "or":
                eat()
                pending_and = False
                continue
            q, occur = parse_atom()
            if q is None:
                # an AND whose bound clause analyzed to nothing must not
                # leak MUST-promotion onto the next unrelated clause
                pending_and = False
                continue
            if pending_and:
                # AND binds previous and current clause into MUST
                if clauses and clauses[-1][0] == Occur.SHOULD:
                    clauses[-1] = (Occur.MUST, clauses[-1][1])
                if occur == Occur.SHOULD:
                    occur = Occur.MUST
                pending_and = False
            clauses.append((occur, q))
        if not clauses:
            return Query.match_none()
        if len(clauses) == 1 and clauses[0][0] == Occur.SHOULD:
            return clauses[0][1]
        return Query.boolean(clauses)

    # "^boost" tokens got lexed into bare terms starting with ^ — handled in
    # _maybe_boost; split them off here
    fixed: list[tuple[str, Any]] = []
    for k, v in toks:
        if k == "term" and "^" in v and not v.startswith("^"):
            base, boost = v.rsplit("^", 1)
            fixed.append(("term", base))
            fixed.append(("term", "^" + boost))
        else:
            fixed.append((k, v))
    toks = fixed

    q = parse_expr()
    if ptr[0] < len(toks):
        # parse_expr stops at a stray ')': consuming only a prefix would
        # silently search a truncated query
        if not lenient:
            raise QueryParseError(
                f"unexpected {toks[ptr[0]][1]!r} at token {ptr[0]}")
        parts = [q]
        while ptr[0] < len(toks):
            if peek()[0] == "rparen":
                eat()
                continue
            parts.append(parse_expr())
        parts = [p for p in parts if p is not None and p.kind != "none"]
        if not parts:
            return Query.match_none()
        if len(parts) == 1:
            return parts[0]
        return Query.boolean([(Occur.SHOULD, p) for p in parts])
    return q
