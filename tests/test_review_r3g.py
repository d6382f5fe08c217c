"""Regressions for the query-parser / scalars review batch: stray ')'
handling, field-scoped groups, AND-leak across vanished clauses,
lenient lexer errors, NUL-safe fingerprints, injective facet encoding,
IP bound falsiness."""

import numpy as np
import pytest

from tantivy4java_ray.functions.scalars import (expand_ip_query_bounds,
                                                facet_encode, facet_parts,
                                                string_fingerprint)
from tantivy4java_ray.query import (Occur, Query, QueryParseError,
                                    parse_query)
from tantivy4java_ray.schema import IndexSchema


@pytest.fixture(scope="module")
def schema():
    s = IndexSchema()
    s.add_text_field("title")
    s.add_text_field("body")
    return s


def _clauses(q):
    return q.params if q.kind == "bool" else ((Occur.SHOULD, q),)


def test_stray_rparen_strict_raises(schema):
    with pytest.raises(QueryParseError, match="unexpected"):
        parse_query("cat) dog", schema)


def test_stray_rparen_lenient_keeps_tail(schema):
    q = parse_query("cat) dog", schema, lenient=True)
    terms = set()

    def walk(x):
        if x.kind == "term":
            terms.add(x.params[1])
        elif x.kind == "bool":
            for _o, s in x.params:
                walk(s)
    walk(q)
    assert {"cat", "dog"} <= terms


def test_field_scoped_group(schema):
    q = parse_query("title:(foo bar)", schema)
    fields = set()

    def walk(x):
        if x.kind == "term":
            fields.add(x.params[0])
        elif x.kind == "bool":
            for _o, s in x.params:
                walk(s)
    walk(q)
    assert fields == {"title"}


def test_and_does_not_leak_over_empty_clause(schema):
    # '!!!' tokenizes to nothing; bar must stay SHOULD
    q = parse_query("foo AND !!! bar", schema, default_fields=["body"])
    occurs = {sub.params[1]: o for o, sub in _clauses(q)}
    assert occurs.get(Query.term("body", "bar").params[1]) == Occur.SHOULD


def test_lenient_survives_unclosed_quote(schema):
    q = parse_query('foo "bar', schema, lenient=True,
                    default_fields=["body"])
    assert q.kind in ("bool", "term")
    with pytest.raises(QueryParseError):
        parse_query('foo "bar', schema, lenient=False)


def test_string_fingerprint_nul_bytes_distinct():
    fps = string_fingerprint(np.array(["a", "a\x00b", "a\x00c", None],
                                      object))
    assert fps[3] == 0
    assert len({fps[0], fps[1], fps[2]}) == 3


def test_facet_encode_injective():
    assert facet_encode("a\\", "b") != facet_encode("a/b")
    assert facet_parts(facet_encode("a\\", "b")) == ["a\\", "b"]
    assert facet_parts(facet_encode("a/b")) == ["a/b"]
    assert facet_parts(facet_encode("", "a")) == ["", "a"]
    assert facet_parts("/") == []
    assert facet_parts("") == []


def test_ip_bounds_not_falsy():
    lo, hi = expand_ip_query_bounds(None, "10.0.0.1")
    assert lo is None and hi is not None
    with pytest.raises(ValueError):
        expand_ip_query_bounds("", "10.0.0.1")
