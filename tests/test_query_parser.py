"""parseQuery mini-language fixtures (``core/Index.java:240-272`` surface;
quirks pinned per SURVEY.md §7.4)."""

import pytest

from tantivy4java_ray.query import Occur, Query, QueryParseError, parse_query
from tantivy4java_ray.schema import IndexSchema


@pytest.fixture(scope="module")
def schema():
    s = IndexSchema()
    s.add_text_field("title", index_option="position")
    s.add_text_field("body", index_option="position")
    s.add_string_field("lang")
    s.add_integer_field("year", fast=True)
    return s


def test_single_term_default_fields(schema):
    q = parse_query("hello", schema)
    # default fields = all text fields -> SHOULD over title/body
    assert q.kind == "bool"
    assert [c[1] for c in q.params] == [Query.term("title", "hello"),
                                        Query.term("body", "hello")]
    assert all(o == Occur.SHOULD for o, _ in q.params)


def test_query_text_is_analyzed(schema):
    # parseQuery("HELLO") matches lowercase index (DefaultTokenizerCaseTest)
    q = parse_query("HELLO", schema, default_fields=["title"])
    assert q == Query.term("title", "hello")


def test_field_qualified(schema):
    assert parse_query("title:hello", schema) == Query.term("title", "hello")
    assert parse_query("lang:DE", schema) == Query.term("lang", "DE")  # raw


def test_and_or_not(schema):
    q = parse_query("a AND b", schema, default_fields=["body"])
    assert q.params == ((Occur.MUST, Query.term("body", "a")),
                        (Occur.MUST, Query.term("body", "b")))
    q = parse_query("a OR b", schema, default_fields=["body"])
    assert all(o == Occur.SHOULD for o, _ in q.params)
    q = parse_query("a -b", schema, default_fields=["body"])
    assert q.params[1][0] == Occur.MUST_NOT
    q = parse_query("a NOT b", schema, default_fields=["body"])
    assert q.params[1][0] == Occur.MUST_NOT
    q = parse_query("+a b", schema, default_fields=["body"])
    assert q.params[0][0] == Occur.MUST
    assert q.params[1][0] == Occur.SHOULD


def test_phrase_and_single_token_phrase_rewrite(schema):
    q = parse_query('body:"old man"', schema)
    assert q == Query.phrase("body", ["old", "man"])
    # quoted single-token phrase -> plain term (index.rs:552-600 quirk)
    q = parse_query('body:"old"', schema)
    assert q == Query.term("body", "old")


def test_phrase_slop(schema):
    q = parse_query('body:"old man"~2', schema)
    assert q == Query.phrase("body", ["old", "man"], slop=2)


def test_range(schema):
    q = parse_query("year:[2000 TO 2010]", schema)
    assert q == Query.range("year", "2000", "2010", True, True)
    q = parse_query("year:{2000 TO 2010}", schema)
    assert q == Query.range("year", "2000", "2010", False, False)
    q = parse_query("year:[* TO 2010]", schema)
    assert q == Query.range("year", None, "2010", True, True)


def test_fuzzy(schema):
    q = parse_query("hello~2", schema, default_fields=["body"])
    assert q == Query.fuzzy_term("body", "hello", 2)
    q = parse_query("hello~", schema, default_fields=["body"])
    assert q == Query.fuzzy_term("body", "hello", 1)


def test_boost(schema):
    q = parse_query("hello^2.5", schema, default_fields=["body"])
    assert q == Query.boost(Query.term("body", "hello"), 2.5)


def test_wildcard(schema):
    q = parse_query("hel*", schema, default_fields=["body"])
    assert q == Query.wildcard("body", "hel*")
    q = parse_query("?ello", schema, default_fields=["body"])
    assert q == Query.wildcard("body", "?ello")


def test_grouping(schema):
    q = parse_query("(a OR b) AND c", schema, default_fields=["body"])
    assert q.kind == "bool"
    assert q.params[0][0] == Occur.MUST
    assert q.params[0][1].kind == "bool"
    assert q.params[1] == (Occur.MUST, Query.term("body", "c"))


def test_unknown_field_errors_and_lenient(schema):
    with pytest.raises(QueryParseError):
        parse_query("nosuch:x", schema)
    q = parse_query("nosuch:x", schema, lenient=True)
    assert q == Query.match_none()


def test_empty_query(schema):
    assert parse_query("", schema) == Query.match_none()
    assert parse_query("   ", schema) == Query.match_none()


def test_punctuation_only_term_dropped(schema):
    q = parse_query("!!! hello", schema, default_fields=["body"])
    assert q == Query.term("body", "hello")


def test_query_json_roundtrip_every_kind():
    # the stable JSON wire form (SplitQuery.toQueryAstJson analog):
    # from_json(to_json(q)) == q for every query kind
    from tantivy4java_ray.query import Occur, Query
    qs = [
        Query.term("f", "v"),
        Query.term_set("f", ["a", "b"]),
        Query.all(),
        Query.match_none(),
        Query.phrase("f", ["a", "b"], slop=1),
        Query.phrase("f", [(0, "a"), (2, "b")]),
        Query.fuzzy_term("f", "merge", 2, False, True),
        Query.boolean([(Occur.MUST, Query.term("f", "a")),
                       (Occur.SHOULD, Query.term("f", "b")),
                       (Occur.MUST_NOT, Query.term("f", "c"))]),
        Query.disjunction_max([Query.term("a", "x"), Query.term("b", "x")],
                              tie_breaker=0.3),
        Query.boost(Query.term("f", "v"), 2.0),
        Query.const_score(Query.term("f", "v"), 1.5),
        Query.range("n", 1, 10, include_upper=False),
        Query.range("s", "a", None),
        Query.regex("f", "ab.*", lenient=True),
        Query.wildcard("f", "ab*c"),
        Query.exists("f"),
        Query.json_term("j", "a.b", 42),
        Query.json_range("j", "k", 1.5, 9.5),
        Query.json_range("j", "k", "a", "z"),
        Query.json_exists("j", "a.b"),
        Query.more_like_this({"f": "some text"}, max_query_terms=10),
    ]
    for q in qs:
        s = q.to_json()
        back = Query.from_json(s)
        assert back == q, f"roundtrip failed for {q.kind}: {s}"
        # nested structures keep working end-to-end
        assert Query.from_json(Query.boost(q, 3.0).to_json()) \
            == Query.boost(q, 3.0)
