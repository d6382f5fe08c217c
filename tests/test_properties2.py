"""Property tests for round-3 additions: prefix edit distance, lenient
parser totality, query JSON wire roundtrip, facet encoding injectivity,
IP term order preservation."""

import ipaddress
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tantivy4java_ray.functions.scalars import (facet_encode, facet_parts,
                                                ip_term)
from tantivy4java_ray.pipelines.search import _edit_distance
from tantivy4java_ray.query import Occur, Query, parse_query
from tantivy4java_ray.schema import IndexSchema

_SCHEMA = IndexSchema()
_SCHEMA.add_text_field("text")
_SCHEMA.add_integer_field("n", fast=True)


def _brute_prefix_dist(a: str, b: str, transposition: bool) -> int:
    big = max(len(a), len(b)) + 2
    return min(_edit_distance(a, b[:j], big, transposition)
               for j in range(len(b) + 1))


@given(st.text(alphabet="abcd", max_size=10),
       st.text(alphabet="abcd", max_size=14),
       st.integers(0, 3), st.booleans())
@settings(max_examples=300, deadline=None)
def test_prefix_edit_distance_matches_brute_force(a, b, cap, transp):
    got = _edit_distance(a, b, cap, transp, prefix=True)
    true = _brute_prefix_dist(a, b, transp)
    if true <= cap:
        assert got == true
    else:
        assert got > cap


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_lenient_parse_never_raises(text):
    q = parse_query(text, _SCHEMA, lenient=True)
    assert isinstance(q, Query)


def _queries():
    leaf = st.one_of(
        st.builds(Query.term, st.just("text"), st.text(max_size=8)),
        st.builds(Query.range, st.just("n"), st.integers(0, 100),
                  st.integers(0, 100)),
        st.builds(Query.fuzzy_term, st.just("text"),
                  st.text(min_size=1, max_size=6), st.integers(0, 2)),
        st.just(Query.all()),
        st.builds(Query.exists, st.just("n")))
    return st.recursive(
        leaf,
        lambda kids: st.one_of(
            st.builds(lambda a, b: Query.boolean(
                [(Occur.MUST, a), (Occur.SHOULD, b)]), kids, kids),
            st.builds(lambda a: Query.boost(a, 2.0), kids),
            st.builds(lambda a, b: Query.disjunction_max([a, b], 0.3),
                      kids, kids)),
        max_leaves=6)


@given(_queries())
@settings(max_examples=200, deadline=None)
def test_query_json_wire_roundtrip(q):
    assert Query.from_json(q.to_json()) == q


@given(st.lists(st.text(alphabet=st.characters(
    blacklist_categories=("Cs",)), max_size=8), min_size=1, max_size=4))
@settings(max_examples=300, deadline=None)
def test_facet_roundtrip(parts):
    if parts == [""]:
        # encode([""]) == "/" == the ROOT facet (zero segments) — a
        # facet of one empty segment is not representable, matching
        # tantivy's Facet::from_text("/") semantics
        assert facet_parts(facet_encode(*parts)) == []
        return
    assert facet_parts(facet_encode(*parts)) == list(parts)


@given(st.lists(st.integers(0, 2**32 - 1), min_size=2, max_size=50,
                unique=True))
@settings(max_examples=200, deadline=None)
def test_ip_term_order_preserving_v4(ints):
    ips = [str(ipaddress.IPv4Address(x)) for x in ints]
    terms = [ip_term(ip) for ip in ips]
    order_num = np.argsort(np.asarray(ints, np.uint64))
    order_lex = np.argsort(np.asarray(terms, object))
    assert list(order_num) == list(order_lex)


@given(st.lists(st.integers(0, 2**128 - 1), min_size=2, max_size=30,
                unique=True))
@settings(max_examples=100, deadline=None)
def test_ip_term_order_preserving_v6(ints):
    # exclude the v4-mapped range, which canonicalizes through v4
    ints = [x for x in ints if not (0xFFFF00000000 <= x < 0x1_0000_0000_0000)]
    if len(ints) < 2:
        return
    ips = [str(ipaddress.IPv6Address(x)) for x in ints]
    terms = [ip_term(ip) for ip in ips]
    by_num = [t for _x, t in sorted(zip(ints, terms))]
    assert by_num == sorted(terms)


def _osa_reference(a: str, b: str, transposition: bool) -> int:
    """Independent full-matrix OSA DP (same as the naive model in
    test_differential_r4d) — NOT derived from the engine's banded DP."""
    la, lb = len(a), len(b)
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (transposition and i > 1 and j > 1
                    and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


@given(st.text(alphabet="abcdeé\U0001F600", max_size=12),
       st.text(alphabet="abcdeé\U0001F600", max_size=12),
       st.integers(0, 3), st.booleans())
@settings(max_examples=400, deadline=None)
def test_edit_distance_matches_independent_osa(a, b, cap, transp):
    """The engine's banded DP vs a full-matrix OSA written separately:
    exact agreement at or under the cap, and 'above cap' agreement
    beyond it (the band may return any value > cap there)."""
    got = _edit_distance(a, b, cap, transp)
    true = _osa_reference(a, b, transp)
    if true <= cap:
        assert got == true, (a, b, cap, transp)
    else:
        assert got > cap, (a, b, cap, transp)


@given(st.lists(st.text(
           alphabet=st.characters(
               codec="utf-8", categories=("L", "N", "P", "Z", "M", "S"),
               include_characters="\n\té世\U0001F600_-'"),
           max_size=40).map(lambda s: s + "x" * 0),
       max_size=8),
       st.sampled_from(["default", "whitespace", "keyword"]))
@settings(max_examples=200, deadline=None)
def test_tokenize_column_matches_scalar_any_unicode(texts, name):
    """The vectorized Arrow tokenize kernel is token-for-token identical
    to the scalar analyzer on arbitrary unicode — the byte-identical
    tokenization invariant, property-tested (fixtures pin the exact
    golden outputs; this pins vectorized == scalar on the full space)."""
    import pyarrow as pa
    from tantivy4java_ray.analyzer import get_analyzer, tokenize_column
    a = get_analyzer(name)
    out = tokenize_column(pa.array(texts, pa.string()), a)
    per_row: dict[int, list] = {}
    for t, r in zip(out["token"], out["row"]):
        per_row.setdefault(int(r), []).append(t)
    for i, text in enumerate(texts):
        assert per_row.get(i, []) == a.tokenize(text), (name, text)


@given(st.integers(1, 4), st.integers(250, 260))
@settings(max_examples=30, deadline=None)
def test_tokenize_column_255_byte_limit_boundary(nbytes_per_char, ln):
    """RemoveLongFilter boundary: tokens straddling the 255-BYTE limit
    (multi-byte chars hit it below 255 CHARS) drop identically in the
    vectorized and scalar paths."""
    import pyarrow as pa
    from tantivy4java_ray.analyzer import get_analyzer, tokenize_column
    ch = {1: "a", 2: "é", 3: "世", 4: "\U0001F600"}[
        nbytes_per_char]
    word = ch * ln
    text = f"pre {word} post"
    a = get_analyzer("default")
    out = tokenize_column(pa.array([text]), a)
    assert list(out["token"]) == a.tokenize(text)
    kept = len(word.encode()) <= 255
    assert (word in list(out["token"])) == kept


@given(st.lists(st.text(alphabet=st.characters(
    blacklist_categories=("Cs",)), max_size=40), min_size=0, max_size=12))
@settings(max_examples=60, deadline=None)
def test_repetition_stats_vectorized_equals_scalar(texts):
    # the lexsort/run-scan kernel must agree with a naive per-doc
    # Counter model on arbitrary unicode
    from collections import Counter

    import pyarrow as pa

    from tantivy4java_ray.functions.textstats import (_round6,
                                                      repetition_batch)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = repetition_batch(t).to_pandas()
    for i, s in enumerate(texts):
        # RE2's \s is [ \t\n\f\r] — NO \v — matching both the Arrow
        # kernel and the DuckDB oracle's regex engine
        words = [w for w in re.split(r"[ \t\n\f\r]+", s) if w]
        grams = [(a, b) for a, b in zip(words, words[1:])]
        row = out.iloc[i]
        assert row["n_words"] == len(words)
        for items, dup_col, top_col in (
                (words, "dup_word_frac", "top_word_frac"),
                (grams, "dup_2gram_frac", "top_2gram_frac")):
            if not items:
                assert row[dup_col] == 0.0 and row[top_col] == 0.0
                continue
            c = Counter(items)
            assert row[dup_col] == _round6(
                np.array([1 - len(c) / len(items)]))[0]
            assert row[top_col] == _round6(
                np.array([max(c.values()) / len(items)]))[0]
