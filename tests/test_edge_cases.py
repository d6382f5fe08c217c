"""Combinator and API edge cases over a tiny index."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_edge"


@pytest.fixture(scope="module")
def r(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    pq.write_table(pa.table({
        "t": pa.array(["a b c", "b c d", "c d e", None, ""]),
        "v": pa.array([1.0, 2.0, None, 4.0, 5.0])}),
        f"{BASE}/docs.parquet")
    s = IndexSchema()
    s.add_text_field("t", index_option="position")
    s.add_float_field("v", fast=True)
    build_index(f"{BASE}/docs.parquet", f"{BASE}/idx", s, num_shards=2)
    return IndexReader(f"{BASE}/idx")


def test_must_not_only_matches_nothing(r):
    q = Query.boolean([(Occur.MUST_NOT, Query.term("t", "a"))])
    docs, _ = r.evaluate(q)
    assert len(docs) == 0  # no positive clause -> no matches (tantivy)


def test_must_with_missing_term(r):
    q = Query.boolean([(Occur.MUST, Query.term("t", "a")),
                       (Occur.MUST, Query.term("t", "zzz"))])
    docs, _ = r.evaluate(q)
    assert len(docs) == 0


def test_should_with_some_empty_clauses(r):
    q = Query.boolean([(Occur.SHOULD, Query.term("t", "zzz")),
                       (Occur.SHOULD, Query.term("t", "e"))])
    docs, _ = r.evaluate(q)
    assert list(docs) == [2]


def test_nested_boost_of_bool(r):
    inner = Query.boolean([(Occur.SHOULD, Query.term("t", "b")),
                           (Occur.SHOULD, Query.term("t", "c"))])
    d1, s1 = r.evaluate(inner)
    d2, s2 = r.evaluate(Query.boost(inner, 2.0))
    assert np.array_equal(d1, d2)
    np.testing.assert_allclose(s2, s1 * 2.0, rtol=1e-6)


def test_dismax_zero_tie_equals_max(r):
    q1 = Query.term("t", "b")
    q2 = Query.term("t", "c")
    docs, scores = r.evaluate(Query.disjunction_max([q1, q2], 0.0))
    d1, s1 = r.evaluate(q1)
    d2, s2 = r.evaluate(q2)
    best = {}
    for d, s in list(zip(d1, s1)) + list(zip(d2, s2)):
        best[d] = max(best.get(d, 0.0), float(s))
    assert {int(d): pytest.approx(best[d]) for d in docs} == \
        {int(d): float(s) for d, s in zip(docs, scores)}


def test_const_score_wraps_anything(r):
    docs, scores = r.evaluate(Query.const_score(Query.range("v", 2.0, None),
                                                1.5))
    assert list(docs) == [1, 3, 4]
    assert (scores == 1.5).all()


def test_range_inverted_bounds_empty(r):
    docs, _ = r.evaluate(Query.range("v", 10.0, 1.0))
    assert len(docs) == 0


def test_exists_respects_nulls(r):
    docs, _ = r.evaluate(Query.exists("v"))
    assert list(docs) == [0, 1, 3, 4]


def test_limit_beyond_hits_and_offset_past_end(r):
    res = r.search(Query.term("t", "a"), limit=100)
    assert len(res) == 1
    res = r.search(Query.term("t", "a"), limit=10, offset=5)
    assert len(res) == 0


def test_retrieve_empty(r):
    assert r.retrieve_docs([]).num_rows == 0


def test_term_set_missing_terms(r):
    docs, _ = r.evaluate(Query.term_set("t", ["zzz", "yyy"]))
    assert len(docs) == 0
    docs, _ = r.evaluate(Query.term_set("t", ["zzz", "a"]))
    assert list(docs) == [0]


def test_match_all_and_none(r):
    docs, _ = r.evaluate(Query.all())
    assert list(docs) == [0, 1, 2, 3, 4]
    docs, _ = r.evaluate(Query.match_none())
    assert len(docs) == 0


def test_aggregate_none_query_counts_all(r):
    out = r.aggregate(None, {"n": {"value_count": {"field": "v"}}})
    assert out["n"]["value"] == 4  # one null


def test_empty_and_null_text_rows(r):
    # doc 3 (null) and doc 4 (empty) produce no tokens but exist
    assert r.num_docs == 5
    assert r.doc_freq("t", "a") == 1


def test_phrase_across_all_docs(r):
    docs, _ = r.evaluate(Query.phrase("t", ["c", "d"]))
    assert list(docs) == [1, 2]
    docs, _ = r.evaluate(Query.phrase("t", ["d", "c"]))
    assert len(docs) == 0


def test_search_pool_matches_reader(r, ray_session):
    from tantivy4java_ray.pipelines.search import SearchPool
    pool = SearchPool(f"{BASE}/idx", num_actors=2, limit=5)
    queries = ["a", "b AND c", "t:e", "zzz"]
    # query-shaped warmup across the pool: one summary per actor, and
    # results after warmup are unchanged
    infos = pool.warmup("a OR (b AND c)")
    assert len(infos) == 2
    assert all(i["postings_runs"] > 0 for i in infos)
    got = pool.search_many(queries)
    pool.shutdown()
    for q, hits in zip(queries, got):
        assert hits == r.search(q, 5).hits, q


def test_sharded_pool_warmup(r, ray_session):
    from tantivy4java_ray.pipelines.search import ShardedSearchPool
    pool = ShardedSearchPool(f"{BASE}/idx", num_actors=2, limit=5,
                             prewarm=False)
    infos = pool.warmup("a")
    assert len(infos) == len(pool.ranges)
    hits = pool.search("a", 5).hits
    pool.shutdown()
    assert hits == r.search("a", 5).hits
