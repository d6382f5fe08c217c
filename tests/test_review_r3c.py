"""Regressions for the third round-3 review batch (deep search.py
audit): dismax negative-score floor, wildcard/regex newline semantics,
WAND limit=0, order-by int64 precision, prefix-fuzzy contract,
json_range boolean bounds, string-range tombstones, explain matched
on zero-score queries."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader, _edit_distance
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    """One shared index: text + raw string + big-int fast field."""
    base = tmp_path_factory.mktemp("r3c")
    src = str(base / "d.parquet")
    big = 9_007_199_254_740_992  # 2^53: adjacent ints collide in f64
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": ["colouring book", "color wheel", "colossal squid",
                 "crayon color", "apple pie", "apple tart"],
        "tag": ["line1\nline2", "line1 line2", "zz", "aa", "mm", "qq"],
        "sn": pa.array([big + 1, big, big + 3, big + 2, big - 1, big + 4],
                       pa.int64())}), src)
    s = IndexSchema().add_text_field("text")
    s.add_string_field("tag")
    s.add_integer_field("sn", fast=True)
    out = str(base / "idx")
    build_index(src, out, s, num_shards=2)
    return out


def test_dismax_keeps_negative_scores(idx):
    r = IndexReader(idx)
    q = Query.disjunction_max([Query.boost(Query.term("text", "apple"),
                                           -1.0)])
    docs, scores = r.evaluate(q)
    assert len(docs) == 2
    assert (scores < 0).all(), f"negative dismax floored: {scores}"
    # two negative clauses: max is the LESS negative one
    q2 = Query.disjunction_max([
        Query.const_score(Query.term("text", "apple"), -3.0),
        Query.const_score(Query.term("text", "pie"), -1.0)])
    docs2, scores2 = r.evaluate(q2)
    by_doc = dict(zip(docs2.tolist(), scores2.tolist()))
    assert by_doc[4] == -1.0       # pie doc: max(-3, -1)
    assert by_doc[5] == -3.0       # tart doc: only the -3 clause


def test_wildcard_and_regex_match_newline_in_raw_terms(idx):
    r = IndexReader(idx)
    docs, _ = r.evaluate(Query.wildcard("tag", "line1*line2"))
    assert docs.tolist() == [0, 1]
    docs, _ = r.evaluate(Query.wildcard("tag", "line1?line2"))
    assert docs.tolist() == [0, 1]
    # user regex: '.' spans the newline (tantivy-fst has no line modes)
    docs, _ = r.evaluate(Query.regex("tag", "line1.line2"))
    assert docs.tolist() == [0, 1]


def test_wand_limit_zero_and_scan_parity(idx):
    r = IndexReader(idx)
    q = Query.term("text", "apple")
    assert r.search(q, limit=0, method="wand").hits == []
    assert r.search(q, limit=0).hits == []


def test_order_by_int64_above_2_53(idx):
    r = IndexReader(idx)
    hits = r.search(Query.all(), 10, order_by_field="sn").hits
    assert [d for _v, d in hits] == [5, 2, 3, 0, 1, 4]
    hits = r.search(Query.all(), 10, order_by_field="sn",
                    descending=False).hits
    assert [d for _v, d in hits] == [4, 1, 0, 3, 2, 5]


def test_fuzzy_prefix_matches_prefix_within_distance(idx):
    r = IndexReader(idx)
    # 'colouring': prefix 'colour' is distance 1 from 'color', but the
    # FULL term is distance 4 — new_prefix semantics must admit it
    docs, _ = r.evaluate(Query.fuzzy_term("text", "color", 1, prefix=True))
    got = set(docs.tolist())
    assert 0 in got, "prefix-within-distance term missed"
    assert {1, 3} <= got          # exact 'color' docs
    assert 2 in got               # 'colossal': prefix 'colos' dist 1
    assert 4 not in got and 5 not in got
    # non-prefix mode unchanged: only whole-term distance counts
    docs, _ = r.evaluate(Query.fuzzy_term("text", "color", 1, prefix=False))
    assert set(docs.tolist()) == {1, 3}


def test_prefix_edit_distance_banded():
    assert _edit_distance("color", "colouring", 1, True, prefix=True) == 1
    assert _edit_distance("color", "colouring", 1, True) == 2  # capped
    assert _edit_distance("color", "xyz", 1, True, prefix=True) == 2
    assert _edit_distance("abcdef", "abdcefzzz", 1, True, prefix=True) == 1
    # stale-zero band cells must not leak into the prefix minimum
    assert _edit_distance("aaaaaaaa", "bbbbbbbb", 2, True, prefix=True) == 3
    assert _edit_distance("", "anything", 1, True, prefix=True) == 0


def test_json_range_boolean_bounds_rejected(idx):
    r = IndexReader(idx)
    with pytest.raises(TypeError, match="boolean"):
        r.evaluate(Query("json_range", ("text", "p", True, None,
                                        True, True)))


def test_string_range_respects_tombstones(idx, tmp_path):
    import shutil
    dup = str(tmp_path / "idx_tomb")
    shutil.copytree(idx, dup)
    np.save(f"{dup}/deleted_docs.npy", np.array([3], np.int64))
    r = IndexReader(dup)
    docs, _ = r.evaluate(Query.range("tag", "aa", "zz"))
    assert 3 not in docs.tolist()


def test_explain_matched_on_zero_score(idx):
    r = IndexReader(idx)
    q = Query.const_score(Query.term("text", "apple"), 0.0)
    ex = r.explain(q, 4)
    assert ex["matched"] is True and ex["score"] == 0.0
    ex = r.explain(q, 0)
    assert ex["matched"] is False


def test_bool_probe_paths_unchanged(idx):
    r = IndexReader(idx)
    q = Query.boolean([
        (Occur.MUST, Query.term("text", "apple")),
        (Occur.SHOULD, Query.term("text", "pie")),
        (Occur.MUST_NOT, Query.term("text", "tart"))])
    docs, scores = r.evaluate(q)
    assert docs.tolist() == [4]
    assert scores[0] > 0
