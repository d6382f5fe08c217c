"""Regressions for the round-3 review findings (query-side batch):
WAND on norm-less fields, IP term_set/explain encoding, exact-dl phrase
scoring, analyzer position gaps in parsed phrases, string-typed html
extraction, leaf-local facet counts, empty-batch executor schema."""

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

BASE = "/tmp/t4jr_review_r3"


@pytest.fixture(scope="module")
def idx(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    long_tok = "x" * 300  # dropped by RemoveLongFilter, leaves a gap
    pq.write_table(pa.table({
        "text": pa.array([f"foo {long_tok} bar", "foo bar baz",
                          "alpha beta gamma", "beta gamma delta"] * 25),
        "tag": pa.array(["red", "blue", "red", "green"] * 25),
        "ip": pa.array(["9.0.0.1", "10.255.255.255", "2.1.1.1",
                        "192.168.0.1"] * 25),
        "cat": pa.array(["/a/x", "/a/y", "/b/x", "/b/y"] * 25),
        "doc_id": pa.array(range(100), pa.int64())}),
        f"{BASE}/docs.parquet", row_group_size=50)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("tag")
    s.add_ip_addr_field("ip")
    s.add_facet_field("cat")
    s.add_integer_field("doc_id", fast=True)
    build_index(f"{BASE}/docs.parquet", f"{BASE}/idx", s, num_shards=2,
                target_docs_per_partition=50)
    return f"{BASE}/idx"


def test_wand_falls_back_on_normless_fields(idx):
    """method='wand' on a STRING field (no norm__ column) must take the
    scan path instead of crashing on the missing norms read."""
    r = IndexReader(idx)
    wand = r.search(Query.term("tag", "red"), 10, method="wand").hits
    scan = r.search(Query.term("tag", "red"), 10).hits
    assert wand == scan and len(wand) == 10
    # mixed union with one norm-less field: also scan
    q = Query.boolean([(Occur.SHOULD, Query.term("text", "foo")),
                       (Occur.SHOULD, Query.term("tag", "red"))])
    assert r.search(q, 10, method="wand").hits == r.search(q, 10).hits
    # pure TEXT union still runs (and matches) either way
    q2 = Query.boolean([(Occur.SHOULD, Query.term("text", "foo")),
                        (Occur.SHOULD, Query.term("text", "beta"))])
    assert r.search(q2, 10, method="wand").hits == r.search(q2, 10).hits


def test_term_set_and_explain_encode_ip(idx):
    r = IndexReader(idx)
    docs, _ = r.evaluate(Query.term_set("ip", ["9.0.0.1", "2.1.1.1"]))
    assert len(docs) == 50  # 2 of the 4 rotating values
    one, _ = r.evaluate(Query.term("ip", "9.0.0.1"))
    assert set(one).issubset(set(docs))
    ex = r.explain(Query.term("ip", "9.0.0.1"), int(one[0]))
    assert ex["matched"] and ex["df"] == 25 and ex["tf"] == 1


def test_parsed_phrase_keeps_analyzer_gaps(idx):
    """A quoted query containing a >255-byte token must match documents
    indexed with the same positional gap (tantivy keeps gaps in query
    analysis; enumerate-offsets missed every gapped phrase)."""
    from tantivy4java_ray.query import parse_query
    r = IndexReader(idx)
    long_tok = "x" * 300
    hits, _ = r.evaluate(parse_query(f'"foo {long_tok} bar"', r.schema,
                                     default_fields=["text"]))
    assert len(hits) == 25          # the gapped docs
    hits2, _ = r.evaluate(parse_query('"foo bar"', r.schema,
                                      default_fields=["text"]))
    assert len(hits2) == 25         # only the adjacent docs


def test_facet_counts_on_leaf_reader(idx):
    """A doc-range-pinned leaf must count only owned docs with AND
    without a query (dictionary df is global; root merges would
    double-count otherwise)."""
    full = IndexReader(idx)
    assert dict(full.facet_counts("cat", "/a"))["/a/x"] == 25
    leaf = IndexReader(idx, doc_range=(0, 50))
    plain = dict(leaf.facet_counts("cat", "/a"))
    with_q = dict(leaf.facet_counts("cat", "/a", query=Query.all()))
    assert plain == with_q
    assert plain["/a/x"] == 13      # docs 0,4,...,48 -> 13 of 50


def test_phrase_scores_exact_dl_mode(idx, tmp_path):
    """exact_fieldnorms indexes must score phrases with the f64 exact-dl
    formula (same branch as term queries), not quantized norm ids."""
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    pq.write_table(pa.table({
        "text": pa.array(["alpha beta " + "pad " * k for k in
                          (0, 30, 60, 90)])}), str(tmp_path / "d.parquet"))
    exact = str(tmp_path / "idx_exact")
    build_index(str(tmp_path / "d.parquet"), exact, s, num_shards=1,
                exact_fieldnorms=True)
    r = IndexReader(exact)
    docs, scores = r.evaluate(Query.phrase("text", ["alpha", "beta"]))
    assert scores.dtype == np.float64
    # manual exact-dl BM25: tf=1 per doc; phrase idf = sum of element
    # idfs (alpha and beta both have df=4, N=4); dl = 2 + k pads
    dls = np.array([2.0, 32.0, 62.0, 92.0])
    avgdl = dls.mean()
    idf = np.log(1 + (4 - 4 + 0.5) / (4 + 0.5))
    want = 2 * idf * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * dls / avgdl))
    assert np.allclose(scores, want, rtol=1e-12)


def test_extract_accepts_string_html():
    from tantivy4java_ray.stages.extract import (extract_text,
                                                 fill_text_from_html)
    h = "<p>Hello <b>world</b></p><script>no()</script>"
    assert extract_text(h) == extract_text(h.encode())
    text = pa.array([None, "kept"], pa.string())
    html = pa.array([h, None], pa.string())  # string-typed html column
    out = fill_text_from_html(text, html)
    assert out.to_pylist() == ["Hello world", "kept"]


def test_batch_search_empty_block_schema(idx, ray_session):
    """A query batch where nothing matches must emit a typed (not null)
    query_id column so Dataset blocks agree on schema."""
    from tantivy4java_ray.pipelines.search import batch_search
    res = batch_search(idx, ["zzznope", "foo", "qqqmiss"], limit=5)
    df = res if not hasattr(res, "to_pandas") else res.to_pandas()
    assert set(df["query_id"].unique()) == {1}
    assert df["query_id"].dtype.kind in "iu"
