"""End-to-end build -> query conformance on the synthetic webpages table
(FIXTURES.md F1/F3), with a brute-force BM25 oracle computed in the test."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.analyzer import get_analyzer
from tantivy4java_ray.fieldnorm import fieldnorm_to_id, id_to_fieldnorm
from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader, batch_search
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema
from tantivy4java_ray.sources.webpages import write_webpages
from tantivy4java_ray.stages.extract import extract_text

N_DOCS = 1000
IDX = "/tmp/t4jr_test_index"
DATA = "/tmp/t4jr_test_webpages"


def webpage_schema() -> IndexSchema:
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("url", stored=True, fast=True)
    s.add_string_field("lang", fast=True)
    s.add_date_field("warc_ts", fast=True)
    return s


@pytest.fixture(scope="module")
def corpus(ray_session):
    shutil.rmtree(DATA, ignore_errors=True)
    shutil.rmtree(IDX, ignore_errors=True)
    paths = write_webpages(DATA, N_DOCS, n_files=2, rows_per_row_group=150)
    res = build_index(paths, IDX, webpage_schema(),
                      html_fallback=("text", "html"),
                      target_docs_per_partition=200, num_shards=8)
    # the tokenization oracle: same per-row text the build must have seen
    texts = []
    for p in paths:
        t = pq.read_table(p, columns=["text", "html"])
        for txt, h in zip(t.column("text").to_pylist(),
                          t.column("html").to_pylist()):
            texts.append(txt if txt is not None else extract_text(h))
    ana = get_analyzer("default")
    docs_tokens = [ana.tokenize(t) for t in texts]
    return res, IndexReader(IDX), docs_tokens


def brute_force_term(reader, docs_tokens, term, boost=1.0):
    """Reference BM25 (same formula + quantization) computed directly."""
    tf = np.array([toks.count(term) for toks in docs_tokens], np.float32)
    docs = np.flatnonzero(tf > 0)
    df = len(docs)
    n = len(docs_tokens)
    avgdl = sum(len(t) for t in docs_tokens) / n
    dls = id_to_fieldnorm(fieldnorm_to_id(
        np.array([len(docs_tokens[d]) for d in docs]))).astype(np.float64)
    idf = np.log1p((n - df + 0.5) / (df + 0.5))
    w = np.float32(boost * idf * 2.2)
    denom = (1.2 * (1 - 0.75 + 0.75 * dls / avgdl)).astype(np.float32)
    tfs = tf[docs]
    return docs, w * tfs / (tfs + denom)


def test_build_counts(corpus):
    res, reader, _ = corpus
    assert res.num_docs == N_DOCS
    # 2 files x (rg 150+150 -> part, rg 150+50 -> part) = 4 partitions
    assert res.num_partitions == 4
    assert reader.num_docs == N_DOCS


def test_docfreq_matches_brute_force(corpus):
    _, reader, docs_tokens = corpus
    for term in ("w0000", "w0123", "w4567", "needleterm", "zzz_absent"):
        expected = sum(1 for t in docs_tokens if term in t)
        assert reader.doc_freq("text", term) == expected, term


def test_needleterm_exact_hits(corpus):
    _, reader, _ = corpus
    docs, _ = reader.evaluate(Query.term("text", "needleterm"))
    assert list(docs) == [d for d in range(N_DOCS) if d % 97 == 0]


def test_term_scores_match_brute_force(corpus):
    _, reader, docs_tokens = corpus
    for term in ("needleterm", "w0042", "w0000"):
        docs, scores = reader.evaluate(Query.term("text", term))
        bdocs, bscores = brute_force_term(reader, docs_tokens, term)
        assert np.array_equal(docs, bdocs)
        np.testing.assert_array_equal(scores, bscores.astype(np.float32))


def test_phrase_marker(corpus):
    _, reader, _ = corpus
    docs, _ = reader.evaluate(Query.phrase("text",
                                           ["alpha", "bravo", "charlie"]))
    assert list(docs) == [0, 997]


def test_phrase_slop(corpus):
    _, reader, _ = corpus
    d0, _ = reader.evaluate(Query.phrase("text", ["alpha", "charlie"], slop=0))
    d1, _ = reader.evaluate(Query.phrase("text", ["alpha", "charlie"], slop=1))
    assert len(d0) == 0
    assert set(d1) >= {0, 997}


def test_boolean_semantics(corpus):
    _, reader, docs_tokens = corpus
    q = Query.boolean([(Occur.MUST, Query.term("text", "w0000")),
                       (Occur.MUST_NOT, Query.term("text", "w0001"))])
    docs, _ = reader.evaluate(q)
    expected = [i for i, t in enumerate(docs_tokens)
                if "w0000" in t and "w0001" not in t]
    assert list(docs) == expected


def test_should_sum_scoring(corpus):
    _, reader, docs_tokens = corpus
    q = Query.boolean([(Occur.SHOULD, Query.term("text", "needleterm")),
                       (Occur.SHOULD, Query.term("text", "w0042"))])
    docs, scores = reader.evaluate(q)
    d1, s1 = brute_force_term(reader, docs_tokens, "needleterm")
    d2, s2 = brute_force_term(reader, docs_tokens, "w0042")
    exp = {}
    for d, s in zip(d1, s1):
        exp[d] = exp.get(d, np.float32(0)) + s
    for d, s in zip(d2, s2):
        exp[d] = exp.get(d, np.float32(0)) + s
    assert set(docs) == set(exp)
    for d, s in zip(docs, scores):
        assert s == pytest.approx(float(exp[d]), abs=1e-6)


def test_wand_equals_scan(corpus):
    _, reader, _ = corpus
    q = Query.boolean([(Occur.SHOULD, Query.term("text", f"w{i:04d}"))
                       for i in (0, 1, 5, 77, 1234)])
    scan = reader.search(q, limit=25, method="scan").hits
    wand = reader.search(q, limit=25, method="wand").hits
    assert scan == wand


def test_range_over_date_fast_field(corpus):
    _, reader, _ = corpus
    lo = "2024-01-01T00:01:00"
    hi = "2024-01-01T00:02:00"
    docs, _ = reader.evaluate(Query.range("warc_ts", lo, hi,
                                          include_upper=False))
    assert list(docs) == list(range(60, 120))


def test_string_field_term_and_exists(corpus):
    _, reader, _ = corpus
    docs, _ = reader.evaluate(Query.term("lang", "de"))
    # lang layout: en x17, de (17), fr (18), "" (19) per doc_id % 20
    assert list(docs) == [d for d in range(N_DOCS) if d % 20 == 17]
    docs, _ = reader.evaluate(Query.term("url",
                                         "https://site1.example/page/1"))
    assert list(docs) == [1]


def test_wildcard_and_regex(corpus):
    _, reader, _ = corpus
    dw, _ = reader.evaluate(Query.wildcard("text", "needle*"))
    dn, _ = reader.evaluate(Query.term("text", "needleterm"))
    assert np.array_equal(dw, dn)
    dr, _ = reader.evaluate(Query.regex("text", "needle.erm"))
    assert np.array_equal(dr, dn)


def test_fuzzy(corpus):
    _, reader, _ = corpus
    df_, _ = reader.evaluate(Query.fuzzy_term("text", "needleterx", 1))
    dn, _ = reader.evaluate(Query.term("text", "needleterm"))
    assert set(dn).issubset(set(df_))


def test_retrieve_docs_roundtrip(corpus):
    _, reader, _ = corpus
    hits = reader.search(Query.term("text", "needleterm"), limit=5).hits
    ids = [h[1] for h in hits]
    tbl = reader.retrieve_docs(ids, columns=["url"])
    assert tbl.column("url").to_pylist() == [
        f"https://site{d % 1000}.example/page/{d}" for d in ids]


def test_batch_search_matches_single(corpus, ray_session):
    _, reader, _ = corpus
    queries = ["needleterm", "w0042 AND w0000", 'text:"alpha bravo charlie"']
    out = batch_search(IDX, queries, limit=5, concurrency=2).to_pandas()
    for qid, qtext in enumerate(queries):
        mine = reader.search(qtext, limit=5).hits
        got = out[out.query_id == qid].sort_values("rank")
        assert list(got.doc_id) == [h[1] for h in mine]


def test_partitioning_invariance(corpus, ray_session):
    """Same corpus, different partitioning/sharding -> identical results."""
    _, reader, _ = corpus
    idx2 = IDX + "_alt"
    shutil.rmtree(idx2, ignore_errors=True)
    build_index(sorted(
        os.path.join(DATA, f) for f in os.listdir(DATA)), idx2,
        webpage_schema(), html_fallback=("text", "html"),
        target_docs_per_partition=450, num_shards=3)
    r2 = IndexReader(idx2)
    for qtext in ("needleterm", "w0000 w0042", 'text:"alpha bravo charlie"',
                  "w0123 AND NOT w0000"):
        assert reader.search(qtext, 20).hits == r2.search(qtext, 20).hits


def test_aggregations_on_index(corpus):
    _, reader, _ = corpus
    out = reader.aggregate(Query.term("text", "needleterm"), {
        "langs": {"terms": {"field": "lang", "size": 10}},
        "n": {"value_count": {"field": "warc_ts"}}})
    marker = [d for d in range(N_DOCS) if d % 97 == 0]
    assert out["n"]["value"] == len(marker)
    total = sum(b["doc_count"] for b in out["langs"]["buckets"])
    assert total == len(marker)
