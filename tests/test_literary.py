"""Literary mini-corpus ported from the reference's JUnit parity tests
(FIXTURES.md F2; ``PythonParityTest.java:221-263,423-436``,
``ExplanationAndFrequencyTest.java``)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_literary"

DOCS = [
    {"title": ["The Old Man and the Sea"],
     "body": "He was an old man who fished alone in a skiff in the Gulf "
             "Stream and he had gone eighty-four days now without taking "
             "a fish.",
     "name": "Hemingway", "reference": [100]},
    {"title": ["Frankenstein", "The Modern Prometheus"],
     "body": "You will rejoice to hear that no disaster has accompanied the "
             "commencement of an enterprise which you have regarded with "
             "such evil forebodings.",
     "name": "Mary Shelley", "reference": [200]},
    {"title": None, "body": None, "name": "Bill", "reference": [1, 2]},
    {"title": ["Of Mice and Men"],
     "body": "A few miles south of Soledad, the Salinas River drops in close "
             "to the hillside bank and runs deep and green. The water is "
             "warm too, for it has slipped twinkling over the yellow sands "
             "in the sunlight before reaching the narrow pool.",
     "name": "Steinbeck", "reference": [300]},
    # 5-doc variant for the docFreq assertion: "sea" df=3
    {"title": ["The Sea, The Sea"], "body": "sea sea sea and more sea",
     "name": "Murdoch", "reference": [400]},
]


@pytest.fixture(scope="module")
def reader(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    tbl = pa.table({
        "title": pa.array([d["title"] for d in DOCS],
                          pa.list_(pa.string())),
        "body": pa.array([d["body"] for d in DOCS], pa.string()),
        "name": pa.array([d["name"] for d in DOCS], pa.string()),
        "reference": pa.array([d["reference"] for d in DOCS],
                              pa.list_(pa.int64())),
    })
    pq.write_table(tbl, f"{BASE}/corpus.parquet")
    s = IndexSchema()
    s.add_text_field("title", stored=True, index_option="position")
    s.add_text_field("body", stored=True, index_option="position")
    s.add_text_field("name", stored=True, index_option="position")
    build_index(f"{BASE}/corpus.parquet", f"{BASE}/idx", s, num_shards=2)
    return IndexReader(f"{BASE}/idx")


def test_doc_freq_sea(reader):
    # title doc0 + title doc4 + body doc4 are separate fields; body df:
    assert reader.doc_freq("body", "sea") == 1
    # "sea" appears in title of docs 0 and 4 -> df=2; plus body doc4 = 3
    # total across text fields (ExplanationAndFrequencyTest:310 counts 3)
    total = reader.doc_freq("title", "sea") + reader.doc_freq("body", "sea")
    assert total == 3


def test_multivalued_title(reader):
    # both values of doc1's multi-valued title are indexed
    d1, _ = reader.evaluate(Query.term("title", "frankenstein"))
    d2, _ = reader.evaluate(Query.term("title", "prometheus"))
    assert list(d1) == [1] and list(d2) == [1]


def test_term_case_sensitivity(reader):
    # index stores lowercase; raw term query is NOT analyzed
    hits, _ = reader.evaluate(Query.term("title", "frankenstein"))
    assert len(hits) == 1
    miss, _ = reader.evaluate(Query.term("title", "Frankenstein"))
    assert len(miss) == 0
    # parseQuery analyzes -> both cases hit
    assert len(reader.search("title:FRANKENSTEIN", 5).hits) == 1


def test_phrase_old_man(reader):
    docs, _ = reader.evaluate(Query.phrase("body", ["old", "man"]))
    assert list(docs) == [0]
    docs, _ = reader.evaluate(Query.phrase("title", ["old", "man"]))
    assert list(docs) == [0]


def test_bm25_tf_ordering(reader):
    # doc4 has tf(sea)=4 in body -> highest body score for "sea"
    hits = reader.search(Query.term("body", "sea"), 5).hits
    assert hits[0][1] == 4


def test_bool_patterns(reader):
    q = Query.boolean([(Occur.MUST, Query.term("body", "old")),
                       (Occur.MUST, Query.term("body", "man"))])
    docs, _ = reader.evaluate(q)
    assert list(docs) == [0]
    q = Query.boolean([(Occur.SHOULD, Query.term("name", "hemingway")),
                       (Occur.SHOULD, Query.term("name", "bill"))])
    docs, _ = reader.evaluate(q)
    assert list(docs) == [0, 2]


def test_fuzzy_conjunction_no_hits(reader):
    # two-fuzzy-MUST conjunction expecting 0 hits (PythonParityTest:465)
    q = Query.boolean([
        (Occur.MUST, Query.fuzzy_term("title", "prometheus", 1)),
        (Occur.MUST, Query.fuzzy_term("title", "mice", 0))])
    docs, _ = reader.evaluate(q)
    assert len(docs) == 0


def test_retrieve_multivalued(reader):
    tbl = reader.retrieve_docs([1, 2], columns=["title", "reference"])
    assert tbl.column("title").to_pylist()[0] == ["Frankenstein",
                                                  "The Modern Prometheus"]
    assert tbl.column("reference").to_pylist() == [[200], [1, 2]]


def test_explain(reader):
    ex = reader.explain(Query.term("body", "sea"), 4)
    assert ex["matched"] and ex["df"] == 1 and ex["score"] > 0


def test_explain_non_term_nodes(reader):
    # round-3: every scorer kind reports node-level detail
    # (Query.java:459-465 — the reference explains every scorer)
    ex = reader.explain(Query.phrase("body", ["more", "sea"]), 4)
    assert ex["matched"] and ex["terms"] == ["more", "sea"]
    assert ex["dfs"]["sea"] == 1 and ex["idf_sum"] > 0
    ex = reader.explain(Query.fuzzy_term("body", "sae", 1), 4)
    assert "sea" in ex["expanded_terms"]
    ex = reader.explain(Query.wildcard("body", "se*"), 4)
    assert ex["const_score"] and ex["pattern"] == "se*"
    ex = reader.explain(Query.term_set("body", ["sea", "xyzzy"]), 4)
    assert ex["matched_terms"] == ["sea"]
    ex = reader.explain(
        Query.const_score(Query.term("body", "sea"), 1.5), 4)
    assert ex["score"] == 1.5 and ex["clauses"][0]["kind"] == "term"


def test_more_like_this(reader):
    q = Query.more_like_this({"body": DOCS[0]["body"]}, min_doc_freq=1)
    hits = reader.search(q, 3).hits
    assert hits[0][1] == 0  # most similar to itself


# ---------------------------------------------------------------------------
# Pinned f32 scores on the QUANTIZED-norm path (the default users get).
# A live differential against the tantivy PyPI bindings is impossible in
# this environment (no network/pip), so the expectation is re-derived
# INDEPENDENTLY here from tantivy's published BM25 (idf = ln(1 + (N - df
# + 0.5)/(df + 0.5)), k1=1.2, b=0.75) with the u8 fieldnorm
# quantization table (tantivy fieldnorm.rs constants, pinned separately
# in test_fieldnorm.py) and f32 arithmetic — exercising the whole
# analyzer -> norm-id -> table-decode -> f32 scoring chain end to end.
# ---------------------------------------------------------------------------

def _expected_f32_term_score(texts, qdoc, term, boost=1.0):
    import re as _re

    import numpy as np
    from tantivy4java_ray.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id

    toks = [_re.findall(r"[a-z0-9]+", (t or "").lower()) for t in texts]
    n = len(texts)
    dls = np.array([len(t) for t in toks], np.int64)
    avgdl = dls.sum() / n
    tf = toks[qdoc].count(term)
    df = sum(1 for t in toks if term in t)
    idf = np.log1p((n - df + 0.5) / (df + 0.5))
    weight = np.float32(boost * idf * (1.2 + 1.0))
    # quantized dl: encode to u8 id, decode through the table
    dl_q = np.float64(FIELD_NORMS_TABLE[fieldnorm_to_id(dls[qdoc:qdoc + 1])[0]])
    denom = np.float32(1.2 * (1.0 - 0.75 + 0.75 * dl_q / avgdl))
    return np.float32(weight * np.float32(tf) / (np.float32(tf) + denom))


def test_quantized_f32_scores_pinned(reader):
    import numpy as np

    bodies = [d["body"] for d in DOCS]
    # term 'sea' on body: only doc4 (tf=4)
    docs, scores = reader.evaluate(Query.term("body", "sea"))
    assert docs.tolist() == [4]
    want = _expected_f32_term_score(bodies, 4, "sea")
    assert scores.dtype == np.float32
    assert scores[0] == want          # bit-exact f32
    # term 'old' on body: doc0 (tf=2: 'old man' + 'eighty-four'? no —
    # 'old' appears once; recompute expectation rather than assume)
    docs, scores = reader.evaluate(Query.term("body", "old"))
    assert docs.tolist() == [0]
    assert scores[0] == _expected_f32_term_score(bodies, 0, "old")
    # boost multiplies the weight INSIDE the f32 chain
    docs, bscores = reader.evaluate(Query.boost(Query.term("body", "old"),
                                                2.0))
    assert bscores[0] == _expected_f32_term_score(bodies, 0, "old", 2.0)
    # SHOULD-union sums the two term scores in f32
    q = Query.boolean([(Occur.SHOULD, Query.term("body", "sea")),
                       (Occur.SHOULD, Query.term("body", "water"))])
    docs, sscores = reader.evaluate(q)
    by_doc = dict(zip(docs.tolist(), sscores))
    assert by_doc[4] == _expected_f32_term_score(bodies, 4, "sea")
    assert by_doc[3] == _expected_f32_term_score(bodies, 3, "water")
    # WAND produces the identical f32 hits
    hits_scan = reader.search(q, 5, method="auto").hits
    hits_wand = reader.search(q, 5, method="wand").hits
    assert hits_scan == hits_wand
