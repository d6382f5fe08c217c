"""SURVEY §5(e) invariance: identical results regardless of build
parallelism/partitioning, plus a randomized query-tree differential
against a naive Python evaluator over the raw tokens."""

import shutil

import numpy as np
import pytest

from tantivy4java_ray.analyzer import get_analyzer
from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema
from tantivy4java_ray.sources.webpages import write_webpages

BASE = "/tmp/t4jr_invariance"
N = 1500


def _schema():
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    return s


@pytest.fixture(scope="module")
def builds(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    # SAME file layout for both builds (text is deterministic per
    # (seed, layout)); only partitioning/concurrency differ
    paths = write_webpages(f"{BASE}/data", N, n_files=3,
                           rows_per_row_group=250)
    a = f"{BASE}/idx_wide"
    b = f"{BASE}/idx_narrow"
    build_index(paths, a, _schema(), num_shards=8,
                html_fallback=("text", "html"),
                target_docs_per_partition=200)
    build_index(paths, b, _schema(), num_shards=8,
                html_fallback=("text", "html"),
                target_docs_per_partition=1000, concurrency=1)
    yield IndexReader(a), IndexReader(b), paths
    shutil.rmtree(BASE, ignore_errors=True)


def test_partitioning_invariance(builds):
    ra, rb, _ = builds
    assert ra.num_docs == rb.num_docs == N
    for term in ("w0000", "w0042", "w3131", "needleterm"):
        assert ra.doc_freq("text", term) == rb.doc_freq("text", term)
    for qt in ("needleterm", "w0000 AND w0042",
               'text:"alpha bravo charlie"', "w00* OR w0101",
               "lang:de"):
        assert ra.search(qt, 25).hits == rb.search(qt, 25).hits, qt


def _naive_eval(q: Query, docs_tokens) -> set[int]:
    """Match SET semantics only (scores covered by bm25 parity tests)."""
    k = q.kind
    if k == "term":
        return {i for i, t in enumerate(docs_tokens) if q.params[1] in t}
    if k == "term_set":
        vals = set(q.params[1])
        return {i for i, t in enumerate(docs_tokens) if vals & set(t)}
    if k == "phrase":
        words = [w for _o, w in q.params[1]]
        out = set()
        for i, toks in enumerate(docs_tokens):
            for j in range(len(toks) - len(words) + 1):
                if toks[j:j + len(words)] == words:
                    out.add(i)
                    break
        return out
    if k == "bool":
        musts = [s for o, s in q.params if o == Occur.MUST]
        shoulds = [s for o, s in q.params if o == Occur.SHOULD]
        nots = [s for o, s in q.params if o == Occur.MUST_NOT]
        if musts:
            cur = set.intersection(*[_naive_eval(s, docs_tokens)
                                     for s in musts])
        elif shoulds:
            cur = set.union(*[_naive_eval(s, docs_tokens)
                              for s in shoulds])
        else:
            return set()
        for s in nots:
            cur -= _naive_eval(s, docs_tokens)
        return cur
    if k == "dismax":
        subs = [_naive_eval(s, docs_tokens) for s in q.params[0]]
        return set.union(*subs) if subs else set()
    if k in ("boost", "const"):
        return _naive_eval(q.params[0], docs_tokens)
    raise AssertionError(k)


def test_random_query_trees_match_naive(builds):
    import pyarrow.parquet as pq

    from tantivy4java_ray.stages.extract import extract_text
    ra, _rb, paths = builds
    ana = get_analyzer("default")
    docs_tokens = []
    for p in paths:
        t = pq.read_table(p, columns=["text", "html"])
        for txt, h in zip(t.column("text").to_pylist(),
                          t.column("html").to_pylist()):
            docs_tokens.append(ana.tokenize(
                txt if txt is not None else extract_text(h)))

    rng = np.random.default_rng(7)
    vocab = ["w0000", "w0001", "w0042", "w0101", "w3131", "needleterm",
             "alpha", "bravo", "zzz_absent"]

    def rand_tree(depth: int) -> Query:
        if depth == 0 or rng.random() < 0.4:
            r = rng.random()
            if r < 0.6:
                return Query.term("text", str(rng.choice(vocab)))
            if r < 0.75:
                return Query.term_set(
                    "text", [str(w) for w in
                             rng.choice(vocab, 2, replace=False)])
            if r < 0.9:
                return Query.phrase("text", ["alpha", "bravo", "charlie"])
            return Query.const_score(
                Query.term("text", str(rng.choice(vocab))), 2.0)
        r = rng.random()
        kids = [rand_tree(depth - 1) for _ in range(2)]
        if r < 0.5:
            occ = [Occur.MUST, Occur.SHOULD, Occur.MUST_NOT]
            return Query.boolean([
                (occ[int(rng.integers(0, 3))], kids[0]),
                (occ[int(rng.integers(0, 2))], kids[1])])
        if r < 0.8:
            return Query.disjunction_max(kids, 0.3)
        return Query.boost(kids[0], 1.5)

    checked = 0
    for _ in range(60):
        q = rand_tree(3)
        expected = _naive_eval(q, docs_tokens)
        got, _s = ra.evaluate(q)
        assert set(got.tolist()) == expected, q
        checked += 1
    assert checked == 60
