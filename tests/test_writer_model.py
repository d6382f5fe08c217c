"""Randomized IndexWriter session vs a naive document-set model.

The writer's LSM surface (staged flushes -> delta build -> byte-copy
merge -> generation swap, delete tombstones at merge, rollback, reopen
purge of uncommitted staged files) is exercised as a random op sequence
and compared, after every commit, against a plain Python list of live
documents:

- ``num_docs`` equals the model's live count
- per-tag term match sets (mapped to each doc's unique ``n``) agree
- a text-term match set agrees
- deletes are OPSTAMP-ORDERED (reference ``IndexWriter.java:164``): a
  delete affects only docs added before it was staged, plus everything
  already committed
- close+reopen discards pending staged files (crash-rollback), keeps
  everything committed
"""

import shutil

import numpy as np
import pytest

from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.pipelines.writer import IndexWriter
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_writer_model"
VOCAB = ["apple", "birch", "cedar", "dates", "elder"]
TAGS = ["red", "green", "blue"]


def _schema():
    s = IndexSchema()
    s.add_text_field("text")
    s.add_string_field("tag", fast=True)
    s.add_integer_field("n", fast=True)
    return s


def _tokens(doc: dict) -> list[str]:
    t = doc["text"]
    if isinstance(t, list):
        return [w for part in t for w in part.split()]
    return t.split()


def _matches(doc: dict, q: Query) -> bool:
    if q.kind == "term":
        field, val = q.params
        if field == "tag":
            return doc["tag"] == val
        return val in _tokens(doc)
    if q.kind == "range":
        _f, lo, hi, il, ih = q.params
        v = doc["n"]
        if lo is not None and not (v >= lo if il else v > lo):
            return False
        if hi is not None and not (v <= hi if ih else v < hi):
            return False
        return True
    if q.kind == "all":
        return True
    raise AssertionError(q.kind)


def _check(idx: str, live: list[dict]) -> None:
    import os
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        # no add has ever committed: the writer creates no index for
        # delete-only / empty commits, and the model must agree
        assert not live
        return
    r = IndexReader(idx)
    assert r.num_docs == len(live)
    if not live:
        return
    nvals, valid = r.fast_column("n")
    assert valid.all()

    def engine_ns(q: Query) -> list[int]:
        docs, _ = r.evaluate(q)
        return sorted(int(nvals[d]) for d in docs)

    for t in TAGS:
        q = Query.term("tag", t)
        want = sorted(d["n"] for d in live if _matches(d, q))
        assert engine_ns(q) == want, t
    for w in VOCAB[:2]:
        q = Query.term("text", w)
        want = sorted(d["n"] for d in live if _matches(d, q))
        assert engine_ns(q) == want, w
        # dictionary df values shrink with deletes (postings rewritten)
        assert r.doc_freq("text", w) == len(want), w
    # direct id retrieval masks tombstones: requesting the WHOLE id
    # space returns exactly the live docs
    t = r.retrieve_docs(np.arange(r.max_doc), columns=["n"])
    assert sorted(t.column("n").to_pylist()) == \
        sorted(d["n"] for d in live)
    # aggregations mask tombstones (query=None path)
    res = r.aggregate(None, {"t": {"terms": {"field": "tag",
                                             "size": 10}}})
    got = {b["key"]: b["doc_count"] for b in res["t"]["buckets"]}
    want: dict[str, int] = {}
    for d in live:
        want[d["tag"]] = want.get(d["tag"], 0) + 1
    assert got == want


@pytest.mark.parametrize("seed,list_text", [(3, False), (17, False),
                                            (29, True)])
def test_random_writer_session_matches_model(ray_session, seed,
                                             list_text):
    """``list_text=True`` stages every TEXT value as a LIST (the
    multi-valued-field shape), driving the writer's text-shape pin
    through flushes, rollbacks, and reopens."""
    shutil.rmtree(f"{BASE}/idx_{seed}", ignore_errors=True)
    idx = f"{BASE}/idx_{seed}"
    rng = np.random.default_rng(seed)

    w = IndexWriter(idx, _schema(), heap_docs=3, num_shards=2)
    live: list[dict] = []       # committed, post-delete
    pending: list[dict] = []
    # (query, number of pending adds staged before it) — the model of
    # the reference's OPSTAMP ordering: a delete only affects docs
    # added before it (plus everything already committed)
    pending_dels: list[tuple[Query, int]] = []
    next_n = 0
    commits = 0

    def model_commit():
        nonlocal live, pending, pending_dels
        all_docs = live + pending
        cut_base = len(live)
        dead: set[int] = set()
        for q, k in pending_dels:
            for i, d in enumerate(all_docs[:cut_base + k]):
                if _matches(d, q):
                    dead.add(i)
        live = [d for i, d in enumerate(all_docs) if i not in dead]
        pending = []
        pending_dels = []

    try:
        for _op in range(70):
            roll = rng.random()
            if roll < 0.52:
                words = [VOCAB[i] for i in
                         rng.integers(0, len(VOCAB), size=4)]
                text = ([" ".join(words[:2]), " ".join(words[2:])]
                        if list_text else " ".join(words))
                doc = {"text": text,
                       "tag": TAGS[int(rng.integers(0, len(TAGS)))],
                       "n": next_n}
                next_n += 1
                w.add_document(doc)
                pending.append(doc)
            elif roll < 0.62:
                q = (Query.term("tag",
                                TAGS[int(rng.integers(0, len(TAGS)))])
                     if rng.random() < 0.5 else
                     Query.range("n", int(rng.integers(0, next_n + 1)),
                                 int(rng.integers(0, next_n + 1)) + 5))
                if q.kind == "term":
                    w.delete_documents(*q.params)
                else:
                    w.delete_documents_by_query(q)
                pending_dels.append((q, len(pending)))
            elif roll < 0.68:
                w.rollback()
                pending = []
                pending_dels = []
            elif roll < 0.88:
                w.commit()
                model_commit()
                commits += 1
                _check(idx, live)
            else:
                # close + reopen: uncommitted staged files are purged
                # (crash-rollback), committed generations survive
                w.close()
                w = IndexWriter(idx, _schema(), heap_docs=3,
                                num_shards=2)
                pending = []
                pending_dels = []
                if commits:
                    _check(idx, live)
        w.commit()
        model_commit()
        commits += 1
        _check(idx, live)
    finally:
        w.close()
    assert commits >= 5
    shutil.rmtree(BASE, ignore_errors=True)


def test_delete_is_opstamp_ordered(ray_session):
    """Reference semantics (IndexWriter.java:164): a delete staged
    BEFORE an add does NOT remove the matching doc added after it in
    the same commit; docs added before it (and committed earlier) go."""
    shutil.rmtree(f"{BASE}/order", ignore_errors=True)
    idx = f"{BASE}/order/idx"
    with IndexWriter(idx, _schema(), heap_docs=2, num_shards=2) as w:
        w.add_document({"text": "apple", "tag": "red", "n": 0})
        w.commit()
        w.add_document({"text": "dates", "tag": "red", "n": 1})
        w.delete_documents("tag", "red")      # hits n=0 and n=1 only
        w.add_document({"text": "birch", "tag": "red", "n": 2})
        w.add_document({"text": "cedar", "tag": "blue", "n": 3})
        w.commit()
    r = IndexReader(idx)
    assert r.max_doc == 4
    assert r.num_docs == 2
    nvals, _ = r.fast_column("n")
    docs, _ = r.evaluate(Query.term("tag", "red"))
    assert [int(nvals[d]) for d in docs] == [2]   # added AFTER the delete
    docs, _ = r.evaluate(Query.term("tag", "blue"))
    assert [int(nvals[d]) for d in docs] == [3]
    shutil.rmtree(f"{BASE}/order", ignore_errors=True)


def test_merge_two_tombstoned_indexes_matches_union(ray_session):
    """merge_indexes over two writer-built inputs, EACH carrying its
    own tombstones, plus a new delete at merge time: the output must
    equal the union model (carried tombstones rebased per input, new
    delete applied to both)."""
    from tantivy4java_ray.pipelines.merge import merge_indexes
    shutil.rmtree(f"{BASE}/m2", ignore_errors=True)
    docs_a = [{"text": "apple", "tag": "red", "n": 0},
              {"text": "birch", "tag": "blue", "n": 1},
              {"text": "cedar dates", "tag": "green", "n": 2}]
    docs_b = [{"text": "apple elder", "tag": "blue", "n": 10},
              {"text": "dates", "tag": "red", "n": 11},
              {"text": "birch birch", "tag": "green", "n": 12}]
    for name, docs, del_tag in (("a", docs_a, "red"),
                                ("b", docs_b, "green")):
        with IndexWriter(f"{BASE}/m2/{name}", _schema(), heap_docs=10,
                         num_shards=2) as w:
            for d in docs:
                w.add_document(d)
            w.commit()
            w.delete_documents("tag", del_tag)
            w.commit()
    live = ([d for d in docs_a if d["tag"] != "red"]
            + [d for d in docs_b if d["tag"] != "green"])
    res = merge_indexes([f"{BASE}/m2/a", f"{BASE}/m2/b"],
                        f"{BASE}/m2/out",
                        delete_queries=[Query.term("text", "dates")])
    live = [d for d in live if "dates" not in d["text"].split()]
    assert res.num_deleted >= 1
    r = IndexReader(f"{BASE}/m2/out")
    assert r.num_docs == len(live)
    assert r.max_doc == 6
    nvals, _ = r.fast_column("n")
    for t in TAGS:
        docs, _s = r.evaluate(Query.term("tag", t))
        got = sorted(int(nvals[d]) for d in docs)
        assert got == sorted(d["n"] for d in live if d["tag"] == t), t
    for w_ in ("apple", "birch", "dates"):
        docs, _s = r.evaluate(Query.term("text", w_))
        got = sorted(int(nvals[d]) for d in docs)
        assert got == sorted(d["n"] for d in live
                             if w_ in d["text"].split()), w_
    t = r.retrieve_docs(np.arange(r.max_doc), columns=["n"])
    assert sorted(t.column("n").to_pylist()) == sorted(d["n"]
                                                       for d in live)
    # WAND equals the exhaustive scan on the tombstoned index (its
    # bounds precompute from the SAME alive-N idf)
    for q in (Query.term("text", "apple"),
              Query.boolean([(Occur.SHOULD, Query.term("text", "apple")),
                             (Occur.SHOULD, Query.term("text", "birch"))])):
        assert r.search(q, 10, method="wand").hits == \
            r.search(q, 10).hits, repr(q)
    # leaf/root pool on the tombstoned merge agrees with the reader
    # (leaves load the global tombstones and the global alive-N)
    from tantivy4java_ray.pipelines.search import ShardedSearchPool
    pool = ShardedSearchPool(f"{BASE}/m2/out", num_actors=2)
    try:
        queries = [Query.term("text", "apple"), Query.term("tag", "blue"),
                   Query.all()]
        got = pool.search_many(queries, limit=10)
        for q, g in zip(queries, got):
            want = r.search(q, 10).hits
            assert [h[1] for h in g] == [h[1] for h in want], repr(q)
            np.testing.assert_allclose([h[0] for h in g],
                                       [h[0] for h in want], rtol=1e-6)
    finally:
        pool.shutdown()
    shutil.rmtree(f"{BASE}/m2", ignore_errors=True)


def test_tombstones_survive_bundling(ray_session):
    """deleted_docs.npy rides the .split bundle: a bundled tombstoned
    index must not resurrect deleted docs in queries, retrieval, or
    num_docs."""
    from tantivy4java_ray.pipelines.bundle import bundle_index, split_url
    shutil.rmtree(f"{BASE}/bundle", ignore_errors=True)
    idx = f"{BASE}/bundle/idx"
    with IndexWriter(idx, _schema(), heap_docs=10, num_shards=2) as w:
        w.add_document({"text": "apple", "tag": "red", "n": 0})
        w.add_document({"text": "birch", "tag": "blue", "n": 1})
        w.commit()
        w.delete_documents("tag", "red")
        w.commit()
    bundle_index(idx, f"{BASE}/bundle/t.split")
    r = IndexReader(split_url(f"{BASE}/bundle/t.split"))
    assert (r.num_docs, r.max_doc) == (1, 2)
    assert r.evaluate(Query.term("tag", "red"))[0].tolist() == []
    assert r.evaluate(Query.term("tag", "blue"))[0].tolist() == [1]
    assert r.retrieve_docs([0, 1], columns=["n"]) \
        .column("n").to_pylist() == [1]
    shutil.rmtree(f"{BASE}/bundle", ignore_errors=True)
