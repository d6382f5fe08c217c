"""Doc-store cache tier (round 4): row-group-pruned retrieval with a
byte-bounded decoded-block LRU — the doc-store block cache analog
(``split/SplitCacheManager.java`` store component).  Pins value
correctness vs a brute full read, warm-hit accounting, byte-bounded
eviction, unsorted/duplicate id order, and the no-stored-fields
``from_store`` edge."""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.schema import IndexSchema
from tantivy4java_ray.sources.webpages import write_webpages

DATA = "/tmp/t4jr_test_docstore_data"
IDX = "/tmp/t4jr_test_docstore_idx"
N = 900


@pytest.fixture(scope="module")
def idx(ray_session):
    shutil.rmtree(DATA, ignore_errors=True)
    shutil.rmtree(IDX, ignore_errors=True)
    paths = write_webpages(DATA, N, n_files=2, rows_per_row_group=100)
    s = IndexSchema()
    s.add_text_field("text")
    s.add_string_field("url", stored=True)
    s.add_string_field("lang")
    build_index(paths, IDX, s, html_fallback=("text", "html"),
                target_docs_per_partition=250, num_shards=4)
    return IndexReader(IDX)


def _brute(reader, ids, columns):
    pieces = []
    for part in reader.partitions:
        pf = pq.ParquetFile(part["path"])
        pieces.append(pf.read_row_groups(part["row_groups"],
                                         columns=columns))
    full = pa.concat_tables(pieces)
    return [[full.column(c)[int(i)].as_py() for c in columns]
            for i in ids]


def test_values_match_brute_read(idx):
    rng = np.random.default_rng(7)
    ids = rng.choice(N, size=120, replace=False)
    t = idx.retrieve_docs(ids, columns=["url", "lang"])
    want = _brute(idx, ids, ["url", "lang"])
    got = list(zip(t.column("url").to_pylist(),
                   t.column("lang").to_pylist()))
    assert [list(g) for g in got] == want
    assert t.column("doc_id").to_pylist() == [int(i) for i in ids]


def test_unsorted_and_duplicate_ids_preserve_order(idx):
    ids = [500, 3, 500, 899, 3]
    t = idx.retrieve_docs(ids, columns=["url"])
    assert t.column("doc_id").to_pylist() == ids
    urls = t.column("url").to_pylist()
    assert urls[0] == urls[2] and urls[1] == urls[4]


def test_warm_retrieval_hits_cache(idx):
    r = IndexReader(IDX)
    ids = np.arange(0, N, 9)
    r.retrieve_docs(ids, columns=["url"])
    s0 = r.cache_stats()["docstore"]
    assert s0["misses"] > 0 and s0["entries"] > 0
    t = r.retrieve_docs(ids, columns=["url"])
    s1 = r.cache_stats()["docstore"]
    assert s1["misses"] == s0["misses"], "warm re-retrieval re-decoded"
    assert s1["hits"] > s0["hits"]
    assert t.column("url")[0].as_py().startswith("https://site")


def test_row_group_pruning_sparse_ids(idx):
    # 2 ids in one 100-row row group: exactly 1 rg decoded per column
    r = IndexReader(IDX)
    r.retrieve_docs([10, 20], columns=["url", "lang"])
    s = r.cache_stats()["docstore"]
    assert s["misses"] == 1 and s["entries"] == 2


def test_eviction_is_byte_bounded(idx):
    r = IndexReader(IDX)
    r.doc_cache_max = 1  # force eviction after every insert
    ids = np.arange(0, N, 7)
    t = r.retrieve_docs(ids, columns=["url", "lang"])
    want = _brute(r, ids, ["url", "lang"])
    got = [[u, g] for u, g in zip(t.column("url").to_pylist(),
                                  t.column("lang").to_pylist())]
    assert got == want
    s = r.cache_stats()["docstore"]
    assert s["bytes"] <= 1 or s["entries"] <= 1


def test_from_store_no_stored_columns_is_id_only(idx):
    t = idx.retrieve_docs([1, 2, 3], columns=[], from_store=True)
    assert t.column_names == ["doc_id"]
    assert t.column("doc_id").to_pylist() == [1, 2, 3]


def test_from_store_stored_field(idx):
    t = idx.retrieve_docs([5, 800], from_store=True)
    assert t.column("url").to_pylist() == [
        "https://site5.example/page/5", "https://site800.example/page/800"]


# ---------------------------------------------------------------------------
# _postings_many_ranged: the doc-range leaf batch-decode path must be
# byte-identical to the per-term ranged path for every term and range
# ---------------------------------------------------------------------------

def test_postings_many_ranged_equals_per_term(idx):
    full = IndexReader(IDX)
    terms = [f"w{i:04d}" for i in range(0, 60, 7)] + ["needleterm"]
    present = [t for t in terms if full.doc_freq("text", t) > 0]
    assert len(present) >= 5
    # partition bases: 0/300/450/750 — use aligned windows
    for lo, hi in [(0, 300), (300, 750), (450, N), (0, 450)]:
        a = IndexReader(IDX, doc_range=(lo, hi))
        b = IndexReader(IDX, doc_range=(lo, hi))
        # a: batch path (cold cache, >=2 uncached pairs)
        a.postings_many([("text", t) for t in present])
        # b: per-term path
        for t in present:
            b.postings("text", t)
        for t in present:
            da, ta = a.postings("text", t)
            db, tb = b.postings("text", t)
            np.testing.assert_array_equal(da, db, err_msg=f"{t} {lo}:{hi}")
            np.testing.assert_array_equal(ta, tb, err_msg=f"{t} {lo}:{hi}")
            assert ((da >= lo) & (da < hi)).all()


def test_sharded_pool_matches_full_reader(idx, ray_session):
    from tantivy4java_ray.pipelines.search import ShardedSearchPool
    full = IndexReader(IDX)
    queries = [f"w{i:04d}" for i in range(0, 40, 3)] + [
        "w0001 OR w0042", "needleterm"]
    pool = ShardedSearchPool(IDX, num_actors=3)
    try:
        got = pool.search_many(queries, limit=8)
        for q, hits in zip(queries, got):
            want = full.search(q, 8).hits
            assert [h[1] for h in hits] == [h[1] for h in want], q
            np.testing.assert_allclose([h[0] for h in hits],
                                       [h[0] for h in want],
                                       rtol=1e-6, err_msg=q)
    finally:
        pool.shutdown()


# ---------------------------------------------------------------------------
# round-4 self-review regressions
# ---------------------------------------------------------------------------

def test_retrieve_docs_default_columns_is_all_source_columns(idx):
    # columns=None on the source-parquet path must return every source
    # column (the pre-doc-store-cache default), not an id-only table
    t = idx.retrieve_docs([0, 1])
    assert set(t.column_names) >= {"url", "lang", "text", "doc_id"}
    assert t.num_rows == 2
    assert t.column("url")[0].as_py() == "https://site0.example/page/0"


def test_postings_many_dedups_repeated_pairs(idx):
    r = IndexReader(IDX)
    pairs = [("text", "w0000"), ("text", "w0001")] * 5
    r.postings_many(pairs)
    # 2 distinct terms -> at most 2 decode misses, not 10
    assert r._cstats["postings"][1] <= 2
    d0 = r.postings("text", "w0000")[0]
    full = IndexReader(IDX)
    np.testing.assert_array_equal(d0, full.postings("text", "w0000")[0])


def test_postings_many_skips_cache_refused_terms(idx):
    # a term whose decoded size >= cap/4 is refused by _post_cache_put;
    # batching it would decode it for nothing
    r = IndexReader(IDX)
    r.postings_cache_max = 64  # df_cap = 64//4//16 = 1 posting
    before = r._cstats["postings"][1]
    r.postings_many([("text", "w0000"), ("text", "w0001")])
    assert r._cstats["postings"][1] == before  # nothing batch-decoded
    # query path still works (decodes once, uncached)
    d, _ = r.postings("text", "w0000")
    assert len(d) > 0


def test_api_doc_default_fields_returns_full_document(idx):
    from tantivy4java_ray.api import Index
    s = Index(IDX).searcher()
    d = s.doc(7)   # fields=None -> every source column
    assert d["url"] == "https://site7.example/page/7"
    assert "text" in d and "lang" in d


# ---------------------------------------------------------------------------
# property: _docstore_read over random row-group layouts / id patterns
# ---------------------------------------------------------------------------

def test_docstore_read_property_random_layouts(tmp_path):
    import pyarrow.parquet as pqm
    rng = np.random.default_rng(41)
    for trial in range(12):
        n = int(rng.integers(1, 400))
        rg = int(rng.integers(1, n + 1))
        tbl = pa.table({
            "a": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "b": pa.array([f"s{v}" for v in rng.integers(0, 50, n)]),
        })
        p = str(tmp_path / f"t{trial}.parquet")
        pqm.write_table(tbl, p, row_group_size=rg)
        pf = pqm.ParquetFile(p)
        nrg = pf.metadata.num_row_groups
        # random subset of row groups plays the partition's rg list
        k = int(rng.integers(1, nrg + 1))
        rgs = sorted(rng.choice(nrg, size=k, replace=False).tolist())
        concat = pa.concat_tables([pf.read_row_groups([g]) for g in rgs])
        m = concat.num_rows
        ids = rng.integers(0, m, size=int(rng.integers(1, 40)))
        from tantivy4java_ray.pipelines.search import IndexReader
        r = IndexReader.__new__(IndexReader)
        from tantivy4java_ray import storage as st
        from collections import OrderedDict
        r._st, r._pf_cache, r._rg_lens = st, {}, {}
        r._doc_cache, r._doc_cache_bytes = OrderedDict(), 0
        r.doc_cache_max = int(rng.choice([1, 1 << 10, 256 << 20]))
        r._cstats = {"docstore": [0, 0]}
        cols = ["a", "b"] if rng.random() < 0.7 else ["b"]
        got = r._docstore_read(p, rgs, np.asarray(ids, np.int64), cols)
        want = concat.select(cols).take(pa.array(ids))
        assert got.equals(want), f"trial {trial} rg={rg} rgs={rgs}"
        # second read: warm path must agree too
        got2 = r._docstore_read(p, rgs, np.asarray(ids, np.int64), cols)
        assert got2.equals(want), f"warm trial {trial}"
