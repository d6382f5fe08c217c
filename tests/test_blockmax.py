"""Block-max frontier pruning: the pruned top-k path must be
BIT-IDENTICAL to the full-scan path on every eligible query shape, and
the sidecar must survive merges, bundles, deletes and doc-range leaves.

The frontier is the per-block (tf, fieldnorm) Pareto set — the analog of
tantivy's per-block BlockWAND max info, generalized so the bound stays
exact under BM25-stat drift (see postings.block_frontier_blob)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray import postings as P
from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader, _top_k
from tantivy4java_ray.query import Query, parse_query
from tantivy4java_ray.schema import IndexSchema


def _corpus(n=4000, seed=3):
    """Zipf vocabulary, doc lengths spanning two orders of magnitude so
    fieldnorms actually discriminate (the pruning-relevant regime)."""
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.lognormal(3.0, 1.0, n), 3, 900).astype(int)
    vocab = np.array([f"t{i:04d}" for i in range(500)], object)
    texts = []
    for i in range(n):
        ws = vocab[np.minimum(rng.zipf(1.3, lens[i]) - 1, 499)]
        texts.append(" ".join(ws))
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "text": texts})


@pytest.fixture(scope="module")
def bm_index(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("bmx")
    src = str(base / "docs.parquet")
    pq.write_table(_corpus(), src, row_group_size=500)
    idx = str(base / "idx")
    # tiny frag_min_df: every term is fragment-encoded -> every run has
    # a frontier; small partitions force many runs per term
    build_index(src, idx, IndexSchema().add_text_field("text"),
                num_shards=4, target_docs_per_partition=500,
                frag_min_df=1)
    return idx


def _pruned_reader(idx, **kw):
    """Reader with the local run-size gate zeroed: test corpora are
    small, and these tests assert the PRUNED path's bit-parity."""
    r = IndexReader(idx, **kw)
    r.prune_min_run_docs = 0
    return r


def _scan_topk(r, q, k):
    docs, scores = r.evaluate(parse_query(q, r.schema)
                              if isinstance(q, str) else q)
    return _top_k(docs, scores, k)


def test_pruned_matches_scan_bitwise(bm_index):
    r = _pruned_reader(bm_index)
    rs = IndexReader(bm_index)
    engaged = 0
    for i in range(0, 500, 7):
        term = f"t{i:04d}"
        for k in (1, 5, 10, 37):
            a = r.search(term, k).hits
            assert a == _scan_topk(rs, term, k), (term, k)
        engaged = r._cstats.get("blockmax", [0, 0])[1]
    assert engaged > 0, "pruned path never engaged"
    assert r._cstats["blockmax"][0] > 0, "no block was ever pruned"


def test_pruned_boost_and_offset(bm_index):
    r = _pruned_reader(bm_index)
    rs = IndexReader(bm_index)
    for q, k, off in (("t0001^2.5", 10, 0), ("t0002^0.3", 5, 3),
                      ("t0000", 20, 10)):
        a = r.search(q, k, offset=off).hits
        b = _scan_topk(rs, q, k + off)[off:]
        assert a == b, q
    # negative boost: ineligible (bound monotonicity flips) -> must fall
    # back to the scan and still match
    a = r.search(Query.boost(Query.term("text", "t0001"), -1.0), 7).hits
    b = _scan_topk(rs, Query.boost(Query.term("text", "t0001"), -1.0), 7)
    assert a == b


def test_pruned_ties_break_by_doc_id(ray_session, tmp_path):
    # identical docs -> identical scores: the pruned top-k must keep the
    # lowest doc ids exactly like the scan
    n = 2000
    texts = ["same words here"] * n
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(n), pa.int64()),
                             "text": texts}), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexSchema().add_text_field("text"),
                num_shards=2, target_docs_per_partition=300,
                frag_min_df=1)
    r = _pruned_reader(idx)
    hits = r.search("same", 10).hits
    assert [d for _s, d in hits] == list(range(10))
    assert hits == _scan_topk(IndexReader(idx), "same", 10)


def test_pruned_doc_range_leaf(bm_index):
    full = IndexReader(bm_index)
    n = full.num_docs
    bases = sorted(int(b) for b in full.doc_bases)
    assert len(bases) >= 4, "corpus must split into several partitions"
    mid = bases[len(bases) // 2]
    q1 = bases[max(1, len(bases) // 4)]
    for lo, hi in ((0, mid), (mid, n), (q1, mid)):
        leaf = _pruned_reader(bm_index, doc_range=(lo, hi))
        sc = IndexReader(bm_index, doc_range=(lo, hi))
        for term in ("t0000", "t0003", "t0011", "t0100"):
            a = leaf.search(term, 10).hits
            assert a == _scan_topk(sc, term, 10), (term, lo, hi)


def test_cold_run_frontier_and_no_norms_fallback(ray_session, tmp_path):
    src = str(tmp_path / "d.parquet")
    pq.write_table(_corpus(800, seed=5), src)
    # frag_min_df huge: every run is reduce-encoded — the reduce now
    # builds frontiers from the shipped per-pair fieldnorm ids, so
    # mid-frequency terms prune too
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexSchema().add_text_field("text"),
                num_shards=2, frag_min_df=10 ** 9)
    r = _pruned_reader(idx)
    runs = r._term_runs("text", "t0000")
    assert runs and all(r._run_frontier(s, rr) is not None
                        for s, rr in runs)
    assert r.search("t0000", 10).hits == _scan_topk(
        IndexReader(idx), "t0000", 10)
    # tiny corpus: phase-1 alone may cover every block — assert the
    # pruned path ENGAGED (bounds evaluated), not a prune count
    assert r._cstats.get("blockmax", [0, 0])[1] > 0
    # fieldnorms=False: no norm ids exist anywhere -> no frontier, and
    # the pruned path must fall back cleanly
    idx2 = str(tmp_path / "idx2")
    build_index(src, idx2,
                IndexSchema().add_text_field("text", fieldnorms=False),
                num_shards=2, frag_min_df=1)
    r2 = _pruned_reader(idx2)
    runs2 = r2._term_runs("text", "t0000")
    assert runs2 and all(r2._run_frontier(s, rr) is None
                         for s, rr in runs2)
    assert r2.search("t0000", 10).hits == _scan_topk(
        IndexReader(idx2), "t0000", 10)


def test_merge_preserves_frontier(ray_session, tmp_path, bm_index):
    from tantivy4java_ray.pipelines.merge import merge_indexes
    src = str(tmp_path / "d2.parquet")
    pq.write_table(_corpus(1500, seed=11), src)
    idx2 = str(tmp_path / "idx2")
    build_index(src, idx2, IndexSchema().add_text_field("text"),
                num_shards=4, target_docs_per_partition=500,
                frag_min_df=1)
    out = str(tmp_path / "merged")
    merge_indexes([bm_index, idx2], out)
    r = _pruned_reader(out)
    rs = IndexReader(out)
    # frontiers survived the byte-copy (offsets re-based)
    runs = r._term_runs("text", "t0000")
    assert any(r._run_frontier(s, rr) is not None for s, rr in runs)
    for term in ("t0000", "t0002", "t0050"):
        assert r.search(term, 10).hits == _scan_topk(rs, term, 10), term
    assert r._cstats.get("blockmax", [0, 0])[0] > 0


def test_delete_merge_drops_frontier_only_on_rewritten_runs(
        ray_session, tmp_path, bm_index):
    from tantivy4java_ray.pipelines.merge import merge_indexes
    full = IndexReader(bm_index)
    victims = set(full.evaluate(Query.term("text", "t0400"))[0].tolist())
    assert victims
    out = str(tmp_path / "mdel")
    merge_indexes([bm_index], out,
                  delete_queries=[Query.term("text", "t0400")])
    r = _pruned_reader(out)
    rs = IndexReader(out)
    for term in ("t0000", "t0001", "t0010"):
        a = r.search(term, 10).hits
        assert a == _scan_topk(rs, term, 10), term
        assert not any(d in victims for _s, d in a), term
    assert r.search("t0400", 10).hits == []


def test_bundle_split_pruned_parity(ray_session, tmp_path, bm_index):
    from tantivy4java_ray.pipelines.bundle import bundle_index
    split = str(tmp_path / "idx.split")
    bundle_index(bm_index, split)
    r = _pruned_reader(f"t4jrsplit://{split}")
    rs = IndexReader(bm_index)
    for term in ("t0000", "t0004", "t0123"):
        assert r.search(term, 10).hits == _scan_topk(rs, term, 10), term


def test_remote_pruned_bytes_scale_with_k(ray_session, tmp_path):
    """On object storage the pruned path must page in only the skip head
    plus the surviving blocks — bytes touched proportional to k, not df."""
    from tantivy4java_ray.storage import RangedBlob
    rng = np.random.default_rng(1)
    n = 30000
    lens = np.clip(rng.lognormal(2.6, 0.9, n), 3, 300).astype(int)
    vocab = np.array([f"t{i:03d}" for i in range(80)], object)
    texts = [" ".join(vocab[np.minimum(rng.zipf(1.35, lens[i]) - 1, 79)])
             for i in range(n)]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(n), pa.int64()),
                             "text": texts}), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexSchema().add_text_field("text"),
                num_shards=1, frag_min_df=1)

    class CountingFS:
        def __init__(self, data):
            self.data = data
            self.fetched = 0

        def size(self, path):
            return len(self.data)

        def cat_file(self, path, start=0, end=None):
            end = len(self.data) if end is None else end
            self.fetched += end - start
            return self.data[start:end]

        def cat_ranges(self, paths, starts, ends, on_error="raise"):
            return [self.cat_file(None, s, e)
                    for s, e in zip(starts, ends)]

    ref = IndexReader(idx)
    term = "t000"
    runs = ref._term_runs("text", term)
    assert len(runs) == 1
    sid, rr = runs[0]
    run_nbytes = int(ref._dict(sid)["nbytes"][rr])
    assert run_nbytes > 8000, "head-term run too small to measure"
    expected = ref.search(term, 10).hits

    r = IndexReader(idx)
    with open(f"{idx}/shards/shard-{sid:05d}/postings.bin", "rb") as f:
        data = f.read()
    fs = CountingFS(data)
    r._post_mm[sid] = RangedBlob(fs, "postings.bin", page_size=512)
    assert r.search(term, 10).hits == expected
    assert r._cstats["blockmax"][0] > 0
    # skip head + frontier-selected blocks only; the full run is ~8x more
    assert fs.fetched < 0.5 * run_nbytes, (fs.fetched, run_nbytes)


def test_frontier_blob_bound_dominates_all_params():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(1, 600))
        tfs = rng.integers(1, 30, n).astype(np.uint32)
        nids = rng.integers(0, 256, n).astype(np.uint8)
        blob = P.block_frontier_blob(tfs, nids)
        off, ftf, fnid = P.parse_frontier_blob(blob)
        # random monotone denom tables stand in for arbitrary (k1, b,
        # avgdl): the frontier max must equal the block max under ALL
        cache = np.sort(rng.random(256).astype(np.float32) * 4 + .05)
        w = np.float32(rng.random() * 3 + .01)
        s = (w * tfs.astype(np.float32)) / (tfs.astype(np.float32)
                                            + cache[nids])
        fs = (w * ftf) / (ftf + cache[fnid])
        nb = (n + 127) // 128
        for b in range(nb):
            assert fs[off[b]:off[b + 1]].max() == s[b * 128:(b + 1) * 128].max()
