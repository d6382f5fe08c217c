"""Round-2 regression tests: scale-shape fixes (hash-only dedup shuffle,
block top-k), exact phrase-slop matching, deleted-doc aggregation, delta
checkpoint edge cases, vectorized fingerprint/simhash semantics."""

import io
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# exact_dedup: hash-only shuffle
# ---------------------------------------------------------------------------

def test_exact_dedup_shuffle_carries_no_text():
    from tantivy4java_ray.functions.dedup import exact_dedup_keys
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["aaa", "bbb", "aaa"]})
    keys = exact_dedup_keys(t, "text", "doc_id")
    assert set(keys.column_names) == {"doc_id", "__h", "__h2"}
    assert all(not pa.types.is_string(f.type) for f in keys.schema
               if f.name != "doc_id")
    # identical values -> identical 128-bit key; distinct -> distinct
    h = keys.to_pandas()
    assert (h.iloc[0]["__h"], h.iloc[0]["__h2"]) == \
        (h.iloc[2]["__h"], h.iloc[2]["__h2"])
    assert (h.iloc[0]["__h"], h.iloc[0]["__h2"]) != \
        (h.iloc[1]["__h"], h.iloc[1]["__h2"])


def test_exact_dedup_string_ids(ray_session):
    """id_col is caller-typed (urls, not just ints) — keep_min must not
    coerce to int64 (regression: review finding)."""
    import ray.data
    from tantivy4java_ray.functions.dedup import exact_dedup
    df = pd.DataFrame({"url": ["u/b", "u/a", "u/c"],
                       "text": ["same", "same", "other"]})
    keep = exact_dedup(ray.data.from_pandas(df), "text", "url").to_pandas()
    assert sorted(keep["url"].tolist()) == ["u/a", "u/c"]


def test_exact_dedup_nul_bytes_distinct():
    # pandas siphash truncates at NUL; the NUL->U+FFFD mapping must keep
    # "a\x00b" and "a\x00c" apart
    from tantivy4java_ray.functions.dedup import exact_dedup_keys
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": ["a\x00b", "a\x00c"]})
    h = exact_dedup_keys(t, "text", "doc_id").to_pandas()
    assert (h.iloc[0]["__h"], h.iloc[0]["__h2"]) != \
        (h.iloc[1]["__h"], h.iloc[1]["__h2"])


def test_exact_dedup_end_to_end(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import exact_dedup
    rng = np.random.default_rng(3)
    texts = [f"doc {rng.integers(0, 30)}" for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    mine = sorted(exact_dedup(ds, "text", "doc_id").to_pandas()["doc_id"])
    want = sorted(df.groupby("text")["doc_id"].min())
    assert mine == want


# ---------------------------------------------------------------------------
# block top-k
# ---------------------------------------------------------------------------

def test_topk_matches_sort(ray_session):
    import pyarrow.compute as pc
    import ray.data
    from tantivy4java_ray.functions.topk import topk
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "grp": rng.choice(["a", "b"], 1000),
                       "v": rng.integers(0, 50, 1000)})
    ds = ray.data.from_pandas(df).repartition(8)
    got = topk(ds, "v", 15, descending=True, tie_cols=("id",),
               filter_expr=lambda t: pc.equal(t.column("grp"), "a"))
    want = (df[df.grp == "a"]
            .sort_values(["v", "id"], ascending=[False, True])
            .head(15).reset_index(drop=True))
    assert got["id"].tolist() == want["id"].tolist()
    # ascending too
    got2 = topk(ds, "v", 5, descending=False, tie_cols=("id",))
    want2 = df.sort_values(["v", "id"]).head(5)
    assert got2["id"].tolist() == want2["id"].tolist()


def test_topk_unsigned_and_extreme_keys(ray_session):
    """Descending top-k must not negate unsigned keys (0 would wrap to
    the 'maximum') or overflow int64.min (regression: review finding)."""
    import ray.data
    from tantivy4java_ray.functions.topk import topk
    dfu = pd.DataFrame({"id": np.arange(3, dtype=np.int64),
                        "k": np.array([0, 5, 3], np.uint64)})
    got = topk(ray.data.from_pandas(dfu).repartition(1), "k", 2,
               descending=True, tie_cols=("id",))
    assert got["k"].tolist() == [5, 3]
    imin = np.iinfo(np.int64).min
    dfi = pd.DataFrame({"id": np.arange(3, dtype=np.int64),
                        "k": np.array([imin, -1, 7], np.int64)})
    got = topk(ray.data.from_pandas(dfi).repartition(1), "k", 2,
               descending=True, tie_cols=("id",))
    assert got["k"].tolist() == [7, -1]


# ---------------------------------------------------------------------------
# phrase slop: exact span matching
# ---------------------------------------------------------------------------

def test_phrase_slop_greedy_counterexample():
    from tantivy4java_ray.pipelines.search import _count_phrase_matches
    plists = [np.array([10], np.int64), np.array([8, 12], np.int64),
              np.array([12], np.int64)]
    offsets = [0, 0, 0]
    # valid window [10,12] exists; the old greedy picked 8 and rejected
    assert _count_phrase_matches(plists, offsets, slop=2) == 1
    assert _count_phrase_matches(plists, offsets, slop=1) == 0


def test_phrase_slop_end_to_end(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    texts = ["alpha beta gamma", "alpha gamma beta", "alpha x y beta",
             "beta alpha", "alpha beta"]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(5), pa.int64()),
                             "text": texts}), src)
    s = IndexSchema().add_text_field("text", index_option="position")
    idx = str(tmp_path / "idx")
    build_index(src, idx, s, num_shards=2)
    r = IndexReader(idx)
    hit = lambda slop: sorted(  # noqa: E731
        r.evaluate(Query.phrase("text", ["alpha", "beta"], slop=slop))[0]
        .tolist())
    assert hit(0) == [0, 4]
    assert hit(1) == [0, 1, 4]      # "alpha gamma beta": displacement 1
    # slop=2 admits both the transposition ("beta alpha", span 2) and two
    # intervening words ("alpha x y beta", span 2)
    assert hit(2) == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------------------
# phrase on a fieldnorms=False field scores with norm 1
# ---------------------------------------------------------------------------

def test_phrase_without_fieldnorms(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                             "text": ["hello world", "world hello"]}), src)
    s = IndexSchema().add_text_field("text", index_option="position",
                                     fieldnorms=False)
    idx = str(tmp_path / "idx")
    build_index(src, idx, s, num_shards=1)
    r = IndexReader(idx)
    docs, scores = r.evaluate(Query.phrase("text", ["hello", "world"]))
    assert docs.tolist() == [0]
    assert scores[0] > 0


# ---------------------------------------------------------------------------
# aggregations exclude merge-time deleted docs on match-all
# ---------------------------------------------------------------------------

def test_aggs_exclude_deleted(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.merge import merge_indexes
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    texts = ["keepme one", "dropme two", "keepme three", "dropme four"]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": texts,
        "val": pa.array([10.0, 100.0, 20.0, 200.0])}), src)
    s = IndexSchema().add_text_field("text")
    s.add_float_field("val", fast=True)
    idx = str(tmp_path / "idx")
    build_index(src, idx, s, num_shards=1)
    out = str(tmp_path / "merged")
    merge_indexes([idx], out, delete_queries=[Query.term("text", "dropme")])
    r = IndexReader(out)
    res = r.aggregate(None, {"s": {"stats": {"field": "val"}}})
    assert res["s"]["count"] == 2
    assert res["s"]["sum"] == 30.0
    # explicit match-all query path too
    res2 = r.aggregate(Query.all(), {"s": {"sum": {"field": "val"}}})
    assert res2["s"]["value"] == 30.0


# ---------------------------------------------------------------------------
# delta: multi-part checkpoint + remove tombstones + _last_checkpoint
# ---------------------------------------------------------------------------

def test_delta_multipart_checkpoint(tmp_path):
    from tantivy4java_ray.sources.delta import (delta_live_files,
                                                read_delta_snapshot)
    table = str(tmp_path / "dt")
    logdir = os.path.join(table, "_delta_log")
    os.makedirs(logdir)
    none_cols = {"metaData": None, "remove": None}

    def cp_row(add=None, remove=None, meta=None):
        return {"add": add, "remove": remove, "metaData": meta}

    # checkpoint at version 10, two parts; fileC tombstoned in part 2
    part1 = pa.Table.from_pylist([
        cp_row(add={"path": "fileA.parquet"}),
        cp_row(add={"path": "fileC.parquet"}),
        cp_row(meta={"schemaString": json.dumps(
            {"type": "struct", "fields": []})})])
    part2 = pa.Table.from_pylist([
        cp_row(add={"path": "fileB.parquet"}),
        cp_row(remove={"path": "fileC.parquet"})])
    pq.write_table(part1, os.path.join(
        logdir, "00000000000000000010.checkpoint.0000000001.0000000002.parquet"))
    pq.write_table(part2, os.path.join(
        logdir, "00000000000000000010.checkpoint.0000000002.0000000002.parquet"))
    with open(os.path.join(logdir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 10, "parts": 2}, f)
    # post-checkpoint commit: add fileD, remove fileA
    with open(os.path.join(logdir, "00000000000000000011.json"), "w") as f:
        f.write(json.dumps({"add": {"path": "fileD.parquet"}}) + "\n")
        f.write(json.dumps({"remove": {"path": "fileA.parquet"}}) + "\n")

    files = [os.path.basename(p) for p in delta_live_files(table)]
    assert files == ["fileB.parquet", "fileD.parquet"]
    snap = read_delta_snapshot(table)
    assert snap.version == 11
    # time travel to checkpoint version only
    snap10 = read_delta_snapshot(table, version=10)
    assert sorted(os.path.basename(p) for p in snap10.files) == \
        ["fileA.parquet", "fileB.parquet"]


# ---------------------------------------------------------------------------
# vectorized fingerprints / simhash semantics
# ---------------------------------------------------------------------------

def test_fingerprint_batch_semantics():
    from tantivy4java_ray.functions.textstats import fingerprint_batch
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": ["hello", None, "", "hello"]})
    out = fingerprint_batch(t).to_pandas()
    assert out["fp64"][1] == 0 and out["fp64"][2] == 0
    assert out["fp64"][0] == out["fp64"][3] != 0
    import hashlib
    assert out["md5"][0] == hashlib.md5(b"hello").hexdigest()
    # embedded NUL: texts differing only AFTER a \x00 must not collide
    # (pandas siphash reads C strings; the NUL is sanitized first)
    t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": ["a\x00left", "a\x00right"]})
    out2 = fingerprint_batch(t2).to_pandas()
    assert out2["fp64"][0] != out2["fp64"][1]


def test_simhash64_vectorized_semantics():
    from tantivy4java_ray.functions.dedup import simhash64
    sims = simhash64(["", None, "aaa bbb ccc", "aaa bbb ccc",
                      "aaa  bbb\tccc", "xxx yyy zzz"])
    assert sims[0] == 0 and sims[1] == 0
    assert sims[2] == sims[3] == sims[4] != sims[5]
    # near-dup texts land within small hamming distance
    a = "the quick brown fox jumps over the lazy dog " * 8
    b = a.replace("lazy", "sleepy")
    d = bin(int(simhash64([a])[0]) ^ int(simhash64([b])[0])).count("1")
    assert d <= 12


# ---------------------------------------------------------------------------
# typed JSON numeric subpaths + vectorized term matching
# ---------------------------------------------------------------------------

def test_encode_f64_sortable_order():
    from tantivy4java_ray.pipelines.search import (encode_f64_sortable,
                                                   encode_f64_sortable_array)
    vals = [-1e300, -123.5, -1.0, -1e-9, -0.0, 0.0, 1e-9, 2.5, 17.0,
            100.0, 1e300]
    encs = [encode_f64_sortable(v) for v in vals]
    # -0.0 and 0.0 encode differently but adjacently; order preserved
    assert encs == sorted(encs)
    arr = encode_f64_sortable_array(np.array(vals))
    assert list(arr) == encs


@pytest.fixture(scope="module")
def jnum_idx(ray_session, tmp_path_factory):
    from tantivy4java_ray.api import Index
    from tantivy4java_ray.schema import IndexSchema
    base = tmp_path_factory.mktemp("jnum")
    metas = ['{"n": 5}', '{"n": 17}', '{"n": 100}', '{"n": -3.5}',
             '{"n": "xyz"}', None, '{"m": 1}']
    pq.write_table(pa.table({
        "id": pa.array(range(len(metas)), pa.int64()),
        "meta": pa.array(metas, pa.string())}), str(base / "d.parquet"))
    s = IndexSchema().add_integer_field("id", fast=True)
    s.add_json_field("meta")
    return Index.create_from_parquet(str(base / "d.parquet"),
                                     str(base / "idx"), s, num_shards=2)


def test_json_range_numeric(jnum_idx):
    from tantivy4java_ray.query import Query
    r = jnum_idx.reader()
    # numeric compare: 5 < 17 < 100 (lexicographic would put "100" first)
    docs, _ = r.evaluate(Query.json_range("meta", "n", 5, 100,
                                          include_upper=False))
    assert docs.tolist() == [0, 1]
    docs, _ = r.evaluate(Query.json_range("meta", "n", -10, 6))
    assert docs.tolist() == [0, 3]
    docs, _ = r.evaluate(Query.json_range("meta", "n", lower=17))
    assert docs.tolist() == [1, 2]
    docs, _ = r.evaluate(Query.json_range("meta", "n", upper=0))
    assert docs.tolist() == [3]
    # exclusive lower
    docs, _ = r.evaluate(Query.json_range("meta", "n", 5, None,
                                          include_lower=False))
    assert docs.tolist() == [1, 2]
    # string bounds still range over the string terms
    docs, _ = r.evaluate(Query.json_range("meta", "n", "x", "z"))
    assert docs.tolist() == [4]


def test_json_exists_covers_numeric_terms(jnum_idx):
    from tantivy4java_ray.query import Query
    r = jnum_idx.reader()
    docs, _ = r.evaluate(Query.json_exists("meta", "n"))
    assert docs.tolist() == [0, 1, 2, 3, 4]


def test_vectorized_matchers_equal_python(ray_session, tmp_path):
    """match_terms(regex/prefix/range) must agree with a Python re scan."""
    import re as _re
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(50)] + \
        ["join", "joan", "jon", "john", "apple", "apply", "applied"]
    texts = [" ".join(rng.choice(words, 20)) for _ in range(300)]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(300), pa.int64()),
                             "text": texts}), src)
    s = IndexSchema().add_text_field("text")
    idx = str(tmp_path / "idx")
    build_index(src, idx, s, num_shards=4)
    r = IndexReader(idx)

    def python_docs(pred):
        terms = sorted({t for txt in texts for t in txt.split() if pred(t)})
        parts = [r.postings("text", t)[0] for t in terms]
        return (sorted(np.unique(np.concatenate(parts)).tolist())
                if parts else [])

    for pattern in ["jo.n", "appl.*", "w0[0-4]\\d", "jo.n|apple"]:
        cre = _re.compile(pattern)
        got, _ = r.evaluate(Query.regex("text", pattern))
        assert got.tolist() == python_docs(
            lambda t: cre.fullmatch(t) is not None), pattern
    for wc in ["jo*", "appl?", "w00?", "*pple"]:
        got, _ = r.evaluate(Query.wildcard("text", wc))
        cre = _re.compile("".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c)
            for c in wc))
        assert got.tolist() == python_docs(
            lambda t: cre.fullmatch(t) is not None), wc
    # term range on the text dictionary
    got, _ = r.evaluate(Query.range("text", "w010", "w020",
                                    include_upper=False))
    assert got.tolist() == python_docs(lambda t: "w010" <= t < "w020")
    # fuzzy
    got, _ = r.evaluate(Query.fuzzy_term("text", "john", distance=1))
    # dl distance <= 1: jon (del), joan (sub h->a), join (sub h->i)
    want_terms = {"john", "jon", "joan", "join"}
    assert got.tolist() == python_docs(lambda t: t in want_terms)


# ---------------------------------------------------------------------------
# doc-range leaf readers + sharded search pool
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def range_idx(ray_session, tmp_path_factory):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.schema import IndexSchema
    from tantivy4java_ray.sources.webpages import write_webpages
    base = tmp_path_factory.mktemp("rangeidx")
    write_webpages(str(base / "data"), 2000, n_files=2,
                   rows_per_row_group=250)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    idx = str(base / "idx")
    build_index(str(base / "data"), idx, s, html_fallback=("text", "html"),
                target_docs_per_partition=250, num_shards=4)
    return idx


def test_range_reader_equals_full(range_idx):
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Occur, Query
    full = IndexReader(range_idx)
    lo, hi = 500, 1250   # partition-aligned (250-doc partitions)
    leaf = IndexReader(range_idx, doc_range=(lo, hi))
    queries = [
        Query.term("text", "w0000"),
        Query.boolean([(Occur.SHOULD, Query.term("text", "w0001")),
                       (Occur.SHOULD, Query.term("text", "w0042"))]),
        Query.phrase("text", ["alpha", "bravo", "charlie"]),
        Query.wildcard("text", "w00*"),
        Query.regex("text", "w01.2"),
        Query.range("text", "w000", "w010", include_upper=False),
        Query.term("lang", "de"),
        Query.all(),
        Query.exists("lang"),
    ]
    for q in queries:
        fd, fsc = full.evaluate(q)
        ld, lsc = leaf.evaluate(q)
        inr = (fd >= lo) & (fd < hi)
        assert ld.tolist() == fd[inr].tolist(), q.kind
        np.testing.assert_array_equal(lsc, fsc[inr], err_msg=q.kind)


def test_range_reader_wand_matches_scan(range_idx):
    from tantivy4java_ray.pipelines.search import IndexReader
    leaf = IndexReader(range_idx, doc_range=(250, 1000))
    res_scan = leaf.search("w0001 OR w0042", 10, method="auto")
    res_wand = leaf.search("w0001 OR w0042", 10, method="wand")
    assert res_scan.hits == res_wand.hits
    assert all(250 <= d < 1000 for _s, d in res_wand.hits)


def test_range_reader_misaligned_raises(range_idx):
    from tantivy4java_ray.pipelines.search import IndexReader
    with pytest.raises(ValueError):
        IndexReader(range_idx, doc_range=(100, 900))


def test_sharded_pool_equals_single_reader(range_idx):
    from tantivy4java_ray.pipelines.search import (IndexReader,
                                                   ShardedSearchPool,
                                                   split_doc_ranges)
    ranges = split_doc_ranges(range_idx, 3)
    assert [r[0] for r in ranges][0] == 0
    assert ranges[-1][1] == 2000
    assert all(a < b for a, b in ranges)
    assert [b for _a, b in ranges][:-1] == [a for a, _b in ranges][1:]

    pool = ShardedSearchPool(range_idx, num_actors=3, limit=10)
    try:
        single = IndexReader(range_idx)
        queries = ["needleterm", "w0000 AND w0042",
                   'text:"alpha bravo charlie"', "w0123 OR w0456",
                   "lang:de", "w00*"]
        got = pool.search_many(queries, 10)
        for q, hits in zip(queries, got):
            assert hits == single.search(q, 10).hits, q
    finally:
        pool.shutdown()


def test_leaf_actor_resident_set_is_partial(range_idx):
    """A range reader's fieldnorm array covers only its own docs."""
    from tantivy4java_ray.pipelines.search import IndexReader
    full = IndexReader(range_idx)
    leaf = IndexReader(range_idx, doc_range=(500, 1250))
    assert len(full.norms("text")) == 2000
    assert len(leaf.norms("text")) == 750
    assert len(leaf.fast_column("lang")[0]) == 750


# ---------------------------------------------------------------------------
# fsspec storage: build -> search round-trip over a file:// URL
# ---------------------------------------------------------------------------

def test_storage_helpers(tmp_path):
    from tantivy4java_ray import storage as st
    url = f"file://{tmp_path}/a/b"
    assert st.is_url(url) and not st.is_url(str(tmp_path))
    st.write_bytes_atomic(b"hello", st.sjoin(url, "x.bin"))
    assert st.sexists(st.sjoin(url, "x.bin"))
    assert st.ssize(st.sjoin(url, "x.bin")) == 5
    blob = st.blob_open(st.sjoin(url, "x.bin"))
    assert len(blob) == 5
    assert bytes(blob[1:4]) == b"ell"
    st.write_json_atomic(st.sjoin(url, "m.json"), {"k": 1})
    assert st.read_json_any(st.sjoin(url, "m.json")) == {"k": 1}
    assert st.swalk_files(url) == ["m.json", "x.bin"]


def test_fsspec_build_search_roundtrip(ray_session, tmp_path):
    """Full build -> search -> merge against file:// URLs: every index
    artifact (txlog, manifest, docdata, shards, deleted_docs) goes
    through the fsspec path, posting reads are ranged."""
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.merge import merge_indexes
    from tantivy4java_ray.pipelines.search import (IndexReader,
                                                   list_index_files,
                                                   validate_index)
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    from tantivy4java_ray.sources.webpages import write_webpages
    write_webpages(str(tmp_path / "data"), 600, n_files=1,
                   rows_per_row_group=200)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    idx_url = f"file://{tmp_path}/idx"
    # source read via URL too
    res = build_index(f"file://{tmp_path}/data", idx_url, s,
                      html_fallback=("text", "html"),
                      target_docs_per_partition=200, num_shards=4)
    assert res.num_docs == 600
    # resume fast path over the URL
    res2 = build_index(f"file://{tmp_path}/data", idx_url, s,
                       html_fallback=("text", "html"),
                       target_docs_per_partition=200, num_shards=4)
    assert res2.resumed_partitions == 3

    r_url = IndexReader(idx_url)
    r_loc = IndexReader(str(tmp_path / "idx"))
    for q in ["needleterm", "w0001 OR w0042", 'text:"alpha bravo charlie"',
              "lang:de", "w00*"]:
        assert r_url.search(q, 10).hits == r_loc.search(q, 10).hits, q
    docs, _ = r_url.evaluate(Query.phrase("text", ["alpha", "bravo"]))
    assert docs.tolist() == r_loc.evaluate(
        Query.phrase("text", ["alpha", "bravo"]))[0].tolist()
    assert validate_index(idx_url) == []
    assert list_index_files(idx_url) == list_index_files(
        str(tmp_path / "idx"))
    # doc retrieval joins back to the URL-addressed source parquet
    hits = [d for _s, d in r_url.search("needleterm", 5).hits]
    tbl = r_url.retrieve_docs(hits, columns=["url"])
    assert tbl.num_rows == len(hits)
    # merge with deletes, URL output
    out_url = f"file://{tmp_path}/merged"
    mr = merge_indexes([idx_url], out_url,
                       delete_queries=[Query.term("text", "needleterm")])
    rm = IndexReader(out_url)
    assert rm.search("needleterm", 10).hits == []
    assert mr.num_deleted > 0


# ---------------------------------------------------------------------------
# single-file split bundle (.split) with footer + hotcache
# ---------------------------------------------------------------------------

def test_split_bundle_roundtrip(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.bundle import (bundle_index,
                                                   read_bundle_footer,
                                                   split_url)
    from tantivy4java_ray.pipelines.search import IndexReader, validate_index
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    from tantivy4java_ray.sources.webpages import write_webpages
    write_webpages(str(tmp_path / "data"), 500, n_files=1,
                   rows_per_row_group=250)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "data"), idx, s,
                html_fallback=("text", "html"),
                target_docs_per_partition=250, num_shards=4)
    bundle = str(tmp_path / "web.split")
    footer = bundle_index(idx, bundle)
    assert "manifest.json" in footer["hotcache"]
    assert all(len(v) == 2 for v in footer["files"].values())
    # footer parses with two ranged reads
    f2 = read_bundle_footer(bundle)
    assert f2["files"] == footer["files"]

    r_dir = IndexReader(idx)
    r_split = IndexReader(split_url(bundle))
    for q in ["needleterm", "w0001 OR w0042", 'text:"alpha bravo charlie"',
              "lang:de", "w00*"]:
        assert r_split.search(q, 10).hits == r_dir.search(q, 10).hits, q
    d1, _ = r_split.evaluate(Query.regex("text", "w0[0-1]23"))
    d2, _ = r_dir.evaluate(Query.regex("text", "w0[0-1]23"))
    assert d1.tolist() == d2.tolist()
    assert r_split.num_docs == 500
    assert validate_index(split_url(bundle)) == []
    # aggregations over the bundle's docdata fast fields
    agg = r_split.aggregate(None, {"l": {"terms": {"field": "lang",
                                                   "size": 10}}})
    assert sum(b["doc_count"] for b in agg["l"]["buckets"]) == 500
    # stored-field/docdata retrieval path (from_store=False needs source
    # parquet, which lives outside the bundle -> positional join still ok)
    hits = [d for _s, d in r_split.search("needleterm", 3).hits]
    got = r_split.retrieve_docs(hits, columns=["url"])
    assert got.num_rows == len(hits)

    # bundle path edge cases (regression: review findings)
    # 1. '.split' inside a PARENT directory name must not cut the path
    nest = tmp_path / "data.splits"
    nest.mkdir()
    b2 = str(nest / "x.split")
    bundle_index(idx, b2)
    assert IndexReader(split_url(b2)).num_docs == 500
    # 2. a bundle with a non-'.split' name resolves by file probing
    b3 = str(tmp_path / "out.bundle")
    bundle_index(idx, b3)
    assert IndexReader(split_url(b3)).num_docs == 500
    # 3. empty/truncated file -> clean ValueError, exists() False
    bad = tmp_path / "empty.split"
    bad.write_bytes(b"")
    import pytest as _pytest

    from tantivy4java_ray import storage as _st
    with _pytest.raises(ValueError):
        read_bundle_footer(str(bad))
    assert not _st.sexists(split_url(str(bad)) + "/manifest.json")

    # 4. fsspec surface regressions (review findings)
    import fsspec as _fsspec
    fs = _fsspec.filesystem("t4jrsplit")
    some_file = max((k for k in footer["files"]
                     if k not in footer["hotcache"]),
                    key=lambda k: footer["files"][k][1])
    url_file = f"{split_url(bundle)}/{some_file}"
    whole = fs.cat_file(url_file)
    # negative offsets are end-relative (fsspec trailer-read idiom) —
    # the old arithmetic returned the PREVIOUS bundled file's bytes
    assert fs.cat_file(url_file, start=-12) == whole[-12:]
    assert fs.cat_file(url_file, start=-12, end=-4) == whole[-12:-4]
    # ls(detail) types directories as directories so walkers descend
    entries = {e["name"].split("/")[-1]: e["type"]
               for e in fs.ls(split_url(bundle), detail=True)}
    assert entries["shards"] == "directory"
    assert entries["manifest.json"] == "file"
    assert any(fs.find(split_url(bundle) + "/shards"))
    # any-protocol qualify: abfs:// style URLs pass through untouched
    from tantivy4java_ray.pipelines.bundle import _qualify
    assert _qualify("abfs://container/idx.split") == \
        "abfs://container/idx.split"
    assert _qualify("some/local/rel.split") == "/some/local/rel.split"
    # lazy open for large members: ranged reader, not a full BytesIO
    import tantivy4java_ray.pipelines.bundle as _bundle
    old_max = _bundle._OPEN_EAGER_MAX
    _bundle._OPEN_EAGER_MAX = 0
    try:
        with fs.open(url_file) as fh:
            assert not isinstance(fh, io.BytesIO)
            fh.seek(-8, 2)
            assert fh.read() == whole[-8:]
            fh.seek(0)
            assert fh.read(16) == whole[:16]
    finally:
        _bundle._OPEN_EAGER_MAX = old_max


def test_merge_splits_by_url(ray_session, tmp_path):
    """QuickwitSplit.mergeSplits(urls, out) shape: merge two single-file
    .split bundles (opened via t4jrsplit://) into a fresh index."""
    import pyarrow.parquet as pq

    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.bundle import bundle_index, split_url
    from tantivy4java_ray.pipelines.merge import merge_indexes
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.schema import IndexSchema
    from tantivy4java_ray.sources.webpages import (generate_webpages,
                                                   write_webpages)
    d = str(tmp_path)
    write_webpages(f"{d}/a", 300, n_files=1, rows_per_row_group=150)
    os.makedirs(f"{d}/b")
    pq.write_table(generate_webpages(300, start_doc_id=300),
                   f"{d}/b/w.parquet", row_group_size=150)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    for part in ("a", "b"):
        build_index(f"{d}/{part}", f"{d}/i{part}", s,
                    html_fallback=("text", "html"), num_shards=2,
                    target_docs_per_partition=150)
        bundle_index(f"{d}/i{part}", f"{d}/{part}.split")
    res = merge_indexes([split_url(f"{d}/a.split"),
                         split_url(f"{d}/b.split")], f"{d}/merged")
    assert res.num_docs == 600
    r = IndexReader(f"{d}/merged")
    # equals a merge of the unbundled directories
    r_dir = IndexReader(merge_indexes(
        [f"{d}/ia", f"{d}/ib"], f"{d}/merged_dir").index_dir)
    for q in ["needleterm", "w0001 OR w0042", "lang:de"]:
        assert r.search(q, 15).hits == r_dir.search(q, 15).hits, q


# ---------------------------------------------------------------------------
# Avro reader + Iceberg live-file listing
# ---------------------------------------------------------------------------

def test_avro_roundtrip():
    from tantivy4java_ray.sources.avro import read_avro_file, write_avro_file
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
        {"name": "sub", "type": {"type": "record", "name": "sub",
                                 "fields": [{"name": "x", "type": "long"}]}},
    ]}
    recs = [{"s": "héllo", "n": -42, "opt": None, "arr": [1, 2, 3],
             "m": {"a": 1.5}, "sub": {"x": 7}},
            {"s": "", "n": 2 ** 40, "opt": "y", "arr": [],
             "m": {}, "sub": {"x": -1}}]
    for codec in ("null", "deflate"):
        blob = write_avro_file(schema, recs, codec=codec)
        _s, got = read_avro_file(blob)
        assert got == recs, codec


def _mini_iceberg_table(base, data_files):
    """Synthesize an Iceberg table layout: metadata JSON + avro manifest
    list + avro manifest (the public spec field subset)."""
    import json as _json

    from tantivy4java_ray.sources.avro import write_avro_file
    meta_dir = os.path.join(base, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    manifest_schema = {"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "long"},
        {"name": "data_file", "type": {"type": "record", "name": "df",
         "fields": [{"name": "content", "type": "long"},
                    {"name": "file_path", "type": "string"},
                    {"name": "record_count", "type": "long"}]}}]}
    entries = [{"status": 1, "data_file":
                {"content": 0, "file_path": p, "record_count": 10}}
               for p in data_files]
    # one deleted entry + one delete-file entry that must be skipped
    entries.append({"status": 2, "data_file":
                    {"content": 0, "file_path": "/gone.parquet",
                     "record_count": 1}})
    entries.append({"status": 1, "data_file":
                    {"content": 1, "file_path": "/posdel.parquet",
                     "record_count": 1}})
    mpath = os.path.join(meta_dir, "manifest-1.avro")
    with open(mpath, "wb") as f:
        f.write(write_avro_file(manifest_schema, entries))
    mlist_schema = {"type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"}]}
    lpath = os.path.join(meta_dir, "snap-1.avro")
    with open(lpath, "wb") as f:
        f.write(write_avro_file(
            mlist_schema, [{"manifest_path": mpath,
                            "manifest_length": os.path.getsize(mpath)}]))
    meta = {"format-version": 2, "current-snapshot-id": 1,
            "snapshots": [{"snapshot-id": 1, "manifest-list": lpath}],
            "schemas": []}
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)


def test_iceberg_live_files_and_build(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.schema import IndexSchema
    from tantivy4java_ray.sources.iceberg import (iceberg_live_files,
                                                  iceberg_snapshots)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    paths = []
    for i in range(2):
        p = str(data_dir / f"f{i}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
            "text": [f"iceberg doc {j} alpha" for j in range(10)]}), p)
        paths.append(p)
    base = str(tmp_path / "table")
    _mini_iceberg_table(base, paths)
    assert len(iceberg_snapshots(base)) == 1
    files = iceberg_live_files(base)
    assert files == sorted(paths)      # tombstones + delete files skipped
    s = IndexSchema().add_text_field("text")
    idx = str(tmp_path / "idx")
    build_index(files, idx, s, num_shards=2)
    from tantivy4java_ray.query import Query
    r = IndexReader(idx)
    docs, _ = r.evaluate(Query.term("text", "alpha"))
    assert len(docs) == 20


# ---------------------------------------------------------------------------
# real multimodal decode: PPM / BMP / WAV
# ---------------------------------------------------------------------------

def _make_ppm(w, h):
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    return (b"P6\n# comment\n%d %d\n255\n" % (w, h)) + px.tobytes(), px


def _make_bmp(w, h):
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):     # bottom-up
        row = px[y][:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\0" * (row_bytes - len(row)))
    data = b"".join(rows)
    header = (b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\0" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + b"\0" * 24)
    return header + data, px


def _make_wav(n_samples=8000):
    import io
    import wave
    t = np.arange(n_samples)
    samples = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def test_ppm_bmp_decode_exact():
    from tantivy4java_ray.stages.multimodal import decode_bmp, decode_ppm
    blob, px = _make_ppm(7, 5)
    np.testing.assert_array_equal(decode_ppm(blob), px)
    blob, px = _make_bmp(6, 4)
    np.testing.assert_array_equal(decode_bmp(blob), px)


def test_image_decode_stage_real(ray_session):
    import ray.data
    from tantivy4java_ray.stages.multimodal import decode_images
    ppm, _ = _make_ppm(16, 12)
    bmp, _ = _make_bmp(10, 10)
    ds = ray.data.from_items([{"doc_id": 0, "image": ppm},
                              {"doc_id": 1, "image": bmp}])
    out = decode_images(ds, size=(8, 8), concurrency=1).to_pandas()
    assert len(out) == 2
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
    assert out["orig_bytes"].tolist() == [len(ppm), len(bmp)]


def _make_y4m(w, h, n_frames, colorspace=b"420"):
    """Solid-color frames: frame f is YUV (y=40+20f, u=96, v=160)."""
    hdr = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" % (w, h, colorspace)
    frames = []
    for f in range(n_frames):
        y = np.full(w * h, 40 + 20 * f, np.uint8)
        if colorspace == b"444":
            u = np.full(w * h, 96, np.uint8)
            v = np.full(w * h, 160, np.uint8)
        else:
            u = np.full((w // 2) * (h // 2), 96, np.uint8)
            v = np.full((w // 2) * (h // 2), 160, np.uint8)
        frames.append(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())
    return hdr + b"".join(frames)


def test_y4m_decode_and_sampling():
    from tantivy4java_ray.stages.multimodal import decode_y4m_frames
    blob = _make_y4m(8, 6, 5)
    out = decode_y4m_frames(blob, 3, (4, 4))
    assert out.shape == (3, 4, 4, 3)
    # even sampling picks frames 0, 2, 4 -> y = 40, 80, 120
    for oi, yval in zip(range(3), (40.0, 80.0, 120.0)):
        uf, vf = 96.0 - 128.0, 160.0 - 128.0
        want = np.clip([yval + 1.402 * vf,
                        yval - 0.344136 * uf - 0.714136 * vf,
                        yval + 1.772 * uf], 0, 255).astype(np.uint8)
        frame = out[oi]
        assert (frame == want).all(), (oi, frame[0, 0], want)
    # 444 parses too, and short streams pad by repeating the last frame
    out444 = decode_y4m_frames(_make_y4m(4, 4, 2, b"444"), 4)
    assert out444.shape == (4, 4, 4, 3)
    np.testing.assert_array_equal(out444[1], out444[3])


def test_video_frame_stage_real(ray_session):
    import ray.data
    from tantivy4java_ray.stages.multimodal import sample_video_frames
    vid = _make_y4m(8, 6, 4)
    ds = ray.data.from_items([{"doc_id": 0, "video": vid}])
    out = sample_video_frames(ds, n_frames=2, size=(4, 4),
                              concurrency=1).to_pandas()
    assert len(out) == 1
    assert len(out["frames"][0]) == 2 * 4 * 4 * 3
    assert out["orig_bytes"].tolist() == [len(vid)]


def test_wav_decode_stage_real(ray_session):
    import ray.data
    from tantivy4java_ray.stages.multimodal import sample_audio_frames
    wav = _make_wav()
    ds = ray.data.from_items([{"doc_id": 0, "audio": wav}])
    out = sample_audio_frames(ds, n_frames=8, concurrency=1).to_pandas()
    e = np.asarray(out["frame_energy"][0])
    assert len(e) == 8
    # a constant-amplitude sine has RMS ~ A/sqrt(2) in every frame
    np.testing.assert_allclose(e, (20000 / 32768) / np.sqrt(2), rtol=0.05)


def test_compressed_codecs_still_raise():
    # r5: JPEG (baseline+progressive), PNG and GIF decode natively now
    # (tests/test_jpeg.py, test_png.py, test_gif.py); the honest raises
    # are WEBP/AVIF and MP3
    from tantivy4java_ray.stages.multimodal import (AudioFrameSample,
                                                    ImageDecodeResize)
    lossy = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
             + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        ImageDecodeResize()._decode_real(lossy)
    with pytest.raises(NotImplementedError):
        AudioFrameSample()._decode_real(b"ID3....")


def test_sharded_pool_aggregate(range_idx):
    """Leaf/root aggregation partials merge to the single-reader result."""
    from tantivy4java_ray.pipelines.search import (IndexReader,
                                                   ShardedSearchPool)
    from tantivy4java_ray.query import Query
    pool = ShardedSearchPool(range_idx, num_actors=3)
    try:
        single = IndexReader(range_idx)
        specs = {"l": {"terms": {"field": "lang", "size": 10}},
                 "n": {"value_count": {"field": "lang"}}}
        for q in [None, Query.term("text", "w0001"), "w0001 OR w0042"]:
            got = pool.aggregate(q, specs)
            qq = q
            if isinstance(qq, str):
                from tantivy4java_ray.query import parse_query
                qq = parse_query(qq, single.schema)
            want = single.aggregate(qq, specs)
            assert got == want, q
    finally:
        pool.shutdown()


def test_nputil_repeat_matches_numpy():
    from tantivy4java_ray.nputil import repeat_int
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = int(rng.integers(1, 200))
        vals = rng.integers(-10**9, 10**9, n)
        counts = rng.integers(0, 7, n)
        np.testing.assert_array_equal(repeat_int(vals, counts),
                                      np.repeat(vals, counts))
    assert repeat_int(np.array([], np.int64),
                      np.array([], np.int64)).tolist() == []


# ---------------------------------------------------------------------------
# IndexWriter: streaming ingest with commit / rollback
# ---------------------------------------------------------------------------

def test_index_writer_commit_rollback(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.pipelines.writer import IndexWriter
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    idx = str(tmp_path / "idx")
    w = IndexWriter(idx, s, heap_docs=3, num_shards=2)
    for i in range(5):
        w.add_document({"doc_id": i, "text": f"first batch doc {i}"})
    w.add_json('{"doc_id": 5, "text": "json ingested doc"}')
    res = w.commit()
    assert res.num_docs == 6
    r = IndexReader(idx)
    assert r.num_docs == 6
    docs, _ = r.evaluate(Query.term("text", "json"))
    assert docs.tolist() == [5]

    # second commit merges a delta, doc ids continue after existing
    w.add_document({"doc_id": 6, "text": "second batch needle"})
    w.commit()
    r = IndexReader(idx)
    assert r.num_docs == 7
    docs, _ = r.evaluate(Query.term("text", "needle"))
    assert docs.tolist() == [6]
    # earlier docs unchanged
    docs, _ = r.evaluate(Query.term("text", "json"))
    assert docs.tolist() == [5]
    # doc retrieval still resolves committed staged files
    tbl = r.retrieve_docs([5, 6], columns=["text"])
    assert tbl.num_rows == 2

    # rollback discards only uncommitted adds
    w.add_document({"doc_id": 7, "text": "rolled back doc"})
    assert w.rollback() == 1
    out = w.commit()
    assert out is None
    assert IndexReader(idx).num_docs == 7
    docs, _ = IndexReader(idx).evaluate(Query.term("text", "rolled"))
    assert docs.tolist() == []


def test_index_writer_deletes(ray_session, tmp_path):
    """Writer-level delete_documents / deleteAll, applied at commit
    (IndexWriter.deleteDocuments semantics: tombstones at merge)."""
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.pipelines.writer import IndexWriter
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    idx = str(tmp_path / "idx")
    w = IndexWriter(idx, s, num_shards=2)
    for i, t in enumerate(["keep one", "drop two", "keep three"]):
        w.add_document({"doc_id": i, "text": t})
    w.commit()
    w.delete_documents("text", "drop")
    res = w.commit()
    assert res.num_deleted == 1
    r = IndexReader(idx)
    assert r.doc_freq("text", "drop") == 0
    docs, _ = r.evaluate(Query.term("text", "keep"))
    assert docs.tolist() == [0, 2]
    # fast-field path excludes the tombstoned doc too
    docs, _ = r.evaluate(Query.range("doc_id", None, None))
    assert docs.tolist() == [0, 2]
    # add + delete staged together: delete applies at commit
    w.add_document({"doc_id": 3, "text": "drop four"})
    w.delete_documents("text", "drop")
    w.commit()
    r = IndexReader(idx)
    docs, _ = r.evaluate(Query.term("text", "four"))
    assert docs.tolist() == []
    # rollback clears staged deletes
    w.delete_all_documents()
    w.rollback()
    assert w.commit() is None
    docs, _ = IndexReader(idx).evaluate(Query.term("text", "keep"))
    assert docs.tolist() == [0, 2]


def test_index_writer_reopen_preserves_doc_store(ray_session, tmp_path):
    """A reopened writer must not reuse staged-file numbers: the
    committed index references them as its doc store (regression)."""
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.pipelines.writer import IndexWriter
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    idx = str(tmp_path / "idx")
    w1 = IndexWriter(idx, s, num_shards=2)
    w1.add_document({"doc_id": 0, "text": "original alpha"})
    w1.commit()
    assert w1.commit_opstamp() == 0
    # new writer session (process restart)
    w2 = IndexWriter(idx, s, num_shards=2)
    assert w2._flush_i == 1  # past staged-00000
    assert w2.commit_opstamp() == 0  # survives reopen
    w2.add_document({"doc_id": 1, "text": "later bravo"})
    w2.commit()
    r = IndexReader(idx)
    tbl = r.retrieve_docs([0, 1], columns=["text"])
    assert tbl.column("text").to_pylist() == ["original alpha",
                                              "later bravo"]
    # failed delete phase must not poison the staged list
    w2.add_document({"doc_id": 2, "text": "charlie"})
    w2.delete_documents("nosuchfield", "x")
    import pytest as _pytest
    with _pytest.raises(KeyError):
        w2.commit()
    assert w2._staged == []          # adds landed, not re-mergeable
    assert IndexReader(idx).num_docs == 3
    w2.rollback()                    # clears the poisoned delete only
    tbl = IndexReader(idx).retrieve_docs([2], columns=["text"])
    assert tbl.column("text").to_pylist() == ["charlie"]


def test_index_writer_typed_flushes(ray_session, tmp_path):
    """Staged columns carry the DECLARED type even when a whole flush
    leaves a field unset (inference would give a null-typed column and
    commit()'s concat would fail on schema mismatch across flushes)."""
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.pipelines.writer import IndexWriter
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    s.add_integer_field("views", fast=True)
    s.add_json_field("props")
    idx = str(tmp_path / "idx")
    w = IndexWriter(idx, s, heap_docs=2, num_shards=2)
    # flush 1: views/props never set -> all-None columns
    w.add_document({"doc_id": 0, "text": "alpha"})
    w.add_document({"doc_id": 1, "text": "bravo"})
    # flush 2: typed values (+ a dict for the JSON field)
    w.add_document({"doc_id": 2, "text": "charlie", "views": 7,
                    "props": {"cat": "x"}})
    w.add_document({"doc_id": 3, "text": "delta", "views": 9})
    w.commit()
    r = IndexReader(idx)
    assert r.num_docs == 4
    docs, _ = r.evaluate(Query.json_term("props", "cat", "x"))
    assert docs.tolist() == [2]
    docs, _ = r.evaluate(Query.range("views", 8, None))
    assert docs.tolist() == [3]


def test_index_writer_counter_parse_past_5_digits(ray_session, tmp_path):
    """A committed staged-100000.parquet (6 digits) must advance the
    resume counter past 100000 — a fixed 5-char slice parsed it as
    10000 and went on to overwrite committed doc-store files."""
    from tantivy4java_ray.pipelines.writer import IndexWriter
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    idx = str(tmp_path / "idx")
    w = IndexWriter(idx, s, num_shards=2)
    w._flush_i = 100000  # simulate a long-lived session's 100001st flush
    w.add_document({"doc_id": 0, "text": "alpha"})
    w.commit()
    w2 = IndexWriter(idx, s, num_shards=2)
    assert w2._flush_i == 100001


def test_index_writer_reopen_discards_uncommitted_staged(ray_session,
                                                         tmp_path):
    """Rollback-on-reopen: staged files a dead session flushed but never
    committed are purged (they would otherwise be orphans — invisible to
    pending_docs/commit yet indistinguishable from doc-store files);
    committed staged files survive untouched."""
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.pipelines.writer import IndexWriter
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    idx = str(tmp_path / "idx")
    w1 = IndexWriter(idx, s, num_shards=2)
    w1.add_document({"doc_id": 0, "text": "committed alpha"})
    w1.commit()
    # the session "crashes" with one flushed-but-uncommitted file
    w1.add_document({"doc_id": 1, "text": "lost bravo"})
    w1._flush()
    staged = sorted(os.listdir(idx + ".staging"))
    assert "staged-00001.parquet" in staged
    w2 = IndexWriter(idx, s, num_shards=2)
    staged = sorted(os.listdir(idx + ".staging"))
    assert "staged-00001.parquet" not in staged     # orphan purged
    assert "staged-00000.parquet" in staged         # doc store intact
    assert IndexReader(idx).retrieve_docs(
        [0], columns=["text"]).column("text").to_pylist() == \
        ["committed alpha"]
    w2.add_document({"doc_id": 1, "text": "new bravo"})
    w2.commit()
    assert IndexReader(idx).retrieve_docs(
        [1], columns=["text"]).column("text").to_pylist() == ["new bravo"]


def test_index_writer_crash_between_renames(ray_session, tmp_path):
    """Simulated crash in the commit generation swap: the recovery
    marker rolls the swap forward on the next writer open."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.pipelines.writer import (
        IndexWriter, recover_interrupted_commit)
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    idx = str(tmp_path / "idx")
    w = IndexWriter(idx, s, num_shards=2)
    w.add_document({"doc_id": 0, "text": "alpha"})
    w.commit()
    # fake the mid-swap state: index renamed away, merged ready, marker on
    _shutil.copytree(idx, idx + ".merged-dead")
    _os.rename(idx, idx + ".old-dead")
    with open(idx + ".swap.json", "w") as f:
        _json.dump({"old": idx + ".old-dead",
                    "merged": idx + ".merged-dead", "index_dir": idx}, f)
    assert not _os.path.exists(idx)
    assert recover_interrupted_commit(idx)
    assert IndexReader(idx).num_docs == 1
    assert not _os.path.exists(idx + ".old-dead")
    assert not _os.path.exists(idx + ".swap.json")


# ---------------------------------------------------------------------------
# persisted IVF index + order-by-fast-field search
# ---------------------------------------------------------------------------

def test_persisted_ivf_index(ray_session, sf_dir, tmp_path):
    import ray.data
    from tantivy4java_ray.functions.ivf import IVFIndex, build_ivf_index
    from tantivy4java_ray.functions.similarity import topk_cosine
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    idx = build_ivf_index(ds, str(tmp_path / "ivf"), n_clusters=8,
                          sample_size=400)
    # reload from disk
    idx2 = IVFIndex(str(tmp_path / "ivf"))
    q = np.stack(ds.limit(3).to_pandas()["embedding"].to_numpy())
    approx = idx2.search(q, k=10, nprobe=4)
    exact = topk_cosine(ds, q, k=10)
    # recall@10 across the 3 queries with half the clusters probed
    hits = 0
    for qi in range(3):
        a = set(approx[approx.query_id == qi]["vec_id"])
        e = set(exact[exact.query_id == qi]["vec_id"])
        hits += len(a & e)
    assert hits >= 15, f"recall too low: {hits}/30"
    # each query's own vector must be its top hit (cosine 1.0)
    for qi in range(3):
        top = approx[approx.query_id == qi].iloc[0]
        assert top["score"] > 0.999


def test_search_order_by_field(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.schema import IndexSchema
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": ["apple pie"] * 6,
        "price": pa.array([5.0, 2.0, None, 9.0, 2.0, 7.0])}), src)
    s = IndexSchema().add_text_field("text")
    s.add_float_field("price", fast=True)
    idx = str(tmp_path / "idx")
    build_index(src, idx, s, num_shards=1)
    r = IndexReader(idx)
    hits = r.search("apple", 3, order_by_field="price").hits
    assert [d for _v, d in hits] == [3, 5, 0]
    assert hits[0][0] == 9.0
    # ascending + offset; null-price doc 2 excluded
    hits = r.search("apple", 10, order_by_field="price",
                    descending=False).hits
    assert [d for _v, d in hits] == [1, 4, 0, 5, 3]


def test_explain_recursive(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Occur, Query
    from tantivy4java_ray.schema import IndexSchema
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": ["red fish blue fish", "red boat", "blue sky"]}), src)
    s = IndexSchema().add_text_field("text")
    idx = str(tmp_path / "idx")
    build_index(src, idx, s, num_shards=1)
    r = IndexReader(idx)
    q = Query.boolean([(Occur.SHOULD, Query.term("text", "red")),
                       (Occur.SHOULD, Query.boost(Query.term("text", "fish"),
                                                  2.0))])
    ex = r.explain(q, 0)
    assert ex["matched"] and ex["kind"] == "bool"
    clauses = ex["clauses"]
    assert clauses[0]["occur"] == "SHOULD"
    assert clauses[0]["term"] == "red" and clauses[0]["tf"] == 1
    assert clauses[1]["kind"] == "boost" and clauses[1]["boost"] == 2.0
    inner = clauses[1]["clauses"][0]
    assert inner["term"] == "fish" and inner["tf"] == 2
    # parent score = sum of clause contributions (f32 tolerance)
    total = clauses[0]["score"] + clauses[1]["score"]
    assert abs(total - ex["score"]) < 1e-5
    # non-matching doc
    ex2 = r.explain(Query.term("text", "boat"), 0)
    assert not ex2["matched"] and ex2["tf"] == 0


def test_sharded_pool_over_bundle(range_idx, tmp_path):
    """ShardedSearchPool opens a single-file split bundle directly."""
    from tantivy4java_ray.pipelines.bundle import bundle_index, split_url
    from tantivy4java_ray.pipelines.search import (IndexReader,
                                                   ShardedSearchPool)
    bundle = str(tmp_path / "r.split")
    bundle_index(range_idx, bundle)
    pool = ShardedSearchPool(split_url(bundle), num_actors=2)
    try:
        single = IndexReader(range_idx)
        for q in ["needleterm", "w0042 OR w0001"]:
            assert pool.search(q, 10).hits == single.search(q, 10).hits, q
    finally:
        pool.shutdown()
