"""Regressions for the write-path review batch: commit() config
propagation to the delta build, checkpoint fingerprint includes
hot_salts, merge config validation, stale empty-shard purge, committed
fast-path config check, html_fallback on a file with no text column,
staging-dir ownership, temp-dir cleanup on failed commits."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.merge import merge_indexes
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.pipelines.writer import IndexWriter
from tantivy4java_ray.query import Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_review_r3d"


@pytest.fixture(autouse=True, scope="module")
def _base(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    yield
    shutil.rmtree(BASE, ignore_errors=True)


def _schema():
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("n")
    return s


def _src(path, texts, n0=0):
    pq.write_table(pa.table({
        "text": texts,
        "n": pa.array(range(n0, n0 + len(texts)), pa.int64())}), path)
    return path


def test_commit_propagates_base_config_to_delta():
    """A delta commit on an exact_fieldnorms base must build the delta
    with exact fieldnorms too — otherwise the merged index promises
    dl__ columns the delta's docdata lacks and scoring crashes."""
    src = _src(f"{BASE}/cfg_a.parquet", ["alpha beta"] * 30)
    idx = f"{BASE}/idx_cfg"
    build_index(src, idx, _schema(), num_shards=2, exact_fieldnorms=True,
                hot_salts=2)
    w = IndexWriter(idx, _schema())
    for i in range(5):
        w.add_document({"text": "alpha gamma", "n": 100 + i})
    w.commit()
    r = IndexReader(idx)
    assert r.num_docs == 35
    # scored query touches exact dls across EVERY partition incl. delta
    hits = r.search(Query.term("text", "alpha"), 40).hits
    assert len(hits) == 35
    cfg = json.load(open(f"{idx}/manifest.json"))["meta"]["config"]
    assert cfg["exact_fieldnorms"] is True
    assert cfg["hot_salts"] == 2


def test_merge_rejects_config_mismatch():
    a = f"{BASE}/m_a"
    b = f"{BASE}/m_b"
    build_index(_src(f"{BASE}/m_a.parquet", ["x y"] * 10), a,
                _schema(), num_shards=2, hot_salts=2)
    build_index(_src(f"{BASE}/m_b.parquet", ["x z"] * 10), b,
                _schema(), num_shards=2, hot_salts=8)
    with pytest.raises(ValueError, match="hot_salts"):
        merge_indexes([a, b], f"{BASE}/m_out")


def test_committed_fast_path_rebuilds_on_config_change():
    src = _src(f"{BASE}/fp.parquet", ["alpha beta"] * 20)
    idx = f"{BASE}/idx_fp"
    build_index(src, idx, _schema(), num_shards=2)
    r1 = build_index(src, idx, _schema(), num_shards=2)
    assert r1.resumed_partitions > 0          # same config: fast path
    r2 = build_index(src, idx, _schema(), num_shards=2,
                     exact_fieldnorms=True)
    assert r2.resumed_partitions == 0         # config change: rebuild
    reader = IndexReader(idx)
    assert reader.exact_fieldnorms


def test_html_fallback_when_text_column_absent():
    """A parquet file with ONLY html must still be searchable via the
    extracted text."""
    path = f"{BASE}/htmlonly.parquet"
    html = ["<html><body><p>alpha beta gamma</p></body></html>"] * 8
    pq.write_table(pa.table({
        "html": pa.array([h.encode() for h in html], pa.binary()),
        "n": pa.array(range(8), pa.int64())}), path)
    idx = f"{BASE}/idx_htmlonly"
    s = _schema()
    build_index(path, idx, s, num_shards=1, html_fallback=("text", "html"))
    r = IndexReader(idx)
    docs, _ = r.evaluate(Query.term("text", "gamma"))
    assert len(docs) == 8


def test_empty_shard_purges_stale_dir():
    """An interrupted earlier attempt's shard dir must not survive a
    re-planned build in which that shard is empty."""
    src = _src(f"{BASE}/es.parquet", ["qqq www"] * 10)
    idx = f"{BASE}/idx_es"
    build_index(src, idx, _schema(), num_shards=4)
    # simulate interrupted prior attempt: committed manifest gone,
    # stale shard files present
    os.unlink(f"{idx}/manifest.json")
    shutil.rmtree(f"{idx}/txlog")
    shutil.rmtree(f"{idx}/docdata")
    stale = {d for d in os.listdir(f"{idx}/shards")}
    assert stale
    # rebuild over a single-term corpus: most shards now empty
    src2 = _src(f"{BASE}/es2.parquet", ["qqq"] * 10)
    build_index(src2, idx, _schema(), num_shards=4)
    r = IndexReader(idx)
    docs, _ = r.evaluate(Query.term("text", "www"))
    assert len(docs) == 0, "stale shard served old postings"
    docs, _ = r.evaluate(Query.term("text", "qqq"))
    assert len(docs) == 10


def test_staging_dir_ownership_enforced():
    idx_a = f"{BASE}/own_a"
    idx_b = f"{BASE}/own_b"
    staging = f"{BASE}/shared_staging"
    wa = IndexWriter(idx_a, _schema(), staging_dir=staging)
    wa.add_document({"text": "hello world", "n": 1})
    wa.commit()
    with pytest.raises(ValueError, match="staging"):
        IndexWriter(idx_b, _schema(), staging_dir=staging)
    # the owner itself reopens fine
    IndexWriter(idx_a, _schema(), staging_dir=staging)


def test_failed_commit_cleans_temp_dirs(monkeypatch):
    src = _src(f"{BASE}/fc.parquet", ["aa bb"] * 10)
    idx = f"{BASE}/idx_fc"
    build_index(src, idx, _schema(), num_shards=2)
    w = IndexWriter(idx, _schema())
    w.add_document({"text": "cc dd", "n": 50})
    import tantivy4java_ray.pipelines.merge as merge_mod

    def boom(*a, **k):
        raise RuntimeError("injected merge failure")
    monkeypatch.setattr(merge_mod, "merge_indexes", boom)
    monkeypatch.setattr("tantivy4java_ray.pipelines.writer.merge_indexes",
                        boom, raising=False)
    with pytest.raises(RuntimeError, match="injected"):
        w.commit()
    parent = os.path.dirname(idx)
    leaks = [d for d in os.listdir(parent)
             if d.startswith(os.path.basename(idx) + ".delta-")
             or d.startswith(os.path.basename(idx) + ".merged-")]
    assert leaks == [], f"leaked temp dirs: {leaks}"
    # index itself still healthy
    r = IndexReader(idx)
    assert r.num_docs == 10
