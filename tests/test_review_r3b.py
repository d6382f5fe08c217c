"""Regressions for the second round-3 review batch: stale-tombstone
rebuild, numeric dual-hash degeneration, NaN-embedding top-k crash,
all-null cardinality, partition-filter JSON op whitelist, resumed-count
from map summaries."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tantivy4java_ray.functions.quantiles import (_distinct_keys,
                                                  exact_cardinality)
from tantivy4java_ray.functions.similarity import topk_cosine
from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Query
from tantivy4java_ray.schema import IndexSchema
from tantivy4java_ray.sources.partition_filter import PartitionFilter

BASE = "/tmp/t4jr_review_r3b"


@pytest.fixture(autouse=True, scope="module")
def _base(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    yield
    shutil.rmtree(BASE, ignore_errors=True)


def _schema(text_field="text"):
    s = IndexSchema()
    s.add_text_field(text_field)
    s.add_integer_field("n")
    return s


def test_rebuild_purges_tombstones_and_stale_shards():
    """A committed index rebuilt under a different plan must not keep
    the old deleted_docs.npy (phantom tombstones masking NEW docs on
    fast-field query paths) or stale shard dirs from a larger prior
    num_shards (bundling would pack them)."""
    src1 = f"{BASE}/a.parquet"
    src2 = f"{BASE}/b.parquet"
    pq.write_table(pa.table({"text": ["alpha beta"] * 20,
                             "n": pa.array(range(20), pa.int64())}), src1)
    pq.write_table(pa.table({"text": ["alpha gamma"] * 30,
                             "n": pa.array(range(30), pa.int64())}), src2)
    idx = f"{BASE}/idx_rebuild"
    build_index(src1, idx, _schema(), num_shards=4)
    # simulate a merge-produced tombstone file + a stale extra shard dir
    # (tombstones mask FAST-FIELD matches; postings are rewritten at
    # merge, so the term path intentionally skips the mask)
    np.save(f"{idx}/deleted_docs.npy", np.arange(10, dtype=np.int64))
    os.makedirs(f"{idx}/shards/shard-00099")
    with open(f"{idx}/shards/shard-00099/terms.parquet", "wb") as f:
        f.write(b"stale")
    r = IndexReader(idx)
    q_all = Query.range("n", 0, 1_000)
    assert len(r.evaluate(q_all)[0]) == 10  # tombstones mask 0..9
    # rebuild with a DIFFERENT plan (other file, fewer shards)
    build_index(src2, idx, _schema(), num_shards=2)
    assert not os.path.exists(f"{idx}/deleted_docs.npy")
    assert not os.path.exists(f"{idx}/shards/shard-00099")
    r2 = IndexReader(idx)
    assert len(r2.evaluate(q_all)[0]) == 30  # no phantom deletes


def test_distinct_keys_numeric_hashes_are_independent():
    """pandas hash_array ignores hash_key for numeric dtypes; the
    numeric path must derive the second key from an independent
    bijective mixer, not return (h, h) pairs."""
    t = pa.table({"u": pa.array(np.arange(1000, dtype=np.int64))})
    keys = _distinct_keys(t, "u")
    h1 = keys.column("__h").to_numpy()
    h2 = keys.column("__h2").to_numpy()
    assert not np.array_equal(h1, h2)
    # both mixers are bijective on 64-bit values: no collisions at all
    assert len(np.unique(h1)) == 1000 and len(np.unique(h2)) == 1000


def test_distinct_keys_negative_zero_canonicalized():
    t = pa.table({"v": pa.array([0.0, -0.0, 1.0], pa.float64())})
    keys = _distinct_keys(t, "v")
    assert keys.num_rows == 2  # -0.0 == 0.0 (SQL equality)


def test_exact_cardinality_all_null_returns_zero():
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array([None, None], pa.float64())}))
    assert exact_cardinality(ds, "v") == 0


def test_topk_cosine_nan_embedding_excluded_not_crash():
    """A NaN embedding must not poison the tie-exact threshold (it made
    the candidate set empty -> ArrowInvalid column-length mismatch)."""
    vecs = np.eye(4, dtype=np.float32)
    vecs[2, 0] = np.nan
    t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                  "embedding": pa.array([list(map(float, r))
                                         for r in vecs])})
    ds = ray.data.from_arrow(t)
    out = topk_cosine(ds, np.eye(4, dtype=np.float32)[:1], k=10)
    assert 2 not in set(out["vec_id"])      # NaN row excluded
    assert list(out["vec_id"])[0] == 0       # true neighbor first
    assert not out["score"].isna().any()


def test_partition_filter_from_json_rejects_unknown_op():
    ok = PartitionFilter.eq("lang", "en").and_(
        PartitionFilter.gt("n", 3)).to_json()
    assert PartitionFilter.from_json(ok) is not None  # round-trips
    with pytest.raises(ValueError, match="unknown partition-filter op"):
        PartitionFilter.from_json('["scan", "/etc/passwd"]')
    with pytest.raises(ValueError, match="unknown partition-filter op"):
        PartitionFilter.from_json('["from_json", "x"]')


def test_resumed_count_comes_from_map_summaries():
    src = f"{BASE}/c.parquet"
    pq.write_table(pa.table({"text": ["one two three"] * 40}), src,
                   row_group_size=10)
    idx = f"{BASE}/idx_resume"
    r1 = build_index(src, idx, _schema(), num_shards=2,
                     target_docs_per_partition=10)
    assert r1.resumed_partitions == 0
    r2 = build_index(src, idx, _schema(), num_shards=2,
                     target_docs_per_partition=10)
    # committed fast path: every partition counts as resumed
    assert r2.resumed_partitions == r2.num_partitions
