"""Incremental exact dedup (new shard vs committed fingerprint
snapshot) — hand oracle, DuckDB differential on a random corpus with
planted cross-shard duplicates, multi-block boundary coverage, and the
16 B/row snapshot contract."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tantivy4java_ray.functions.dedup import (corpus_fingerprint_keys,
                                              exact_dedup_incremental)


def _survivors(new_ds, seen_ds):
    out = exact_dedup_incremental(new_ds, "text", "doc_id",
                                  corpus_fingerprint_keys(seen_ds, "text"))
    df = out.to_pandas()
    # an empty Dataset's to_pandas has no columns at all
    return sorted(df["doc_id"].tolist()) if "doc_id" in df.columns else []


def test_hand_oracle(ray_session):
    import ray.data
    old = pd.DataFrame({"doc_id": [100, 101],
                        "text": ["committed", "stays"]})
    new = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                        "text": ["committed",   # seen -> dropped
                                 "fresh",       # survives
                                 "fresh",       # dup within new -> dropped
                                 "stays",       # seen -> dropped
                                 "also new"]})
    assert _survivors(ray.data.from_pandas(new),
                      ray.data.from_pandas(old)) == [2, 5]


def test_empty_sides(ray_session):
    import ray.data
    new = pd.DataFrame({"doc_id": [1, 2], "text": ["a", "a"]})
    none_seen = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "text": pd.Series([], dtype=object)})
    # empty snapshot == plain exact dedup of the new shard
    assert _survivors(ray.data.from_pandas(new),
                      ray.data.from_pandas(none_seen)) == [1]
    # everything seen -> nothing survives
    assert _survivors(ray.data.from_pandas(new.assign(text="x")),
                      ray.data.from_pandas(
                          pd.DataFrame({"doc_id": [9], "text": ["x"]}))) == []


def test_duckdb_differential_multiblock(ray_session):
    """Random corpus, many blocks on BOTH sides, planted cross-shard and
    within-shard duplicates; Ray survivors == SQL anti-join + keep-first."""
    import ray.data
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 6)))
             for _ in range(600)]
    old = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                        "text": texts[:200]})
    # new shard: fresh texts + re-crawls of old texts + internal dups
    new_texts = (texts[150:500]
                 + [texts[i] for i in rng.integers(0, 500, 80)])
    new = pd.DataFrame({
        "doc_id": np.arange(1000, 1000 + len(new_texts), dtype=np.int64),
        "text": new_texts})

    got = _survivors(
        ray.data.from_pandas(new).repartition(7),
        ray.data.from_pandas(old).repartition(5))

    con = duckdb.connect()
    con.register("old", old)
    con.register("new", new)
    want = con.sql("""
        SELECT min(n.doc_id) AS doc_id FROM new n
        WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.text = n.text)
        GROUP BY n.text ORDER BY doc_id
    """).df()["doc_id"].tolist()
    assert got == want


def test_snapshot_is_hashes_only(ray_session):
    """The committed snapshot carries 16 B/row (two int64 hashes) and
    per-batch-distinct rows — never the text."""
    import pyarrow as pa
    import ray
    import ray.data
    old = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "a", "b"]})
    snap = corpus_fingerprint_keys(ray.data.from_pandas(old), "text")
    t = pa.concat_tables(ray.get(snap.to_arrow_refs()))
    assert t.column_names == ["__h", "__h2"]
    assert all(pa.types.is_int64(f.type) for f in t.schema)
    assert t.num_rows == 2  # batch-distinct


def test_keep_keys_roundtrip(ray_session):
    """keep_keys=True emits survivors WITH their fingerprints; unioning
    them into the snapshot makes the next crawl's dedup see them —
    zero re-hashing of today's text."""
    import ray.data
    old = pd.DataFrame({"doc_id": [100], "text": ["committed"]})
    day1 = pd.DataFrame({"doc_id": [1, 2], "text": ["fresh", "committed"]})
    snap = corpus_fingerprint_keys(ray.data.from_pandas(old), "text")
    out1 = exact_dedup_incremental(ray.data.from_pandas(day1), "text",
                                   "doc_id", snap, keep_keys=True)
    df1 = out1.to_pandas()
    assert sorted(df1.columns) == ["__h", "__h2", "doc_id"]
    assert df1["doc_id"].tolist() == [1]
    # next crawl: snapshot = old snapshot ∪ day-1 survivors' keys
    snap2 = snap.union(out1.map_batches(
        lambda t: t.select(["__h", "__h2"]), batch_format="pyarrow"))
    day2 = pd.DataFrame({"doc_id": [10, 11],
                         "text": ["fresh", "brand new"]})
    got = _survivors_ds(ray.data.from_pandas(day2), snap2)
    assert got == [11]


def _survivors_ds(new_ds, snap):
    df = exact_dedup_incremental(new_ds, "text", "doc_id",
                                 snap).to_pandas()
    return sorted(df["doc_id"].tolist()) if "doc_id" in df.columns else []


def test_non_integer_ids_refused_and_narrow_ints_cast(ray_session):
    import pyarrow as pa
    import ray.data
    seen = corpus_fingerprint_keys(
        ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["y"]})),
        "text")
    bad = pa.table({"doc_id": pa.array(["a1"], pa.string()),
                    "text": pa.array(["x"])})
    with pytest.raises(Exception, match="int64-compatible"):
        exact_dedup_incremental(ray.data.from_arrow(bad), "text",
                                "doc_id", seen).to_pandas()
    ok = pa.table({"doc_id": pa.array([5, 6], pa.int32()),
                   "text": pa.array(["x", "x"])})
    out = exact_dedup_incremental(ray.data.from_arrow(ok), "text",
                                  "doc_id", seen).to_pandas()
    assert out["doc_id"].tolist() == [5]


def test_sentinel_id_refused(ray_session):
    import ray.data
    bad = pd.DataFrame({"doc_id": [np.iinfo(np.int64).min],
                        "text": ["x"]})
    seen = corpus_fingerprint_keys(
        ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["y"]})),
        "text")
    with pytest.raises(Exception, match="sentinel"):
        exact_dedup_incremental(ray.data.from_pandas(bad), "text",
                                "doc_id", seen).to_pandas()
