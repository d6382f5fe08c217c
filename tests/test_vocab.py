"""Corpus vocabulary top-k (tokenizer-prep) — hand oracle, DuckDB
differential for unigrams AND bigrams on a random Zipf corpus, tie-break
determinism at the k boundary."""

import duckdb
import numpy as np
import pandas as pd

from tantivy4java_ray.functions.textstats import vocab_counts, vocab_topk

_TOKS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
         "x -> x <> '')")


def _corpus(n=400, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    p = 1.0 / np.arange(1, 61)
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30), p=p))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_hand_oracle(ray_session):
    import ray.data
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["The cat, the HAT!", "a cat"]})
    out = vocab_topk(ray.data.from_pandas(df), k=2)
    assert out.to_dict("records") == [{"term": "cat", "cnt": 2},
                                      {"term": "the", "cnt": 2}]


def test_duckdb_differential_unigram(ray_session):
    import ray.data
    df = _corpus()
    got = vocab_topk(ray.data.from_pandas(df).repartition(6), k=25)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(f"""
        SELECT term, count(*)::BIGINT AS cnt
        FROM (SELECT unnest({_TOKS}) AS term FROM documents)
        GROUP BY term ORDER BY cnt DESC, term LIMIT 25""").df()
    pd.testing.assert_frame_equal(got, want)


def test_duckdb_differential_bigram(ray_session):
    import ray.data
    df = _corpus(seed=9)
    got = vocab_topk(ray.data.from_pandas(df).repartition(6), k=20,
                     ngram=2)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(f"""
        WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS t,
                           unnest(range(len({_TOKS}))) AS i
                    FROM documents),
        bg AS (SELECT t || ' ' || lead(t) OVER
                          (PARTITION BY doc_id ORDER BY i) AS term
               FROM tk)
        SELECT term, count(*)::BIGINT AS cnt FROM bg
        WHERE term IS NOT NULL
        GROUP BY term ORDER BY cnt DESC, term LIMIT 20""").df()
    pd.testing.assert_frame_equal(got, want)


def test_bigram_not_bridged_across_removed_long_token(ray_session):
    """RemoveLongFilter drops >255-byte tokens from the stream; the two
    neighbours of a dropped token must NOT count as an adjacent pair
    (position continuity, not stream adjacency)."""
    import ray.data
    blob = "x" * 300
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": [f"foo {blob} bar", "foo bar"]})
    out = vocab_counts(ray.data.from_pandas(df), ngram=2).to_pandas()
    counts = dict(zip(out["term"], out["cnt"]))
    assert counts == {"foo bar": 1}   # only doc 2's real pair


def test_counts_sum_to_token_total(ray_session):
    import ray.data
    df = _corpus(n=100, seed=2)
    full = vocab_counts(ray.data.from_pandas(df).repartition(4)).to_pandas()
    n_tokens = sum(len([w for w in t.split() if w]) for t in df["text"])
    assert int(full["cnt"].sum()) == n_tokens
    assert full["term"].is_unique


def test_empty_and_null_text(ray_session):
    import pyarrow as pa
    import ray.data
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", None, "only term"])})
    out = vocab_topk(ray.data.from_arrow(t), k=10)
    assert out.to_dict("records") == [{"term": "only", "cnt": 1},
                                      {"term": "term", "cnt": 1}]
