"""Regressions for the analytics review batch: inf handling in the HDR
percentile sketch and exact quantiles, empty-corpus LSH pairs, the
vectorized simhash bucket verification, and exact cardinality's
block-boundary counting."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tantivy4java_ray.aggs import (_pct_finalize, _pct_merge, _pct_partial,
                                   _pct_rank_finalize)
from tantivy4java_ray.functions.dedup import minhash_lsh_pairs, simhash64
from tantivy4java_ray.functions.quantiles import (exact_cardinality,
                                                  exact_quantiles)


def test_percentiles_sketch_with_infinities():
    st = _pct_partial(np.array([1.0, 2.0, np.inf]))
    res = _pct_finalize(st, (50.0, 100.0))["values"]
    assert res["50"] == pytest.approx(2.0, rel=0.02)
    assert res["100"] == math.inf
    ranks = _pct_rank_finalize(st, (2.5,))["values"]
    assert ranks["2.5"] == pytest.approx(100 * 2 / 3, abs=1.0)
    # -inf sorts first and survives a merge
    st2 = _pct_merge(st, _pct_partial(np.array([-np.inf])))
    res2 = _pct_finalize(st2, (1.0, 50.0, 100.0))["values"]
    assert res2["1"] == -math.inf
    assert res2["100"] == math.inf
    # nearest-rank: p50 of [-inf, 1, 2, inf] is rank ceil(2)=2 -> 1.0
    assert res2["50"] == pytest.approx(1.0, rel=0.02)


def test_exact_quantiles_with_infinities(ray_session):
    import duckdb
    vals = [1.0, 2.0, 3.0, np.inf, -np.inf, 5.0, 8.0]
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    got = exact_quantiles(ds, "v", [0.0, 50.0, 100.0, 90.0])
    con = duckdb.connect()
    for p, g in got.items():
        exp = con.execute(
            "SELECT quantile_cont(v, ?) FROM (SELECT unnest(?::DOUBLE[])"
            " AS v)", [p / 100.0, vals]).fetchone()[0]
        assert g == exp or (math.isinf(g) and g == exp), (p, g, exp)
    con.close()


def test_minhash_pairs_empty_corpus(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"text": ["", "   ", ""], "id": [1, 2, 3]}))
    pairs = minhash_lsh_pairs(ds, "text", "id")
    assert len(pairs) == 0
    assert {"a", "b"} <= set(pairs.columns)


def test_simhash_vectorized_pair_hamming(ray_session):
    """The vectorized bucket verification must agree with scalar
    popcount on every pair."""
    from tantivy4java_ray.functions.dedup import simhash_pairs
    texts = ["the quick brown fox jumps over the lazy dog again " * 3]
    texts += [texts[0].replace("dog", "cat")]
    texts += ["completely different words entirely unrelated content " * 3]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"text": texts, "id": [0, 1, 2]}))
    pairs = simhash_pairs(ds, "text", "id", hamming_k=10).to_pandas()
    sims = simhash64(texts)
    for _, r in pairs.iterrows():
        d = bin(int(sims[int(r.a)]) ^ int(sims[int(r.b)])).count("1")
        assert d == int(r.hamming)
    assert {(0, 1)} <= {(int(r.a), int(r.b)) for _, r in pairs.iterrows()}


def test_exact_cardinality_many_blocks(ray_session):
    """Distinct keys spanning sorted-block boundaries must not double
    count (the per-block run counts overlap at block edges)."""
    vals = np.repeat(np.arange(2000, dtype=np.int64), 5)
    rng = np.random.default_rng(3)
    rng.shuffle(vals)
    ds = ray.data.from_pandas(
        pd.DataFrame({"v": vals})).repartition(16)
    assert exact_cardinality(ds, "v") == 2000
