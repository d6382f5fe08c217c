"""Round-4 composite differential: QUERY-FILTERED index aggregations.

The fixed oracles cover each aggregation once and the agg spec space is
covered dataset-level by test_agg_differential; what was uncovered is
the composition the CLI exposes as ``agg idx SPEC -q QUERY``: an
aggregation computed over a full-text match set. Here random query
trees (term / term_set / numeric / date / json ranges, composed with
bool / dismax) are paired with random agg specs (terms+metric sub-agg,
histogram, stats, value_count) and each pair is checked against a
pandas model computed over the naive match set — and the leaf/root
``ShardedSearchPool.aggregate`` must agree with the single reader on
the same pairs.
"""

import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_diff_r4e"
SF = "/root/testdata/sf0.001"


def _schema():
    s = IndexSchema()
    s.add_string_field("event_type", fast=True)
    s.add_integer_field("user_id", fast=True)
    s.add_float_field("value", fast=True)
    s.add_date_field("ts", fast=True)
    s.add_json_field("props")
    return s


@pytest.fixture(scope="module")
def env(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    idx = f"{BASE}/idx"
    build_index([f"{SF}/events.parquet"], idx, _schema(), num_shards=4,
                target_docs_per_partition=300)
    df = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_type", "user_id", "value", "ts", "props"]
    ).to_pandas()
    df["k"] = df["props"].map(lambda s: __import__("json").loads(s)["k"])
    yield IndexReader(idx), df
    shutil.rmtree(BASE, ignore_errors=True)


def _naive_match(df: pd.DataFrame, q: Query) -> np.ndarray:
    """Row mask for the query over the raw columns."""
    k, p = q.kind, q.params
    n = len(df)
    if k == "term":
        return (df["event_type"] == p[1]).to_numpy()
    if k == "term_set":
        return df["event_type"].isin(list(p[1])).to_numpy()
    if k == "all":
        return np.ones(n, bool)
    if k == "range":
        field, lo, hi, il, ih = p
        v = df[field]
        m = v.notna().to_numpy()
        if lo is not None:
            m &= (v >= lo).to_numpy() if il else (v > lo).to_numpy()
        if hi is not None:
            m &= (v <= hi).to_numpy() if ih else (v < hi).to_numpy()
        return m
    if k == "json_range":
        _f, _path, lo, hi, il, ih = p
        v = df["k"]
        m = np.ones(n, bool)
        if lo is not None:
            m &= (v >= lo).to_numpy() if il else (v > lo).to_numpy()
        if hi is not None:
            m &= (v <= hi).to_numpy() if ih else (v < hi).to_numpy()
        return m
    if k == "json_exists":
        return np.ones(n, bool)
    if k == "bool":
        musts = [s for o, s in p if o == Occur.MUST]
        shoulds = [s for o, s in p if o == Occur.SHOULD]
        nots = [s for o, s in p if o == Occur.MUST_NOT]
        if musts:
            cur = np.ones(n, bool)
            for s in musts:
                cur &= _naive_match(df, s)
        elif shoulds:
            cur = np.zeros(n, bool)
            for s in shoulds:
                cur |= _naive_match(df, s)
        else:
            return np.zeros(n, bool)
        for s in nots:
            cur &= ~_naive_match(df, s)
        return cur
    if k == "dismax":
        cur = np.zeros(n, bool)
        for s in p[0]:
            cur |= _naive_match(df, s)
        return cur
    if k in ("boost", "const"):
        return _naive_match(df, p[0])
    raise AssertionError(k)


def _rand_query(df, rng, depth=2) -> Query:
    types = ["view", "signup", "purchase", "click", "error", "ghost"]
    leaves = [
        lambda: Query.term("event_type",
                           types[int(rng.integers(0, len(types)))]),
        lambda: Query.term_set(
            "event_type",
            [types[i] for i in rng.choice(len(types), 2, replace=False)]),
        lambda: Query.range("value", float(rng.uniform(0, 50)),
                            float(rng.uniform(50, 120)),
                            include_lower=bool(rng.integers(0, 2)),
                            include_upper=bool(rng.integers(0, 2))),
        lambda: Query.range("user_id", int(rng.integers(0, 40)),
                            int(rng.integers(40, 120))),
        lambda: Query.range("ts", df["ts"].quantile(0.15),
                            df["ts"].quantile(
                                float(rng.uniform(0.4, 0.95)))),
        lambda: Query.json_range("props", "k", int(rng.integers(0, 40)),
                                 int(rng.integers(40, 100))),
        lambda: Query.all(),
    ]
    if depth == 0 or rng.random() < 0.4:
        return leaves[int(rng.integers(0, len(leaves)))]()
    kids = [_rand_query(df, rng, depth - 1) for _ in range(2)]
    roll = rng.random()
    if roll < 0.55:
        occ = [Occur.MUST, Occur.SHOULD, Occur.MUST_NOT]
        return Query.boolean([(occ[int(rng.integers(0, 3))], kids[0]),
                              (occ[int(rng.integers(0, 2))], kids[1])])
    if roll < 0.8:
        return Query.disjunction_max(kids, 0.2)
    return Query.const_score(kids[0], 3.0)


def _check_agg(res: dict, sub: pd.DataFrame, spec: dict) -> None:
    """Compare one agg result against pandas over the matched rows."""
    for name, s in spec.items():
        r = res[name]
        if "terms" in s:
            size = s["terms"].get("size", 10)
            vc = sub.groupby("event_type").size()
            order = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
            want = order[:size]
            got = [(b["key"], b["doc_count"]) for b in r["buckets"]]
            assert got == want, (name, got, want)
            if "aggs" in s:
                for b in r["buckets"]:
                    grp = sub[sub["event_type"] == b["key"]]["value"]
                    assert b["v"]["value"] == pytest.approx(
                        float(grp.mean()), rel=1e-12), b
        elif "histogram" in s:
            body = s["histogram"]
            interval = body["interval"]
            off = float(body.get("offset", 0.0))
            v = sub["value"].to_numpy(np.float64)
            hb = body.get("hard_bounds")
            if hb is not None:
                v = v[(v >= hb["min"]) & (v <= hb["max"])]
            keys = np.floor((v - off) / interval) * interval + off
            want = pd.Series(keys).value_counts().to_dict()
            got = {float(b["key"]): b["doc_count"]
                   for b in r["buckets"] if b["doc_count"] > 0}
            assert got == {float(k): int(c) for k, c in want.items()}, name
            bkeys = sorted(float(b["key"]) for b in r["buckets"])
            eb = body.get("extended_bounds")
            if eb is not None:
                import math
                lo = math.floor((eb["min"] - off) / interval) * interval + off
                hi = math.floor((eb["max"] - off) / interval) * interval + off
                # the grid covers the bounds even when the match set is
                # empty, and every emitted key sits on the offset grid
                assert bkeys and bkeys[0] <= lo and bkeys[-1] >= hi, name
            if len(bkeys) > 1:
                assert np.allclose(np.diff(bkeys), interval), name
        elif "stats" in s:
            v = sub["value"]
            assert r["count"] == len(v)
            if len(v):
                assert r["min"] == pytest.approx(float(v.min()))
                assert r["max"] == pytest.approx(float(v.max()))
                assert r["sum"] == pytest.approx(float(v.sum()),
                                                 rel=1e-9)
                assert r["avg"] == pytest.approx(float(v.mean()),
                                                 rel=1e-9)
        elif "value_count" in s:
            assert r["value"] == sub["user_id"].notna().sum(), name
        else:
            raise AssertionError(s)


_SPECS = [
    {"t": {"terms": {"field": "event_type", "size": 3},
           "aggs": {"v": {"avg": {"field": "value"}}}}},
    {"t": {"terms": {"field": "event_type", "size": 10}}},
    {"h": {"histogram": {"field": "value", "interval": 12.5}}},
    {"hb": {"histogram": {"field": "value", "interval": 20.0, "offset": 5.0,
            "hard_bounds": {"min": 10.0, "max": 180.0}}}},
    {"he": {"histogram": {"field": "value", "interval": 25.0,
            "extended_bounds": {"min": -50.0, "max": 250.0}}}},
    {"s": {"stats": {"field": "value"}}},
    {"c": {"value_count": {"field": "user_id"}}},
    {"s": {"stats": {"field": "value"}},
     "t": {"terms": {"field": "event_type", "size": 4}}},
]


def test_random_query_filtered_aggs_match_pandas(env):
    reader, df = env
    rng = np.random.default_rng(23)
    checked_nonempty = 0
    for i in range(36):
        q = _rand_query(df, rng)
        spec = _SPECS[i % len(_SPECS)]
        mask = _naive_match(df, q)
        # the filter itself must agree before the agg comparison means
        # anything
        docs, _ = reader.evaluate(q)
        assert set(docs.tolist()) == set(np.flatnonzero(mask).tolist()), \
            repr(q)
        res = reader.aggregate(q, spec)
        _check_agg(res, df[mask], spec)
        checked_nonempty += int(mask.any())
    assert checked_nonempty >= 20   # the space isn't degenerate


def test_sharded_pool_aggregate_matches_reader(env, tmp_path):
    from tantivy4java_ray.pipelines.search import ShardedSearchPool
    reader, df = env
    rng = np.random.default_rng(99)
    pairs = [(_rand_query(df, rng), _SPECS[i % len(_SPECS)])
             for i in range(10)]
    pool = ShardedSearchPool(f"{BASE}/idx", num_actors=3)

    def _close(a, b, path=""):
        if isinstance(a, dict):
            assert set(a) == set(b), (path, a, b)
            for k in a:
                _close(a[k], b[k], f"{path}.{k}")
        elif isinstance(a, list):
            assert len(a) == len(b), path
            for i, (x, y) in enumerate(zip(a, b)):
                _close(x, y, f"{path}[{i}]")
        elif isinstance(a, float):
            assert b == pytest.approx(a, rel=1e-9, abs=1e-12), path
        else:
            assert a == b, path

    try:
        for q, spec in pairs:
            _close(reader.aggregate(q, spec), pool.aggregate(q, spec))
    finally:
        pool.shutdown()
