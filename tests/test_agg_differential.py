"""Randomized aggregation differential: random terms/histogram/range/
metric/sub-agg specs over the events table, each checked against a
DuckDB query generated from the same spec. Complements the fixed
per-agg oracles with spec-space coverage."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from tantivy4java_ray.aggs import aggregate_dataset

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def env(ray_session):
    ds = ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{SF}/events.parquet'")
    yield ds, con
    con.close()


def _buckets(res):
    return {str(b["key"]): b["doc_count"] for b in res["buckets"]}


def test_random_terms_aggs(env):
    ds, con = env
    rng = np.random.default_rng(11)
    for field in ("event_type", "user_id"):
        size = int(rng.integers(2, 30))
        out = aggregate_dataset(
            ds, {"t": {"terms": {"field": field, "size": size}}})
        got = [(str(b["key"]), b["doc_count"])
               for b in out["t"]["buckets"]]
        ref = con.execute(
            f"SELECT CAST({field} AS VARCHAR) k, count(*) c FROM events "
            f"WHERE {field} IS NOT NULL "
            f"GROUP BY 1 ORDER BY c DESC, k LIMIT {size}").fetchall()
        assert got == [(k, c) for k, c in ref], (field, size)


def test_random_histograms(env):
    ds, con = env
    rng = np.random.default_rng(5)
    for _ in range(6):
        interval = float(rng.choice([2.5, 7.0, 13.0, 40.0]))
        offset = float(rng.choice([0.0, 1.0, 3.5]))
        out = aggregate_dataset(ds, {"h": {"histogram": {
            "field": "value", "interval": interval, "offset": offset}}})
        got = {float(b["key"]): b["doc_count"] for b in out["h"]["buckets"]}
        ref = {float(k): c for k, c in con.execute(
            f"SELECT floor((value - {offset}) / {interval}) * {interval}"
            f" + {offset} AS k, count(*) FROM events "
            f"WHERE value IS NOT NULL GROUP BY 1").fetchall()}
        # ES/tantivy semantics: interior gaps filled with empty buckets
        if ref:
            js = sorted(round((k - offset) / interval) for k in ref)
            for j in range(js[0], js[-1] + 1):
                ref.setdefault(j * interval + offset, 0)
        assert got == ref, (interval, offset)


def test_random_ranges(env):
    ds, con = env
    rng = np.random.default_rng(3)
    for _ in range(5):
        edges = np.sort(rng.uniform(-50, 150, 2))
        lo, hi = float(edges[0]), float(edges[1])
        out = aggregate_dataset(ds, {"r": {"range": {
            "field": "value",
            "ranges": [{"to": lo}, {"from": lo, "to": hi},
                       {"from": hi}]}}})
        cnt = [b["doc_count"] for b in out["r"]["buckets"]]
        ref = con.execute(
            f"SELECT count(*) FILTER (value < {lo}), "
            f"count(*) FILTER (value >= {lo} AND value < {hi}), "
            f"count(*) FILTER (value >= {hi}) FROM events "
            f"WHERE value IS NOT NULL").fetchone()
        assert cnt == list(ref), (lo, hi)


def test_random_metric_and_subagg(env):
    ds, con = env
    out = aggregate_dataset(ds, {
        "s": {"stats": {"field": "value"}},
        "by": {"terms": {"field": "event_type", "size": 10},
               "aggs": {"m": {"avg": {"field": "value"}},
                        "x": {"max": {"field": "value"}}}}})
    st = out["s"]
    ref = con.execute(
        "SELECT count(value), min(value), max(value), sum(value), "
        "avg(value) FROM events").fetchone()
    assert st["count"] == ref[0]
    assert st["min"] == pytest.approx(ref[1])
    assert st["max"] == pytest.approx(ref[2])
    assert st["sum"] == pytest.approx(ref[3])
    assert st["avg"] == pytest.approx(ref[4])
    sub = {b["key"]: (b["m"]["value"], b["x"]["value"])
           for b in out["by"]["buckets"]}
    for k, m, x in con.execute(
            "SELECT event_type, avg(value), max(value) FROM events "
            "WHERE event_type IS NOT NULL GROUP BY 1").fetchall():
        assert sub[k][0] == pytest.approx(m), k
        assert sub[k][1] == pytest.approx(x), k
